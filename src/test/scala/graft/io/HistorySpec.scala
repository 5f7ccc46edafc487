package graft.io

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class HistorySpec extends AnyFunSuite {
  import TestSpark._

  test("daily-partitioned write; slice reads prune partitions and push the key filter") {
    val dir = java.nio.file.Files.createTempDirectory("graft-hist").toString + "/ticks"
    // two days × two instruments (86400 s apart)
    val rows = for {
      (p, off) <- Seq(("A", 0L), ("B", 5L))
      day <- 0 to 1
      i <- 0 until 10
    } yield (p, day * 86400L + i * 60 + off, (day * 1000 + i).toLong,
      100.0 + i, Option(99.0 + i), Option(101.0 + i))
    History.write(ticks(rows), dir)

    val sliced = History.slice(spark, dir, "2023-11-15", "A")
    assert(sliced.count() == 10)
    assert(sliced.select("product_id").distinct().collect().map(_.getString(0)).toSeq == Seq("A"))

    val plan = sliced.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("event_date"),
      s"date predicate must prune partitions:\n$plan")
    assert(plan.contains("PushedFilters") && plan.contains("product_id"),
      s"instrument predicate must reach the parquet scan:\n$plan")
    // layout: one directory per day
    val dirs = new java.io.File(dir).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.count(_.startsWith("event_date=")) == 2)
  }
}

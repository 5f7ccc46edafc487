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

  test("compactDay collapses micro-batch file accretion and preserves content + pruning") {
    val dir = java.nio.file.Files.createTempDirectory("graft-compact").toString + "/ticks"
    // simulate 12 micro-batch appends into the same day
    for (batch <- 0 until 12) {
      val rows = (0 until 20).map(i => ("A", batch * 600L + i, (batch * 100 + i).toLong,
        100.0 + i, Option(99.0), Option(101.0)))
      History.write(ticks(rows), dir)
    }
    val day = new java.io.File(dir).listFiles()
      .find(_.getName.startsWith("event_date=")).get
    val date = day.getName.stripPrefix("event_date=")
    val before = History.read(spark, dir).orderBy("sequence").collect().toSeq

    val (nBefore, nAfter) = History.compactDay(spark, dir, date)
    assert(nBefore >= 10, s"expected accreted small files, saw $nBefore")
    assert(nAfter == 1, s"tiny day must compact to one file, saw $nAfter")

    val after = History.read(spark, dir).orderBy("sequence").collect().toSeq
    assert(after == before, "compaction must preserve every row bit-for-bit")
    // idempotent: already-compact day is left alone
    assert(History.compactDay(spark, dir, date) == ((1, 1)))
  }

  private def accrete(dir: String, batches: Int = 12): String = {
    for (batch <- 0 until batches) {
      val rows = (0 until 20).map(i => ("A", batch * 600L + i, (batch * 100 + i).toLong,
        100.0 + i, Option(99.0), Option(101.0)))
      History.write(ticks(rows), dir)
    }
    new java.io.File(dir.stripPrefix("flaky:")).listFiles()
      .find(_.getName.startsWith("event_date=")).get.getName.stripPrefix("event_date=")
  }

  test("compactDay restores a stranded backup from a crash between the two renames") {
    val dir = java.nio.file.Files.createTempDirectory("graft-crash").toString + "/ticks"
    val date = accrete(dir)
    val before = History.read(spark, dir).orderBy("sequence").collect().toSeq
    // simulate the crash window: old dir moved aside, new dir never moved in
    val base = new java.io.File(dir)
    assert(new java.io.File(base, s"event_date=$date")
      .renameTo(new java.io.File(base, s".old-event_date=$date")))
    // the day must NOT read as empty: the next compactDay self-heals first
    val (nBefore, nAfter) = History.compactDay(spark, dir, date)
    assert(nBefore >= 10 && nAfter == 1, s"expected restore+compact, got ($nBefore, $nAfter)")
    assert(History.read(spark, dir).orderBy("sequence").collect().toSeq == before,
      "every row must survive the crash-recovery compaction")
    assert(!new java.io.File(base, s".old-event_date=$date").exists())
  }

  test("compactDay aborts on a false-returning rename, leaving the day readable") {
    val conf = spark.sparkContext.hadoopConfiguration
    conf.set("fs.flaky.impl", classOf[FlakyRenameFs].getName)
    conf.set("fs.flaky.impl.disable.cache", "true")
    val local = java.nio.file.Files.createTempDirectory("graft-flaky").toString + "/ticks"
    val dir = s"flaky:$local"
    val date = accrete(dir)
    val before = History.read(spark, dir).orderBy("sequence").collect().toSeq

    // rename #1 (live -> backup) returns false: nothing must have moved
    FlakyRenameFs.failAt.set(1)
    intercept[java.io.IOException](History.compactDay(spark, dir, date))
    assert(History.read(spark, dir).orderBy("sequence").collect().toSeq == before,
      "a failed first rename must leave the live day untouched")

    // rename #2 (tmp -> live) returns false: the backup must be restored
    FlakyRenameFs.failAt.set(2)
    intercept[java.io.IOException](History.compactDay(spark, dir, date))
    assert(History.read(spark, dir).orderBy("sequence").collect().toSeq == before,
      "a failed swap-in must restore the original at the live path")

    // with the filesystem healthy again the same call succeeds
    FlakyRenameFs.failAt.set(0)
    val (_, nAfter) = History.compactDay(spark, dir, date)
    assert(nAfter == 1)
    assert(History.read(spark, dir).orderBy("sequence").collect().toSeq == before)
  }

  test("upsertDay merges late rows, replaces collided keys, and is idempotent") {
    val dir = java.nio.file.Files.createTempDirectory("graft-upsert").toString + "/ticks"
    accrete(dir) // fixture spans midnight: 220 rows on day one, 20 on day two
    def dateOf(secs: Long): String =
      java.time.Instant.ofEpochMilli(1700000000000L + secs * 1000L)
        .atZone(java.time.ZoneOffset.UTC).toLocalDate.toString
    val date = dateOf(0L)
    val before = History.slice(spark, dir, date, "A").count()

    // a correction for an existing key (seq 5 re-priced) + two new rows
    // (t=6300/6301 stay before the fixture's midnight at t=6400)
    val updates = ticks(Seq(
      ("A", 5L, 5L, 999.0, Option(998.0), Option(1000.0)),     // replaces
      ("A", 6300L, 9001L, 50.0, Option(49.0), Option(51.0)),   // new
      ("A", 6301L, 9002L, 51.0, Option(50.0), Option(52.0))))  // new
    val (b1, in1, a1) = History.upsertDay(spark, dir, date, updates)
    assert(b1 == before && in1 == 3 && a1 == before + 2,
      s"merge counts off: ($b1, $in1, $a1) vs before=$before")
    val rePriced = History.slice(spark, dir, date, "A")
      .filter(org.apache.spark.sql.functions.col("sequence") === 5L)
      .select("price").collect().map(_.getDouble(0)).toSeq
    assert(rePriced == Seq(999.0), "incoming row must replace the matched key")

    // idempotent: the same slice again changes nothing
    val content1 = History.read(spark, dir).orderBy("sequence", "event_time")
      .collect().toSeq
    val (b2, in2, a2) = History.upsertDay(spark, dir, date, updates)
    assert(b2 == a1 && in2 == 3 && a2 == a1, "re-run must be a content no-op")
    val content2 = History.read(spark, dir).orderBy("sequence", "event_time")
      .collect().toSeq
    assert(content2 == content1, "idempotent upsert must preserve content")

    // mis-dated rows cannot leak into the wrong partition
    val wrongDay = ticks(Seq(("A", 20 * 86400L, 7777L, 1.0, None, None)))
    val (_, in3, a3) = History.upsertDay(spark, dir, date, wrongDay)
    assert(in3 == 0 && a3 == a1, "other-day rows must be filtered out")

    // creating a missing day from scratch
    val dir2 = java.nio.file.Files.createTempDirectory("graft-upsert2").toString + "/ticks"
    val (b4, in4, a4) = History.upsertDay(spark, dir2, dateOf(20 * 86400L), wrongDay)
    assert(b4 == 0 && a4 == in4 && in4 == 1)
  }

  test("backtest over a warehouse slice equals the strategy on the same ticks (T8)") {
    import graft.{Backtest, TestSpark}
    import graft.config.StrategyConfig
    import graft.strategy.SmaCrossStrategy
    val dir = java.nio.file.Files.createTempDirectory("graft-bt").toString + "/ticks"
    val cfg = StrategyConfig(smaFastWindow = 2, smaSlowWindow = 4,
      smaConfirmationWindow = 1)
    val rows = (0 until 120).map(i =>
      ("A", i * 60L, i.toLong, 100.0 + 3 * math.sin(i / 5.0),
        Option(99.0), Option(101.0)))
    History.write(ticks(rows), dir)

    // slice = second hour of data
    val t0 = TestSpark.ts(3600).toInstant.toString.replace("T", " ").dropRight(1)
    val t1 = TestSpark.ts(7200).toInstant.toString.replace("T", " ").dropRight(1)
    val bt = Backtest.run(spark, dir, SmaCrossStrategy, cfg, t0, t1)

    val direct = SmaCrossStrategy(
      ticks(rows.filter(r => r._2 >= 3600 && r._2 < 7200)), cfg)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
    assert(canon(bt.signals) == canon(direct.signals))
    assert(canon(bt.executions) == canon(direct.executions))
  }
}

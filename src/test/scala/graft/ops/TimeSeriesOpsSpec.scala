package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

/** GapFill + Ewma — hand-checkable fixtures. */
class TimeSeriesOpsSpec extends AnyFunSuite {
  import TestSpark._

  test("gapfill carries the latest observation onto a regular grid") {
    // key A: obs at 0:30 and 2:10 (minutes:seconds); grid 1 minute from 0:00
    val df = ticks(Seq(
      ("A", 30, 0, 10.0, None, None),
      ("A", 130, 1, 20.0, None, None),
      ("B", 65, 2, 5.0, None, None)))
      .select(col("product_id"), col("event_time"), col("price"))
    val out = GapFill(df, Seq("product_id"), "event_time", "1 minute",
        Seq("price" -> "price", "event_time" -> "src_time"))
      .orderBy("product_id", "grid_ts").collect()
    val a = out.filter(_.getString(0) == "A")
    // A grid: 0:00 (before first obs → null), 1:00 (carries 10.0), 2:00 (10.0)
    assert(a.length == 3)
    assert(a(0).isNullAt(a(0).fieldIndex("price")))
    assert(a(1).getAs[Double]("price") == 10.0)
    assert(a(2).getAs[Double]("price") == 10.0)
    assert(a(1).getAs[Timestamp]("src_time") == ts(30))
    // B grid: single point at 1:00, before obs at 1:05 → null
    val b = out.filter(_.getString(0) == "B")
    assert(b.length == 1 && b(0).isNullAt(b(0).fieldIndex("price")))
  }

  test("ewma folds in event order with first-observation seed") {
    val df = ticks(Seq(
      ("A", 0, 0, 16.0, None, None),
      ("A", 10, 1, 8.0, None, None),
      ("A", 20, 2, 4.0, None, None),
      ("B", 0, 3, 1.0, None, None)))
    val out = Ewma.finalPerKey(df, "product_id", "event_time", "sequence", "price")
      .orderBy("product_id").collect()
    // A: s0=16; s1 = 8/8 + 16*7/8 = 15; s2 = 4/8 + 15*7/8 = 13.625
    assert(out(0).getAs[Long]("n_ticks") == 3L)
    assert(out(0).getAs[Double]("ewma") == 13.625)
    assert(out(1).getAs[Double]("ewma") == 1.0)
  }

  test("ewma is insensitive to input row order (sort is internal)") {
    val rows = (0 until 50).map(i => ("A", i.toLong, i.toLong, 100.0 + i, None, None))
    val fwd = Ewma.finalPerKey(ticks(rows), "product_id", "event_time", "sequence", "price")
      .head().getAs[Double]("ewma")
    val rev = Ewma.finalPerKey(ticks(rows.reverse), "product_id", "event_time", "sequence", "price")
      .head().getAs[Double]("ewma")
    assert(fwd == rev)
  }
}

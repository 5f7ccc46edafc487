package graft.ops

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

class RollupSpec extends AnyFunSuite {
  import TestSpark._

  final case class Metric(
      strategy_run_id: String, metric_time: Timestamp,
      sharpe_ratio: java.lang.Double, sortino_ratio: java.lang.Double,
      cumulative_return: Double, drawdown: Double, trades_executed: Long)

  private def metric(min: Long, sharpe: Double): Metric =
    Metric("run", ts(min * 60), sharpe, sharpe / 2, sharpe * 0.1, -0.5, 2L)

  test("hourly rollup as a streaming windowed aggregate: watermark closes buckets (A7/T2)") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val ms = MemoryStream[Metric]
    val q = Rollup.hourlyStream(
      ms.toDF().withWatermark("metric_time", "10 minutes"))
      .writeStream.outputMode("append")
      .format("memory").queryName("rollup_stream").start()
    try {
      // 3 hours of 5-min metrics, then a late-hour event to push the watermark
      ms.addData((0 until 36).map(i => metric(i * 5, 1.0 + i)))
      q.processAllAvailable()
      ms.addData(Seq(metric(60 * 5, 99.0))) // watermark → hour 4; hours 0-2 close
      q.processAllAvailable()
    } finally q.stop()
    val out = s.table("rollup_stream").collect()
    // fixture starts at 22:13:20, so the 36 metrics span 4 hour buckets
    // (10+12+12+2 windows); all four close once the watermark passes —
    // only the late metric's own bucket stays open and unemitted
    assert(out.length == 4)
    assert(out.map(_.getAs[Long]("total_trades")).sorted.toSeq == Seq(4L, 20L, 24L, 24L))
    val firstHour = out.minBy(_.getAs[Timestamp]("bucket").getTime)
    assert(firstHour.getAs[Double]("avg_sharpe") > 1.0)
  }

  test("incremental maintenance: merged partials finalize to the full-recompute bits") {
    val s = spark
    import s.implicits._
    // two days of metrics; the second slice also lands INSIDE buckets the
    // first slice already covers (the hard case: partial-bucket merge)
    val cols = Seq("strategy_run_id", "metric_time", "sharpe_ratio",
      "sortino_ratio", "cumulative_return", "drawdown", "trades_executed")
    def rowsOf(ms: Seq[Metric]) = ms.map(m => (m.strategy_run_id,
      m.metric_time, m.sharpe_ratio.doubleValue, m.sortino_ratio.doubleValue,
      m.cumulative_return, m.drawdown, m.trades_executed))
    val day1 = (0 until 40).map(i => metric(i * 5, 1.0 + (i % 7) * 0.31))
    val day2 = (37 until 90).map(i => metric(i * 5, 2.0 + (i % 5) * 0.17))
    val d1 = rowsOf(day1).toDF(cols: _*)
    val d2 = rowsOf(day2).toDF(cols: _*)
    val full = rowsOf(day1 ++ day2).toDF(cols: _*)

    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq

    val incremental = Rollup.finalizeHourly(
      Rollup.mergeHourly(Rollup.hourlyPartials(d1), Rollup.hourlyPartials(d2)))
    assert(canon(incremental) == canon(Rollup.hourly(full)),
      "incremental refresh must equal full recompute bit-for-bit")

    // merging an empty delta is the identity
    val empty = Rollup.hourlyPartials(full.filter($"trades_executed" < 0))
    assert(canon(Rollup.finalizeHourly(
      Rollup.mergeHourly(Rollup.hourlyPartials(d1), empty))) ==
      canon(Rollup.hourly(d1)))
  }
}

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
}

package graft.streaming

import graft.TestSpark
import graft.config.StrategyConfig
import graft.ops.{Normalize, SmaCross}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** The keyed-ring-buffer streaming variant must produce bit-identical
  * SMAs/spreads/signals to the batch pipeline. */
class StatefulSignalsSpec extends AnyFunSuite {
  import TestSpark._

  private val cfg = StrategyConfig(
    smaFastWindow = 3, smaSlowWindow = 6, smaConfirmationWindow = 2)

  private def price(i: Int) = 100.0 + 2.5 * math.sin(i / 6.0) + (i % 4) * 0.3

  test("flatMapGroupsWithState signals equal batch signals bit-for-bit") {
    val s = spark
    import s.implicits._
    // sub-ms micros (i*131 % 1000): the state fold must sort/compare on
    // exact micros, not getTime ms (round-2 ADVICE)
    val ins = for {
      p <- Seq("A", "B"); i <- 0 until 150
    } yield StatefulSignals.TickIn(p, tsUs(i * 7000000L + (i * 131) % 1000), i.toLong,
      price(i) + (if (p == "A") 0 else 3))

    implicit val sq = s.sqlContext
    val ms = MemoryStream[StatefulSignals.TickIn]
    val q = StatefulSignals.signals(ms.toDS(), cfg)
      .writeStream.outputMode("append").format("memory")
      .queryName("stateful_signals").start()
    try {
      val sorted = ins.sortBy(t => (EventTime.micros(t.event_time), t.product_id))
      Seq(sorted.slice(0, 90), sorted.slice(90, 210), sorted.slice(210, 300))
        .foreach { c => ms.addData(c); q.processAllAvailable() }
    } finally q.stop()

    val streamed = s.table("stateful_signals").collect()
      .map(r => (r.getAs[String]("product_id"), r.getAs[Long]("sequence")) ->
        (r.getAs[Double]("fast_sma"), r.getAs[Double]("slow_sma"),
          r.getAs[Double]("spread"), r.getAs[String]("signal_type"),
          r.getAs[Double]("position"))).toMap

    // batch reference: raw ticks (no bid/ask → mid = price) through the
    // ops, built from the identical micro-precision timestamps
    val raw = ins.map(t =>
      Tick(t.product_id, t.event_time, t.sequence, t.mid_price, null, null)).toDF()
    val batch = SmaCross.enrich(Normalize(raw), cfg)
    val isLong = org.apache.spark.sql.functions.expr("spread > 0 AND prev_spread <= 0")
    val isShort = org.apache.spark.sql.functions.expr("spread < 0 AND prev_spread >= 0")
    import org.apache.spark.sql.functions._
    val ref = batch.select(col("product_id"), col("sequence"),
      col("fast_sma"), col("slow_sma"), col("spread"),
      when(isLong, "LONG").when(isShort, "SHORT").otherwise("HOLD").as("st"),
      when(isLong, 1.0).when(isShort, -1.0).otherwise(0.0).as("pos"))
      .collect()
      .map(r => (r.getAs[String]("product_id"), r.getAs[Long]("sequence")) ->
        (r.getAs[Double]("fast_sma"), r.getAs[Double]("slow_sma"),
          r.getAs[Double]("spread"), r.getAs[String]("st"),
          r.getAs[Double]("pos"))).toMap

    assert(streamed.keySet == ref.keySet)
    streamed.keySet.foreach { k =>
      assert(streamed(k) == ref(k), s"row $k must match batch bit-for-bit")
    }
  }

  test("late rows behind the key's state are dropped, not reprocessed") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val ms = MemoryStream[StatefulSignals.TickIn]
    val q = StatefulSignals.signals(ms.toDS(), cfg)
      .writeStream.outputMode("append").format("memory")
      .queryName("stateful_late").start()
    try {
      ms.addData((0 until 10).map(i =>
        StatefulSignals.TickIn("A", ts(i * 10L), i.toLong, 100.0 + i)))
      q.processAllAvailable()
      ms.addData(Seq(StatefulSignals.TickIn("A", ts(5L), 99L, 500.0))) // stale
      q.processAllAvailable()
    } finally q.stop()
    val rows = s.table("stateful_late").collect()
    assert(rows.length == 10)
    assert(!rows.exists(_.getAs[Long]("sequence") == 99L))
  }
}

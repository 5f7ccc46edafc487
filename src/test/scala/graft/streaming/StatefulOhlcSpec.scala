package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable

/** Streaming OHLC ≡ batch on every prefix: bars emitted at ingest (each
  * exactly once, the moment a later-bar tick arrives) equal the batch
  * `min_by/max_by(struct(event_time, sequence))` aggregation over the
  * ticks seen so far minus each key's still-open bar — across
  * chunkings, same-instant sequence ties on open AND close, replays,
  * and a checkpointed restart. */
class StatefulOhlcSpec extends AnyFunSuite {
  import TestSpark._
  import StatefulOhlc.{BarOut, TickIn}

  private val HourUs = 3600000000L

  private def t(hhmm: String): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(s"2024-03-01 $hhmm:00")

  // A: 10:00 bar with same-instant ties at BOTH ends (open = seq 1 at
  // 10:05, close = seq 5 at 10:50), high/low mid-bar; 11:00 bar closed
  // by a 12:05 tick; 12:00 bar left open. B: one bar, never closed.
  private val ticks: Seq[TickIn] = Seq(
    TickIn("A", t("10:05"), 1L, 5.0),
    TickIn("A", t("10:05"), 2L, 5.5),
    TickIn("A", t("10:20"), 3L, 7.0),
    TickIn("A", t("10:40"), 4L, 4.0),
    TickIn("A", t("10:50"), 5L, 6.0),
    TickIn("A", t("11:10"), 6L, 6.5),
    TickIn("A", t("11:45"), 7L, 6.2),
    TickIn("A", t("12:05"), 8L, 6.8),
    TickIn("B", t("10:20"), 1L, 9.0))

  private type Row = (String, java.sql.Timestamp, Double, Double, Double,
    Double, Long)

  private def runStream(chunks: Seq[Seq[TickIn]]): Seq[Row] = {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val got = mutable.ArrayBuffer[Row]()
    val ms = MemoryStream[TickIn]
    val q = StatefulOhlc.bars(ms.toDS(), HourUs)
      .writeStream.outputMode(OutputMode.Append())
      .foreachBatch { (df: org.apache.spark.sql.Dataset[BarOut], _: Long) =>
        df.collect().foreach(b => got += ((b.product_id, b.bar_ts,
          b.open, b.high, b.low, b.close, b.n_ticks)))
      }.start()
    try chunks.foreach { c => ms.addData(c); q.processAllAvailable() }
    finally q.stop()
    assert(got.size == got.distinct.size, "a bar was emitted twice")
    got.toSeq
  }

  /** Batch OHLC over `rows` (the ohlc_bars aggregation) minus each
    * key's last — still open — bar. */
  private def closedBatchOf(rows: Seq[TickIn]): Set[Row] = {
    val s = spark
    import s.implicits._
    val bars = rows.toDF("product_id", "event_time", "sequence", "price")
      .groupBy(col("product_id"),
        date_trunc("hour", col("event_time")).as("bar_ts"))
      .agg(
        min_by(col("price"), struct(col("event_time"), col("sequence"))).as("open"),
        max(col("price")).as("high"),
        min(col("price")).as("low"),
        max_by(col("price"), struct(col("event_time"), col("sequence"))).as("close"),
        count(lit(1)).as("n_ticks"))
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getLong(6)))
    val lastBar = bars.groupBy(_._1).map { case (k, bs) =>
      k -> bs.map(_._2.getTime).max }
    bars.filterNot(b => lastBar(b._1) == b._2.getTime).toSet
  }

  test("fixture exercises both same-instant ties and the open/close picks") {
    val all = closedBatchOf(ticks)
    // A 10:00 bar: open = seq 1's 5.0 (not seq 2's 5.5), close = 6.0,
    // high 7.0, low 4.0, 5 ticks
    assert(all.contains(("A", t("10:00"), 5.0, 7.0, 4.0, 6.0, 5L)))
    assert(all.contains(("A", t("11:00"), 6.5, 6.5, 6.2, 6.2, 2L)))
    assert(all.size == 2) // A's 12:00 bar and B's only bar are open
  }

  test("every stream prefix equals batch-minus-open-bars over ticks seen so far") {
    assert(runStream(Seq(ticks.slice(0, 3))).toSet == closedBatchOf(ticks.slice(0, 3)))
    assert(runStream(Seq(ticks.slice(0, 3), ticks.slice(3, 6))).toSet
      == closedBatchOf(ticks.slice(0, 6)))
    assert(runStream(Seq(ticks.slice(0, 6), ticks.slice(6, 9))).toSet
      == closedBatchOf(ticks))
  }

  test("chunking invariance and replayed-chunk idempotence") {
    val all = closedBatchOf(ticks)
    assert(runStream(Seq(ticks)).toSet == all)
    assert(runStream(ticks.map(Seq(_))).toSet == all)
    assert(runStream(Seq(ticks.slice(0, 6), ticks.slice(0, 6), ticks.slice(6, 9)))
      .toSet == all)
  }

  test("restart from checkpoint: the open bar survives and closes correctly") {
    val s = spark
    import s.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-ohlc-restart").toString
    val srcDir = base + "/src"
    val ckpt = base + "/ckpt"
    val schema = ticks.toDF().schema
    val got = mutable.ArrayBuffer[Row]()
    def runProcess(chunk: Seq[TickIn]): Unit = {
      chunk.toDF().coalesce(1).write.mode("append").parquet(srcDir)
      val q = StatefulOhlc.bars(
          s.readStream.schema(schema).parquet(srcDir).as[TickIn], HourUs)
        .writeStream.outputMode(OutputMode.Append())
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.Dataset[BarOut], _: Long) =>
          df.collect().foreach(b => got += ((b.product_id, b.bar_ts,
            b.open, b.high, b.low, b.close, b.n_ticks)))
        }.start()
      try q.processAllAvailable() finally q.stop()
    }
    // the 10:00 bar accumulates in process 1 and is CLOSED by the 11:10
    // tick that only process 2 sees — the state must survive the restart
    runProcess(ticks.slice(0, 5))
    runProcess(ticks.slice(5, 9))
    assert(got.size == got.distinct.size)
    assert(got.toSet == closedBatchOf(ticks),
      "bars across a checkpointed restart must equal batch-minus-open")
  }
}

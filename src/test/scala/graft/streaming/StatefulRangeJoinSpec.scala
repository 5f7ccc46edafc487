package graft.streaming

import graft.TestSpark
import graft.ops.Det
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable

/** Live lookback enrichment ≡ batch range_join on every prefix: rows
  * emitted at each trigger equal the batch band join over the events
  * seen so far — the exactly-at-60s inclusive lower bound, the
  * same-instant exclusive upper bound, triggers feeding later windows,
  * Det-grid bit-equal sums — across chunkings, replays, and a
  * checkpointed restart. */
class StatefulRangeJoinSpec extends AnyFunSuite {
  import TestSpark._
  import StatefulRangeJoin.{EnrichedOut, EventIn}

  private def t(mmss: String): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(s"2024-03-01 10:$mmss")

  // user 1: window with an exactly-60s-before event (INCLUDED), an
  // out-of-window event, a same-instant event (EXCLUDED), and an error
  // trigger that later serves as a window event for a SECOND error.
  // user 2: trigger with empty window.
  private val ev: Seq[EventIn] = Seq(
    EventIn(1L, t("00:00"), 1L, "view", 10.01),
    EventIn(1L, t("01:30"), 2L, "view", 5.5),
    EventIn(1L, t("02:00"), 3L, "click", 2.25),
    EventIn(1L, t("02:30"), 4L, "view", 1.0),
    EventIn(1L, t("02:30"), 5L, "error", 0.75), // window = [01:30, 02:30)
    EventIn(1L, t("03:00"), 6L, "error", 0.5),  // window includes the 02:30 error
    EventIn(2L, t("05:00"), 7L, "error", 9.0))  // empty window

  private type Row = (Long, Long, java.sql.Timestamp, Long, Double)

  private def runStream(chunks: Seq[Seq[EventIn]]): Seq[Row] = {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val got = mutable.ArrayBuffer[Row]()
    val ms = MemoryStream[EventIn]
    val q = StatefulRangeJoin.enrich(ms.toDS())
      .writeStream.outputMode(OutputMode.Append())
      .foreachBatch { (df: org.apache.spark.sql.Dataset[EnrichedOut], _: Long) =>
        df.collect().foreach(o =>
          got += ((o.user_id, o.event_id, o.ts, o.n_prior, o.sum_value)))
      }.start()
    try chunks.foreach { c => ms.addData(c); q.processAllAvailable() }
    finally q.stop()
    assert(got.size == got.distinct.size, "a trigger was enriched twice")
    got.sortBy(r => (r._1, r._2)).toSeq
  }

  /** The batch range_join algebra over the events seen so far. */
  private def batchOf(rows: Seq[EventIn]): Seq[Row] = {
    val s = spark
    import s.implicits._
    val df = rows.toDF()
    val err = df.filter(col("event_type") === "error")
      .select(col("user_id"), col("event_id"), col("ts"))
    val b = df.select(col("user_id").as("bu"), col("ts").as("bts"),
      col("value"))
    err.join(b, col("bu") === col("user_id") &&
        col("bts") >= col("ts") - expr("INTERVAL 60 seconds") &&
        col("bts") < col("ts"), "left")
      .groupBy(col("user_id"), col("event_id"), col("ts"))
      .agg(count(col("bts")).as("n_prior"),
        // the contract query wraps range_join in r6 — mirror the snap
        // here so twin ≡ batch is compared at the contract's surface
        Det.snap(coalesce(Det.sumD(col("value"), 4), lit(0.0)), 6)
          .as("sum_value"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id"),
        r.getAs[java.sql.Timestamp]("ts"), r.getAs[Long]("n_prior"),
        r.getAs[Double]("sum_value")))
      .sortBy(r => (r._1, r._2))
      .toSeq
  }

  test("fixture pins the inclusive 60s bound, same-instant exclusion, trigger reuse") {
    val b = batchOf(ev).map(r => (r._1, r._2) -> ((r._4, r._5))).toMap
    // event 5: 01:30 (exactly 60s before: IN), 02:00 in, 02:30 same-instant OUT
    assert(b((1L, 5L)) == ((2L, 7.75)))
    // event 6: window [02:00, 03:00) includes the 02:30 error itself
    assert(b((1L, 6L)) == ((3L, 4.0)))
    assert(b((2L, 7L)) == ((0L, 0.0)))
  }

  test("emitted rows equal batch on every prefix") {
    assert(runStream(Seq(ev.take(5))) == batchOf(ev.take(5)))
    assert(runStream(Seq(ev.take(5), ev.drop(5))) == batchOf(ev))
  }

  test("chunking invariance and replayed-chunk idempotence") {
    val all = batchOf(ev)
    assert(runStream(Seq(ev)) == all)
    assert(runStream(ev.map(Seq(_))) == all)
    assert(runStream(Seq(ev.take(5), ev.take(5), ev.drop(5))) == all)
  }

  test("restart from checkpoint: the lookback buffer survives") {
    val s = spark
    import s.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-rj-restart").toString
    val srcDir = base + "/src"
    val ckpt = base + "/ckpt"
    val schema = ev.toDF().schema
    val got = mutable.ArrayBuffer[Row]()
    def runProcess(chunk: Seq[EventIn]): Unit = {
      chunk.toDF().coalesce(1).write.mode("append").parquet(srcDir)
      val q = StatefulRangeJoin.enrich(
          s.readStream.schema(schema).parquet(srcDir).as[EventIn])
        .writeStream.outputMode(OutputMode.Append())
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.Dataset[EnrichedOut], _: Long) =>
          df.collect().foreach(o =>
            got += ((o.user_id, o.event_id, o.ts, o.n_prior, o.sum_value)))
        }.start()
      try q.processAllAvailable() finally q.stop()
    }
    // event 6's window spans the restart: its 02:00/02:30 window events
    // arrive in process 1, the trigger in process 2
    runProcess(ev.take(5))
    runProcess(ev.drop(5))
    assert(got.sortBy(r => (r._1, r._2)).toSeq == batchOf(ev),
      "lookback enrichment across a restart must equal the batch band join")
  }
}

package graft.streaming

import graft.TestSpark
import graft.ops.GapFill
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable

/** Streaming gap-fill ≡ batch GapFill on every prefix: grid rows emitted
  * at ingest (each exactly once) equal the batch grid over the
  * observations seen so far — across chunkings, replays, an
  * exactly-on-grid tie, pre-first-observation NULL rows, and a
  * checkpointed restart. */
class StatefulGapFillSpec extends AnyFunSuite {
  import TestSpark._
  import StatefulGapFill.{GridOut, ObsIn}

  private val HourUs = 3600000000L

  private def t(hhmm: String): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(s"2024-03-01 $hhmm:00")

  // A: mid-hour start (NULL at the 10:00 grid point), a 3-hour gap
  // (locf across 11:00/12:00/13:00), an EXACTLY-on-grid observation at
  // 15:00 (the as-of tie branch); B: single mid-hour observation.
  private val obs: Seq[ObsIn] = Seq(
    ObsIn("A", t("10:15"), 1.0),
    ObsIn("A", t("13:40"), 2.0),
    ObsIn("A", t("15:00"), 3.0),
    ObsIn("A", t("15:20"), 4.0),
    ObsIn("B", t("10:20"), 9.0))

  private type Row = (String, java.sql.Timestamp, Option[Double],
    Option[java.sql.Timestamp])

  private def runStream(chunks: Seq[Seq[ObsIn]]): Seq[Row] = {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val got = mutable.ArrayBuffer[Row]()
    val ms = MemoryStream[ObsIn]
    val q = StatefulGapFill.grid(ms.toDS(), HourUs, HourUs)
      .writeStream.outputMode(OutputMode.Append())
      .foreachBatch { (df: org.apache.spark.sql.Dataset[GridOut], _: Long) =>
        df.collect().foreach(g =>
          got += ((g.product_id, g.grid_ts, g.price, g.src_time)))
      }.start()
    try chunks.foreach { c => ms.addData(c); q.processAllAvailable() }
    finally q.stop()
    assert(got.size == got.distinct.size, "a grid row was emitted twice")
    got.toSeq
  }

  private def batchOf(rows: Seq[ObsIn]): Set[Row] = {
    val s = spark
    import s.implicits._
    GapFill(rows.toDF("product_id", "event_time", "price"),
        Seq("product_id"), "event_time", "1 hour",
        Seq("price" -> "price", "event_time" -> "src_time"),
        truncUnit = "hour")
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1),
        Option(r.get(2)).map(_.asInstanceOf[Double]),
        Option(r.getTimestamp(3))))
      .toSet
  }

  test("fixture exercises NULL head, locf gap, and the on-grid tie") {
    val b = batchOf(obs)
    assert(b.contains(("A", t("10:00"), None, None)), "pre-first NULL row")
    assert(b.contains(("A", t("12:00"), Some(1.0), Some(t("10:15")))), "locf carry")
    assert(b.contains(("A", t("15:00"), Some(3.0), Some(t("15:00")))), "on-grid tie")
    assert(b.contains(("B", t("10:00"), None, None)))
    assert(b.size == 7) // A: 10..15 (6 points), B: 10:00
  }

  test("every stream prefix equals batch over the observations seen so far") {
    assert(runStream(Seq(obs.slice(0, 1))).toSet == batchOf(obs.slice(0, 1)))
    assert(runStream(Seq(obs.slice(0, 1), obs.slice(1, 3))).toSet
      == batchOf(obs.slice(0, 3)))
    assert(runStream(Seq(obs.slice(0, 3), obs.slice(3, 5))).toSet
      == batchOf(obs))
  }

  test("chunking invariance and replayed-chunk idempotence") {
    val all = batchOf(obs)
    assert(runStream(Seq(obs)).toSet == all)
    assert(runStream(obs.map(Seq(_))).toSet == all)
    // replaying an already-seen chunk delivers only stale rows — dropped
    assert(runStream(Seq(obs.slice(0, 3), obs.slice(0, 3), obs.slice(3, 5)))
      .toSet == all)
  }

  test("restart from checkpoint: the locf carry survives a restart") {
    val s = spark
    import s.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-gapfill-restart").toString
    val srcDir = base + "/src"
    val ckpt = base + "/ckpt"
    val schema = obs.toDF().schema
    val got = mutable.ArrayBuffer[Row]()
    def runProcess(chunk: Seq[ObsIn]): Unit = {
      chunk.toDF().coalesce(1).write.mode("append").parquet(srcDir)
      val q = StatefulGapFill.grid(
          s.readStream.schema(schema).parquet(srcDir).as[ObsIn], HourUs, HourUs)
        .writeStream.outputMode(OutputMode.Append())
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.Dataset[GridOut], _: Long) =>
          df.collect().foreach(g =>
            got += ((g.product_id, g.grid_ts, g.price, g.src_time)))
        }.start()
      try q.processAllAvailable() finally q.stop()
    }
    // the 13:40 arrival must locf 11:00-13:00 from the 10:15 observation
    // that only the FIRST process saw
    runProcess(obs.slice(0, 1))
    runProcess(obs.slice(1, 5))
    assert(got.size == got.distinct.size)
    assert(got.toSet == batchOf(obs),
      "grid across a checkpointed restart must equal the batch gap-fill")
  }
}

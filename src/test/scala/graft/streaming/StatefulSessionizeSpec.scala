package graft.streaming

import graft.TestSpark
import graft.ops.Sessionize
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable

/** Streaming incremental sessionization ≡ batch Sessionize. */
class StatefulSessionizeSpec extends AnyFunSuite {
  import TestSpark._
  import StatefulSessionize.EventIn

  private val GapSec = 30L
  private val Sentinel = 9999L

  // 25 users × up to 10 events: intra-session steps of a few seconds,
  // inter-session gaps > 30 s, sub-millisecond micros (h*7 µs) so the fold
  // must use exact micros, and value sums exercising the 1e-4 grid.
  private val rows: Seq[EventIn] = (for {
    u <- 1L to 25L
    i <- 0 until ((u % 5) + 6).toInt
  } yield {
    val h = (u * 37 + i * 11) % 101
    val burst = i / 3                 // every 3rd event jumps past the gap
    val us = (u * 1000 + burst * 300 + (i % 3) * 4) * 1000000L + h * 7
    EventIn(u, tsUs(us), (h % 13) * 0.137 - 0.4)
  }).sortBy(e => (EventTime.micros(e.ts), e.user_id))

  test("emitted streaming sessions equal the batch sessionize output") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext

    val emitted = mutable.ArrayBuffer[(Long, Long, Long, Long, Double)]()
    val ms = MemoryStream[EventIn]
    val q = StatefulSessionize.sessions(
        ms.toDS().withWatermark("ts", "0 seconds").as[EventIn], GapSec)
      .writeStream.outputMode(OutputMode.Append())
      .foreachBatch { (df: org.apache.spark.sql.Dataset[StatefulSessionize.SessionOut], _: Long) =>
        df.collect().foreach { o =>
          emitted += ((o.user_id, EventTime.micros(o.session_start),
            EventTime.micros(o.session_end), o.n_events, o.total_value))
        }
      }.start()
    try {
      Seq(rows.slice(0, 80), rows.slice(80, 160), rows.slice(160, rows.size))
        .foreach { c => ms.addData(c); q.processAllAvailable() }
      // Two far-future sentinel batches: the first advances the watermark
      // past every open session's last+gap, the second triggers the
      // timeout sweep under that watermark (timeouts fire on the batch
      // AFTER the data that moved the watermark).
      ms.addData(Seq(EventIn(Sentinel, tsUs(86400L * 1000000L), 0.0)))
      q.processAllAvailable()
      ms.addData(Seq(EventIn(Sentinel, tsUs(2 * 86400L * 1000000L), 0.0)))
      q.processAllAvailable()
    } finally q.stop()

    val streaming = emitted.filter(_._1 != Sentinel).toSet

    val batch = Sessionize(rows.toDF(), "user_id", "ts", "value", s"$GapSec seconds")
      .select(col("user_id"), unix_micros(col("session_start")),
        unix_micros(col("session_end")), col("n_events"), col("total_value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toSet

    assert(batch.nonEmpty && batch.size > 25, "fixture must produce multiple sessions per user")
    assert(streaming == batch, "streaming sessions must equal batch sessionize bit-for-bit")
  }

  test("restart from checkpoint: open-session state survives a process restart") {
    val s = spark
    import s.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-sess-restart").toString
    val srcDir = base + "/src"
    val ckpt = base + "/ckpt"
    val schema = rows.toDF().schema

    val emitted = mutable.ArrayBuffer[(Long, Long, Long, Long, Double)]()
    // Each call is a fresh "process": new query instance, same checkpoint.
    // The file source resumes from committed offsets; the state store
    // reloads every open session, so sessions spanning the restart close
    // with their pre-restart events included.
    def runProcess(chunk: Seq[EventIn]): Unit = {
      chunk.toDF().coalesce(1).write.mode("append").parquet(srcDir)
      val q = StatefulSessionize.sessions(
          s.readStream.schema(schema).parquet(srcDir)
            .withWatermark("ts", "0 seconds").as[EventIn], GapSec)
        .writeStream.outputMode(OutputMode.Append())
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.Dataset[StatefulSessionize.SessionOut], _: Long) =>
          df.collect().foreach { o =>
            emitted += ((o.user_id, EventTime.micros(o.session_start),
              EventTime.micros(o.session_end), o.n_events, o.total_value))
          }
        }.start()
      try q.processAllAvailable() finally q.stop()
    }

    val (chunk1, chunk2) = rows.splitAt(rows.size / 2)
    runProcess(chunk1)
    runProcess(chunk2 :+ EventIn(Sentinel, tsUs(86400L * 1000000L), 0.0))
    runProcess(Seq(EventIn(Sentinel, tsUs(2 * 86400L * 1000000L), 0.0)))

    val streaming = emitted.filter(_._1 != Sentinel).toSet
    val batch = Sessionize(rows.toDF(), "user_id", "ts", "value", s"$GapSec seconds")
      .select(col("user_id"), unix_micros(col("session_start")),
        unix_micros(col("session_end")), col("n_events"), col("total_value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toSet
    assert(streaming == batch,
      "sessions across a checkpointed restart must equal batch sessionize")
  }

  test("mid-stream gap event closes the session on the data path (no watermark wait)") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext

    val emitted = mutable.ArrayBuffer[(Long, Long, Long)]()
    val ms = MemoryStream[EventIn]
    val q = StatefulSessionize.sessions(
        ms.toDS().withWatermark("ts", "0 seconds").as[EventIn], GapSec)
      .writeStream.outputMode(OutputMode.Append())
      .foreachBatch { (df: org.apache.spark.sql.Dataset[StatefulSessionize.SessionOut], _: Long) =>
        df.collect().foreach(o => emitted += ((o.user_id, o.n_events,
          EventTime.micros(o.session_end) - EventTime.micros(o.session_start))))
      }.start()
    try {
      // Session of 2 events, then a successor 31 s later IN THE SAME batch:
      // the close must come from the data path, before any watermark move.
      ms.addData(Seq(
        EventIn(7L, tsUs(1000000L), 1.0), EventIn(7L, tsUs(3000000L), 2.0),
        EventIn(7L, tsUs(34000000L), 3.0)))
      q.processAllAvailable()
    } finally q.stop()

    assert(emitted.toList == List((7L, 2L, 2000000L + GapSec * 1000000L)))
  }
}

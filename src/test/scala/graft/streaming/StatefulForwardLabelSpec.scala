package graft.streaming

import graft.TestSpark
import graft.ops.AsofJoin
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable

/** Streaming forward labels ≡ batch AsofJoin.forward on every prefix:
  * emitted labels equal the batch query's non-NULL rows over the ticks
  * seen so far (the NULL tail = still-pending probes), across
  * chunkings, replays, same-instant max-price folds, the exact-horizon
  * tie, and a checkpointed restart. */
class StatefulForwardLabelSpec extends AnyFunSuite {
  import TestSpark._
  import StatefulForwardLabel.{LabelOut, TickIn}

  private val HorizonUs = 60000000L // 60 s, the contract query's horizon

  private def tk(key: String, secs: Long, seq: Long, price: Double): TickIn =
    TickIn(key, ts(secs), seq, price)

  // A: a tie exactly at +60 s (1 -> labeled by t=60), a long dead zone
  // (60's probe labeled at 200), an unlabeled tail (200, 205);
  // same-instant duplicate at t=0 (seq 0/1) folding to max as the
  // reference while BOTH rows stay probes; B: everything pending.
  private val ticks0: Seq[TickIn] = Seq(
    tk("A", 0, 0, 10.0), tk("A", 0, 1, 11.0),
    tk("A", 5, 2, 12.0),
    tk("A", 60, 3, 13.0),
    tk("A", 200, 4, 14.0),
    tk("A", 205, 5, 15.0),
    tk("B", 3, 6, 20.0))

  private type Row = (String, java.sql.Timestamp, Long, Double,
    java.sql.Timestamp, Double)

  private def runStream(chunks: Seq[Seq[TickIn]]): Seq[Row] = {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val got = mutable.ArrayBuffer[Row]()
    val ms = MemoryStream[TickIn]
    val q = StatefulForwardLabel.labels(ms.toDS(), HorizonUs)
      .writeStream.outputMode(OutputMode.Append())
      .foreachBatch { (df: org.apache.spark.sql.Dataset[LabelOut], _: Long) =>
        df.collect().foreach(o => got += ((o.product_id, o.event_time,
          o.sequence, o.price, o.fwd_time, o.fwd_price)))
      }.start()
    try chunks.foreach { c => ms.addData(c); q.processAllAvailable() }
    finally q.stop()
    assert(got.size == got.distinct.size, "a label was emitted twice")
    got.toSeq
  }

  /** The batch forward as-of (the forward_labels core): probes look
    * ahead to the first deduped price at or after t + horizon. */
  private def batchFrame(rows: Seq[TickIn]): DataFrame = {
    val s = spark
    import s.implicits._
    val base = rows.toDF("product_id", "event_time", "sequence", "price")
    val probes = base.withColumn("probe_time",
      col("event_time") + expr("INTERVAL 60 SECONDS"))
    val uniq = base.groupBy(col("product_id"), col("event_time"))
      .agg(max(col("price")).as("r_price"))
      .select(col("product_id"), col("event_time").as("r_time"), col("r_price"))
    AsofJoin.forward(probes, uniq, Seq("product_id"), "probe_time", "r_time",
      Seq("r_time" -> "fwd_time", "r_price" -> "fwd_price"))
  }

  private def batchLabeled(rows: Seq[TickIn]): Set[Row] =
    batchFrame(rows).filter(col("fwd_time").isNotNull)
      .select("product_id", "event_time", "sequence", "price",
        "fwd_time", "fwd_price")
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2),
        r.getDouble(3), r.getTimestamp(4), r.getDouble(5)))
      .toSet

  test("fixture exercises tie, dup fold, dead zone, and pending tail") {
    val f = batchFrame(ticks0)
    val labeled = batchLabeled(ticks0)
    // exactly-at-horizon tie: t=0 probes are labeled BY the t=60 tick
    assert(labeled.exists(r => r._3 == 0L && r._5 == ts(60) && r._6 == 13.0))
    // both same-instant duplicates are probes, fold to max as reference:
    // t=5's probe (due 65) is labeled by t=200
    assert(labeled.exists(r => r._3 == 2L && r._5 == ts(200)))
    assert(f.filter(col("fwd_time").isNull).count() == 3) // A tail ×2 + B
  }

  test("every stream prefix equals the batch non-NULL rows; tail stays pending") {
    val c1 = ticks0.slice(0, 3) // nothing labelable yet
    assert(runStream(Seq(c1)).isEmpty && batchLabeled(c1).isEmpty)
    val c2 = ticks0.slice(0, 4)
    assert(runStream(Seq(c1, ticks0.slice(3, 4))).toSet == batchLabeled(c2))
    assert(runStream(Seq(c1, ticks0.slice(3, 4), ticks0.slice(4, 7))).toSet
      == batchLabeled(ticks0))
  }

  test("chunking invariance and replayed-chunk idempotence") {
    val all = batchLabeled(ticks0)
    assert(all.nonEmpty)
    assert(runStream(Seq(ticks0)).toSet == all)
    assert(runStream(ticks0.map(Seq(_))).toSet == all)
    assert(runStream(Seq(ticks0.slice(0, 4), ticks0.slice(0, 4),
      ticks0.slice(4, 7))).toSet == all)
  }

  test("restart from checkpoint: pending probes survive a restart") {
    val s = spark
    import s.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-fwdlabel-restart").toString
    val srcDir = base + "/src"
    val ckpt = base + "/ckpt"
    val schema = ticks0.toDF().schema
    val got = mutable.ArrayBuffer[Row]()
    def runProcess(chunk: Seq[TickIn]): Unit = {
      chunk.toDF().coalesce(1).write.mode("append").parquet(srcDir)
      val q = StatefulForwardLabel.labels(
          s.readStream.schema(schema).parquet(srcDir).as[TickIn], HorizonUs)
        .writeStream.outputMode(OutputMode.Append())
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.Dataset[LabelOut], _: Long) =>
          df.collect().foreach(o => got += ((o.product_id, o.event_time,
            o.sequence, o.price, o.fwd_time, o.fwd_price)))
        }.start()
      try q.processAllAvailable() finally q.stop()
    }
    // the t=200 arrival must label probes only the FIRST process saw
    runProcess(ticks0.slice(0, 4))
    runProcess(ticks0.slice(4, 7))
    assert(got.size == got.distinct.size)
    assert(got.toSet == batchLabeled(ticks0),
      "labels across a checkpointed restart must equal the batch join")
  }
}

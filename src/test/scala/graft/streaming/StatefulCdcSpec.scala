package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable

/** Live CDC MERGE-apply ≡ batch cdc_upsert on every prefix: the latest
  * changelog emission per key with alive = true equals the batch
  * snapshot row over the changes seen so far, and keys whose latest
  * emission is a tombstone are exactly the keys batch omits — across
  * delete→re-insert (resurrection), delete-as-last-change, chunkings,
  * replays, and a checkpointed restart. */
class StatefulCdcSpec extends AnyFunSuite {
  import TestSpark._
  import StatefulCdc.{ChangeIn, RowOut}

  private def t(mmss: String): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(s"2024-03-01 10:$mmss")

  // key 1: upsert → delete → upsert (one resurrection), alive
  // key 2: upsert → delete (tombstoned — absent from batch)
  // key 3: single upsert, alive
  // key 4: delete as the FIRST change, then upsert (resurrection from
  //        a never-seen row), alive
  private val log: Seq[ChangeIn] = Seq(
    ChangeIn(1L, t("00:01"), 1L, "view", 10.0, "a"),
    ChangeIn(2L, t("00:02"), 2L, "click", 20.0, "b"),
    ChangeIn(1L, t("00:03"), 3L, "error", 0.0, "x"),
    ChangeIn(3L, t("00:04"), 4L, "purchase", 30.0, "c"),
    ChangeIn(1L, t("00:05"), 5L, "view", 11.0, "a2"),
    ChangeIn(2L, t("00:06"), 6L, "error", 0.0, "x"),
    ChangeIn(4L, t("00:07"), 7L, "error", 0.0, "x"),
    ChangeIn(4L, t("00:08"), 8L, "view", 40.0, "d"))

  private type Row = (Long, Double, String, java.sql.Timestamp, Long, Long, Long)

  private def runStream(chunks: Seq[Seq[ChangeIn]])
      : (Map[Long, RowOut], Seq[RowOut]) = {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val got = mutable.ArrayBuffer[RowOut]()
    val ms = MemoryStream[ChangeIn]
    val q = StatefulCdc(ms.toDS())
      .writeStream.outputMode(OutputMode.Append())
      .foreachBatch { (df: org.apache.spark.sql.Dataset[RowOut], _: Long) =>
        df.collect().foreach(got += _)
      }.start()
    try chunks.foreach { c => ms.addData(c); q.processAllAvailable() }
    finally q.stop()
    (got.groupBy(_.user_id).map { case (k, rs) => k -> rs.last }, got.toSeq)
  }

  /** The batch cdc_upsert aggregation (AnalyticsQueries.cdcUpsert's
    * algebra) over the changes seen so far. */
  private def batchOf(rows: Seq[ChangeIn]): Map[Long, Row] = {
    val s = spark
    import s.implicits._
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val ord = struct(col("ts"), col("event_id"))
    rows.toDF()
      .withColumn("is_del", (col("event_type") === "error").cast("long"))
      .withColumn("prev_del", lag(col("is_del"), 1).over(w))
      .withColumn("resur",
        when(col("prev_del") === 1L && col("is_del") === 0L, 1L).otherwise(0L))
      .groupBy(col("user_id"))
      .agg(max_by(col("is_del"), ord).as("last_del"),
        max_by(col("value"), ord).as("value"),
        max_by(col("props"), ord).as("props"),
        max(col("ts")).as("updated_at"),
        count(lit(1)).as("n_changes"),
        sum(col("is_del")).as("n_deletes"),
        sum(col("resur")).as("n_resurrections"))
      .filter(col("last_del") === 0L)
      .collect()
      .map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Long]("user_id"), r.getAs[Double]("value"),
          r.getAs[String]("props"), r.getAs[java.sql.Timestamp]("updated_at"),
          r.getAs[Long]("n_changes"), r.getAs[Long]("n_deletes"),
          r.getAs[Long]("n_resurrections"))))
      .toMap
  }

  private def aliveOf(latest: Map[Long, RowOut]): Map[Long, Row] =
    latest.collect { case (k, r) if r.alive =>
      k -> ((r.user_id, r.value, r.props, r.updated_at, r.n_changes,
        r.n_deletes, r.n_resurrections)) }

  test("fixture pins resurrection, tombstone-last, and delete-first cases") {
    val b = batchOf(log)
    assert(b(1L) == ((1L, 11.0, "a2", t("00:05"), 3L, 1L, 1L)))
    assert(!b.contains(2L), "tombstoned key must be absent from batch")
    assert(b(3L) == ((3L, 30.0, "c", t("00:04"), 1L, 0L, 0L)))
    assert(b(4L) == ((4L, 40.0, "d", t("00:08"), 2L, 1L, 1L)))
  }

  test("latest alive emissions equal batch on every prefix; dead keys match omissions") {
    for (cut <- Seq(3, 6, 8)) {
      val (latest, _) = runStream(Seq(log.take(cut)))
      val b = batchOf(log.take(cut))
      assert(aliveOf(latest) == b, s"prefix $cut")
      val dead = latest.collect { case (k, r) if !r.alive => k }.toSet
      assert(dead == (latest.keySet -- b.keySet), s"prefix $cut tombstones")
    }
  }

  test("chunking invariance and replayed-chunk idempotence") {
    val b = batchOf(log)
    assert(aliveOf(runStream(Seq(log))._1) == b)
    assert(aliveOf(runStream(log.map(Seq(_)))._1) == b)
    assert(aliveOf(runStream(Seq(log.take(5), log.take(5), log.drop(5)))._1) == b)
  }

  test("restart from checkpoint: counters and tombstones survive") {
    val s = spark
    import s.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-cdc-restart").toString
    val srcDir = base + "/src"
    val ckpt = base + "/ckpt"
    val schema = log.toDF().schema
    val got = mutable.ArrayBuffer[RowOut]()
    def runProcess(chunk: Seq[ChangeIn]): Unit = {
      chunk.toDF().coalesce(1).write.mode("append").parquet(srcDir)
      val q = StatefulCdc(
          s.readStream.schema(schema).parquet(srcDir).as[ChangeIn])
        .writeStream.outputMode(OutputMode.Append())
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.Dataset[RowOut], _: Long) =>
          df.collect().foreach(got += _)
        }.start()
      try q.processAllAvailable() finally q.stop()
    }
    // key 1's resurrection spans the restart: the tombstone lands in
    // process 1, the reviving upsert in process 2
    runProcess(log.take(4))
    runProcess(log.drop(4))
    val latest = got.groupBy(_.user_id).map { case (k, rs) => k -> rs.last }
    assert(aliveOf(latest) == batchOf(log),
      "CDC state across a checkpointed restart must equal the batch apply")
  }
}

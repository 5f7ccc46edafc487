package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable

/** Live exact percentiles ≡ batch order-statistic picks on every
  * prefix: the LATEST emission per key equals rank ceil(p·n) over the
  * ascending multiset of values seen so far (the global_quantiles /
  * rel_quantiles convention) — across chunkings, duplicate values,
  * replays, and a checkpointed restart. */
class StatefulQuantileSpec extends AnyFunSuite {
  import TestSpark._
  import StatefulQuantile.{ObsIn, QOut}

  private def t(mmss: String): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(s"2024-03-01 10:$mmss")

  // A: duplicated values (the histogram path), a p99 tail outlier late
  // in the stream; B: two values only (p50 = lower pick at n=2).
  private val obs: Seq[ObsIn] = Seq(
    ObsIn("A", t("00:01"), 1L, 5.0),
    ObsIn("A", t("00:02"), 2L, 3.0),
    ObsIn("A", t("00:03"), 3L, 5.0),
    ObsIn("A", t("00:04"), 4L, 1.0),
    ObsIn("A", t("00:05"), 5L, 4.0),
    ObsIn("A", t("00:06"), 6L, 100.0),
    ObsIn("A", t("00:07"), 7L, 2.0),
    ObsIn("B", t("00:01"), 1L, 7.0),
    ObsIn("B", t("00:02"), 2L, 9.0))

  private type Row = (String, Long, Double, Double, Double)

  private def runStream(chunks: Seq[Seq[ObsIn]]): Map[String, Row] = {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val got = mutable.ArrayBuffer[Row]()
    val ms = MemoryStream[ObsIn]
    val q = StatefulQuantile.quantiles(ms.toDS())
      .writeStream.outputMode(OutputMode.Append())
      .foreachBatch { (df: org.apache.spark.sql.Dataset[QOut], _: Long) =>
        df.collect().foreach(o => got += ((o.product_id, o.n, o.p50, o.p95, o.p99)))
      }.start()
    try chunks.foreach { c => ms.addData(c); q.processAllAvailable() }
    finally q.stop()
    // changelog semantics: the LAST emission per key is the current truth
    got.groupBy(_._1).map { case (k, rs) => k -> rs.last }
  }

  /** The batch order-statistic pick over all values seen. */
  private def batchOf(rows: Seq[ObsIn]): Map[String, Row] =
    rows.groupBy(_.product_id).map { case (k, rs) =>
      val sorted = rs.map(_.price).sorted
      val n = sorted.length.toLong
      def pick(p: Int): Double = sorted(((n * p + 99L) / 100L).toInt - 1)
      k -> ((k, n, pick(50), pick(95), pick(99)))
    }

  test("fixture pins the duplicate-value histogram and the tail outlier") {
    val b = batchOf(obs)
    assert(b("A") == (("A", 7L, 4.0, 100.0, 100.0)))
    assert(b("B") == (("B", 2L, 7.0, 9.0, 9.0))) // lower pick at n=2
  }

  test("latest emission equals the batch pick on every prefix") {
    assert(runStream(Seq(obs.take(4))) == batchOf(obs.take(4)))
    assert(runStream(Seq(obs.take(4), obs.slice(4, 7))) == batchOf(obs.take(7)))
    assert(runStream(Seq(obs.take(7), obs.drop(7))) == batchOf(obs))
  }

  test("chunking invariance and replayed-chunk idempotence") {
    val all = batchOf(obs)
    assert(runStream(Seq(obs)) == all)
    assert(runStream(obs.map(Seq(_))) == all)
    // a replayed chunk must not double-count histogram entries
    assert(runStream(Seq(obs.take(7), obs.take(7), obs.drop(7))) == all)
  }

  test("restart from checkpoint: the histogram survives") {
    val s = spark
    import s.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-quant-restart").toString
    val srcDir = base + "/src"
    val ckpt = base + "/ckpt"
    val schema = obs.toDF().schema
    val got = mutable.ArrayBuffer[Row]()
    def runProcess(chunk: Seq[ObsIn]): Unit = {
      chunk.toDF().coalesce(1).write.mode("append").parquet(srcDir)
      val q = StatefulQuantile.quantiles(
          s.readStream.schema(schema).parquet(srcDir).as[ObsIn])
        .writeStream.outputMode(OutputMode.Append())
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.Dataset[QOut], _: Long) =>
          df.collect().foreach(o =>
            got += ((o.product_id, o.n, o.p50, o.p95, o.p99)))
        }.start()
      try q.processAllAvailable() finally q.stop()
    }
    // the p95/p99 after the restart depend on counts only process 1 saw
    runProcess(obs.take(5))
    runProcess(obs.drop(5))
    val last = got.groupBy(_._1).map { case (k, rs) => k -> rs.last }
    assert(last == batchOf(obs),
      "percentiles across a checkpointed restart must equal the batch pick")
  }
}

package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable

/** StatefulScaler ≡ the batch per-dimension moment computation after
  * every exactly-once prefix, under any chunking, and across a
  * checkpoint restart. Equality is on BITS: both sides accumulate the
  * same 1e-6 grid longs and finish with StatefulScaler.finish's fixed
  * IEEE sequence. */
class StatefulScalerSpec extends AnyFunSuite {
  import TestSpark._
  import StatefulScaler.{DimOut, VecIn}

  private val Dim = 6
  private val rows: Seq[VecIn] = (0 until 120).map { i =>
    VecIn(i.toLong, IndexedSeq.tabulate(Dim)(j =>
      (((i * 2654435761L + j * 40503L) % 1001) - 500).toFloat / 1000f))
  }

  /** Batch twin: exact grid moments per dimension, same finish. */
  private def batchMoments(rs: Seq[VecIn]): Map[Long, (Long, Double, Double)] =
    (0 until Dim).map { j =>
      val ks = rs.map(v => StatefulScaler.kl6(v.embedding(j)))
      val n = ks.length.toLong
      val sk = ks.sum
      val sk2 = ks.map(k => BigInt(k) * BigInt(k)).sum
      val (mean, sd) = StatefulScaler.finish(n, sk, sk2)
      j.toLong -> (n, mean, sd)
    }.toMap

  private def bitsEqual(a: Map[Long, (Long, Double, Double)],
                        b: Map[Long, (Long, Double, Double)]): Boolean =
    a.keySet == b.keySet && a.forall { case (p, (n, m, s)) =>
      val (bn, bm, bs) = b(p)
      n == bn &&
        java.lang.Double.doubleToLongBits(m) == java.lang.Double.doubleToLongBits(bm) &&
        java.lang.Double.doubleToLongBits(s) == java.lang.Double.doubleToLongBits(bs)
    }

  private def runStream(chunks: Seq[Seq[VecIn]]): Map[Long, (Long, Double, Double)] = {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val latest = mutable.LinkedHashMap[Long, (Long, Double, Double)]()
    val ms = MemoryStream[VecIn]
    val q = StatefulScaler.refresh(ms.toDS())
      .writeStream.outputMode(OutputMode.Append())
      .foreachBatch { (df: org.apache.spark.sql.Dataset[DimOut], _: Long) =>
        latest.synchronized {
          df.collect().foreach(o => latest(o.pos) = (o.n_obs, o.mean, o.sd_pop))
        }; ()
      }.start()
    try chunks.foreach { c => ms.addData(c); q.processAllAvailable() }
    finally q.stop()
    latest.toMap
  }

  test("latest scaler per dimension equals batch, any chunking") {
    val want = batchMoments(rows)
    assert(bitsEqual(runStream(Seq(rows)), want))
    assert(bitsEqual(runStream(Seq(rows.take(7), rows.slice(7, 8),
      rows.drop(8))), want))
  }

  test("every prefix matches batch over the vectors seen so far") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val latest = mutable.LinkedHashMap[Long, (Long, Double, Double)]()
    val ms = MemoryStream[VecIn]
    val q = StatefulScaler.refresh(ms.toDS())
      .writeStream.outputMode(OutputMode.Append())
      .foreachBatch { (df: org.apache.spark.sql.Dataset[DimOut], _: Long) =>
        latest.synchronized {
          df.collect().foreach(o => latest(o.pos) = (o.n_obs, o.mean, o.sd_pop))
        }; ()
      }.start()
    val cuts = Seq(30, 77, 120)
    try cuts.foldLeft(0) { (from, to) =>
      ms.addData(rows.slice(from, to)); q.processAllAvailable()
      assert(bitsEqual(latest.toMap, batchMoments(rows.take(to))),
        s"prefix $to diverged from batch")
      to
    } finally q.stop()
  }

  test("restart from checkpoint resumes the exact sums") {
    val s = spark
    import s.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-scaler").toString
    val ckpt = base + "/ckpt"
    val srcDir = base + "/src"
    val latest = mutable.LinkedHashMap[Long, (Long, Double, Double)]()
    val schema = rows.toDF().schema

    def runChunk(chunk: Seq[VecIn]): Unit = {
      chunk.toDF().coalesce(1).write.mode("append").parquet(srcDir)
      val in = s.readStream.schema(schema).parquet(srcDir).as[VecIn]
      val q = StatefulScaler.refresh(in).writeStream
        .outputMode(OutputMode.Append())
        .foreachBatch { (df: org.apache.spark.sql.Dataset[DimOut], _: Long) =>
          latest.synchronized {
            df.collect().foreach(o => latest(o.pos) = (o.n_obs, o.mean, o.sd_pop))
          }; ()
        }
        .option("checkpointLocation", ckpt).start()
      try q.processAllAvailable() finally q.stop()
    }

    runChunk(rows.take(53))
    runChunk(rows.drop(53))
    assert(bitsEqual(latest.toMap, batchMoments(rows)))
  }
}

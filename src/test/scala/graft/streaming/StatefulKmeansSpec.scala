package graft.streaming

import graft.TestSpark
import graft.ops.{Det, Similarity}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable

/** StatefulKmeans ≡ the batch Lloyd-step centroid recomputation (the
  * `cent` aggregate of Similarity.kmeansRefine) under the same frozen
  * codebook, after every exactly-once prefix, under any chunking, and
  * across a checkpoint restart. Equality is on BITS: the streaming
  * state sums the same 1e-12 grid longs Det.avgD(·, 12) sums, finished
  * with the same `(double)Σk / 1e12 / n` sequence. */
class StatefulKmeansSpec extends AnyFunSuite {
  import TestSpark._
  import StatefulKmeans.{CentOut, VecIn}

  private val Dim = 4
  private val codebook: Array[(Int, Array[Double])] = Array(
    (0, Array(0.0, 0.0, 0.0, 0.0)),
    (1, Array(1.0, 1.0, 0.0, 0.0)),
    (2, Array(0.0, 0.0, 1.0, 1.0)))

  // deterministic scatter around the three centers, plus points near
  // cell boundaries so tie/argmin behavior is exercised
  private val rows: Seq[VecIn] = (0 until 150).map { i =>
    val c = codebook(i % 3)._2
    val e = Array.tabulate(Dim)(j =>
      (c(j) + ((i * 7919 + j * 131) % 41 - 20) / 100.0).toFloat)
    VecIn(i.toLong, e.toIndexedSeq)
  }

  /** Batch twin: same compiled assignment, then the kmeansRefine cent
    * aggregate (Det.avgD grid means) + member counts. */
  private def batchCentroids(rs: Seq[VecIn]): Map[Int, (Long, Seq[Double])] = {
    val s = spark
    import s.implicits._
    val cb = codebook
    val cells: DataFrame = rs.toDS()
      .flatMap { v =>
        val cid = Similarity.argminCell(cb, v.embedding.toArray)._1
        v.embedding.iterator.zipWithIndex.map { case (x, p) =>
          (cid, (p + 1).toLong, x.toDouble)
        }
      }
      .toDF("cid", "pos", "val")
    val cent = cells.groupBy(col("cid"), col("pos"))
      .agg(Det.avgD(col("val"), 12).as("c"), count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getAs[Int]("cid"), r.getAs[Long]("pos"),
        r.getAs[Double]("c"), r.getAs[Long]("n")))
    cent.groupBy(_._1).map { case (cid, xs) =>
      cid -> (xs.head._4, xs.sortBy(_._2).map(_._3).toSeq)
    }
  }

  private def runStream(chunks: Seq[Seq[VecIn]]): Map[Int, (Long, Seq[Double])] = {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val latest = mutable.LinkedHashMap[Int, (Long, Seq[Double])]()
    val ms = MemoryStream[VecIn]
    val q = StatefulKmeans.refresh(ms.toDS(), codebook)
      .writeStream.outputMode(OutputMode.Append())
      .foreachBatch { (df: org.apache.spark.sql.Dataset[CentOut], _: Long) =>
        df.collect().foreach(o => latest(o.cluster) = (o.n_members, o.centroid))
      }.start()
    try chunks.foreach { c => ms.addData(c); q.processAllAvailable() }
    finally q.stop()
    latest.toMap
  }

  private def bitsEqual(a: Map[Int, (Long, Seq[Double])],
                        b: Map[Int, (Long, Seq[Double])]): Boolean =
    a.keySet == b.keySet && a.forall { case (cid, (n, cs)) =>
      val (bn, bcs) = b(cid)
      n == bn && cs.size == bcs.size &&
        cs.zip(bcs).forall { case (x, y) =>
          java.lang.Double.doubleToLongBits(x) ==
            java.lang.Double.doubleToLongBits(y)
        }
    }

  test("latest centroid per cell equals the batch Lloyd step, any chunking") {
    val want = batchCentroids(rows)
    assert(want.size == 3, "fixture must populate all three cells")
    val one = runStream(Seq(rows))
    val three = runStream(Seq(rows.slice(0, 40), rows.slice(40, 41),
      rows.slice(41, 150)))
    assert(bitsEqual(one, want))
    assert(bitsEqual(three, want))
  }

  test("every prefix matches batch over the rows seen so far") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val snaps = mutable.ArrayBuffer[Map[Int, (Long, Seq[Double])]]()
    val latest = mutable.LinkedHashMap[Int, (Long, Seq[Double])]()
    val ms = MemoryStream[VecIn]
    val q = StatefulKmeans.refresh(ms.toDS(), codebook)
      .writeStream.outputMode(OutputMode.Append())
      .foreachBatch { (df: org.apache.spark.sql.Dataset[CentOut], _: Long) =>
        df.collect().foreach(o => latest(o.cluster) = (o.n_members, o.centroid))
      }.start()
    val cuts = Seq(30, 75, 150)
    try cuts.foldLeft(0) { (from, to) =>
      ms.addData(rows.slice(from, to)); q.processAllAvailable()
      snaps += latest.toMap; to
    } finally q.stop()
    cuts.zip(snaps).foreach { case (to, got) =>
      assert(bitsEqual(got, batchCentroids(rows.take(to))),
        s"prefix $to diverged from batch")
    }
  }

  test("restart from checkpoint resumes the grid sums") {
    val s = spark
    import s.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-skm").toString
    val ckpt = base + "/ckpt"
    val srcDir = base + "/src"
    val latest = mutable.LinkedHashMap[Int, (Long, Seq[Double])]()
    val schema = rows.toDF().schema

    def runChunk(chunk: Seq[VecIn]): Unit = {
      chunk.toDF().coalesce(1).write.mode("append").parquet(srcDir)
      val in = s.readStream.schema(schema).parquet(srcDir).as[VecIn]
      val q = StatefulKmeans.refresh(in, codebook).writeStream
        .outputMode(OutputMode.Append())
        .foreachBatch { (df: org.apache.spark.sql.Dataset[CentOut], _: Long) =>
          latest.synchronized {
            df.collect().foreach(o => latest(o.cluster) = (o.n_members, o.centroid))
          }; ()
        }
        .option("checkpointLocation", ckpt).start()
      try q.processAllAvailable() finally q.stop()
    }

    runChunk(rows.take(67))
    runChunk(rows.drop(67))
    assert(bitsEqual(latest.toMap, batchCentroids(rows)))
  }
}

package graft.streaming

import graft.TestSpark
import graft.ops.Approx
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable

/** Streaming KMV ≡ batch Approx.kmvDistinct on the sketch columns, under
  * chunking, duplicates, and replays; state stays bounded at k. */
class StatefulKmvSpec extends AnyFunSuite {
  import TestSpark._
  import StatefulKmv.{KvIn, KmvOut}

  private val K = 8
  private val rows: Seq[KvIn] =
    (0 until 120).map(i => KvIn(s"g${i % 3}", s"val${i % 40}")) ++ // dups galore
      (0 until 5).map(i => KvIn("tiny", s"t$i")) // below-k group

  private def runStream(chunks: Seq[Seq[KvIn]]): Map[String, KmvOut] = {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val latest = mutable.LinkedHashMap[String, KmvOut]()
    val ms = MemoryStream[KvIn]
    val q = StatefulKmv.sketch(ms.toDS(), K)
      .writeStream.outputMode(OutputMode.Append())
      .foreachBatch { (df: org.apache.spark.sql.Dataset[KmvOut], _: Long) =>
        df.collect().foreach(o => latest(o.key) = o)
      }.start()
    try chunks.foreach { c => ms.addData(c); q.processAllAvailable() }
    finally q.stop()
    latest.toMap
  }

  private def batchOf(rs: Seq[KvIn]): Map[String, (Long, Option[Long], Double)] = {
    val s = spark
    import s.implicits._
    Approx.kmvDistinct(rs.toDF("key", "value"), col("key"), col("value"), K)
      .collect().map { r =>
        r.getAs[String]("key") -> ((r.getAs[Long]("n_exact"),
          Option(r.get(r.fieldIndex("kth_hv"))).map(_.asInstanceOf[Long]),
          r.getAs[Double]("estimate")))
      }.toMap
  }

  test("hv48 matches the batch conv(substring(md5)) parse") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.{conv, md5, substring}
    val vs = rows.map(_.value).distinct
    val batch = vs.toDF("v")
      .select(conv(substring(md5(col("v")), 1, 12), 16, 10).cast("long"))
      .collect().map(_.getLong(0))
    assert(batch.sameElements(vs.map(StatefulKmv.hv48)))
  }

  test("streaming sketch equals batch on sketch columns, exact below k") {
    val got = runStream(Seq(rows.slice(0, 50), rows.slice(50, 100),
      rows.slice(20, 60) ++ rows.slice(100, 125))) // replay + finish
    val want = batchOf(rows)
    assert(got.keySet == want.keySet)
    got.foreach { case (key, o) =>
      val (nExact, kth, est) = want(key)
      assert(o.kth_hv == kth, key)
      assert(o.estimate == est, key)
      if (o.n_sketch < K) assert(o.n_sketch == nExact, key) // sketch IS exact
      else assert(o.n_sketch == K.toLong, key) // bounded state
    }
    assert(got("tiny").n_sketch == 5L && got("tiny").estimate == 5.0)
  }

  test("every prefix equals batch over rows seen so far") {
    val c1 = rows.slice(0, 33); val c2 = rows.slice(33, 80)
    for ((chunks, seen) <- Seq(Seq(c1) -> c1, Seq(c1, c2) -> (c1 ++ c2))) {
      val got = runStream(chunks)
      val want = batchOf(seen)
      got.foreach { case (key, o) =>
        assert(o.kth_hv == want(key)._2 && o.estimate == want(key)._3, key)
      }
    }
  }
}

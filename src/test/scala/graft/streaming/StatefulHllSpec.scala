package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable

/** Streaming HLL registers ≡ batch after every prefix under any chunking
  * AND any duplication (max is replay-idempotent — the at-least-once
  * contrast to StatefulCountMin); the derived estimate matches the batch
  * hllDistinct column formula bit for bit. */
class StatefulHllSpec extends AnyFunSuite {
  import TestSpark._
  import StatefulHll.{HllIn, RegOut}

  private val M = 32
  private val rows: Seq[HllIn] =
    (0 until 400).map(i => HllIn(if (i % 3 == 0) "a" else "b", s"v${i % 250}")) ++
      (0 until 60).map(i => HllIn("a", s"w$i"))

  private def runStream(chunks: Seq[Seq[HllIn]]): Map[(String, Int), Long] = {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val latest = mutable.LinkedHashMap[(String, Int), Long]()
    val ms = MemoryStream[HllIn]
    val q = StatefulHll.cells(ms.toDS(), M)
      .writeStream.outputMode(OutputMode.Append())
      .foreachBatch { (df: org.apache.spark.sql.Dataset[RegOut], _: Long) =>
        df.collect().foreach(o => latest((o.key, o.bucket)) = o.gmax)
      }.start()
    try chunks.foreach { c => ms.addData(c); q.processAllAvailable() }
    finally q.stop()
    latest.toMap
  }

  private def batchRegs(rs: Seq[HllIn]): Map[(String, Int), Long] =
    rs.map(r => (r.key, StatefulHll.reg(r.value, M)))
      .groupBy(r => (r._1, r._2._1))
      .map { case ((k, b), g) => (k, b) -> g.map(_._2._2).max }

  test("compiled reg matches the batch bucket/payload columns") {
    val s = spark
    import s.implicits._
    val vs = rows.map(_.value).distinct
    val batch = vs.toDF("v").selectExpr(
      "conv(substring(md5(v), 1, 12), 16, 10) AS hvs", "v")
      .selectExpr(s"cast(hvs as long) % $M AS bucket",
        s"((cast(hvs as long) div $M) + ${1L << 42}L) AS x", "v")
      .selectExpr("bucket", "x & -x AS g", "v")
      .collect().map(r => r.getAs[String]("v") ->
        ((r.getAs[Long]("bucket").toInt, r.getAs[Long]("g")))).toMap
    vs.foreach(v => assert(StatefulHll.reg(v, M) == batch(v), v))
  }

  test("latest cells equal batch registers; duplication cannot move a bit") {
    val withDups = rows ++ rows.take(200) ++ rows.slice(100, 300)
    val got = runStream(Seq(withDups.take(300), withDups.drop(300)))
    assert(got == batchRegs(rows)) // dups collapse to the duplicate-free regs
    assert(got.count(_._1._1 == "a") <= M && got.count(_._1._1 == "b") <= M)
  }

  test("every prefix equals batch over rows seen, any chunking") {
    val c1 = rows.take(123); val c2 = rows.slice(123, 460)
    for ((chunks, seen) <- Seq(
        Seq(c1) -> c1,
        Seq(c1, c2) -> (c1 ++ c2),
        Seq(rows.take(1), rows.slice(1, 460)) -> rows)) {
      assert(runStream(chunks) == batchRegs(seen))
    }
  }

  test("estimate from cells matches the batch hllDistinct column") {
    val s = spark
    import s.implicits._
    val batch = graft.ops.Approx.hllDistinct(
      rows.toDF("key", "value"), col("key"), col("value"), M)
      .collect().map(r => r.getAs[String]("key") -> r.getAs[Double]("estimate"))
      .toMap
    val derived = StatefulHll.estimateFromCells(batchRegs(rows), M)
    assert(derived == batch)
  }
}

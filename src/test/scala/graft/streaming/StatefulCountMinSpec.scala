package graft.streaming

import graft.TestSpark
import graft.ops.Approx
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable

/** Streaming Count-Min cells ≡ batch Approx.countMinCells after every
  * exactly-once prefix, under any chunking; state stays ≤ width·depth
  * cells; the compiled cell hash matches the batch column expression. */
class StatefulCountMinSpec extends AnyFunSuite {
  import TestSpark._
  import StatefulCountMin.{CellOut, CmIn}

  private val Width = 32
  private val Depth = 3
  // zipf-ish word soup: heavy hitters + a long tail, forcing collisions
  // at width 32 so estimates genuinely overestimate
  private val rows: Seq[CmIn] =
    (0 until 300).map(i => CmIn(s"w${i % (1 + i % 17)}")) ++
      (0 until 40).map(i => CmIn(s"tail$i"))

  private def runStream(chunks: Seq[Seq[CmIn]]): Map[(Int, Long), Long] = {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val latest = mutable.LinkedHashMap[(Int, Long), Long]()
    val ms = MemoryStream[CmIn]
    val q = StatefulCountMin.cells(ms.toDS(), Width, Depth)
      .writeStream.outputMode(OutputMode.Append())
      .foreachBatch { (df: org.apache.spark.sql.Dataset[CellOut], _: Long) =>
        df.collect().foreach(o => latest((o.h, o.pos)) = o.c)
      }.start()
    try chunks.foreach { c => ms.addData(c); q.processAllAvailable() }
    finally q.stop()
    latest.toMap
  }

  private def batchOf(rs: Seq[CmIn]): Map[(Int, Long), Long] = {
    val s = spark
    import s.implicits._
    Approx.countMinCells(rs.toDF("v"), col("v"), Width, Depth)
      .collect()
      .map(r => (r.getAs[Int]("h"), r.getAs[Long]("pos")) -> r.getAs[Long]("c"))
      .toMap
  }

  test("compiled cell hash matches the batch position expression") {
    val s = spark
    import s.implicits._
    val vs = rows.map(_.v).distinct
    val batch = Approx.countMinCells(vs.toDF("v"), col("v"), Width, 1)
    // depth=1, distinct values: the batch cell table is the multiset of
    // per-value positions; rebuild it from the compiled hash
    val wantPos = vs.groupBy(v => StatefulCountMin.cellOf(0, v, Width))
      .view.mapValues(_.size.toLong).toMap
    val gotPos = batch.collect()
      .map(r => r.getAs[Long]("pos") -> r.getAs[Long]("c")).toMap
    assert(gotPos == wantPos)
  }

  test("latest cells equal batch after the full stream, state bounded") {
    val got = runStream(Seq(rows.slice(0, 100), rows.slice(100, 250),
      rows.slice(250, 340)))
    val want = batchOf(rows)
    assert(got == want)
    assert(got.size <= Width * Depth)
  }

  test("every prefix equals batch over rows seen so far, any chunking") {
    val c1 = rows.slice(0, 77); val c2 = rows.slice(77, 203)
    for ((chunks, seen) <- Seq(
        Seq(c1) -> c1,
        Seq(c1, c2) -> (c1 ++ c2),
        Seq(rows.slice(0, 1), rows.slice(1, 203)) -> rows.slice(0, 203))) {
      assert(runStream(chunks) == batchOf(seen))
    }
  }
}

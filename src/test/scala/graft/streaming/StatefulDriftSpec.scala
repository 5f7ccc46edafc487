package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable

/** Streaming drift cells ≡ batch per-(source,value) counts after every
  * exactly-once prefix under any chunking, and the KS statistic derived
  * from cells matches the batch all-integer formula. */
class StatefulDriftSpec extends AnyFunSuite {
  import TestSpark._
  import StatefulDrift.{DriftCell, DriftIn}

  // three sources with deliberately different length distributions
  // (sc2 shifted, sc3 bimodal) so every pair has a nonzero D
  private val rows: Seq[DriftIn] =
    (0 until 120).map(i => DriftIn("sc1", 50 + (i % 10))) ++
      (0 until 100).map(i => DriftIn("sc2", 54 + (i % 10))) ++
      (0 until 80).map(i => DriftIn("sc3", if (i % 2 == 0) 50 else 62))

  private def runStream(chunks: Seq[Seq[DriftIn]]): Map[(String, Long), Long] = {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val latest = mutable.LinkedHashMap[(String, Long), Long]()
    val ms = MemoryStream[DriftIn]
    val q = StatefulDrift.cells(ms.toDS())
      .writeStream.outputMode(OutputMode.Append())
      .foreachBatch { (df: org.apache.spark.sql.Dataset[DriftCell], _: Long) =>
        df.collect().foreach(o => latest((o.source, o.v)) = o.c)
      }.start()
    try chunks.foreach { c => ms.addData(c); q.processAllAvailable() }
    finally q.stop()
    latest.toMap
  }

  private def batchOf(rs: Seq[DriftIn]): Map[(String, Long), Long] = {
    val s = spark
    import s.implicits._
    rs.toDF("source", "v").groupBy("source", "v").count()
      .collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("v")) -> r.getAs[Long]("count"))
      .toMap
  }

  test("latest cells equal batch counts after the full stream") {
    val got = runStream(Seq(rows.slice(0, 90), rows.slice(90, 220),
      rows.slice(220, 300)))
    assert(got == batchOf(rows))
    // state bounded by |sources| x |distinct values|, not row count
    assert(got.size == rows.map(r => (r.source, r.v)).distinct.size)
  }

  test("every prefix equals batch over rows seen so far, any chunking") {
    val c1 = rows.slice(0, 57); val c2 = rows.slice(57, 181)
    for ((chunks, seen) <- Seq(
        Seq(c1) -> c1,
        Seq(c1, c2) -> (c1 ++ c2),
        Seq(rows.slice(0, 1), rows.slice(1, 181)) -> rows.slice(0, 181))) {
      assert(runStream(chunks) == batchOf(seen))
    }
  }

  test("KS derived from cells matches a brute-force ECDF comparison") {
    val cells = batchOf(rows)
    val ks = StatefulDrift.ksFromCells(cells)
    assert(ks.keySet == Set(("sc1", "sc2"), ("sc1", "sc3"), ("sc2", "sc3")))
    for (((a, b), (num, na, nb)) <- ks) {
      val va = rows.filter(_.source == a).map(_.v)
      val vb = rows.filter(_.source == b).map(_.v)
      val allVals = (va ++ vb).distinct.sorted
      val want = allVals.map { t =>
        math.abs(va.count(_ <= t).toLong * vb.size - vb.count(_ <= t).toLong * va.size)
      }.max
      assert(num == want, s"pair ($a,$b)")
      assert(na == va.size && nb == vb.size)
      assert(num > 0) // distributions differ by construction
    }
  }
}

package graft.streaming

import graft.TestSpark
import graft.ops.Dedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable

/** Streaming exact dedup ≡ batch Dedup.exact, under out-of-order ids,
  * cross-batch duplicate groups, and replayed chunks. */
class StatefulDedupSpec extends AnyFunSuite {
  import TestSpark._
  import StatefulDedup.{DocIn, DedupOut}

  // 40 docs over 12 distinct texts; duplicate groups span chunks and the
  // smallest doc_id of several groups arrives LAST (forces re-canonicalization)
  private val docs: Seq[DocIn] = {
    val texts = (0 until 12).map(t => s"text body number ${t % 12} with shared tail")
    (0 until 40).map { i => DocIn(40L - i, texts(i % 12)) } // descending ids
  }

  private def runStream(chunks: Seq[Seq[DocIn]]): Map[Long, (String, Long, Long, Boolean)] = {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val latest = mutable.LinkedHashMap[Long, (String, Long, Long, Boolean)]()
    val ms = MemoryStream[DocIn]
    val q = StatefulDedup.dedup(ms.toDS())
      .writeStream.outputMode(OutputMode.Append())
      .foreachBatch { (df: org.apache.spark.sql.Dataset[DedupOut], _: Long) =>
        df.collect().foreach(o =>
          latest(o.doc_id) = (o.text_md5, o.canonical_id, o.group_size, o.is_duplicate))
      }.start()
    try chunks.foreach { c => ms.addData(c); q.processAllAvailable() }
    finally q.stop()
    latest.toMap
  }

  private def batchOf(rows: Seq[DocIn]): Map[Long, (String, Long, Long, Boolean)] = {
    val s = spark
    import s.implicits._
    Dedup.exact(rows.toDF("doc_id", "text")).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("text_md5"), r.getAs[Long]("canonical_id"),
          r.getAs[Long]("group_size"), r.getAs[Boolean]("is_duplicate"))))
      .toMap
  }

  test("md5Hex matches Spark's md5 column") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.md5
    val texts = docs.map(_.text).distinct
    val sparkSide = texts.toDF("t").select(md5($"t")).collect().map(_.getString(0))
    assert(sparkSide.sameElements(texts.map(StatefulDedup.md5Hex)))
  }

  test("streaming dedup converges to batch Dedup.exact across chunks and replays") {
    val chunks = Seq(
      docs.slice(0, 15),
      docs.slice(15, 30),
      docs.slice(5, 20) ++ docs.slice(30, 40)) // replay 15 + finish
    assert(runStream(chunks) == batchOf(docs))
  }

  test("every stream prefix equals batch over the documents seen so far") {
    val c1 = docs.slice(0, 13); val c2 = docs.slice(13, 27)
    assert(runStream(Seq(c1)) == batchOf(c1))
    assert(runStream(Seq(c1, c2)) == batchOf(c1 ++ c2))
  }

  test("late smaller doc_id re-canonicalizes its whole group") {
    val grp = Seq(DocIn(7L, "same"), DocIn(9L, "same"))
    val late = DocIn(2L, "same")
    val out = runStream(Seq(grp, Seq(late)))
    assert(out.keySet == Set(2L, 7L, 9L))
    assert(out.values.forall { case (_, canon, size, _) => canon == 2L && size == 3L })
    assert(out(2L)._4 == false && out(7L)._4 && out(9L)._4)
  }
}

package graft.streaming

import graft.TestSpark
import graft.ops.Dedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable

/** Streaming MinHash-LSH near-dup ≡ batch Dedup.minhashLshPairs on every
  * prefix, under cross-batch bucket growth and replayed chunks. */
class StatefulNearDupSpec extends AnyFunSuite {
  import TestSpark._
  import StatefulNearDup.{DocIn, PairOut}

  // near-dup families: shared long word runs with small edits, plus
  // unrelated docs and a too-short doc (no shingles → never a candidate)
  private val docs: Seq[DocIn] = {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val other = "one two three four five six seven eight nine ten"
    Seq(
      DocIn(1L, base),
      DocIn(2L, base + " lambda"),
      DocIn(3L, base.replace("delta", "delta2")),
      DocIn(4L, other),
      DocIn(5L, other + " eleven"),
      DocIn(6L, "tiny doc"),
      DocIn(7L, base),
      DocIn(8L, "totally different words here nothing shared with others at all"))
  }

  private def runStream(chunks: Seq[Seq[DocIn]]): Map[(Long, Long), (Long, Double)] = {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val got = mutable.LinkedHashMap[(Long, Long), (Long, Double)]()
    val ms = MemoryStream[DocIn]
    val q = StatefulNearDup.pairs(ms.toDS())
      .writeStream.outputMode(OutputMode.Append())
      .foreachBatch { (df: org.apache.spark.sql.Dataset[PairOut], _: Long) =>
        df.collect().foreach { p =>
          val prev = got.get((p.doc_a, p.doc_b))
          assert(prev.forall(_ == ((p.n_agree, p.est_jaccard))),
            s"re-emission changed values for (${p.doc_a},${p.doc_b})")
          got((p.doc_a, p.doc_b)) = (p.n_agree, p.est_jaccard)
        }
      }.start()
    try chunks.foreach { c => ms.addData(c); q.processAllAvailable() }
    finally q.stop()
    got.toMap
  }

  private def batchOf(rows: Seq[DocIn]): Map[(Long, Long), (Long, Double)] = {
    val s = spark
    import s.implicits._
    Dedup.minhashLshPairs(rows.toDF("doc_id", "text")).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
        ((r.getAs[Long]("n_agree"), r.getAs[Double]("est_jaccard"))))
      .toMap
  }

  test("streaming signature replays the batch minhash column pipeline") {
    val s = spark
    import s.implicits._
    val sigCols = Dedup.minhashSignatures(docs.toDF("doc_id", "text"), n = 3, numHashes = 8)
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> (0 until 8).map(h => r.getAs[String](s"m$h")))
      .toMap
    docs.foreach { d =>
      StatefulNearDup.signature(d.text, 3, 8) match {
        case Some(sig) => assert(sig == sigCols(d.doc_id), s"doc ${d.doc_id}")
        case None      => assert(!sigCols.contains(d.doc_id), s"doc ${d.doc_id}")
      }
    }
  }

  test("streaming pairs converge to batch minhashLshPairs across chunks and replays") {
    val chunks = Seq(docs.slice(0, 3), docs.slice(3, 6),
      docs.slice(1, 4) ++ docs.slice(6, 8)) // replay 3 + finish
    val got = runStream(chunks)
    val want = batchOf(docs)
    assert(want.nonEmpty, "fixture must produce batch candidate pairs")
    assert(got == want)
  }

  test("every stream prefix equals batch over the documents seen so far") {
    val c1 = docs.slice(0, 2); val c2 = docs.slice(2, 5)
    assert(runStream(Seq(c1)) == batchOf(c1))
    assert(runStream(Seq(c1, c2)) == batchOf(c1 ++ c2))
  }

  test("stop-band cap bounds bucket state and pairing (r15 docs_zipf class)") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    // five EXACT copies → every band bucket holds all five docs; with
    // maxBucket = 3 the stream pairs among the first three members and
    // then stops growing the bucket — per-key state is bounded even if
    // a boilerplate key never stops arriving
    val copies = (1L to 5L).map(i =>
      DocIn(i, "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
    val got = mutable.Set[(Long, Long)]()
    val ms = MemoryStream[DocIn]
    val q = StatefulNearDup.pairs(ms.toDS(), maxBucket = 3)
      .writeStream.outputMode(OutputMode.Append())
      .foreachBatch { (df: org.apache.spark.sql.Dataset[PairOut], _: Long) =>
        got ++= df.collect().map(p => (p.doc_a, p.doc_b)); ()
      }.start()
    try { ms.addData(copies); q.processAllAvailable() } finally q.stop()
    // pairs among the first three docs only — docs 4, 5 never joined
    // the capped bucket (the documented divergence class: the batch op
    // drops the >cap bucket entirely; the stream keeps its ≤cap prefix)
    assert(got.toSet == Set((1L, 2L), (1L, 3L), (2L, 3L)))
    assert(Dedup.minhashLshPairs(copies.toSeq.toDF("doc_id", "text"), maxBucket = 3)
      .count() == 0, "batch drops the over-cap bucket entirely")
  }

  test("pair emission is incremental: second member's batch triggers it") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val perBatch = mutable.ArrayBuffer[Set[(Long, Long)]]()
    val ms = MemoryStream[DocIn]
    val q = StatefulNearDup.pairs(ms.toDS())
      .writeStream.outputMode(OutputMode.Append())
      .foreachBatch { (df: org.apache.spark.sql.Dataset[PairOut], _: Long) =>
        perBatch += df.collect().map(p => (p.doc_a, p.doc_b)).toSet
        ()
      }.start()
    try {
      ms.addData(Seq(docs.head)); q.processAllAvailable()       // doc 1 alone
      ms.addData(Seq(docs(6))); q.processAllAvailable()          // doc 7 == doc 1
    } finally q.stop()
    assert(perBatch.head.isEmpty)
    assert(perBatch(1).contains((1L, 7L)))
  }
}

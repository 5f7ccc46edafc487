package graft.streaming

import graft.TestSpark
import graft.queries.CorpusQueries
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable

/** Streaming ExactSubstr ≡ batch dedup_substring on every prefix: the
  * stream emits duplicated window starts at ingest (each at most once),
  * and the shared island merge over the accumulated starts reproduces
  * the batch spans bit-for-bit — across chunkings, replayed chunks, and
  * a checkpointed restart. */
class StatefulSubstringSpec extends AnyFunSuite {
  import TestSpark._
  import StatefulSubstring.{DocIn, StartOut}

  private val L = CorpusQueries.SubstrL

  // 60-char shared run; doc 2 repeats only its 48-char PREFIX and doc 6
  // only its 48-char SUFFIX, so doc 1's duplicated region GROWS when
  // doc 6 arrives (the span-growth branch). Plus a short doc (< L chars,
  // never windowed), a SELF-repeating doc (the within-doc duplication
  // branch: the batch global count has no per-doc distinct), and
  // unrelated filler long enough to window but never duplicated.
  private val shared = "the quick brown fox jumps over the lazy dog again and again!"
    .take(60)
  private val docs: Seq[DocIn] = Seq(
    DocIn(1L, "prefix one " + shared + " suffix alpha"),
    DocIn(2L, "a different, much longer prefix two: " + shared.take(48)),
    DocIn(3L, "tiny"),
    DocIn(4L, shared.take(50) + " and then " + shared.take(50)),
    DocIn(5L, "completely unrelated text that is certainly long enough to produce windows of its own"),
    DocIn(6L, "yet another " + shared.drop(12) + " trailing bits here"))

  /** Run the stream over chunks; assert per-start single emission;
    * return accumulated starts. */
  private def runStream(chunks: Seq[Seq[DocIn]]): Set[(Long, Long)] = {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val got = mutable.ArrayBuffer[(Long, Long)]()
    val ms = MemoryStream[DocIn]
    val q = StatefulSubstring.starts(ms.toDS())
      .writeStream.outputMode(OutputMode.Append())
      .foreachBatch { (df: org.apache.spark.sql.Dataset[StartOut], _: Long) =>
        df.collect().foreach(o => got += ((o.doc_id, o.pos)))
      }.start()
    try chunks.foreach { c => ms.addData(c); q.processAllAvailable() }
    finally q.stop()
    assert(got.size == got.distinct.size, "a start was emitted twice")
    got.toSet
  }

  private def batchSpans(rows: Seq[DocIn]): Set[(Long, Long, Long, Long, Long)] = {
    val s = spark
    import s.implicits._
    CorpusQueries.dedupSubstringOf(rows.toDF("doc_id", "text"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .toSet
  }

  private def mergedSpans(starts: Set[(Long, Long)]): Set[(Long, Long, Long, Long, Long)] = {
    val s = spark
    import s.implicits._
    if (starts.isEmpty) Set.empty
    else CorpusQueries.substrSpansFromStarts(
        starts.toSeq.toDF("doc_id", "pos"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .toSet
  }

  test("fixture exercises all branches (cross-doc, within-doc, sub-L, growth)") {
    assert(shared.length == 60 && L == 40)
    val spans = batchSpans(docs)
    assert(spans.nonEmpty)
    assert(spans.exists(_._1 == 4L), "self-repeating doc must carry a span")
    assert(!spans.exists(_._1 == 3L) && !spans.exists(_._1 == 5L))
  }

  test("every stream prefix equals batch over the documents seen so far") {
    val c1 = docs.slice(0, 1) // no duplicates yet — nothing may be emitted
    val c2 = docs.slice(0, 2)
    val c3 = docs.slice(0, 4)
    assert(mergedSpans(runStream(Seq(c1))) == batchSpans(c1))
    assert(batchSpans(c1).isEmpty, "a single doc prefix has no cross-doc dup")
    assert(mergedSpans(runStream(Seq(c1, docs.slice(1, 2)))) == batchSpans(c2))
    assert(mergedSpans(runStream(Seq(c1, docs.slice(1, 2), docs.slice(2, 4))))
      == batchSpans(c3))
  }

  test("chunking invariance and replayed-chunk idempotence") {
    val all = batchSpans(docs)
    assert(mergedSpans(runStream(Seq(docs))) == all)
    assert(mergedSpans(runStream(docs.map(Seq(_)))) == all)
    // replay chunk 2 (same docs re-delivered) — idempotent, no re-emits
    val replayed = runStream(Seq(docs.slice(0, 3), docs.slice(3, 6),
      docs.slice(1, 5)))
    assert(mergedSpans(replayed) == all)
  }

  test("spans GROW across the stream (why starts are the append unit)") {
    val firstTwo = batchSpans(docs.slice(0, 2))
    val withSix = batchSpans(docs.slice(0, 2) :+ docs(5))
    val doc1first = firstTwo.filter(_._1 == 1L)
    val doc1later = withSix.filter(_._1 == 1L)
    assert(doc1first != doc1later,
      "fixture must make doc 1's span set change when doc 6 arrives")
    // the stream still converges because starts are append-only
    assert(mergedSpans(runStream(Seq(docs.slice(0, 2), Seq(docs(5)))))
      == withSix)
  }

  test("restart from checkpoint: window-occurrence state survives a restart") {
    val s = spark
    import s.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-substr-restart").toString
    val srcDir = base + "/src"
    val ckpt = base + "/ckpt"
    val schema = docs.toDF().schema
    val got = mutable.ArrayBuffer[(Long, Long)]()
    def runProcess(chunk: Seq[DocIn]): Unit = {
      chunk.toDF().coalesce(1).write.mode("append").parquet(srcDir)
      val q = StatefulSubstring.starts(
          s.readStream.schema(schema).parquet(srcDir).as[DocIn])
        .writeStream.outputMode(OutputMode.Append())
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.Dataset[StartOut], _: Long) =>
          df.collect().foreach(o => got += ((o.doc_id, o.pos)))
        }.start()
      try q.processAllAvailable() finally q.stop()
    }
    // doc 2's duplicate windows are only detectable if doc 1's singleton
    // occurrences survived the restart in state
    runProcess(docs.slice(0, 1))
    runProcess(docs.slice(1, 6))
    assert(got.size == got.distinct.size)
    assert(mergedSpans(got.toSet) == batchSpans(docs),
      "spans across a checkpointed restart must equal the batch query")
  }
}

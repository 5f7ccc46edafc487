package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable

/** State TTL on the ingest-dedup twins (r15 verdict #3): keys idle past
  * the EVENT-TIME horizon are evicted via EventTimeTimeout (the
  * watermark clock — deterministic under replay and spec-able without
  * wall-clock sleeps; ProcessingTimeTimeout was measured to livelock
  * `processAllAvailable` because FlatMapGroupsWithStateExec
  * .shouldRunAnotherBatch is unconditionally true for it, storming
  * continuous empty micro-batches under the default 0-interval
  * trigger). The divergence class is exactly the accepted-missing one:
  *
  *  - StatefulDedup.dedupTtl: a duplicate arriving after its group
  *    expired re-admits as a FRESH group (canonical = itself, size 1);
  *  - StatefulNearDup.pairsTtl: a doc arriving after its band bucket
  *    expired pairs only with post-expiry members — pairs across the
  *    horizon are missing, pairs within it unchanged;
  *  - below the horizon the TTL twins emit EXACTLY what the NoTimeout
  *    twins emit (prefix equality is untouched).
  */
class StatefulTtlSpec extends AnyFunSuite {
  import TestSpark.{spark, ts}
  import StatefulDedup.{DedupOut, DocTs}
  import StatefulNearDup.{DocTsIn, PairOut}

  private val H = 3600L // seconds

  // long enough for 3-shingles, distinct enough to land in its own bucket
  private def text(tag: String) =
    s"document $tag with a reasonably long shared body of words $tag"

  private def runDedupTtl(chunks: Seq[Seq[DocTs]])
      : mutable.LinkedHashMap[Long, (Long, Long, Boolean)] = {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val latest = mutable.LinkedHashMap[Long, (Long, Long, Boolean)]()
    val ms = MemoryStream[DocTs]
    val q = StatefulDedup.dedupTtl(ms.toDS(), ttl = "6 hours")
      .writeStream.outputMode(OutputMode.Append())
      .foreachBatch { (df: org.apache.spark.sql.Dataset[DedupOut], _: Long) =>
        df.collect().foreach(o =>
          latest(o.doc_id) = (o.canonical_id, o.group_size, o.is_duplicate))
      }.start()
    try chunks.foreach { c => ms.addData(c); q.processAllAvailable() }
    finally q.stop()
    latest
  }

  test("dedupTtl: expired group re-admits a duplicate as fresh") {
    val latest = runDedupTtl(Seq(
      // the group forms — WITHIN the horizon
      Seq(DocTs(10L, text("a"), ts(0)), DocTs(11L, text("a"), ts(0))),
      // event time jumps 7 h: the watermark passes 0 + 6 h and the
      // engine's follow-up batch fires the timeout for group "a"
      Seq(DocTs(20L, text("b"), ts(7 * H))),
      // the SAME text again — its group state is gone, so it re-admits
      // as a fresh singleton (the accepted-missing class)
      Seq(DocTs(12L, text("a"), ts(7 * H + 10)))))
    assert(latest(10L) == ((10L, 2L, false)))
    assert(latest(11L) == ((10L, 2L, true)))
    assert(latest(12L) == ((12L, 1L, false)),
      s"expected fresh re-admission after expiry, got ${latest.get(12L)}")
  }

  test("dedupTtl: idle groups below the horizon are NOT evicted") {
    val latest = runDedupTtl(Seq(
      Seq(DocTs(10L, text("a"), ts(0))),
      // 5 h later: watermark 5 h < 0 + 6 h — group must survive
      Seq(DocTs(20L, text("b"), ts(5 * H))),
      Seq(DocTs(12L, text("a"), ts(5 * H + 10)))))
    assert(latest(12L) == ((10L, 2L, true)),
      s"group must still be alive below the horizon: ${latest.get(12L)}")
  }

  test("pairsTtl: pairs across the expiry horizon are missing") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val pairs = mutable.LinkedHashSet[(Long, Long)]()
    val ms = MemoryStream[DocTsIn]
    val q = StatefulNearDup.pairsTtl(ms.toDS(), ttl = "6 hours")
      .writeStream.outputMode(OutputMode.Append())
      .foreachBatch { (df: org.apache.spark.sql.Dataset[PairOut], _: Long) =>
        df.collect().foreach(p => pairs += ((p.doc_a, p.doc_b)))
      }.start()
    try {
      // identical text = same signature = same bucket: a pre-expiry pair
      ms.addData(Seq(DocTsIn(1L, text("x"), ts(0)),
        DocTsIn(2L, text("x"), ts(0))))
      q.processAllAvailable()
      assert(pairs.contains((1L, 2L)), s"within-horizon pair missing: $pairs")
      // event time jumps 7 h; the bucket expires on the follow-up batch
      ms.addData(Seq(DocTsIn(9L, text("z"), ts(7 * H))))
      q.processAllAvailable()
      // doc 3 arrives after the bucket expired: (1,3)/(2,3) are the
      // accepted-missing pairs; but 3 seeds a fresh bucket, so a LATER
      // doc 4 within the new horizon still pairs with 3
      ms.addData(Seq(DocTsIn(3L, text("x"), ts(7 * H + 1))))
      q.processAllAvailable()
      ms.addData(Seq(DocTsIn(4L, text("x"), ts(7 * H + 2))))
      q.processAllAvailable()
      assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)),
        s"pairs across the horizon should be missing: $pairs")
      assert(pairs.contains((3L, 4L)),
        s"post-expiry members must still pair with each other: $pairs")
    } finally q.stop()
  }

  test("below the horizon, pairsTtl emits exactly the batch pair set") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    // 18 docs over 6 near-duplicate families, all within one hour
    val docs = (0 until 18).map { i =>
      DocTsIn(i.toLong, text(s"fam${i % 6}"), ts(i * 60L))
    }
    val got = mutable.LinkedHashMap[(Long, Long), (Long, Double)]()
    val ms = MemoryStream[DocTsIn]
    val q = StatefulNearDup.pairsTtl(ms.toDS(), ttl = "6 hours")
      .writeStream.outputMode(OutputMode.Append())
      .foreachBatch { (df: org.apache.spark.sql.Dataset[PairOut], _: Long) =>
        df.collect().foreach(p =>
          got((p.doc_a, p.doc_b)) = (p.n_agree, p.est_jaccard))
      }.start()
    try {
      docs.grouped(7).foreach { c => ms.addData(c); q.processAllAvailable() }
    } finally q.stop()
    val want = graft.ops.Dedup
      .minhashLshPairs(docs.map(d => (d.doc_id, d.text)).toDF("doc_id", "text"))
      .collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
        ((r.getAs[Long]("n_agree"), r.getAs[Double]("est_jaccard"))))
      .toMap
    assert(got.toMap == want,
      s"TTL twin must equal batch below the horizon: got=$got want=$want")
  }
}

package graft.ops

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class DedupSpec extends AnyFunSuite {
  import TestSpark._

  private val corpus = docs(Seq(
    (0L, "the quick brown fox jumps over the lazy dog", "en"),
    (1L, "the quick brown fox jumps over the lazy dog", "en"), // exact dup of 0
    (2L, "the quick brown fox jumps over the lazy cat", "en"), // near dup of 0
    (3L, "completely different words entirely here now", "en"),
    (4L, "other text again with different content", "en")))

  test("exact dedup groups identical texts under the min doc_id") {
    val out = Dedup.exact(corpus).collect().map(r =>
      r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("canonical_id"), r.getAs[Long]("group_size"),
          r.getAs[Boolean]("is_duplicate"))).toMap
    assert(out(0L) == ((0L, 2L, false)))
    assert(out(1L) == ((0L, 2L, true)))
    assert(out(2L)._1 == 2L && !out(2L)._3)
  }

  test("n-gram Jaccard ranks the exact pair above the near pair") {
    val pairs = Dedup.ngramJaccardTopK(corpus, topK = 10).collect()
    assert(pairs.nonEmpty)
    val top = pairs.head
    assert((top.getAs[Long]("doc_a"), top.getAs[Long]("doc_b")) == ((0L, 1L)))
    assert(top.getAs[Double]("jaccard") == 1.0)
    val near = pairs.find(r => r.getAs[Long]("doc_a") == 0L && r.getAs[Long]("doc_b") == 2L)
    assert(near.isDefined && near.get.getAs[Double]("jaccard") > 0.5)
  }

  test("jaccardPairs equals the brute-force thresholded pair set") {
    // brute force: shingle sets per doc, all C(n,2) pairs, filter >= tau
    val texts = corpus.collect().map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    def shingles(t: String): Set[String] =
      t.split("\\s+").sliding(3).map(_.mkString(" ")).toSet
    val tau = 0.3
    val want = (for {
      a <- texts.keys; b <- texts.keys if a < b
      sa = shingles(texts(a)); sb = shingles(texts(b))
      inter = (sa & sb).size
      if inter > 0
      j = math.floor(inter.toDouble / (sa ++ sb).size * 1e6 + 0.5) / 1e6
      if j >= tau
    } yield (a, b, j)).toSet
    val got = Dedup.jaccardPairs(corpus, tau = tau).collect().map(r =>
      (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Double]("jaccard"))).toSet
    assert(got == want)
    assert(want.exists(_._3 < 1.0), "fixture must exercise a non-exact pair")
  }

  test("containment catches a fragment embedded in a superset that Jaccard misses") {
    val withFragment = docs(Seq(
      (0L, "alpha beta gamma delta epsilon zeta eta theta iota kappa", "en"),
      // doc 1 = doc 0 plus a long suffix: fragment 0 is fully contained
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
        "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi psi omega", "en"),
      (2L, "unrelated words that share nothing with the others at all plus padding", "en")))
    val out = Dedup.containmentPairs(withFragment, tau = 0.9).collect()
    assert(out.length == 1)
    val r = out.head
    assert((r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) == ((0L, 1L)))
    // the fragment direction is total containment...
    assert(r.getAs[Double]("containment_a") == 1.0)
    // ...while symmetric Jaccard on the same pair stays below any dedup bar
    val j = Dedup.jaccardPairs(withFragment, tau = 0.0)
      .collect().find(p => p.getAs[Long]("doc_a") == 0L && p.getAs[Long]("doc_b") == 1L)
    assert(j.isDefined && j.get.getAs[Double]("jaccard") < 0.5)
  }

  test("minhash LSH surfaces identical docs with full signature agreement") {
    val pairs = Dedup.minhashLshPairs(corpus).collect()
    val exact = pairs.find(r =>
      r.getAs[Long]("doc_a") == 0L && r.getAs[Long]("doc_b") == 1L)
    assert(exact.isDefined, "identical docs must collide in every band")
    assert(exact.get.getAs[Long]("n_agree") == 8L)
    assert(exact.get.getAs[Double]("est_jaccard") == 1.0)
  }

  test("delta pairs = full LSH pairs touching the new batch, nothing more") {
    import org.apache.spark.sql.functions.col
    val isNew = col("doc_id") % 2 === 0
    val delta = Dedup.minhashLshDeltaPairs(corpus, isNew).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Boolean]("new_a"), r.getAs[Boolean]("new_b"),
        r.getAs[Long]("n_agree"))).toSet
    val full = Dedup.minhashLshPairs(corpus).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Long]("n_agree")))
      .filter { case (a, b, _) => a % 2 == 0 || b % 2 == 0 }
      .map { case (a, b, g) => (a, b, a % 2 == 0, b % 2 == 0, g) }.toSet
    assert(delta == full)
    assert(delta.forall { case (_, _, na, nb, _) => na || nb },
      "a history-x-history pair leaked through the delta filter")
  }

  test("simhashHamming equals the brute-force quadratic (pigeonhole completeness)") {
    for (maxH <- Seq(0, 1, 3)) {
      val fps = Dedup.simhash(corpus).collect().map(r =>
        r.getAs[Long]("doc_id") -> r.getAs[Long]("simhash")).toMap
      val want = (for {
        a <- fps.keys; b <- fps.keys if a < b
        h = java.lang.Long.bitCount(fps(a) ^ fps(b))
        if h <= maxH
      } yield (a, b, h.toLong)).toSet
      val got = Dedup.simhashHamming(corpus, maxHamming = maxH).collect().map(r =>
        (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
          r.getAs[Long]("hamming"))).toSet
      assert(got == want, s"maxHamming=$maxH")
    }
    // the exact-dup pair is a guaranteed hamming-0 witness
    assert(Dedup.simhashHamming(corpus, maxHamming = 0).collect()
      .exists(r => r.getAs[Long]("doc_a") == 0L && r.getAs[Long]("doc_b") == 1L))
  }

  test("simhash: identical docs share a fingerprint and cluster; near dups are close") {
    val out = Dedup.simhash(corpus).collect().map(r =>
      r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("simhash"), r.getAs[Long]("canonical_id"))).toMap
    assert(out(0L)._1 == out(1L)._1)
    assert(out(1L)._2 == 0L)
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(out(0L)._1, out(2L)._1) <= ham(out(0L)._1, out(3L)._1))
  }
}

package graft.ops

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class SimilaritySpec extends AnyFunSuite {
  import TestSpark._

  // two tight clusters on orthogonal axes + one diagonal outlier
  private val corpus = vecs(Seq(
    (0L, Seq(1f, 0f, 0f, 0f), 0),
    (1L, Seq(0.9f, 0.1f, 0f, 0f), 0),
    (2L, Seq(0.95f, -0.05f, 0f, 0f), 0),
    (3L, Seq(0f, 1f, 0f, 0f), 1),
    (4L, Seq(0.1f, 0.9f, 0f, 0f), 1),
    (5L, Seq(-0.05f, 0.95f, 0f, 0f), 1),
    (6L, Seq(0.7f, 0.7f, 0f, 0f), 1)))

  test("brute-force top-k ranks same-cluster vectors first, cosine in [-1,1]") {
    val out = Similarity.bruteForceTopK(
      corpus.filter("vec_id = 0"), corpus, k = 3).orderBy("rnk").collect()
    assert(out.length == 3)
    assert(out.map(_.getAs[Long]("vec_id")).toSet == Set(1L, 2L, 6L))
    assert(out.head.getAs[Long]("vec_id") != 3L)
    out.foreach { r =>
      val c = r.getAs[Double]("cosine")
      assert(c >= -1.0000001 && c <= 1.0000001)
    }
    // descending by cosine
    val cs = out.map(_.getAs[Double]("cosine"))
    assert(cs.sameElements(cs.sorted.reverse))
  }

  test("LSH bucketing only returns same-bucket candidates (recall/cost trade)") {
    import org.apache.spark.sql.functions.col
    graft.functions.GraftFunctions.register(spark)
    val out = Similarity.lshTopK(
      corpus.filter("vec_id = 0"), corpus, k = 7, planes = 2).collect()
    // candidates = exactly the other members of v0's hyperplane bucket
    val buckets = corpus
      .select(col("vec_id"), Similarity.srpBucket(col("embedding"), 2).as("b"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val expect = buckets.collect {
      case (id, b) if b == buckets(0L) && id != 0L => id
    }.toSet
    assert(expect.nonEmpty && expect.size < buckets.size - 1,
      s"fixture must split into >1 bucket: $buckets")
    assert(out.map(_.getAs[Long]("vec_id")).toSet == expect)
  }

  test("multi-probe candidates are a superset of the home-bucket candidates") {
    val single = Similarity.lshTopK(
      corpus.filter("vec_id = 0"), corpus, k = 7, planes = 2)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    val probe = Similarity.lshTopKProbe(
      corpus.filter("vec_id = 0"), corpus, k = 7, planes = 2)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    assert(single.subsetOf(probe))
    // 2 planes -> home + 2 flipped buckets = 3 of the 4 possible keys;
    // on this fixture the wider probe must actually add candidates
    assert(probe.size > single.size, s"probe $probe vs single $single")
  }

  test("IVF assignment sends cluster members to their own centroid") {
    val cents = Similarity.centroidArrays(Similarity.centroids(corpus))
    val out = Similarity.ivfAssign(corpus, cents).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("assigned_label")).toMap
    assert(out(0L) == 0 && out(1L) == 0 && out(2L) == 0)
    assert(out(3L) == 1 && out(4L) == 1 && out(5L) == 1)
  }

  test("compiled and declarative IVF assignment agree bit-for-bit") {
    val cents = Similarity.centroidArrays(Similarity.centroids(corpus))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
    assert(canon(Similarity.ivfAssign(corpus, cents)) ==
      canon(Similarity.ivfAssignDeclarative(corpus, cents)))
  }

  test("PQ with a single subspace degenerates bit-for-bit to IVF assignment") {
    val cents = Similarity.centroidArrays(Similarity.centroids(corpus))
    val ivf = Similarity.ivfAssign(corpus, cents).collect()
      .map(r => r.getAs[Long]("vec_id") -> (r.getAs[Int]("assigned_label"), r.getAs[Double]("d2"))).toMap
    val pq = Similarity.pqAssign(corpus, cents, subDims = 4).collect()
    assert(pq.length == ivf.size)
    pq.foreach { r =>
      assert(r.getAs[Long]("subspace") == 1L)
      val (lbl, d2) = ivf(r.getAs[Long]("vec_id"))
      assert(r.getAs[Int]("code") == lbl)
      assert(r.getAs[Double]("d2") == d2)
    }
  }

  test("PQ per-subspace argmin never loses to the whole-vector assignment") {
    val cents = Similarity.centroidArrays(Similarity.centroids(corpus))
    val ivf = Similarity.ivfAssign(corpus, cents).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("d2")).toMap
    val bySub = Similarity.pqAssign(corpus, cents, subDims = 2).collect()
      .groupBy(_.getAs[Long]("vec_id"))
    assert(bySub.size == ivf.size)
    bySub.foreach { case (id, rows) =>
      assert(rows.map(_.getAs[Long]("subspace")).sorted.toSeq == Seq(1L, 2L))
      // Σ over subspaces of the per-subspace best d2 ≤ the single shared
      // argmin's d2 (each subspace can only do better independently);
      // 1e-6 snap slack per term
      val pqTotal = rows.map(_.getAs[Double]("d2")).sum
      assert(pqTotal <= ivf(id) + 3e-6, s"vec $id: $pqTotal > ${ivf(id)}")
    }
  }

  test("IVF probe with nprobe >= |codebook| degenerates bit-for-bit to brute force") {
    val cents = Similarity.centroidArrays(Similarity.centroids(corpus))
    val q = corpus.filter("vec_id = 0")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
    assert(canon(Similarity.ivfProbeTopK(q, corpus, cents, nprobe = 2, k = 6)) ==
      canon(Similarity.bruteForceTopK(q, corpus, k = 6)))
  }

  test("IVF probe with nprobe = 1 only returns vectors from the query's own cell") {
    val cents = Similarity.centroidArrays(Similarity.centroids(corpus))
    val q = corpus.filter("vec_id = 0")
    val cells = Similarity.ivfAssign(corpus, cents).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("assigned_label")).toMap
    val got = Similarity.ivfProbeTopK(q, corpus, cents, nprobe = 1, k = 7)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    val expect = cells.collect { case (id, c) if c == cells(0L) && id != 0L => id }.toSet
    assert(got == expect, s"cells=$cells got=$got")
  }

  test("IVFADC with nprobe >= |codebook| degenerates bit-for-bit to pure ADC") {
    val cents = Similarity.centroidArrays(Similarity.centroids(corpus))
    val q = corpus.filter("vec_id = 0")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
    assert(canon(Similarity.ivfPqTopK(q, corpus, cents,
        nprobe = 2, subDims = 2, k = 6)) ==
      canon(Similarity.pqAdcTopK(q, corpus, cents, subDims = 2, k = 6)))
  }

  test("IVFADC with nprobe = 1 scores exactly the query's own cell, ADC-ranked") {
    val cents = Similarity.centroidArrays(Similarity.centroids(corpus))
    val q = corpus.filter("vec_id = 0")
    val cells = Similarity.ivfAssign(corpus, cents).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("assigned_label")).toMap
    val out = Similarity.ivfPqTopK(q, corpus, cents,
      nprobe = 1, subDims = 2, k = 7).collect()
    val got = out.map(_.getAs[Long]("vec_id")).toSet
    val expect = cells.collect { case (id, c) if c == cells(0L) && id != 0L => id }.toSet
    assert(got == expect, s"cells=$cells got=$got")
    // the survivors' ADC distances equal the full ADC pass's for the
    // same (qid, vec_id) — probing filters candidates, never rescores
    val full = Similarity.pqAdcTopK(q, corpus, cents, subDims = 2, k = 7)
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("adc_d2")).toMap
    out.foreach { r =>
      assert(r.getAs[Double]("adc_d2") == full(r.getAs[Long]("vec_id")))
    }
  }

  test("ADC top-k equals true squared distances when codewords are lossless") {
    // every vector sits exactly at its label centroid (identical dups per
    // label, grid-exact coordinates) → PQ encodes losslessly and the
    // asymmetric distance IS the true squared distance
    val pts = Seq(
      Seq(1f, 0f, 0f, 0f), Seq(0f, 1f, 0f, 0f), Seq(0f, 0f, 1f, 1f))
    val v = vecs(pts.zipWithIndex.flatMap { case (p, l) =>
      Seq((l * 2L, p, l), (l * 2L + 1, p, l)) })
    val cents = Similarity.centroidArrays(Similarity.centroids(v))
    val q = v.filter("vec_id = 0")
    val out = Similarity.pqAdcTopK(q, v, cents, subDims = 2, k = 6)
      .orderBy("rnk").collect()
    assert(out.length == 5) // self excluded
    val d2 = out.map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("adc_d2")).toMap
    assert(d2(1L) == 0.0)                      // same point
    assert(d2(2L) == 2.0 && d2(3L) == 2.0)     // |e1-e2|² = 2
    assert(d2(4L) == 3.0 && d2(5L) == 3.0)     // 1+1+1
    // ties rank by vec_id
    assert(out.map(_.getAs[Long]("vec_id")).toSeq == Seq(1L, 2L, 3L, 4L, 5L))
  }

  test("maxBucket cap keeps the deterministic lowest-vec_id survivors and counts drops") {
    // six positive multiples of one direction — identical SRP bucket
    // (sign bits are scale-invariant), pairwise cosine exactly 1 after
    // the 1e-6 snap. Superincreasing magnitudes: every ±1 combination
    // of (0.8, 0.4, 0.2, 0.1) is ≥ 0.1 in absolute value, so no plane
    // dot sits near zero where scaling could flip its sign bit.
    val dir = Seq(0.8f, 0.4f, 0.2f, 0.1f)
    val same = vecs((0L until 6L).map(i => (i, dir.map(_ * (1f + i * 0.25f)), 0)))
    val out = Similarity.cosineNearDupPairs(same, tau = 0.2, planes = 4, maxBucket = 3)
      .collect().map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"))).toSet
    // survivors must be vec_ids 0,1,2 — the sort makes the cap's keep
    // set order-independent — so exactly C(3,2) pairs emerge
    assert(out == Set((0L, 1L), (0L, 2L), (1L, 2L)))
    assert(Similarity.lastDropped == 3L,
      s"3 of 6 same-bucket rows past the cap must be counted, got ${Similarity.lastDropped}")
  }

  test("auto-planes near-dup equals the fixed-planes call at the planesFor count") {
    val n = corpus.count()
    val p = Similarity.planesFor(n, 2)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
    assert(canon(Similarity.cosineNearDupPairsAuto(corpus, targetBucketRows = 2)) ==
      canon(Similarity.cosineNearDupPairs(corpus, planes = p)))
  }

  test("scalar quantization: exact per-dim stats, error bounded by half a step") {
    val v = vecs(Seq(
      (0L, Seq(0f, 10f, 7f), 0),
      (1L, Seq(1f, 20f, 7f), 0),
      (2L, Seq(0.5f, 15f, 7f), 0)))
    val rows = Similarity.scalarQuantize(v, levels = 255).collect()
      .map(r => r.getAs[Long]("pos") -> r).toMap
    assert(rows.keySet == Set(1L, 2L, 3L))
    assert(rows(1L).getAs[Double]("mn") == 0.0 && rows(1L).getAs[Double]("mx") == 1.0)
    assert(rows(2L).getAs[Double]("mn") == 10.0 && rows(2L).getAs[Double]("mx") == 20.0)
    // every dimension's max reconstruction error ≤ half a quantization step
    rows.values.foreach { r =>
      val halfStep = r.getAs[Double]("scale") / 2
      assert(r.getAs[Double]("max_abs_err") <= halfStep + 1e-9)
      assert(r.getAs[Double]("mse") <= halfStep * halfStep + 1e-9)
    }
    // constant dimension quantizes losslessly to level 0
    assert(rows(3L).getAs[Double]("scale") == 0.0)
    assert(rows(3L).getAs[Double]("max_abs_err") == 0.0)
    assert(rows(3L).getAs[Double]("mse") == 0.0)
  }

  test("scalar quantization at levels=1 still reconstructs endpoints exactly") {
    val v = vecs(Seq((0L, Seq(-2f), 0), (1L, Seq(6f), 0)))
    val r = Similarity.scalarQuantize(v, levels = 1).head()
    // q ∈ {0,1} → recon ∈ {mn, mx}: both endpoints exact, so err = 0 there
    assert(r.getAs[Double]("mn") == -2.0 && r.getAs[Double]("mx") == 6.0)
    assert(r.getAs[Double]("max_abs_err") == 0.0)
  }

  test("cosine of a vector with an identical vector is exactly 1.0") {
    val two = vecs(Seq((0L, Seq(0.3f, -0.2f, 0.5f, 0.1f), 0),
      (1L, Seq(0.3f, -0.2f, 0.5f, 0.1f), 0)))
    val out = Similarity.bruteForceTopK(two.filter("vec_id = 0"), two, k = 1).head()
    assert(out.getAs[Double]("cosine") == 1.0)
  }
}

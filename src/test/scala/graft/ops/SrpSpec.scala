package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Random-hyperplane SRP properties (VERDICT r3 item 7): the md5-seeded
  * ±1 hyperplanes must be deterministic, must spread CORRELATED
  * embeddings across buckets (where axis-aligned sign bits collapse to
  * one bucket), and must keep cosine-similar vectors colliding more than
  * dissimilar ones — incl. full recall on a clustered fixture whose
  * within-cluster noise is far below the plane-dot margin. */
class SrpSpec extends AnyFunSuite {
  import TestSpark._

  graft.functions.GraftFunctions.register(spark)

  // odd on purpose: a ±1 plane dotted with a ±1 centroid over an odd
  // number of coordinates sums to an ODD multiple of the grid unit —
  // the margin can never be zero, so small jitter can never flip a bit
  private val Dim = 15

  private def bucketsOf(vs: Seq[(Long, Seq[Float], Int)], planes: Int): Map[Long, String] =
    vecs(vs).select(col("vec_id"),
        Similarity.srpBucket(col("embedding"), planes, Dim).as("b"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap

  test("native srp_bucket equals the composed per-plane dotl form bit for bit") {
    import org.apache.spark.sql.functions.{concat, lit, typedlit, when}
    val vs = (0L until 40L).map { i =>
      (i, (0 until Dim).map(j => ((i * 17 + j * 29) % 19).toFloat / 7f - 1.2f), 0)
    }
    val composed = concat(Similarity.planeSigns(8, Dim).toIndexedSeq.map { s =>
      when(Similarity.dotL(col("embedding"), typedlit(s.toSeq)) >= 0L, lit("1"))
        .otherwise(lit("0"))
    }: _*)
    val rows = vecs(vs)
      .select(col("vec_id"),
        Similarity.srpBucket(col("embedding"), 8, Dim).as("native"),
        composed.as("composed"))
      .collect()
    rows.foreach(r => assert(r.getString(1) == r.getString(2),
      s"bucket mismatch for vec ${r.getLong(0)}"))
  }

  test("plane signs are deterministic and balanced-ish") {
    val a = Similarity.planeSigns(8, 64)
    val b = Similarity.planeSigns(8, 64)
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq, "same seed, same planes")
    val pos = a.flatten.count(_ > 0)
    assert(pos > 150 && pos < 350, s"Rademacher signs wildly unbalanced: $pos/512")
    // planes differ from each other (md5 keyed by plane index)
    assert(a.map(_.toSeq).distinct.length == 8)
  }

  test("correlated embeddings spread over buckets (axis-aligned would collapse to one)") {
    // leading coordinates identical and positive across the corpus — the
    // old first-N-sign bucketing maps ALL of these to the same key
    val base = Seq.fill(8)(1f)
    val vs = (0L until 32L).map { i =>
      val tail = (0 until Dim - 8).map(j =>
        (((i * 31 + j * 17) % 13).toFloat - 6f) / 10f)
      (i, base ++ tail, 0)
    }
    val bk = bucketsOf(vs, planes = 8)
    assert(bk.values.toSet.size > 4,
      s"hyperplane SRP must split correlated vectors, got ${bk.values.toSet.size} buckets")
  }

  test("identical vectors share a bucket; negated vectors never do") {
    val v = (0 until Dim).map(i => (i * 7 % 5).toFloat / 3f + 0.1f)
    val bk = bucketsOf(Seq((0L, v, 0), (1L, v, 0), (2L, v.map(-_), 0)), planes = 8)
    assert(bk(0L) == bk(1L))
    // every plane dot is nonzero for this v, so -v flips every bit
    assert(bk(2L) == bk(0L).map(c => if (c == '1') '0' else '1'))
  }

  test("clustered corpus: within-cluster collision ≫ cross-cluster, full LSH recall") {
    // two far-apart centroids, noise small enough that no plane dot can
    // change sign (margin |dot(c)| ≥ grid sum of |noise|)
    val c1 = (0 until Dim).map(i => if (i % 2 == 0) 1f else -1f)
    val c2 = (0 until Dim).map(i => if (i % 3 == 0) -1f else 1f)
    def jitter(c: Seq[Float], k: Long): Seq[Float] =
      c.zipWithIndex.map { case (x, j) => x + ((k * 13 + j) % 7).toFloat / 1000f }
    val vs = (0L until 10L).map(i => (i, jitter(c1, i), 0)) ++
      (10L until 20L).map(i => (i, jitter(c2, i), 1))
    val bk = bucketsOf(vs, planes = 6)
    val within1 = (0L until 10L).map(bk).toSet
    val within2 = (10L until 20L).map(bk).toSet
    assert(within1.size == 1 && within2.size == 1,
      "cluster members must share their centroid's bucket under small noise")
    assert(within1 != within2, "far-apart clusters must hash apart")

    // therefore bucketed ANN reaches every same-cluster neighbor: recall = 1
    val corpus = vecs(vs)
    val got = Similarity.lshTopK(corpus.filter("vec_id = 0"), corpus,
        k = 9, planes = 6).collect().map(_.getAs[Long]("vec_id")).toSet
    assert(got == (1L until 10L).toSet)
  }

  test("planesFor is the exact integer ceil-log2 (no FP overshoot at powers of two)") {
    // naive model: smallest k in [1,30] with 2^k >= ceil(n/target)
    def naive(n: Long, t: Long): Int = {
      val cr = (n + t - 1) / t
      (1 to 30).find(k => (1L << k) >= cr).getOrElse(30)
    }
    for (t <- Seq(1L, 7L, 8L, 512L); n <- Seq(1L, 2L, 7L, 8L, 9L, 63L, 64L, 65L,
        500L, 2000L, (1L << 29) * 8, (1L << 29) * 8 + 1, Long.MaxValue / 2))
      assert(Similarity.planesFor(n, t) == naive(n, t), s"n=$n target=$t")
    // the ADVICE counterexamples: exact power-of-two ratios must NOT gain a plane
    assert(Similarity.planesFor(1L << 29, 1) == 29)
    assert(Similarity.planesFor(1L << 31, 1) == 30) // clamp
    assert(Similarity.planesFor(5, 8) == 1)          // ratio <= 1 floor
  }

  private lazy val sfVecs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("vec_id"))).toSet

  test("tables=1 multi-table ANN degenerates to the single-table path bit for bit") {
    val q = sfVecs.filter("vec_id < 5")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
    assert(canon(Similarity.lshTopKMulti(q, sfVecs, k = 10, planes = 8, tables = 1)) ==
      canon(Similarity.lshTopK(q, sfVecs, k = 10, planes = 8)))
  }

  test("OR-amplification: multi-table recall vs brute force beats single-table at equal per-table planes") {
    val q = sfVecs.filter("vec_id < 5")
    val brute = pairs(Similarity.bruteForceTopK(q, sfVecs, k = 10))
    val single = pairs(Similarity.lshTopK(q, sfVecs, k = 10, planes = 8))
    val multi = pairs(Similarity.lshTopKMulti(q, sfVecs, k = 10, planes = 8, tables = 4))
    val rs = (single & brute).size
    val rm = (multi & brute).size
    // table 0 of the multi index IS the single-table index, so candidate
    // sets are supersets and top-k recall cannot drop; on this corpus the
    // extra tables recover strictly more true neighbors
    assert(rm > rs, s"multi recall $rm/${brute.size} must beat single $rs/${brute.size}")
  }
}

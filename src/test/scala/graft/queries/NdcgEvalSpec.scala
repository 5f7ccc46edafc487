package graft.queries

import graft.TestSpark
import graft.ops.Similarity
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral cross-check for `ndcg_eval` (the DuckDB twin proves
  * cross-engine bit-equality; this proves the NDCG SEMANTICS): DCG of
  * the hamming arm recomputed by hand from hammingTopK ∩ truth using
  * the same grid weights, the ndcg ∈ [0, 1] envelope, and the
  * perfect-ranker identity (a ranker that returns the truth itself
  * scores ndcg = 1 — here checked as dcg_grid = idcg_grid iff every
  * truth rank is hit at the same position).
  */
class NdcgEvalSpec extends AnyFunSuite {
  import TestSpark._

  private val dir = "/root/testdata/sf0.001"
  // THE production constants (r14 ADVICE: read, don't re-derive — a
  // VecQueries constant change must fail these recomputations loudly)
  private val w: Map[Long, Long] = VecQueries.NdcgW.toMap

  private lazy val rows = VecQueries.queries("ndcg_eval")(spark, dir).collect()

  test("every cell is in [0,1], dcg <= idcg, 25-cell frame complete") {
    assert(rows.length == 25)
    assert(rows.map(r => (r.getAs[String]("ranker"), r.getAs[Long]("qid"))).toSet.size == 25)
    rows.foreach { r =>
      val d = r.getAs[Long]("dcg_grid"); val i = r.getAs[Long]("idcg_grid")
      assert(d >= 0L && d <= i, s"row $r")
      val n = r.getAs[Double]("ndcg")
      assert(n >= 0.0 && n <= 1.0, s"row $r")
    }
  }

  test("hamming-arm DCG equals the hand-computed weighted hit sum") {
    val v = spark.read.parquet(s"$dir/embeddings.parquet")
    val q = v.filter("vec_id < 5")
    val truth = Similarity.bruteForceTopK(q, v).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("vec_id"))).toSet
    val want = Similarity.hammingTopK(q, v).collect()
      .filter(r => truth((r.getAs[Long]("qid"), r.getAs[Long]("vec_id"))))
      .groupBy(_.getAs[Long]("qid"))
      .map { case (qid, hits) => qid -> hits.map(h => w(h.getAs[Long]("rnk"))).sum }
      .withDefaultValue(0L)
    rows.filter(_.getAs[String]("ranker") == "hamming").foreach { r =>
      assert(r.getAs[Long]("dcg_grid") == want(r.getAs[Long]("qid")), s"row $r")
    }
  }

  test("the exact ranker identity: truth scored against itself gives dcg = idcg") {
    // emulate a perfect ranker: truth's own ranks hit every position
    val idcgAt = (1 to 10).scanLeft(0L)((acc, r) => acc + w(r.toLong)).drop(1)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_true").toInt
      assert(r.getAs[Long]("idcg_grid") == idcgAt(n - 1), s"row $r")
    }
  }
}

package graft.ops

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class KmeansSpec extends AnyFunSuite {
  import TestSpark._

  // two tight clusters; seeds (smallest ids 0 and 1) start INSIDE the
  // same cluster, so at least one refinement iteration is required to
  // pull a centroid over to the second cluster
  private val corpus = vecs(Seq(
    (0L, Seq(1f, 0f, 0f, 0f), 0),
    (1L, Seq(0.9f, 0.1f, 0f, 0f), 0),
    (2L, Seq(0.95f, -0.05f, 0f, 0f), 0),
    (3L, Seq(0f, 1f, 0f, 0f), 1),
    (4L, Seq(0.1f, 0.9f, 0f, 0f), 1),
    (5L, Seq(-0.05f, 0.95f, 0f, 0f), 1)))

  test("refinement separates the two clusters from colocated seeds") {
    val out = Similarity.kmeansRefine(corpus, k = 2, iters = 2).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("cluster")).toMap
    assert(out.size == 6)
    assert(Set(out(0L), out(1L), out(2L)).size == 1)
    assert(Set(out(3L), out(4L), out(5L)).size == 1)
    assert(out(0L) != out(3L))
  }

  test("every vector assigned once; n_members matches the group counts") {
    val rows = Similarity.kmeansRefine(corpus, k = 2, iters = 1).collect()
    assert(rows.map(_.getAs[Long]("vec_id")).distinct.length == 6)
    val byCluster = rows.groupBy(_.getAs[Long]("cluster"))
    byCluster.foreach { case (_, rs) =>
      rs.foreach(r => assert(r.getAs[Long]("n_members") == rs.length.toLong))
    }
    rows.foreach(r => assert(r.getAs[Double]("d2") >= 0.0))
  }

  test("iters=0 assigns to the raw seeds; a seed vector has d2 = 0") {
    val out = Similarity.kmeansRefine(corpus, k = 2, iters = 0).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Long]("cluster"), r.getAs[Double]("d2"))).toMap
    // seeds are vec 0 (cid 0) and vec 1 (cid 1), assigned to themselves
    assert(out(0L) == ((0L, 0.0)))
    assert(out(1L) == ((1L, 0.0)))
  }

  test("partition-invariant: repartitioned input gives identical bits") {
    val a = Similarity.kmeansRefine(corpus, k = 2, iters = 2)
      .collect().map(_.toSeq).toSet
    val b = Similarity.kmeansRefine(corpus.repartition(5), k = 2, iters = 2)
      .collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("refinement does not increase total within-cluster distance") {
    def total(iters: Int): Double =
      Similarity.kmeansRefine(corpus, k = 2, iters = iters)
        .collect().map(_.getAs[Double]("d2")).sum
    // Lloyd monotonicity (grid rounding perturbs at the 1e-12 scale,
    // far below the 1e-6 snap of d2 on this well-separated fixture)
    assert(total(1) <= total(0) + 1e-9)
    assert(total(2) <= total(1) + 1e-9)
  }
}

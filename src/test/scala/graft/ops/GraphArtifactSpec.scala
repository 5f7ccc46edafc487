package graft.ops

import graft.TestSpark
import graft.queries.GraphQueries
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Maintenance proofs for the materialized graph-frame artifact
  * (round-13 verdict #1 — the WalkCorpus pattern extended to the whole
  * static-graph family):
  *
  *  1. every amortized reader off the persisted artifact produces its
  *     contract query's EXACT bits (so consumers stay oracle-exact
  *     transitively through the Verify gate);
  *  2. pair counts are merge-invariant over disjoint group (order)
  *     sets — pairCounts(A ∪ B) ≡ mergePairCounts(pairCounts(A),
  *     pairCounts(B)) — which is what makes incremental append exact
  *     rather than approximate (pairs never span two orders, counts
  *     are exact longs);
  *  3. the derived frames (thresholded edges, BFS labels) re-derived
  *     from the MERGED counts equal the from-scratch build — the
  *     refresh-after-append contract.
  */
class GraphArtifactSpec extends AnyFunSuite {
  import TestSpark._

  private val dir = "/root/testdata/sf0.001"
  private val path = "/tmp/graph_artifact_spec"

  // multiset compare (row -> count): a duplicate-row multiplicity
  // divergence between reader and contract must FAIL, which plain Set
  // semantics would mask (r14 ADVICE)
  private def rows(df: org.apache.spark.sql.DataFrame): Map[Seq[Any], Int] =
    df.collect().toSeq.map(_.toSeq).groupBy(identity)
      .map { case (r, g) => (r, g.size) }

  private lazy val built: Unit =
    GraphQueries.buildGraphArtifact(spark, dir, path)

  // the full amortized family, compared query-by-query against the
  // CONTRACT entries (the ones the Verify gate hash-checks)
  private val family = Seq("triangle_count", "link_prediction", "kcore",
    "graph_communities", "graph_assortativity", "graph_bfs",
    "graph_closeness", "graph_harmonic", "pagerank", "degree_dist")

  test("every amortized reader equals its contract query bit-for-bit") {
    built
    val amortized = GraphQueries.amortizedGraphQueries(path)
    assert(family.toSet == amortized.keySet)
    family.foreach { name =>
      val want = rows(graft.SparkEntry.queries(name)(spark, dir))
      val got = rows(amortized(name)(spark, dir))
      assert(want.nonEmpty, s"$name: contract result is empty")
      assert(got == want, s"$name: artifact reader diverged from contract")
    }
  }

  test("pair counts merge exactly over disjoint order sets (incremental append)") {
    val li = spark.read.parquet(s"$dir/lineitem.parquet").cache()
    val full = CoOccur.pairCounts(li, "l_orderkey", "l_suppkey")
    // simulate an artifact built before the odd orders existed, then
    // refreshed by merging the new orders' partial counts
    val base = CoOccur.pairCounts(
      li.filter(col("l_orderkey") % 2 === 0), "l_orderkey", "l_suppkey")
    val delta = CoOccur.pairCounts(
      li.filter(col("l_orderkey") % 2 =!= 0), "l_orderkey", "l_suppkey")
    val merged = GraphArtifact.mergePairCounts(base, delta)
    val m = rows(merged)
    assert(m == rows(full))
    assert(m.nonEmpty)
    // non-vacuous: some pairs really do straddle the two halves (their
    // counts only come out right because longs add exactly)
    val straddling = base.select(col("x"), col("y"))
      .intersect(delta.select(col("x"), col("y"))).count()
    assert(straddling > 0, "fixture too small: no pair spans both halves")
    li.unpersist(false)
  }

  test("derived frames refreshed from merged counts equal the from-scratch build") {
    val li = spark.read.parquet(s"$dir/lineitem.parquet").cache()
    val merged = GraphArtifact.mergePairCounts(
        CoOccur.pairCounts(li.filter(col("l_orderkey") % 2 === 0),
          "l_orderkey", "l_suppkey"),
        CoOccur.pairCounts(li.filter(col("l_orderkey") % 2 =!= 0),
          "l_orderkey", "l_suppkey"))
      .localCheckpoint(true)
    // thresholded edges and BFS labels are functions of the pair table;
    // after a merge they are re-derived, and must equal from-scratch
    val labelsRefreshed = GraphQueries.bfsLabelsFrom(
      GraphQueries.suppEdgesFrom(merged))
    val labelsScratch = graft.SparkEntry.queries("graph_bfs")(spark, dir)
    assert(rows(labelsRefreshed) == rows(labelsScratch))
    Checkpoints.release(merged, labelsRefreshed)
    li.unpersist(false)
  }
}

package graft.ops

import graft.TestSpark
import graft.queries.GraphQueries
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Maintenance proofs for the materialized walk-corpus artifact
  * (round-11 verdict #4, the Rollup-partials pattern for walks):
  *
  *  1. store → load → reader produces the contract queries' EXACT bits
  *     (so a consumer off the artifact stays oracle-exact transitively
  *     through the Verify gate);
  *  2. the corpus is split-invariant over start nodes — walks(A ∪ B) ≡
  *     walks(A) ∪ walks(B) on the same graph — which is what makes
  *     incremental append (WalkCorpus.walksForNew for nodes added since
  *     the artifact was built) exact rather than approximate.
  */
class WalkCorpusSpec extends AnyFunSuite {
  import TestSpark._

  private val dir = "/root/testdata/sf0.001"

  private def rows(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq).toSet

  test("readers off the persisted artifact equal the contract queries bit-for-bit") {
    val path = "/tmp/walk_corpus_spec"
    val corpus = graft.SparkEntry.queries("graph_walks")(spark, dir)
    WalkCorpus.store(corpus, path)
    val loaded = WalkCorpus.load(spark, path)

    val wantSg = rows(graft.SparkEntry.queries("walk_skipgrams")(spark, dir))
    val gotSg = rows(GraphQueries.walkSkipgramsFrom(loaded))
    assert(gotSg == wantSg)

    val wantVs = rows(graft.SparkEntry.queries("walk_visit_stats")(spark, dir))
    val gotVs = rows(GraphQueries.walkVisitStatsFrom(loaded,
      GraphQueries.suppDir(spark, dir)))
    assert(gotVs == wantVs)
  }

  test("corpus is split-invariant over start nodes (incremental append is exact)") {
    val g = GraphQueries.suppDir(spark, dir).cache()
    val nodes = g.select(col("x").as("node")).distinct()
    val full = RandomWalk.walks(g, nodes, GraphQueries.WalkSteps)
    // simulate an artifact built before the odd nodes existed, then
    // refreshed for them with walksForNew on the same graph
    val evens = nodes.filter(col("node") % 2 === 0)
    val odds = nodes.filter(col("node") % 2 =!= 0)
    val base = RandomWalk.walks(g, evens, GraphQueries.WalkSteps)
    val appended = WalkCorpus.walksForNew(g, odds, GraphQueries.WalkSteps)
    val merged = rows(base.unionByName(appended))
    assert(merged == rows(full))
    assert(merged.nonEmpty)
    g.unpersist(false)
    Checkpoints.release(full, base, appended)
  }
}

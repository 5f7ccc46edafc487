package graft

import org.scalatest.funsuite.AnyFunSuite

/** Storage-hygiene guards (round-5 finding): contract queries must not
  * leave cached blocks behind after they materialize — in a 121-query
  * Verify/Bench session leaked caches accumulate for the driver's
  * lifetime. Queries that legitimately persist mid-plan (pagerank,
  * triangle_count) must release those caches before returning, leaving at
  * most their own result-sized localCheckpoint behind.
  */
class CacheHygieneSpec extends AnyFunSuite {
  import TestSpark._

  private val dir = "/root/testdata/sf0.001"

  /** Runs the query to completion and returns the persistent-RDD delta
    * (ids present after that were not present before). */
  private def persistedAfter(name: String): Set[Int] = {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet.toSet
    SparkEntry.queries(name)(spark, dir).write.format("noop").mode("overwrite").save()
    sc.getPersistentRDDs.keySet.toSet -- before
  }

  test("lead_lag, pairs_spread, corr_matrix, rfm_segments and graph_assortativity leave no cached blocks") {
    // graph_assortativity caches the symmetrized edge frame (3 plan
    // references) but collects its 1-row result and releases everything.
    for (q <- Seq("lead_lag", "pairs_spread", "corr_matrix", "rfm_segments",
        "graph_assortativity")) {
      val leaked = persistedAfter(q)
      assert(leaked.isEmpty, s"$q left persistent RDDs behind: $leaked")
    }
  }

  test("walk family and link_prediction leave at most one result-sized checkpoint") {
    // Round-10 verdict finding: the walkers unioned every per-step
    // localCheckpoint into the result (steps+1 surviving block sets) and
    // linkPrediction's Dataset.unpersist was a CacheManager no-op on its
    // pc/edges checkpoints. Both now release through Checkpoints.release;
    // the one legitimate survivor is the checkpointed result (for
    // walk_skipgrams: the walk corpus its lazy result reads from).
    // walk_visit_stats returns a lazy frame over the graphWalks corpus
    // checkpoint (same single-survivor discipline as walk_skipgrams).
    for (q <- Seq("graph_walks", "graph_walks_biased", "walk_spectral",
        "walk_embed_k", "walk_skipgrams", "walk_visit_stats",
        "link_prediction")) {
      val sc = spark.sparkContext
      val before = sc.getPersistentRDDs.keySet.toSet
      SparkEntry.queries(q)(spark, dir).write.format("noop").mode("overwrite").save()
      val after = sc.getPersistentRDDs.view.filterKeys(!before.contains(_)).toMap
      assert(after.size <= 1,
        s"$q left more than its result checkpoint behind: ${after.keySet}")
      after.values.foreach { rdd =>
        assert(rdd.partitions.length <= spark.sparkContext.defaultParallelism * 2,
          s"$q left a large persisted RDD (${rdd.partitions.length} partitions)")
      }
    }
  }

  test("pagerank, triangle_count, market_basket, lm_fluency release their mid-plan caches") {
    for (q <- Seq("pagerank", "triangle_count", "market_basket", "lm_fluency")) {
      val sc = spark.sparkContext
      val before = sc.getPersistentRDDs.keySet.toSet
      SparkEntry.queries(q)(spark, dir).write.format("noop").mode("overwrite").save()
      val after = sc.getPersistentRDDs.view.filterKeys(!before.contains(_)).toMap
      // the result localCheckpoint may remain (node-sized / one row);
      // the edge-list and degree caches must be gone
      assert(after.size <= 1,
        s"$q left more than its result checkpoint behind: ${after.keySet}")
      // and nothing big: every surviving block set is the tiny result
      after.values.foreach { rdd =>
        assert(rdd.partitions.length <= spark.sparkContext.defaultParallelism * 2,
          s"$q left a large persisted RDD (${rdd.partitions.length} partitions)")
      }
    }
  }
}

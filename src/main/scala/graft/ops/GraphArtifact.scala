package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Materialized graph-frame artifact — the [[WalkCorpus]] pattern for
  * the REST of the graph family (round-13 verdict #1): every member
  * (triangles, link prediction, k-core, communities, assortativity,
  * BFS/closeness/harmonic, PageRank, degree distribution) re-derives
  * the same two co-occurrence pair tables and, for the BFS trio, the
  * same hub-distance labels — the slowest bench family by far, ~2-3.8 s
  * per query at sf0.1 almost entirely re-paying shared frames. Build
  * them ONCE, persist, and let consumers read the artifact.
  *
  * What is stored (all exact longs — parquet round-trips are
  * bit-lossless, so consumers stay oracle-exact transitively):
  *  - `supp_pairs`:  UNTHRESHOLDED supplier co-occurrence pair counts
  *    (x, y, c), x < y — both the MinCo edge filter (triangles, BFS,
  *    assortativity, PageRank, degree_dist) and link_prediction's
  *    decile threshold derive from it, so one table serves both rules;
  *  - `part_pairs`:  the part-dimension twin (k-core, communities);
  *  - `bfs_labels`:  the seeded-BFS hub-distance map (supp_id, hops,
  *    nearest_seed) — graph_bfs IS this frame, closeness/harmonic are
  *    one aggregate over it.
  *
  * Why incremental append is exact (not approximate): co-occurrence
  * pairs live entirely WITHIN one group (order) — a pair row never
  * spans two orders — so over disjoint order sets A and B,
  * `pairCounts(A ∪ B) ≡ mergePairCounts(pairCounts(A), pairCounts(B))`
  * holds as exact long addition (GraphArtifactSpec proves the split
  * invariance bit for bit). New orders therefore extend the artifact by
  * merging their partial counts — the same touch-one-day economics as
  * Rollup.mergeHourly; no history re-scan. The caveat is DERIVED
  * frames: thresholded edges and BFS labels are cheap functions of the
  * pair table (edge-list-sized, not fact-sized) but NOT incrementally
  * mergeable themselves — after a merge, re-derive them from the
  * refreshed counts ([[graft.queries.GraphQueries]] exposes the exact
  * `*From` bodies; the spec proves refresh ≡ rebuild).
  */
object GraphArtifact {

  /** Persist the three frames under `path` (parquet subdirectories).
    * Plain unpartitioned parquet on purpose: every consumer's first
    * move is a (x, y)- or node-keyed shuffle/aggregate of its own, and
    * the tables are edge-list-sized (orders of magnitude below fact
    * scale), so layout tuning buys nothing here. */
  def store(suppPairs: DataFrame, partPairs: DataFrame,
            bfsLabels: DataFrame, path: String): Unit = {
    suppPairs.write.mode("overwrite").parquet(s"$path/supp_pairs")
    partPairs.write.mode("overwrite").parquet(s"$path/part_pairs")
    bfsLabels.write.mode("overwrite").parquet(s"$path/bfs_labels")
  }

  def loadSuppPairs(s: SparkSession, path: String): DataFrame =
    s.read.parquet(s"$path/supp_pairs")

  def loadPartPairs(s: SparkSession, path: String): DataFrame =
    s.read.parquet(s"$path/part_pairs")

  def loadBfsLabels(s: SparkSession, path: String): DataFrame =
    s.read.parquet(s"$path/bfs_labels")

  /** Merge pair-count partials built over DISJOINT group sets: one
    * union + one (x, y)-keyed exact long sum. Counts are exact
    * integers, integer addition is associative and commutative, so the
    * merged table is bit-identical to a from-scratch build over the
    * union of the groups (the append-exactness contract above). */
  def mergePairCounts(partials: DataFrame*): DataFrame = {
    require(partials.nonEmpty)
    partials.reduce(_.unionByName(_))
      .groupBy(col("x"), col("y"))
      .agg(sum(col("c")).as("c"))
  }
}

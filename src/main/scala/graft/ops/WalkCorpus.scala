package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Materialized walk-corpus artifact — the Rollup-partials pattern for
  * the walk family (round-11 verdict #4): the (walk_id, step, node)
  * corpus [[RandomWalk.walks]] builds is the shared ~3 s input that
  * every downstream consumer (skip-grams, spectral, embed_k,
  * visit-stats) re-paid under bench isolation. Build it ONCE, persist
  * it, and let consumers read the artifact; refresh it INCREMENTALLY as
  * the graph gains nodes.
  *
  * Why incremental append is exact (not approximate): each walk is
  * fully determined by its walk_id and the graph — the seeded draw is
  * `md5("<prefix>:<walk_id>:<t>")` (RandomWalk.draw48), independent of
  * every other walk — so on the same edge frame
  * `walks(dir, A ∪ B) ≡ walks(dir, A) ∪ walks(dir, B)` bit for bit
  * (WalkCorpusSpec proves the split invariance). A corpus artifact can
  * therefore be extended for NEW start nodes by unioning
  * `walks(dir, newNodes)` without touching history — the same
  * touch-one-day-not-three-years economics as Rollup.mergeHourly. The
  * caveat is the graph itself: an append is exact only while the edge
  * frame is unchanged for the appended walks; if EXISTING nodes gain
  * edges, their walks must be rebuilt (drop + re-append those
  * walk_ids — walk_id = start node makes the invalidation set easy to
  * compute). [[graft.streaming.StatefulWalk]] covers the other axis
  * (extending walk LENGTH), proven prefix-equal in its spec.
  *
  * Consumers stay oracle-exact off the artifact transitively:
  * GraphQueries.walkSkipgramsFrom / walkVisitStatsFrom produce the
  * contract queries' exact bits from a loaded corpus (WalkCorpusSpec),
  * and the contract queries are hash-exact against their DuckDB twins
  * (the Verify gate).
  */
object WalkCorpus {

  /** Persist a built corpus as the parquet artifact consumers read.
    * Partitioned by nothing on purpose: the corpus is walk_id-keyed and
    * every consumer's first move is either a walk_id-keyed self-join or
    * a node-keyed aggregate — a plain parquet round-trip preserves the
    * exact long rows, and the consumer's own shuffle lands wherever its
    * key needs it. */
  def store(corpus: DataFrame, path: String): Unit =
    corpus.write.mode("overwrite").parquet(path)

  def load(s: SparkSession, path: String): DataFrame =
    s.read.parquet(path)

  /** Walks for start nodes ADDED since the artifact was built, on the
    * current edge frame — union with the loaded artifact for the
    * refreshed corpus (exact by the split invariance above). */
  def walksForNew(dir: DataFrame, newNodes: DataFrame, steps: Int,
                  seedPrefix: String = "walk"): DataFrame =
    RandomWalk.walks(dir, newNodes, steps, seedPrefix)
}

package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** The `Adaptive.forceDistributed` knob (graft.force.distributed /
  * SPARK_GRAFT_FORCE_DISTRIBUTED) must flip every size-adaptive operator
  * onto its distributed branch THROUGH THE CONTRACT QUERIES — not just
  * when a spec passes explicit thresholds. The affected queries'
  * distributed twins are bit-identical by construction (exact-long
  * walks, global-row-number ntile, prefix sums), so forcing must not
  * change a single output bit; dedup_embed is the one exception — its
  * forced form is a DIFFERENT contract (maxBucket=4, mirrored in the
  * oracle), pinned here against the explicit-parameter call.
  *
  * The full-scale proof runs out of band (docs/SCALE.md): a complete
  * Verify + DuckDB check_oracle pass at sf0.1 with
  * SPARK_GRAFT_FORCE_DISTRIBUTED=1 — this spec pins the knob's plumbing
  * so that proof stays reproducible.
  */
class ThresholdForcingSpec extends AnyFunSuite {
  import TestSpark._

  private val dir = "/root/testdata/sf0.001"

  /** Engine-order-free canonical form with full double bit fidelity. */
  private def canon(v: Any): Any = v match {
    case d: Double => java.lang.Double.doubleToLongBits(d)
    case f: Float => java.lang.Float.floatToIntBits(f)
    case r: org.apache.spark.sql.Row => r.toSeq.map(canon)
    case s: scala.collection.Seq[_] => s.map(canon)
    case m: scala.collection.Map[_, _] =>
      m.map { case (k, x) => (canon(k), canon(x)) }.toSeq.sortBy(_.toString)
    case b: Array[Byte] => b.toSeq
    case x => x
  }

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(r => canon(r).toString).sorted.toSeq

  private def forced[A](body: => A): A = {
    sys.props("graft.force.distributed") = "1"
    try body finally sys.props -= "graft.force.distributed"
  }

  test("threshold helper honors the override") {
    assert(ops.Adaptive.threshold(123L) == 123L)
    forced {
      assert(ops.Adaptive.forceDistributed)
      assert(ops.Adaptive.threshold(123L) == -1L)
    }
    assert(!ops.Adaptive.forceDistributed)
  }

  // Every contract query whose plan crosses an adaptive flip
  // (Ranks.ntileByRange / runningSumByRange, ConnectedComponents.clusters,
  // GraphQueries.pagerank) — both branches are bit-identical, so the
  // forced run must match the fast-path run bit for bit.
  private val bitIdentical = Seq(
    "pagerank",            // driver replay vs distributed long-grid loop
    "dedup_clusters",      // driver union-find vs min-label propagation
    "curation_report",     // clusters inside the composed doc pipeline
    "rfm_segments",        // 3× ntileByRange window vs two-pass range
    "ntile_bins",          // partitioned window — must be flip-inert
    "session_concurrency", // runningSumByRange window vs two-pass range
    "seq_packing",         // runningSumByRange over doc_id order
    "vocab_growth",        // 2× runningSumByRange in TextOps
    "epoch_shuffle",       // rowNumberByRange window vs two-pass range
    "global_quantiles",    // rowNumberByRange rank-selection picks
    "quality_dup",         // ntileByRange quality quintiles
    "entity_clusters",     // ConnectedComponents inside record linkage
    "graph_communities",   // ConnectedComponents + community aggregates
    "mmr_diversify",       // driver greedy vs per-round distributed argmax
    "kendall_tau",         // driver groupCounts vs two-pass Knight split
    "graph_bfs",           // r17 driver min-code replay vs relaxation loop
    "graph_closeness",     // BFS labels consumed by the catchment profile
    "graph_harmonic",      // BFS labels consumed by harmonic centrality
    "kcore",               // r17 driver peel replay vs per-round semi-joins
    "bpe_merges",          // r17 driver round replay vs per-round agg+argmax
    "bpe_tokenize",        // same trajectory feeding the count report
    "bpe_eval"             // train-side replay under the held-out apply
  )

  for (name <- bitIdentical)
    test(s"$name is bit-identical with distributed branches forced") {
      val fast = rows(SparkEntry.queries(name)(spark, dir))
      val dist = forced(rows(SparkEntry.queries(name)(spark, dir)))
      assert(fast.nonEmpty, s"$name returned no rows at sf0.001")
      assert(dist == fast)
    }

  test("dedup_embed under forcing equals the explicit maxBucket=4 contract") {
    val v = queries.VecQueries.vecs(spark, dir)
    val expected = rows(ops.Similarity.cosineNearDupPairsAuto(
      v, targetBucketRows = 8, maxBucket = 4))
    val dist = forced(rows(SparkEntry.queries("dedup_embed")(spark, dir)))
    assert(dist == expected)
    // and the capped pair set is a subset of the uncapped contract run
    val full = rows(SparkEntry.queries("dedup_embed")(spark, dir))
    assert(dist.toSet.subsetOf(full.toSet))
  }
}

package graft

import graft.queries._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan shape guards for the scale claims in docs/SCALE.md —
  * these assert the PLAN, not the output, so a regression that keeps
  * results correct but degrades the 100 TB story (an extra shuffle, a
  * window sort where a hash aggregate should be, a sort-merge join where
  * a broadcast belongs) fails loudly. Runs against the sf0.001 fixtures.
  */
class PlanShapeSpec extends AnyFunSuite {
  import TestSpark._

  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("ohlc_bars aggregates with map-side partials and no Window pass") {
    val p = plan("ohlc_bars")
    assert(!p.contains("Window"), "OHLC must not use a window sort")
    assert(p.contains("partial_min_by"),
      "OHLC must partial-aggregate map-side (shuffle carries partial states, not ticks)")
  }

  test("triangle_count joins stay broadcast (no sort-merge join)") {
    // inspect the lazy frame: the contract query eagerly checkpoints the
    // one-row summary (cache hygiene), which hides the join shape
    val (edges, lazyOut) = queries.GraphQueries.trianglesLazy(spark, dir)
    val p = try lazyOut.queryExecution.executedPlan.toString
            finally edges.unpersist(false)
    assert(!p.contains("SortMergeJoin"),
      "wedge/closure joins must broadcast the thresholded edge list")
    assert(p.contains("BroadcastHashJoin"), "expected broadcast wedge joins")
  }

  test("market_basket: one typed grouped pass, broadcast dictionaries, no shuffled join") {
    // inspect the lazy frame (same reason as triangle_count: the contract
    // query's eager checkpoint hides the join shape behind an RDD scan)
    val (tagged, lazyOut) = queries.BasketQueries.marketBasketLazy(spark, dir)
    val p = try lazyOut.queryExecution.executedPlan.toString
            finally tagged.unpersist(false)
    assert(p.contains("MapGroups"),
      "pair generation must be the typed per-basket grouped pass (no distinct + self-join)")
    assert(!p.contains("SortMergeJoin"),
      "dictionary joins must broadcast, never shuffle the pair table")
    assert("BroadcastHashJoin".r.findAllIn(p).size == 2,
      s"both item-dictionary joins must broadcast, got:\n$p")
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_partkey:bigint>"),
      "the lineitem scan must prune to the two basket columns")
  }

  test("dedup_substring: two shuffles (gram md5 + doc-local merge), pruned scan") {
    // ExactSubstr's inherent shape: Σchars window rows shuffled ONCE on
    // the gram hash for the global occurrence count, then ONE doc-keyed
    // exchange shared by both island windows AND the span aggregate (no
    // extra exchange before the groupBy — it is already doc-partitioned).
    val p = plan("dedup_substring")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges == 2, s"dedup_substring must shuffle exactly twice, saw $exchanges:\n$p")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      "the documents scan must prune to doc_id + text")
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastNestedLoopJoin"),
      "no joins belong in this plan")
  }

  test("salted_agg runs the two-phase combine (exactly 2 shuffles)") {
    val p = plan("salted_agg")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges == 2, s"salted aggregation must shuffle exactly twice, saw $exchanges:\n$p")
  }

  test("the tick pipeline shares one Exchange across all its windows") {
    val p = plan("sma_signals")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges == 1, s"all rolling windows must share one shuffle, saw $exchanges")
  }

  test("rel_star_join broadcasts every dimension (single fact shuffle at most)") {
    val p = plan("rel_star_join")
    assert(!p.contains("SortMergeJoin"), "dimensions must broadcast")
  }

  test("fuzzy_match broadcasts the name dictionary and prunes the part scan to p_name") {
    val df = SparkEntry.queries("fuzzy_match")(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("SortMergeJoin"), "the distinct-name dictionary must broadcast")
    val scans = df.queryExecution.executedPlan.collectLeaves().map(_.toString)
    val part = scans.find(_.contains("part.parquet")).getOrElse(fail("no part scan"))
    assert(part.contains("p_name") && !part.contains("p_retailprice"),
      "the linkage scan must read only the name column")
  }

  test("rel_above_avg broadcasts the per-customer aggregate (fact never shuffles for the join)") {
    val p = plan("rel_above_avg")
    assert(!p.contains("SortMergeJoin"),
      "the decorrelated per-key aggregate must broadcast onto the fact scan")
    assert(p.contains("BroadcastHashJoin"))
  }

  test("spread_stats is a single hash aggregate (one shuffle, no window, no join)") {
    val p = plan("spread_stats")
    assert(!p.contains("Window") && !p.contains("Join"))
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges == 1, s"expected one aggregate shuffle, saw $exchanges")
  }

  test("indicator folds shuffle once (repartition + in-partition sort, no extra Exchange)") {
    val p = plan("rsi")
    val exchanges = "Exchange".r.findAllIn(p).size
    assert(exchanges == 1, s"the secondary-sort fold must shuffle exactly once, saw $exchanges:\n$p")
  }

  test("rel_topk_per_group pushes the rank limit below the shuffle (WindowGroupLimit × 2)") {
    val p = plan("rel_topk_per_group")
    val limits = "WindowGroupLimit".r.findAllIn(p).size
    assert(limits == 2,
      s"expected partial+final rank pushdown (shuffle carries ≤k rows/group), saw $limits:\n$p")
  }

  test("vpin's sign chain, volume clock, and bucket aggregate share one Exchange") {
    val p = plan("vpin")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges == 1,
      s"the (product_id, bucket) aggregate must reuse the sign-chain partitioning, saw $exchanges:\n$p")
  }

  test("latency_metrics reuses the gap window's Exchange for the hourly aggregate") {
    val p = plan("latency_metrics")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges == 1,
      s"(event_type, hour) grouping must reuse hashpartitioning(event_type), saw $exchanges:\n$p")
  }

  test("forward_labels runs the union as-of shape: 2 Exchanges, 1 Window, no join") {
    val p = plan("forward_labels")
    assert(!p.contains("Join"), "forward as-of must not plan a join")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges == 2, // uniq aggregate + the union window
      s"expected the dedup aggregate + one union window shuffle, saw $exchanges:\n$p")
  }

  test("rfm_segments takes the dimension window path on small stats, two-pass above") {
    // ntileByRange flips on plan stats (RanksSpec proves both paths are
    // bit-identical). At fixture scale the customer frame is
    // dimension-sized: the RIGHT plan is the plain window chain — one
    // task over a frame that fits in one task, no range sampling jobs.
    val p = plan("rfm_segments")
    assert(p.contains("ntile"),
      "dimension-sized RFM should plan the plain window ntile")
    // the scale path must stay reachable: forced past the cutoff, the
    // same rank runs range-partitioned with no single-partition sort.
    // The range exchange lives inside the eager checkpoint that pins ONE
    // evaluation under both passes (RanksForcedScaleSpec — boundary
    // re-sampling bug), so the returned plan is a codegen project over
    // the checkpoint scan; the range layout survives as the RDD's
    // partitioning (asserted in RanksSpec's partition-shape test too).
    val forcedDf = graft.ops.Ranks.ntileByRange(
      spark.range(1000).toDF("id"), Seq(col("id")), 5, "t", smallBytes = -1)
    val forced = forcedDf.queryExecution.executedPlan.toString
    assert(!forced.contains("ntile") && forced.contains("ExistingRDD"),
      s"forced two-pass must project over the pinned range layout, got:\n$forced")
    assert(forcedDf.rdd.getNumPartitions ==
      spark.sessionState.conf.numShufflePartitions,
      "forced two-pass must keep the range partitioning (no one-task sort)")
  }

  test("dedup_embed streams bucket groups: no collect_list row, one Exchange") {
    val p = plan("dedup_embed")
    assert(!p.contains("collect_list"),
      "a bucket must never materialize as one collect_list row (2 GB row cap at scale)")
    val exchanges = "Exchange".r.findAllIn(p).size
    assert(exchanges == 1,
      s"pair generation must shuffle once (repartition by bucket), saw $exchanges:\n$p")
  }

  test("source_overlap broadcasts the per-source size table, word join has no cartesian") {
    val p = plan("source_overlap")
    assert(p.contains("BroadcastHashJoin"),
      "the source-count-sized vocabulary-size table must broadcast")
    assert(!p.contains("CartesianProduct"),
      "the pair join must stay word-keyed, never cartesian")
  }

  test("vocab_growth collapses the word fan-out with map-side partials, no cartesian") {
    val p = plan("vocab_growth")
    assert(p.contains("partial_min") || p.contains("partial_count"),
      "the distinct-word first-seen aggregate must combine map-side")
    assert(!p.contains("CartesianProduct"))
  }

  test("parquet scans prune columns: the lineitem quantile scan reads only what it needs") {
    val df = SparkEntry.queries("rel_quantiles")(spark, dir)
    val scans = df.queryExecution.executedPlan.collectLeaves().map(_.toString)
    val li = scans.find(_.contains("lineitem")).getOrElse(fail("no lineitem scan"))
    assert(li.contains("l_returnflag") && li.contains("l_extendedprice"))
    assert(!li.contains("l_comment") && !li.contains("l_shipdate"),
      "unused wide columns must be pruned from the scan")
  }

  test("no query window uses an UnboundedFollowing frame (O(n²) per hot partition)") {
    // Spark executes [current row, unbounded following) frames by
    // re-aggregating the remaining partition FOR EVERY ROW — ~10¹²
    // row-ops on the zipf tier's 1.7M-row hot key (the round-13
    // asof_nearest incident: >17 min vs 52 s for the whole tier after
    // the reversed-sort rewrite). The look-ahead queries are the ones
    // that historically reached for this frame; guard their plans so
    // the O(n) reversed-running-last form can't silently regress.
    for (name <- Seq("asof_nearest", "forward_labels", "attribution")) {
      val p = SparkEntry.queries(name)(spark, dir)
        .queryExecution.optimizedPlan.toString.toLowerCase
      assert(!p.contains("unboundedfollowing"),
        s"$name must not use an UnboundedFollowing window frame")
    }
  }
}

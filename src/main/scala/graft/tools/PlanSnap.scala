package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Physical-plan snapshot regression harness (docs/SCALE.md).
  *
  * [[PlanSnap.skeleton]] reduces an executed plan to a stable operator
  * skeleton — tree shape + operator names only, with expression IDs,
  * codegen stage numbers, paths, and statistics stripped — so an added
  * Exchange / a join-strategy flip / a lost WholeStageCodegen span fails
  * `PlanRegressionSpec` at build time instead of surfacing as a bench
  * regression a round later. Alias renames and literal tweaks do NOT
  * trip it: only the operator tree does.
  *
  * Golden files: `src/test/resources/plans/<query>.plan`, captured on
  * the sf0.001 fixtures (plan shapes are stats-adaptive; the snapshot
  * pins the fixture-scale plan, PlanShapeSpec pins the scale-path
  * invariants that must hold at ANY size).
  *
  * Regenerate after a DELIBERATE plan change:
  *   sbt "runMain graft.tools.PlanSnap"            # rewrite all
  *   sbt "runMain graft.tools.PlanSnap q1 q2 ..."  # rewrite a subset
  * then eyeball `git diff src/test/resources/plans` before committing.
  */
object PlanSnap {

  /** The headline queries whose plans are pinned — one per pipeline
    * family, covering every operator class the 100 TB story leans on. */
  val Headline: Seq[String] = Seq(
    "sma_signals",     // shared-Exchange rolling-window chain
    "positions",       // fused join-free signal→position pipeline
    "metrics_5m",      // windowed Det aggregate (partial/final hash agg)
    "rollup_hourly",   // continuous-aggregate rollup over metrics
    "ohlc_bars",       // min_by/max_by hash aggregate, no window sort
    "vpin",            // sign chain + volume clock on one Exchange
    "dedup_minhash",   // shingle→minhash→band→bucket-join
    "dedup_embed",     // SRP bucket repartition + streaming pair gen
    "embed_topk",      // broadcast brute-force cosine top-k
    "embed_lsh_multi", // multi-table SRP ANN (explode + bucket join)
    "rel_star_join",   // broadcast star join
    "curation_report", // the big composed doc pipeline
    // Round-6 widening: one pin per remaining scale-critical shape.
    "asof_join",         // backward as-of via union + window carry
    "range_join",        // band-join shape
    "dedup_jaccard",     // postings self-join under the maxDf cap
    "market_basket",     // basket self-join + broadcast item dictionary
    "rfm_segments",      // ntileByRange's dimension (window) path
    "sessions",          // sessionization gap→id window chain
    "gapfill",           // grid generate + last-value forward fill
    "momentum_ranks",    // two orthogonal window Exchanges
    "lead_lag",          // aligned-pair grid + whole-series window
    "rel_distinct_agg",  // expand-based multi-distinct aggregate
    "rel_topk_per_group",// per-group rank under a partial top-k
    "embed_ivf",         // broadcast codebook argmin probe
    // Driver-round-7 widening: PQ read path and the quota-sample shape.
    "pq_adc_topk",       // shuffle-free ADC scan + per-query partial top-k
    "cluster_sample",    // WindowGroupLimit quota under the argmin probe
    // Driver-round-7 curation additions.
    "repetition_stats",  // doc-local typed map — pin proves ZERO shuffle
    "importance_weights",// word-agg broadcast + scalar totals (no re-agg)
    "zorder_layout",     // scan → 32-term bit project → one hash agg
    // Driver round 7, late batch (new operator families).
    "bow_cosine",        // inverted-index sparse scorer: broadcast qtf +
                         // (qid, doc)-keyed dot aggregate + norm join
    "dedup_containment", // shared pairCounts postings under the maxDf cap
    "lexical_diversity", // doc-local typed map — pin proves ZERO shuffle
    "kmv_distinct",      // one distinct exchange + per-key bottom-k window
    "ngram_novelty",     // inverted min-aggregate + doc-keyed recount
    "knn_graph",         // bucket equi-SELF-join, no broadcast side
    "countmin_words",    // fixed-size counter aggregate + top-k probe join
    // Driver round 7, closing batch.
    "embed_jl",          // JL projection — pin proves ZERO shuffle (17
                         // grid kernels inside one scan-side codegen span)
    "cluster_quality",   // codebook argmin (no join) + id equi-join +
                         // |clusters|-sized aggregate
    "epoch_shuffle",     // rowNumberByRange window path at fixture scale
    "shingle_profile",   // inverted-index df agg + log2-bucket re-agg
    "dollar_bars",       // one keyed Exchange: prefix clock + pick agg
    "dedup_verify",      // LSH pair frame + two id-keyed text joins
    "global_quantiles",  // rank selection: filter + one-row aggregate
    "rolling_beta",      // gapfill + two orthogonal window Exchanges
    "variance_ratio",    // one multi-lag window + one agg + q-arm explode
    "ks_drift",          // dense ECDF grid + per-value pair join
    // hurst_rs is NOT pinned: its eager output checkpoint (hygiene for
    // the shared grid checkpoint) reduces the observable plan to an RDD
    // scan — a 1-op pin asserts nothing.
    "lee_ready",         // one keyed window chain + hash aggregate
    "vol_signature",     // five rn-subsample arms off one window pass
    // Driver-round-8 additions. (Labels above follow the driver's round
    // counter; two builder sessions ran per driver round 7-8, which is
    // why older commits called these batches "round 8-11".)
    "seasonal_decompose",// gapfill + ONE keyed window pass (MA + lags) +
                         // hour-dimension aggregate
    "props_profile",     // single from_json map parse + explode + agg
    "session_paths",     // TakeOrdered top-k + rank on serving frame
    "kendall_corr",      // hash Exchange on instrument + per-group kernel
    "spearman_corr",     // gapfill + per-instant mkt window + rank windows
    "fifo_pnl",          // one keyed Exchange: secondary-sort queue fold
    "scd2_intervals",    // one keyed Exchange: change-row lead window
    "interval_overlap",  // start-bucket dedup band join
    // Driver-round-10 additions.
    "perceptron_auc",    // literal-weight margin agg + running-sum rank path
    "perceptron_pr_curve",// same + descending double running sum + broadcast total
    // Round-11: the walk family (the bench's most expensive queries).
    "walk_skipgrams",    // corpus self-join + PMI marginal joins (the
                         // corpus leaf is the walks checkpoint's RDD scan)
    // Round-13 continuation: retrieval-serving + layout + CDC shapes.
    "ivfpq_topk",        // IVFADC: ONE corpus scan (cell argmin + PQ +
                         // LUT sum fused map-side) + per-query top-k
    "rrf_fusion",        // bow arm (broadcast qtf) + vector arm + one
                         // full-outer SMJ on Q·depth rows + fused rank
    "hilbert_layout",    // typed-map bit kernel → one hash aggregate
    "cdc_upsert",        // window + snapshot agg sharing ONE user Exchange
    "theil_sen",         // hourly downsample + trailing-window rank +
                         // W²-bounded pair self-join + two rank picks
    "collocations",      // inverted bigram agg + broadcast marginals +
                         // two-pass range rank (no 1-partition window)
    // Round-14: adjudicating the r13 +18% bench delta (verdict #4) —
    // the pin rules out a silent plan flip behind any future drift.
    "simhash_hamming"    // 64-bit simhash + pigeonhole band self-join
    // ivf_sweep / hurst_rs / ndcg_eval / graph_walks* / walk_spectral /
    // link_prediction are NOT pinned as full queries: their eager output
    // checkpoints reduce the observable plan to an RDD scan — the
    // walk three pin their hot inner shape through Seams below instead.
  )

  /** Lazy plan-pin seams for checkpoint-hygienic queries whose contract
    * entry eagerly checkpoints its result (a full-query pin would
    * reduce to a 1-op RDD scan): name → (lazy frame, cleanup). The
    * frame is the query's hot inner shape over already-checkpointed
    * inputs — exactly the plan whose AQE strategy flip the round-10
    * verdict wanted caught (the biased walker's distance-1 probe). */
  val Seams: Map[String, (SparkSession, String) =>
      (org.apache.spark.sql.DataFrame, () => Unit)] = Map(
    "graph_walks_step" -> // frontier ⨝ deg ⨝ indexed-nbr uniform step
      ((s, d) => graft.queries.GraphQueries.walkStepLazy(s, d)),
    "graph_walks_biased_step" -> // candidate expansion + BROADCAST
      // distance-1 probe + one walk_id Exchange for both window sums
      ((s, d) => graft.queries.GraphQueries.biasedStepLazy(s, d)),
    "walk_spectral_round" -> // SpMV: cab ⨝ iterate + row-keyed agg
      ((s, d) => graft.queries.GraphQueries.spectralRoundLazy(s, d)),
    "link_prediction_scored" -> // wedge self-join + anti-join + degree joins
      ((s, d) => {
        val (cks, frame) = graft.queries.GraphQueries.linkPredictionLazy(s, d)
        (frame, () => graft.ops.Checkpoints.release(cks: _*))
      }))

  val SnapshotDir = "src/test/resources/plans"

  /** Stable operator skeleton of an executed-plan string: per line keep
    * the tree-drawing indentation and the operator name; drop expression
    * IDs, codegen stage ids, subquery ids, paths, pushed-filter dumps,
    * and the trailing detail sections `toString` appends after the tree
    * (`(1) Scan parquet` blocks, reused-exchange tables). */
  def skeleton(plan: String): String = {
    val opLine = """^([\s:+\-]*)(?:\*\(\d+\)\s*)?([A-Za-z][A-Za-z0-9]*)""".r
    plan.linesIterator
      .takeWhile(l => l.nonEmpty)       // tree section ends at first blank
      .flatMap { line =>
        opLine.findPrefixMatchOf(line).map { m =>
          // normalize ":  +-" vs "   +-" connector variants to plain depth
          val depth = m.group(1).replaceAll("[^\\s]", " ")
          s"$depth${m.group(2)}"
        }
      }
      .mkString("\n")
  }

  def capture(spark: SparkSession, name: String, dir: String): String =
    if (Seams.contains(name)) {
      val (frame, cleanup) = Seams(name)(spark, dir)
      try skeleton(frame.queryExecution.executedPlan.toString)
      finally cleanup()
    } else skeleton(SparkEntry.queries(name)(spark, dir)
      .queryExecution.executedPlan.toString)

  def main(args: Array[String]): Unit = {
    val names =
      if (args.nonEmpty) args.toSeq else Headline ++ Seams.keys.toSeq.sorted
    // MUST match graft.TestSpark's session config — PlanRegressionSpec
    // compares against snapshots captured here.
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val out = java.nio.file.Paths.get(SnapshotDir)
    java.nio.file.Files.createDirectories(out)
    names.foreach { n =>
      val s = capture(spark, n, "/root/testdata/sf0.001")
      java.nio.file.Files.writeString(out.resolve(s"$n.plan"), s + "\n")
      println(s"[plansnap] wrote $n (${s.linesIterator.size} ops)")
    }
    spark.stop()
  }
}

package graft.queries

import graft.config.StrategyConfig
import graft.ops._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Driver-verifiable queries for the tick/signals pipeline (SURVEY §2.2-2.8)
  * over `events.parquet` mapped to the reference's tick schema
  * (FIXTURES.md §7: user_id→product_id, ts→event_time, value→price,
  * event_id→sequence). Synthetic best_bid/best_ask = value ∓ 0.1% except on
  * 'error' rows (NULL), so both branches of the mid-price CASE
  * (sma_cross.py:67-70) are exercised.
  *
  * Each query has a DuckDB oracle twin built from the SAME StrategyConfig
  * constants. Output doubles are rounded to 6 dp on BOTH sides: per-row
  * arithmetic is bit-identical across engines, but windowed/grouped
  * aggregates (AVG/STDDEV_POP) legitimately differ in the last ulps because
  * the two engines combine partials in different orders; rounding pins the
  * contract to a deterministic grid without touching library semantics
  * (the graft.ops functions themselves return full-precision values).
  */
object TickQueries {

  val cfg: StrategyConfig = StrategyConfig()

  /** The reference's mock_breakout run profile
    * (configs/strategies/mock_breakout.json): fast=5 / slow=30. */
  val cfgBreakout: StrategyConfig = StrategyConfig(
    strategyRunId = "mock-breakout",
    smaFastWindow = 5, smaSlowWindow = 30, smaConfirmationWindow = 2)

  /** Variance-ratio horizons (grid hours) — shared by the Spark query and
    * its oracle twin. */
  private val VrQs = Seq(2, 4, 8)

  /** hurst_rs block lengths (grid hours) — shared Spark/oracle constant. */
  private val RsLens = Seq(32, 64, 128)

  /** vol_signature sampling intervals (grid hours) — shared constant. */
  private val SigDeltas = Seq(1, 2, 4, 8, 24)

  /** events.parquet → reference raw-tick shape.
    *
    * `ts` has shipped as both parquet TIMESTAMP(NANOS) — which Spark only
    * reads as a nanos Long (`spark.sql.legacy.parquet.nanosAsLong=true`,
    * set by Verify/Bench/tests; no sub-microsecond components, so
    * `div 1000` → timestamp_micros is exact) — and as TIMESTAMP(MICROS)
    * NTZ. Normalize both to the session-zone TIMESTAMP the pipeline
    * expects (`unix_micros` et al. reject NTZ); the session zone is UTC
    * everywhere, so the NTZ cast is value-preserving.
    */
  def ticks(s: SparkSession, dir: String): DataFrame = {
    // Defensive: a caller-supplied session (driver smoke test) may not
    // carry the flag; without it a TIMESTAMP(NANOS) read throws. The zone
    // pin keeps the NTZ→TIMESTAMP cast below value-preserving on non-UTC
    // hosts (NTZ values are reinterpreted in the session zone).
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.conf.set("spark.sql.session.timeZone", "UTC")
    val raw = s.read.parquet(s"$dir/events.parquet")
    val eventTime =
      if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
        expr("timestamp_micros(ts div 1000)")
      else col("ts").cast("timestamp")
    // price = value + 100: shifts the synthetic series into a realistic
    // price band (events.value has min 0.0; near-zero prices make
    // (mid−prev)/prev returns explode to ~1e13, a dynamic range no real
    // ticker exhibits and no fixed-point verification grid can hold).
    // The reference's prev_mid=0 NULL guard branch is covered by unit
    // tests instead (NormalizeSpec).
    raw
      .select(
        col("user_id").cast("string").as("product_id"),
        eventTime.as("event_time"),
        col("event_id").as("sequence"),
        (col("value") + lit(100.0)).cast("double").as("price"),
        when(col("event_type") =!= "error", (col("value") + lit(100.0)) * 0.999).as("best_bid"),
        when(col("event_type") =!= "error", (col("value") + lit(100.0)) * 1.001).as("best_ask")
      )
  }

  /** Replayed/backtest source (J3, sma_cross.py:43-52): the same stream
    * re-published one hour later with offset sequences.
    */
  def replayTicks(s: SparkSession, dir: String): DataFrame =
    ticks(s, dir)
      .withColumn("event_time", expr("timestampadd(HOUR, 1, event_time)"))
      .withColumn("sequence", col("sequence") + lit(10000000L))

  /** Snap every double output column to the 1e-6 grid (verify-contract
    * only). Uses Det.snap, not round(): round()'s half-way tie-breaking is
    * implementation-defined across engines, the IEEE snap is not.
    */
  def r6(df: DataFrame): DataFrame =
    df.select(df.schema.fields.map { f =>
      if (f.dataType == DoubleType) Det.snap(col(f.name), 6).as(f.name) else col(f.name)
    }.toIndexedSeq: _*)

  private def costs(s: SparkSession, dir: String): DataFrame =
    Positions.costs(Positions.stream(SmaCross.enrich(Normalize(ticks(s, dir)), cfg)), cfg)

  /** One price per (product_id, event_time) — AsofJoin/ASOF's documented
    * uniqueness precondition (a duplicate timestamp would make Spark's
    * window-last and DuckDB's ASOF pick nondeterministically). max() is the
    * deterministic tie-break, mirrored in [[uniqTicksSql]]. */
  private def uniqTicks(s: SparkSession, dir: String): DataFrame =
    ticks(s, dir)
      .groupBy(col("product_id"), col("event_time"))
      .agg(max(col("price")).as("price"))

  /** The standard filled hourly grid (price forward-filled, pre-price
    * rows dropped) shared by the grid family — seasonal, market-factor,
    * rank and long-memory queries. (r17: consolidated from 11 inline
    * copies; a raw-ticks bounds override was probed and found
    * plan-identical — Catalyst already prunes the dedup aggregate out
    * of the grid-bounds side, see GapFill's scaladoc.) */
  private def filledGrid(s: SparkSession, d: String): DataFrame =
    GapFill(uniqTicks(s, d),
      Seq("product_id"), "event_time", "1 hour",
      Seq("price" -> "price"), truncUnit = "hour")
      .filter(col("price").isNotNull)

  // r17 probed and REVERTED: a broadcast hour-mean shape for the
  // market-factor family (checkpoint the grid, groupBy(grid_ts) the
  // mean, broadcast-join it back — saving the full-grid Exchange onto
  // the hour key). Local reads: rolling_beta 1.19–1.27×, the
  // aggregate-tailed siblings 0.80–1.02× (wash). Rejected on the 100×
  // uniform tier (ScaleBench, same-day A/B at /tmp/sf100x): 85.1 s vs
  // 74.4 s reverted — the events replication extends the TIME SPAN
  // 100×, so the "hours-sized" broadcast side is ~7M rows (~110 MB
  // shipped to every executor) and the grid checkpoint writes ~105M
  // rows of blocks. The hour dimension grows with the span, which this
  // data model scales with volume: a structurally unbounded broadcast
  // for a ~0.3 s local win. Every consumer keeps the window-over-hour
  // form (one keyed Exchange, span-independent).

  /** Deterministic top-N instruments by filled-grid length (count DESC,
    * product_id) — the pick is instrument-DIMENSION-sized, so it is a
    * driver collect of per-product counts embedded back as literals.
    *
    * The non-null filled count per product is CLOSED-FORM from its tick
    * span — every tick carries a price (ticks() constructs price =
    * value+100, never null), so the hourly as-of grid is non-null
    * exactly at trunc(min)+k·1h points within [min, max]:
    * n = (max − trunc(min,'hour')) div 1h + (min == trunc(min) ? 1 : 0),
    * all exact integer micros arithmetic. The pick job is therefore a
    * map-side-combined min/max per product over the RAW ticks — it
    * never builds the grid (the prior shape evaluated the whole
    * gap-fill subtree a second time just to count its rows), and
    * min/max need no (product, event_time) dedup pass either. */
  private[graft] def topProducts(rawTicks: DataFrame, n: Int): Seq[String] =
    rawTicks.groupBy(col("product_id"))
      .agg(min(col("event_time")).as("mn"), max(col("event_time")).as("mx"))
      .select(col("product_id"),
        (expr("(unix_micros(mx) - unix_micros(date_trunc('hour', mn))) div 3600000000") +
          when(col("mn") === date_trunc("hour", col("mn")), lit(1L)).otherwise(lit(0L)))
          .as("n"))
      // a product with ZERO non-null grid points (single sub-hour tick)
      // has no rows in the filled frame at all — the grid-built ranking
      // cannot contain it, so the closed form must drop it too
      // (TopProductsSpec pins this edge)
      .filter(col("n") > 0L)
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy { case (p, c) => (-c, p) }.take(n).map(_._1).toSeq

  /** Gap-filled hourly grid for `picks` ONLY. The gap-fill is per-key
    * (each product's grid spans its own min..max), so pruning the
    * observation stream BEFORE the grid build is bit-identical to
    * filtering after — and builds |picks| grids instead of every
    * instrument's (the pair queries build 2, not the whole universe). */
  private def filledFor(obs: DataFrame, picks: Seq[String]): DataFrame =
    GapFill(obs.filter(col("product_id").isin(picks: _*)),
      Seq("product_id"), "event_time", "1 hour",
      Seq("price" -> "price"), truncUnit = "hour")
      .filter(col("price").isNotNull)

  /** Wide per-grid-hour alignment of the picked instruments: ONE
    * aggregation on grid_ts replaces the grid self-join (the filled grid
    * has exactly one row per (product, hour), so max(when) lifts each
    * pick's price bit-for-bit into column x<i>). */
  private def alignWide(filled: DataFrame, picks: Seq[String]): DataFrame =
    filled.filter(col("product_id").isin(picks: _*))
      .groupBy(col("grid_ts"))
      .agg(max(when(col("product_id") === picks.head, col("price"))).as("x0"),
        picks.tail.zipWithIndex.map { case (p, i) =>
          max(when(col("product_id") === p, col("price"))).as(s"x${i + 1}")
        }: _*)

  /** (grid_ts, xa, xb) for the two longest-history instruments — the
    * aligned pair grid behind pairs_spread and lead_lag. Empty when the
    * feed has fewer than two instruments (join semantics preserved).
    * Picks come from the closed-form span count over raw ticks; only
    * the two picked instruments' grids are ever built. */
  private def alignPair(s: SparkSession, d: String): DataFrame = {
    val picks = topProducts(ticks(s, d), 2)
    if (picks.size < 2)
      uniqTicks(s, d).select(
        date_trunc("hour", col("event_time")).as("grid_ts"),
        col("price").as("xa"), col("price").as("xb")).limit(0)
    else
      alignWide(filledFor(uniqTicks(s, d), picks), picks)
        .filter(col("x0").isNotNull && col("x1").isNotNull)
        .select(col("grid_ts"), col("x0").as("xa"), col("x1").as("xb"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "normalize" -> ((s, d) => r6(Normalize(ticks(s, d)))),
    "sma_signals" -> ((s, d) =>
      r6(SmaCross(ticks(s, d), cfg).filter(col("signal_type") =!= "HOLD").drop("metadata"))),
    // §2.10 parameterized run profiles: same pipeline, breakout knobs.
    "sma_signals_breakout" -> ((s, d) =>
      r6(SmaCross(ticks(s, d), cfgBreakout)
        .filter(col("signal_type") =!= "HOLD").drop("metadata"))),
    "positions" -> ((s, d) => r6(Positions.transitions(costs(s, d), cfg).drop("metadata"))),
    "executions" -> ((s, d) => r6(Positions.executions(costs(s, d), cfg).drop("metadata"))),
    "metrics_5m" -> ((s, d) => r6(Performance(costs(s, d), cfg).drop("metadata"))),
    "rollup_hourly" -> ((s, d) =>
      // Inner r6 so the rollup consumes the same 6-dp metric values the
      // oracle's `metrics` CTE aggregates.
      r6(Rollup.hourly(r6(Performance(costs(s, d), cfg))))),
    "topk_positions" -> ((s, d) =>
      // §2.6 serving query: most recent 200 position transitions.
      r6(Positions.transitions(costs(s, d), cfg).drop("metadata")
        .orderBy(col("event_time").desc, col("sequence").desc).limit(200))),
    "union_replay" -> ((s, d) =>
      // J3 backtest union: live ∪ replayed through the same normalize stage.
      r6(Normalize(ticks(s, d).unionByName(replayTicks(s, d))))),
    "sessions" -> ((s, d) =>
      // T9 sessionization over the tick stream (1-day inactivity gap).
      r6(Sessionize(ticks(s, d), "product_id", "event_time", "price", "1 day"))),
    "gapfill" -> ((s, d) =>
      // Resample to an hourly grid with forward-fill (locf) + staleness.
      r6(GapFill(uniqTicks(s, d),
        Seq("product_id"), "event_time", "1 hour",
        Seq("price" -> "price", "event_time" -> "src_time"), truncUnit = "hour")
        .withColumn("stale_us",
          unix_micros(col("grid_ts")) - unix_micros(col("src_time"))))),
    "ewma" -> ((s, d) =>
      r6(Ewma.finalPerKey(ticks(s, d), "product_id", "event_time", "sequence", "price"))),
    "market_corr" -> ((s, d) => {
      // Each instrument's Pearson correlation with the cross-sectional
      // market mean over the gap-filled hourly grid (time-series
      // similarity vs the market factor). mkt is one row per grid hour —
      // broadcast; corr runs on Det grids, engine-exact.
      val filled = filledGrid(s, d)
      // mkt via window-over-hour, not a self-join: the grid subtree is
      // computed ONCE (a self-join would recompute the whole gap-fill
      // for each side). r17 probed the [[filledWithMkt]] broadcast shape
      // here and REJECTED it (0.80×/0.87× two runs — the cache/ckpt
      // materialization costs more than the saved Exchange when the
      // tail is one small aggregate; it only pays where heavy window
      // work follows, i.e. rolling_beta).
      val withMkt = filled.withColumn("mkt",
        Det.avgD(col("price"), 9, Window.partitionBy(col("grid_ts"))))
      r6(withMkt.groupBy(col("product_id"))
        .agg(count(lit(1)).as("n_obs"), Det.corrD(col("price"), col("mkt"), 4).as("mkt_corr")))
    }),
    "market_beta" -> ((s, d) => {
      // OLS beta/alpha of each instrument vs the cross-sectional market
      // mean on the gap-filled grid — the CAPM-style factor regression
      // companion to market_corr, from the same single grid build: beta
      // is Det.betaD's exact moment combination, alpha the Det-mean
      // residual intercept (a fixed IEEE sequence over exact means).
      val filled = filledGrid(s, d)
      val withMkt = filled.withColumn("mkt",
        Det.avgD(col("price"), 9, Window.partitionBy(col("grid_ts"))))
      r6(withMkt.groupBy(col("product_id"))
        .agg(count(lit(1)).as("n_obs"),
          Det.betaD(col("price"), col("mkt"), 4).as("beta"),
          (Det.avgD(col("price"), 9) -
            Det.betaD(col("price"), col("mkt"), 4) * Det.avgD(col("mkt"), 9)).as("alpha")))
    }),
    "rolling_beta" -> ((s, d) => {
      // Rolling 24-hour CAPM beta — market_beta's regression re-run on a
      // trailing frame per grid hour, the time-varying exposure series a
      // risk system actually tracks. Same single grid build + broadcast-
      // free per-instant market mean; the frame moment sums are exact
      // grid longs (associative — frame split points cannot move a bit)
      // feeding betaD's fixed finishing sequence. Two window passes on
      // orthogonal partitionings (per-instant mean, per-instrument
      // frame) = two keyed Exchanges, the momentum_ranks shape.
      val filled = filledGrid(s, d)
      val withMkt = filled.withColumn("mkt",
        Det.avgD(col("price"), 9, Window.partitionBy(col("grid_ts"))))
      // r16: trailing prefix-sum form (Det.betaDTrailing) — Spark
      // rebuilds a sliding ROWS frame per output row (O(n·w·aggs);
      // measured 1.5 s of this query's 2.6 s), the prefix-difference is
      // bit-identical on exact grid longs. n_obs = min(rn, 24): the
      // frame count of a never-null column, same values.
      val base = Window.partitionBy(col("product_id"))
        .orderBy(col("grid_ts"))
      r6(withMkt
        .withColumn("n_obs",
          least(row_number().over(base), lit(24)).cast("long"))
        .withColumn("beta24",
          Det.betaDTrailing(col("price"), col("mkt"), 4, 24, base))
        .select(col("product_id"), col("grid_ts"), col("n_obs"),
          col("beta24")))
    }),
    "variance_ratio" -> ((s, d) => {
      // Lo–MacKinlay variance-ratio test on the hourly filled grid: for
      // horizon q, VR(q) = Var_pop(q-period price diff) / (q · Var_pop
      // (1-period diff)); VR<1 flags mean reversion, VR>1 trending. All
      // moments are exact cent-grid longs (q-diffs telescope over the
      // same grid, so every sum is integer-exact); each VR finishes as
      // ONE division of two string-routed integer→double casts —
      // correctly rounded in both engines at any magnitude. One grid
      // build, one window Exchange carrying all four lags, one
      // |products|-sized aggregate. Envelope: |d|≤1e6 (price span ·1e4),
      // Σd² <2^63 to ~9e6 rows/instrument; num ≈ n³·Σd² stays under
      // 1e37 < min(DECIMAL(38), HUGEINT) at the 10× fixture.
      val filled = filledGrid(s, d)
      val w = Window.partitionBy(col("product_id")).orderBy(col("grid_ts"))
      val base = filled.withColumn("k", Det.kl(col("price"), 4))
      val diffs = (1 +: VrQs).foldLeft(base) { (df, q) =>
        df.withColumn(s"d$q", col("k") - lag(col("k"), q).over(w))
      }
      val aggExprs =
        count(col("d1")).as("n1") +: sum(col("d1")).as("s1") +:
          sum(col("d1") * col("d1")).as("s2") +:
          VrQs.flatMap(q => Seq(
            count(col(s"d$q")).as(s"n$q"),
            sum(col(s"d$q")).as(s"t1_$q"),
            sum(col(s"d$q") * col(s"d$q")).as(s"t2_$q")))
      val m = diffs.groupBy(col("product_id")).agg(aggExprs.head, aggExprs.tail: _*)
      def dec(c: Column) = c.cast(DecimalType(19, 0))
      def exact(c: Column) = c.cast("string").cast("double")
      val perQ = VrQs.map { q =>
        val n1 = dec(col("n1")); val s1 = dec(col("s1")); val s2 = dec(col("s2"))
        val nq = dec(col(s"n$q")); val t1 = dec(col(s"t1_$q")); val t2 = dec(col(s"t2_$q"))
        val num = (n1 * n1 * (nq * t2 - t1 * t1)).cast(DecimalType(38, 0))
        val den = (lit(q) * nq * nq * (n1 * s2 - s1 * s1)).cast(DecimalType(38, 0))
        struct(lit(q).as("q"), col(s"n$q").as("n_pairs"),
          when(den > 0, Det.snap(exact(num) / exact(den), 6)).as("vr"))
      }
      m.select(col("product_id"), explode(array(perQ: _*)).as("r"))
        .select(col("product_id"), col("r.q").as("q"),
          col("r.n_pairs").as("n_pairs"), col("r.vr").as("vr"))
    }),
    "kendall_tau" -> ((s, d) =>
      // Kendall's τ_a of the aligned top-2 pair — completing the
      // correlation trio (Pearson market_corr, Spearman spearman_corr).
      // Concordant/discordant/tied counts are EXACT integers, computed
      // DATA-bounded by graft.ops.Kendall (distributed Knight: merge
      // inversion counts within range partitions + a partition²-bounded
      // cross-dominance pass — no |grid|² self-join; KendallSpec proves
      // count equality vs brute force), so τ_a = (C−D)/(n(n−1)/2) has
      // the same bits as the all-pairs form. The ORACLE keeps the
      // quadratic SQL as the cross-engine check.
      Kendall.counts(alignPair(s, d), "xa", "xb", "grid_ts")),
    "ewma_var" -> ((s, d) => {
      // RiskMetrics-style EWMA variance: σ²_t = λσ²_{t−1} + (1−λ)r²_t
      // per instrument over raw tick returns, λ = 15/16 (α = 1/16 — an
      // exact dyadic, so the bare SQL literal cannot misround the way
      // an arbitrary decimal can). Per-row r and r² are identical
      // double bits in both engines; the fold rides the Ewma
      // secondary-sort kernel (one Exchange, O(1) state/key); vol is
      // one correctly-rounded sqrt of the final value.
      val w = Window.partitionBy(col("product_id"))
        .orderBy(col("event_time"), col("sequence"))
      val r2f = ticks(s, d)
        .withColumn("r", col("price") - lag(col("price"), 1).over(w))
        .filter(col("r").isNotNull)
        .withColumn("r2", col("r") * col("r"))
      r6(Ewma.finalPerKey(r2f, "product_id", "event_time", "sequence",
          "r2", 0.0625)
        .withColumnRenamed("ewma", "var_ewma")
        .withColumn("vol", sqrt(col("var_ewma"))))
    }),
    "kendall_corr" -> ((s, d) => {
      // Kendall τ_b of EVERY instrument vs the equal-weight market on
      // the filled hourly grid — the grouped, tie-corrected companion
      // of kendall_tau (spearman_corr's frame, Kendall's statistic).
      // Counts come from ops.Kendall.countsByKey: one hash Exchange on
      // the instrument, per-group merge inversion counting (the
      // instrument axis scales; each group is time-bounded). The ORACLE
      // is the quadratic per-instrument sign census — an independent
      // algorithm checking every count column.
      val filled = filledGrid(s, d)
      val withMkt = filled.withColumn("mkt",
        Det.avgD(col("price"), 9, Window.partitionBy(col("grid_ts"))))
      Kendall.countsByKey(withMkt, "product_id", "price", "mkt", "grid_ts")
        .withColumnRenamed("product_key", "product_id")
        .filter(col("n_obs") >= 2)
    }),
    "seasonal_decompose" -> ((s, d) => {
      // Additive seasonal decomposition of each instrument's filled
      // hourly grid (ops.Seasonal scaladoc has the exact-grid design):
      // centered 2x24 MA trend, per-hour-of-day seasonal means of the
      // detrended series, within-slot stddev — the classical STL
      // ancestor, 24 rows per instrument, everything on exact integer
      // grids so both engines agree bit-for-bit.
      val filled = filledGrid(s, d)
      Seasonal.hourOfDayProfile(filled)
    }),
    "seasonal_anomalies" -> ((s, d) => {
      // Seasonally-adjusted outliers: top-20 grid points by within-slot
      // z-score (> 3σ) after the 2x24 MA detrend — the anomaly monitor
      // built on seasonal_decompose's exact frame (ops.Seasonal
      // scaladoc: the z-score's grid denominators cancel, so every
      // compared value is exact-long / sqrt(exact)).
      val filled = filledGrid(s, d)
      Seasonal.anomalies(filled)
    }),
    "spearman_corr" -> ((s, d) => {
      // Spearman rank correlation of each instrument vs the equal-weight
      // market on the filled grid — the monotone-co-movement companion
      // to market_corr's Pearson (robust to outliers and nonlinearity).
      // Ranks are row_numbers with a (value, grid_ts) tie-break
      // (tie-broken Spearman, documented), so Σd² is an EXACT long and
      // ρ = 1 − 6Σd²/(n(n²−1)) is plain IEEE on exact operands —
      // n(n²−1) ≤ ~4e11 at the 10× fixture, well inside long. Three
      // window passes, all keyed on (grid_ts) or (product_id).
      val filled = filledGrid(s, d)
      val withMkt = filled.withColumn("mkt",
        Det.avgD(col("price"), 9, Window.partitionBy(col("grid_ts"))))
      val ranked = withMkt
        .withColumn("rp", row_number().over(Window.partitionBy(col("product_id"))
          .orderBy(col("price"), col("grid_ts"))).cast("long"))
        .withColumn("rm", row_number().over(Window.partitionBy(col("product_id"))
          .orderBy(col("mkt"), col("grid_ts"))).cast("long"))
        .withColumn("dd", col("rp") - col("rm"))
      ranked.groupBy(col("product_id"))
        .agg(count(lit(1)).as("n_obs"), sum(col("dd") * col("dd")).as("sd2"))
        .filter(col("n_obs") >= 2)
        .select(col("product_id"), col("n_obs"),
          Det.snap(lit(1.0) - lit(6.0) * col("sd2").cast("double") /
            (col("n_obs") * (col("n_obs") * col("n_obs") - 1)).cast("double"), 6)
            .as("spearman"))
    }),
    "lee_ready" -> ((s, d) => {
      // Lee–Ready trade classification: above-mid → buy, below-mid →
      // sell, at-mid or quoteless → tick test with the last nonzero
      // sign carried forward (the W6 ignore-nulls forward-fill
      // pattern). Every comparison is on identical double bits in both
      // engines (mid is the same bid/ask arithmetic; the tick sign is
      // exact), and the signed flow rides the Det cent grid. One keyed
      // window Exchange + one |products|-sized aggregate.
      val w = Window.partitionBy(col("product_id"))
        .orderBy(col("event_time"), col("sequence"))
      val base = ticks(s, d)
        .withColumn("mid", (col("best_bid") + col("best_ask")) / 2)
        .withColumn("prev", lag(col("price"), 1).over(w))
        .withColumn("tick0",
          when(col("price") > col("prev"), 1)
            .when(col("price") < col("prev"), -1))
        .withColumn("tick", last(col("tick0"), ignoreNulls = true).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("dir",
          when(col("mid").isNotNull && col("price") > col("mid"), 1)
            .when(col("mid").isNotNull && col("price") < col("mid"), -1)
            .otherwise(col("tick")))
      base.groupBy(col("product_id")).agg(
        count(lit(1)).as("n_ticks"),
        count(when(col("dir") === 1, 1)).as("n_buys"),
        count(when(col("dir") === -1, 1)).as("n_sells"),
        count(when(col("dir").isNull, 1)).as("n_unclassified"),
        Det.snap(Det.sumD(when(col("dir").isNotNull,
          col("dir") * col("price")), 4), 6).as("signed_flow"))
    }),
    "vol_signature" -> ((s, d) => {
      // Volatility signature plot — realized variance per hour at
      // non-overlapping sampling intervals Δ∈{1,2,4,8,24} grid hours,
      // the classic microstructure diagnostic (RV(Δ) flat ⇒ noise-free
      // diffusion; rising at small Δ ⇒ microstructure noise). Each arm
      // sub-samples every Δ-th grid row (exact rn arithmetic — no
      // re-bucketing), diffs the cent grid, and reduces to one
      // |products|-sized aggregate; Σd² is an exact long whose
      // non-negative cast is correctly rounded in both engines.
      // Single-pass shape: on the sampled sub-series the lag-1 partner
      // IS the full-series row Δ back (sampled rns are 1, Δ+1, 2Δ+1, …),
      // so all five arms ride ONE window carrying lag(k, Δ) per Δ, then
      // stack → one aggregate — not five grid rebuilds (at 100 TB that
      // would be five scans). Exact integers throughout, so the rewrite
      // cannot move a bit vs the per-arm form (the oracle keeps the
      // per-arm algebra).
      val filled = filledGrid(s, d)
      val wp = Window.partitionBy(col("product_id")).orderBy(col("grid_ts"))
      val seq0 = filled.withColumn("k", Det.kl(col("price"), 4))
        .withColumn("rn", row_number().over(wp))
      val withD = SigDeltas.foldLeft(seq0) { (df, dl) =>
        df.withColumn(s"d$dl", when(expr(s"(rn - 1) % $dl = 0"),
          col("k") - lag(col("k"), dl).over(wp)))
      }
      val stackArgs = SigDeltas.map(dl => s"$dl, d$dl").mkString(", ")
      withD
        .selectExpr("product_id",
          s"stack(${SigDeltas.size}, $stackArgs) AS (delta_h, d)")
        .filter(col("d").isNotNull)
        .groupBy(col("product_id"), col("delta_h"))
        .agg(count(lit(1)).as("n_obs"), sum(col("d") * col("d")).as("ss"))
        .select(col("product_id"), col("delta_h"), col("n_obs"),
          Det.snap(col("ss").cast("double") / lit(1e8) /
            (col("n_obs") * col("delta_h")).cast("double"), 6).as("rv_per_hour"))
    }),
    "hurst_rs" -> ((s, d) => {
      // Rescaled-range (R/S) analysis — the long-memory diagnostic
      // behind the Hurst exponent: per instrument and block length L,
      // the mean over full blocks of R/S = range(cumulative deviation
      // from block mean) / block stddev. The cumulative deviation rides
      // an ALL-INTEGER trick: D_i = L·P_i − i·T (P prefix sum, T block
      // total of cent-grid longs) is L× the cumdev, exact, so
      // R = (maxD−minD)/(L·1e4) needs only one non-negative cast and a
      // division by an exactly-representable literal; S is the Det
      // block stddev; block R/S values snap to 1e-6 and average on the
      // exact grid. The log-log slope (the exponent itself) is left to
      // the caller — ln is not engine-portable, the R/S curve is.
      // Each arm: one Exchange per (product,block) window family.
      val filled = filledGrid(s, d)
      val wp = Window.partitionBy(col("product_id")).orderBy(col("grid_ts"))
      // one grid build materialized for the three block-length arms
      // (each arm re-windows on its own (product,block) keying — that
      // Exchange is inherent, the grid build is not)
      val seq0 = filled.withColumn("k", Det.kl(col("price"), 4))
        .withColumn("rn", row_number().over(wp))
        .withColumn("ntot", count(lit(1)).over(Window.partitionBy(col("product_id"))))
        .localCheckpoint(true)
      val arms = RsLens.map { l =>
        val base = seq0
          .withColumn("blk", expr(s"(rn - 1) div $l"))
          .withColumn("i", expr(s"(rn - 1) % $l + 1"))
          .filter(col("blk") < expr(s"ntot div $l"))
        val wb = Window.partitionBy(col("product_id"), col("blk")).orderBy(col("i"))
        val wball = Window.partitionBy(col("product_id"), col("blk"))
        val withD = base
          .withColumn("p", sum(col("k")).over(
            wb.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .withColumn("t", sum(col("k")).over(wball))
          .withColumn("dd", lit(l) * col("p") - col("i") * col("t"))
        val blocks = withD.groupBy(col("product_id"), col("blk"))
          .agg((max(col("dd")) - min(col("dd"))).as("rr"),
            Det.stddevPopD(col("price"), 4).as("sd"))
          .filter(col("sd") > 0)
          .withColumn("rs", Det.snap(
            col("rr").cast("double") / lit(l * 1e4) / col("sd"), 6))
        blocks.groupBy(col("product_id"))
          .agg(count(lit(1)).as("n_blocks"),
            Det.snap(Det.avgD(col("rs"), 6), 6).as("mean_rs"))
          .select(col("product_id"), lit(l).as("block_len"),
            col("n_blocks"), col("mean_rs"))
      }
      val out = arms.reduce(_ union _).localCheckpoint(true)
      seq0.unpersist()
      out
    }),
    "rolling_corr" -> ((s, d) => {
      // Rolling 24-hour correlation of the top-2 pair — the time-varying
      // co-movement series behind pairs_spread's static z-score: a pairs
      // desk watches rolling corr to see the relationship (and the
      // strategy premise) decay. Same aligned-pair grid; frame moment
      // sums are exact grid longs feeding corrD's fixed num/√dx/√dy
      // finish (sqrt is IEEE-correctly-rounded in both engines). The
      // single-pair series makes the lit(1) window partition
      // time-bounded, not data-bounded.
      // r16: trailing prefix-sum form — see rolling_beta's note.
      val base = Window.partitionBy(lit(1)).orderBy(col("grid_ts"))
      r6(alignPair(s, d)
        .withColumn("n_obs",
          least(row_number().over(base), lit(24)).cast("long"))
        .withColumn("corr24",
          Det.corrDTrailing(col("xa"), col("xb"), 4, 24, base))
        .select(col("grid_ts"), col("n_obs"), col("corr24")))
    }),
    "pairs_spread" -> ((s, d) => {
      // Pairs-trading spread signal: align the TWO longest-history
      // instruments (deterministic pick: filled-grid length DESC,
      // product_id) on the hourly grid, z-score their price spread with
      // Det-exact whole-series moments, and emit |z| > 2 dislocations —
      // the entry/exit signal of a pairs strategy. The spread is a
      // per-row double subtraction on identical operand bits; mean and
      // stddev ride Det grids; the whole-series window sees one
      // instrument-pair's aligned grid (time-bounded, not data-bounded).
      val aligned = alignPair(s, d)
        .withColumn("spread", col("xa") - col("xb"))
      val all = Window.partitionBy(lit(1))
      val mu = Det.avgD(col("spread"), 9, all)
      val sd = Det.stddevPopD(col("spread"), 4, all)
      r6(aligned
        .withColumn("z", when(sd > 0, (col("spread") - mu) / sd))
        .filter(abs(col("z")) > 2.0)
        .select(col("grid_ts"), col("xa"), col("xb"), col("spread"), col("z")))
    }),
    "lead_lag" -> ((s, d) => {
      // Lead-lag screen: cross-correlation of the two longest-history
      // instruments at ±3 hourly lags (xcorr(L) = corr(xa_t, xb_{t+L}))
      // with a deterministic best-lag pick (max |xcorr|, ties → smaller
      // lag). A significantly asymmetric profile says one instrument
      // LEADS the other — the screen behind lead-lag stat-arb. The
      // whole-series window orders one aligned pair grid (time-bounded,
      // not data-bounded — the pairs_spread justification); all seven
      // lag columns come from ONE window pass, and corrD keeps each
      // cell engine-identical. Ranking orders on coalesce(|xcorr|, −1)
      // so a null cell can never make the pick engine-dependent.
      val aligned = alignPair(s, d)
      val wb = Window.orderBy(col("grid_ts"))
      val lags = -3 to 3
      def nm(l: Int) = if (l < 0) s"xb_m${-l}" else s"xb_p$l"
      val lagCols = lags.map { l =>
        (if (l >= 0) lead(col("xb"), l).over(wb)
         else lag(col("xb"), -l).over(wb)).as(nm(l))
      }
      val wide = aligned.select(col("xa") +: lagCols: _*)
      val stackArgs = lags.map(l => s"$l, ${nm(l)}").mkString(", ")
      val byLag = wide
        .selectExpr("xa", s"stack(${lags.size}, $stackArgs) AS (lag_h, xbl)")
        .filter(col("xbl").isNotNull)
        .groupBy(col("lag_h"))
        .agg(count(lit(1)).as("n_obs"),
          Det.corrD(col("xa"), col("xbl"), 4).as("xr"))
      byLag
        // unpartitioned rank window is BOUNDED: byLag is the 7-row
        // (±3 lags) grid, a constant regardless of data scale
        .withColumn("rk2", row_number().over(
          Window.orderBy(coalesce(abs(col("xr")), lit(-1.0)).desc, col("lag_h"))))
        .select(col("lag_h").cast("long").as("lag_h"), col("n_obs"),
          Det.snap(col("xr"), 6).as("xcorr"), (col("rk2") === 1).as("is_best"))
    }),
    "corr_matrix" -> ((s, d) => {
      // Pairwise Pearson correlation matrix over the gap-filled hourly
      // grid, bounded to the top-15 instruments by filled-grid length
      // (deterministic pick: count DESC, product_id) — the classic
      // pairs-trading screen. The quadratic is contained by design:
      // 15 instruments → 105 pairs, generated by a per-grid-hour
      // EXPLODE over the wide-aligned row, never a grid self-join — one
      // aggregation on grid_ts, a shuffle-free 105× Generate, one hash
      // aggregate on the pair key. No cache anywhere (the pick is a
      // driver collect of per-product counts); corrD runs on exact Det
      // grids so the matrix is engine-identical.
      val picks = topProducts(ticks(s, d), 15)
      if (picks.size < 2)
        r6(uniqTicks(s, d).select(col("product_id").as("pa"), col("product_id").as("pb"),
          lit(0L).as("n_obs"), col("price").as("pair_corr")).limit(0))
      else {
        val wide = alignWide(filledFor(uniqTicks(s, d), picks), picks)
        val pairStructs = for {
          i <- picks.indices; j <- (i + 1) until picks.size
        } yield {
          val (pi, pj) = (picks(i), picks(j))
          val (pa, pb, ca, cb) =
            if (pi < pj) (pi, pj, s"x$i", s"x$j") else (pj, pi, s"x$j", s"x$i")
          struct(lit(pa).as("pa"), lit(pb).as("pb"),
            col(ca).as("xa"), col(cb).as("xb"))
        }
        val pairs = wide
          .select(explode(array(pairStructs: _*)).as("p"))
          .select(col("p.pa").as("pa"), col("p.pb").as("pb"),
            col("p.xa").as("xa"), col("p.xb").as("xb"))
          .filter(col("xa").isNotNull && col("xb").isNotNull)
        r6(pairs.groupBy(col("pa"), col("pb"))
          .agg(count(lit(1)).as("n_obs"),
            Det.corrD(col("xa"), col("xb"), 4).as("pair_corr")))
      }
    }),
    "seq_gaps" -> ((s, d) => {
      // Ingest-integrity audit: per instrument, gaps in the sequence-id
      // stream (the engine-side analog of the reference's Kafka consumer
      // lag healthcheck — a gap is a dropped/unreplayed message). Pure
      // integer arithmetic over one keyed window pass: lag along the
      // sequence order, then a hash aggregate of the deficits.
      val w = Window.partitionBy(col("product_id")).orderBy(col("sequence"))
      ticks(s, d)
        .withColumn("gap", col("sequence") - lag(col("sequence"), 1).over(w) - lit(1L))
        .groupBy(col("product_id"))
        .agg(count(lit(1)).as("n_ticks"),
          count(when(col("gap") > 0, 1)).as("n_gaps"),
          coalesce(sum(when(col("gap") > 0, col("gap"))), lit(0L)).as("missing_total"),
          coalesce(max(when(col("gap") > 0, col("gap"))), lit(0L)).as("max_gap"))
    }),
    "momentum_ranks" -> ((s, d) => {
      // Cross-sectional momentum ranking: per grid hour, instruments
      // ranked by 24h price momentum — the classic signal-ranking shape
      // (per-key lag along time, then a rank ACROSS keys per timestamp:
      // two window passes on orthogonal partitionings). Momentum divides
      // two raw picked prices (identical bits in both engines), so the
      // DESC rank order matches everywhere; ties break on product_id.
      val filled = filledGrid(s, d)
      val wk = Window.partitionBy(col("product_id")).orderBy(col("grid_ts"))
      val byTs = Window.partitionBy(col("grid_ts"))
      r6(filled
        .withColumn("mom", col("price") / lag(col("price"), 24).over(wk) - lit(1.0))
        .filter(col("mom").isNotNull)
        .withColumn("rk", row_number().over(
          byTs.orderBy(col("mom").desc, col("product_id"))))
        .withColumn("n_products", count(lit(1)).over(byTs))
        .filter(col("rk") <= 10)
        .select(col("grid_ts"), col("rk"), col("product_id"), col("mom"),
          col("n_products")))
    }),
    "outliers" -> ((s, d) => {
      // Anomaly detection: |z| > 2 ticks vs the key's own Det-exact
      // mean/stddev — one whole-partition window (single Exchange).
      val byKey = Window.partitionBy(col("product_id"))
      r6(ticks(s, d)
        .withColumn("mean_p", Det.avgD(col("price"), 9, byKey))
        .withColumn("sd_p", Det.stddevPopD(col("price"), 4, byKey))
        .withColumn("z",
          when(col("sd_p") > 0d, (col("price") - col("mean_p")) / col("sd_p")))
        .filter(abs(col("z")) > 2d)
        .select(col("product_id"), col("event_time"), col("sequence"),
          col("price"), col("z")))
    })
  )

  // ---------------------------------------------------------------------
  // DuckDB oracle SQL (same constants, same tie-break ordering).
  // ---------------------------------------------------------------------

  private val ord = "PARTITION BY product_id ORDER BY event_time, sequence"
  private def f(d: Double): String = d.toString
  /** 1e-6 grid snap (duckdb side of TickQueries.r6 / Det.snap). */
  private def s6(x: String): String = Det.snapSql(x, 6)

  /** Shared CTE chain: ticks → normalized → sma-enriched → positions → costs. */
  private def pipelineCtes(ticksSql: String, c: StrategyConfig = cfg): String = {
    s"""WITH ticks AS (
  $ticksSql
), base AS (
  SELECT product_id, event_time, sequence, price, best_bid, best_ask,
         CASE WHEN best_bid IS NOT NULL AND best_ask IS NOT NULL
              THEN (best_bid + best_ask) / 2 ELSE price END AS mid_price
  FROM ticks
), normalized AS (
  SELECT product_id, event_time, sequence, mid_price, best_bid, best_ask,
         CASE WHEN prev_mid IS NULL OR prev_mid = 0 THEN NULL
              ELSE (mid_price - prev_mid) / prev_mid END AS returns,
         ${Det.stddevPopDSql("mid_price", 4, s" OVER ($ord ROWS BETWEEN 59 PRECEDING AND CURRENT ROW)")} AS volatility
  FROM (SELECT *, lag(mid_price) OVER ($ord) AS prev_mid FROM base)
), enriched AS (
  SELECT *, fast_sma - slow_sma AS spread,
         lag(fast_sma - slow_sma, ${c.confirmation}) OVER ($ord) AS prev_spread
  FROM (SELECT *,
          ${Det.avgDSql("mid_price", 9, s" OVER ($ord ROWS BETWEEN ${c.smaFastWindow - 1} PRECEDING AND CURRENT ROW)")} AS fast_sma,
          ${Det.avgDSql("mid_price", 9, s" OVER ($ord ROWS BETWEEN ${c.smaSlowWindow - 1} PRECEDING AND CURRENT ROW)")} AS slow_sma
        FROM normalized)
), possig AS (
  SELECT product_id, event_time, sequence, mid_price, returns, volatility, best_bid, best_ask,
         CASE WHEN spread > 0 AND prev_spread <= 0 THEN 1.0
              WHEN spread < 0 AND prev_spread >= 0 THEN -1.0 ELSE 0.0 END AS signal_position,
         CASE WHEN spread > 0 AND prev_spread <= 0 THEN 'LONG'
              WHEN spread < 0 AND prev_spread >= 0 THEN 'SHORT' ELSE 'HOLD' END AS signal_type
  FROM enriched
), pos AS (
  SELECT product_id, event_time, sequence, mid_price, returns, volatility, best_bid, best_ask, signal_type,
         CASE WHEN best_bid IS NOT NULL AND best_ask IS NOT NULL
              THEN best_ask - best_bid ELSE NULL END AS spread,
         coalesce(last_value(signal_position IGNORE NULLS)
                    OVER ($ord ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                  0.0) AS position
  FROM possig
), costs AS (
  SELECT *,
         position - coalesce(prev_position, 0.0) AS position_change,
         greatest(0.0, least(${f(c.slippageMaxRate)},
           ${f(c.slippageRate)} + volatility_ratio * ${f(c.slippageVolatilityMultiplier)}
                               + spread_ratio * ${f(c.slippageSpreadMultiplier)})) AS slippage_rate,
         ${f(c.transactionCostRate)} AS transaction_cost_rate,
         greatest(0.0, least(${f(c.slippageMaxRate)},
           ${f(c.slippageRate)} + volatility_ratio * ${f(c.slippageVolatilityMultiplier)}
                               + spread_ratio * ${f(c.slippageSpreadMultiplier)}))
           + ${f(c.transactionCostRate)} AS trade_cost_rate,
         greatest(${c.fillLatencyMs}, least(${c.fillLatencyMs + c.fillLatencyJitterMs},
           ${c.fillLatencyMs} + CAST(floor(${c.fillLatencyVolatilityMs}.0 * volatility_ratio) AS BIGINT))) AS fill_latency_ms
  FROM (SELECT *,
          lag(position) OVER ($ord) AS prev_position,
          CASE WHEN mid_price IS NULL OR mid_price = 0 THEN 0.0
               ELSE coalesce(volatility, 0.0) / mid_price END AS volatility_ratio,
          CASE WHEN mid_price IS NULL OR mid_price = 0 OR spread IS NULL THEN 0.0
               ELSE spread / mid_price END AS spread_ratio
        FROM pos)
), rets AS (
  SELECT *,
         abs(position_change) * mid_price * transaction_cost_rate AS transaction_cost,
         abs(position_change) * mid_price * slippage_rate AS slippage_cost,
         abs(position_change) * mid_price * trade_cost_rate AS trade_cost,
         coalesce(prev_position, 0.0) * coalesce(returns, 0.0)
           - abs(position_change) * mid_price * trade_cost_rate AS realized_pnl,
         abs(position) * mid_price AS notional_exposure,
         abs(position) AS unit_exposure
  FROM costs
)"""
  }

  private[queries] val liveTicksSql =
    """SELECT CAST(user_id AS VARCHAR) AS product_id,
         ts AS event_time,
         event_id AS sequence,
         CAST(value + 100.0 AS DOUBLE) AS price,
         CASE WHEN event_type <> 'error' THEN (value + 100.0) * 0.999 END AS best_bid,
         CASE WHEN event_type <> 'error' THEN (value + 100.0) * 1.001 END AS best_ask
  FROM events"""

  private val unionTicksSql =
    s"""$liveTicksSql
  UNION ALL
  SELECT CAST(user_id AS VARCHAR) AS product_id,
         ts + INTERVAL '1 hour' AS event_time,
         event_id + 10000000 AS sequence,
         CAST(value + 100.0 AS DOUBLE) AS price,
         CASE WHEN event_type <> 'error' THEN (value + 100.0) * 0.999 END AS best_bid,
         CASE WHEN event_type <> 'error' THEN (value + 100.0) * 1.001 END AS best_ask
  FROM events"""

  private def p: String = pipelineCtes(liveTicksSql)

  /** Twin of [[uniqTicks]]: unique (product_id, event_time) for ASOF. */
  private val uniqTicksSql =
    s"""SELECT product_id, event_time, max(price) AS price
  FROM ($liveTicksSql) raw_ticks GROUP BY product_id, event_time"""

  /** Shared chain of the seasonal family (filled hourly grid → exact
    * 48·10⁴-grid detrended `y` per row, full-window rows only) — twin
    * of ops.Seasonal's detrend frame; consumed by both
    * seasonal_decompose (per-slot aggregate tail) and
    * seasonal_anomalies (per-row z-score tail). */
  private val seasonalBaseSql =
    s"""t AS ($uniqTicksSql),
bounds AS (
  SELECT product_id, date_trunc('hour', min(event_time)) AS s, max(event_time) AS e
  FROM t GROUP BY 1),
g AS (
  SELECT product_id, unnest(generate_series(s, e, INTERVAL '1 hour')) AS grid_ts
  FROM bounds),
filled AS (
  SELECT g.product_id, g.grid_ts, t.price
  FROM g ASOF LEFT JOIN t
    ON g.product_id = t.product_id AND g.grid_ts >= t.event_time
  WHERE t.price IS NOT NULL),
kk AS (
  SELECT product_id, grid_ts, ${Det.klSql("price", 4)} AS k FROM filled),
win AS (
  SELECT product_id, grid_ts, k,
         count(k) OVER w25 AS cnt,
         CAST(sum(k) OVER w23 AS BIGINT) AS sinner,
         lag(k, 12) OVER wp AS lag12, lead(k, 12) OVER wp AS lead12
  FROM kk
  WINDOW wp AS (PARTITION BY product_id ORDER BY grid_ts),
         w23 AS (PARTITION BY product_id ORDER BY grid_ts
                 ROWS BETWEEN 11 PRECEDING AND 11 FOLLOWING),
         w25 AS (PARTITION BY product_id ORDER BY grid_ts
                 ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)),
y AS (
  SELECT product_id, grid_ts, CAST(hour(grid_ts) AS BIGINT) AS hour_od,
         48 * k - (2 * sinner + lag12 + lead12) AS y
  FROM win WHERE cnt = 25)"""

  /** Crossover-signals select over the `enriched` CTE (duck twin of
    * SmaCross.signals minus metadata). */
  private def signalsSelect(c: StrategyConfig): String =
    s"""SELECT '${c.strategyRunId}' AS strategy_run_id,
       product_id AS instrument_id, event_time AS signal_time, sequence,
       st AS signal_type, sp AS position, ${s6("confidence")} AS confidence
FROM (SELECT *,
        CASE WHEN spread > 0 AND prev_spread <= 0 THEN 'LONG'
             WHEN spread < 0 AND prev_spread >= 0 THEN 'SHORT' ELSE 'HOLD' END AS st,
        CASE WHEN spread > 0 AND prev_spread <= 0 THEN 1.0
             WHEN spread < 0 AND prev_spread >= 0 THEN -1.0 ELSE 0.0 END AS sp,
        abs(spread) AS confidence
      FROM enriched)
WHERE st <> 'HOLD'"""

  private def metricsSelect: String = {
    val c = cfg
    s"""SELECT '${c.strategyRunId}' AS strategy_run_id,
       window_end AS metric_time,
       '${c.metricsWindowLabel}' AS window_label,
       ${s6("""CASE WHEN volatility IS NULL OR volatility = 0 THEN NULL
            ELSE (avg_return / volatility) * sqrt(12.0) END""")} AS sharpe_ratio,
       ${s6("""CASE WHEN downside_sum IS NULL OR negative_samples = 0 THEN NULL
            ELSE (avg_return / nullif(sqrt(downside_sum / negative_samples), 0)) * sqrt(12.0) END""")} AS sortino_ratio,
       ${s6("cumulative_return")} AS cumulative_return,
       ${s6("min_return")} AS drawdown,
       ${s6("volatility")} AS volatility,
       trades_executed,
       ${s6("avg_notional_exposure")} AS avg_exposure_notional,
       ${s6("total_trade_cost")} AS total_trade_cost,
       ${s6("total_transaction_cost")} AS total_transaction_cost,
       ${s6("total_slippage_cost")} AS total_slippage_cost
FROM (
  SELECT window_start,
         window_start + INTERVAL '5 minutes' AS window_end,
         ${Det.avgDSql("realized_pnl", 12)} AS avg_return,
         ${Det.stddevPopDSql("realized_pnl", 5)} AS volatility,
         ${Det.sumDSql("realized_pnl", 12)} AS cumulative_return,
         ${Det.sumSqWhereDSql("realized_pnl < 0", "realized_pnl", 5)} AS downside_sum,
         count(realized_pnl) AS sample_size,
         count(CASE WHEN realized_pnl < 0 THEN 1 END) AS negative_samples,
         min(realized_pnl) AS min_return,
         ${Det.avgDSql("notional_exposure", 9)} AS avg_notional_exposure,
         ${Det.avgDSql("unit_exposure", 9)} AS avg_unit_exposure,
         ${Det.sumDSql("trade_cost", 12)} AS total_trade_cost,
         ${Det.sumDSql("transaction_cost", 12)} AS total_transaction_cost,
         ${Det.sumDSql("slippage_cost", 12)} AS total_slippage_cost,
         count(CASE WHEN signal_type <> 'HOLD' THEN 1 END) AS trades_executed
  FROM (SELECT *, time_bucket(INTERVAL '5 minutes', event_time) AS window_start FROM rets)
  GROUP BY window_start
)"""
  }

  def oracleSql: Map[String, String] = {
    val c = cfg
    val normalizedSelect =
      s"""SELECT product_id, event_time, sequence, ${s6("mid_price")} AS mid_price,
       ${s6("best_bid")} AS best_bid, ${s6("best_ask")} AS best_ask,
       ${s6("returns")} AS returns, ${s6("volatility")} AS volatility
FROM normalized"""
    Map(
      "normalize" -> s"$p $normalizedSelect",
      "sma_signals" -> s"$p ${signalsSelect(c)}",
      // §2.10 parameterized run profile (mock_breakout knobs).
      "sma_signals_breakout" ->
        s"${pipelineCtes(liveTicksSql, cfgBreakout)} ${signalsSelect(cfgBreakout)}",
      "positions" ->
        s"""$p SELECT '${c.strategyRunId}' AS strategy_run_id, product_id, event_time, sequence,
       position, ${s6("position_change")} AS position_change,
       ${s6(s"abs(position_change) * mid_price * ${f(c.transactionCostRate)}")} AS transaction_cost,
       ${s6("abs(position_change) * mid_price * slippage_rate")} AS slippage_cost,
       ${s6("abs(position_change) * mid_price * trade_cost_rate")} AS trade_cost,
       ${s6("mid_price")} AS mid_price
FROM costs WHERE prev_position IS NULL OR position <> prev_position""",
      "executions" ->
        s"""$p SELECT '${c.strategyRunId}' AS strategy_run_id, product_id,
       event_time AS signal_time, sequence,
       event_time + fill_latency_ms * INTERVAL '1 millisecond' AS execution_time,
       ${s6("position_change")} AS position_change,
       ${s6("""CASE WHEN position_change > 0 THEN mid_price * (1 + slippage_rate)
            WHEN position_change < 0 THEN mid_price * (1 - slippage_rate)
            ELSE mid_price END""")} AS execution_price,
       ${s6("mid_price")} AS base_price,
       ${s6(s"abs(position_change) * mid_price * ${f(c.transactionCostRate)}")} AS transaction_cost,
       ${s6("abs(position_change) * mid_price * slippage_rate")} AS slippage_cost
FROM costs WHERE position_change <> 0""",
      "metrics_5m" -> s"$p $metricsSelect",
      "rollup_hourly" ->
        s"""$p, metrics AS ($metricsSelect)
SELECT strategy_run_id,
       time_bucket(INTERVAL '1 hour', metric_time) AS bucket,
       ${s6(Det.avgDSql("sharpe_ratio", 6))} AS avg_sharpe,
       ${s6(Det.avgDSql("sortino_ratio", 6))} AS avg_sortino,
       ${s6("arg_max(cumulative_return, metric_time)")} AS last_cumulative_return,
       ${s6("max(drawdown)")} AS max_drawdown,
       CAST(sum(trades_executed) AS BIGINT) AS total_trades
FROM metrics
GROUP BY strategy_run_id, time_bucket(INTERVAL '1 hour', metric_time)""",
      "topk_positions" ->
        s"""$p SELECT '${c.strategyRunId}' AS strategy_run_id, product_id, event_time, sequence,
       position, ${s6("position_change")} AS position_change,
       ${s6(s"abs(position_change) * mid_price * ${f(c.transactionCostRate)}")} AS transaction_cost,
       ${s6("abs(position_change) * mid_price * slippage_rate")} AS slippage_cost,
       ${s6("abs(position_change) * mid_price * trade_cost_rate")} AS trade_cost,
       ${s6("mid_price")} AS mid_price
FROM costs WHERE prev_position IS NULL OR position <> prev_position
ORDER BY event_time DESC, sequence DESC LIMIT 200""",
      "union_replay" -> s"${pipelineCtes(unionTicksSql)} $normalizedSelect",
      "sessions" -> {
        val base = Sessionize.sql(s"($liveTicksSql) t", "product_id",
          "event_time", "price", "INTERVAL '1 day'")
        s"""SELECT product_id, session_start, session_end, n_events,
       ${s6("total_value")} AS total_value
FROM ($base) sessions_out"""
      },
      "gapfill" ->
        s"""WITH t AS ($uniqTicksSql),
bounds AS (
  SELECT product_id, date_trunc('hour', min(event_time)) AS s, max(event_time) AS e
  FROM t GROUP BY 1),
g AS (
  SELECT product_id, unnest(generate_series(s, e, INTERVAL '1 hour')) AS grid_ts
  FROM bounds)
SELECT g.product_id, g.grid_ts, ${s6("t.price")} AS price,
       t.event_time AS src_time,
       epoch_us(g.grid_ts) - epoch_us(t.event_time) AS stale_us
FROM g ASOF LEFT JOIN t
  ON g.product_id = t.product_id AND g.grid_ts >= t.event_time""",
      "ewma" -> {
        val base = Ewma.finalPerKeySql(s"($liveTicksSql) t", "product_id",
          "event_time", "sequence", "price")
        s"""SELECT product_id, n_ticks, ${s6("ewma")} AS ewma FROM ($base) ewma_out"""
      },
      "rolling_beta" ->
        s"""WITH t AS ($uniqTicksSql),
bounds AS (
  SELECT product_id, date_trunc('hour', min(event_time)) AS s, max(event_time) AS e
  FROM t GROUP BY 1),
g AS (
  SELECT product_id, unnest(generate_series(s, e, INTERVAL '1 hour')) AS grid_ts
  FROM bounds),
filled AS (
  SELECT g.product_id, g.grid_ts, t.price
  FROM g ASOF LEFT JOIN t
    ON g.product_id = t.product_id AND g.grid_ts >= t.event_time
  WHERE t.price IS NOT NULL),
withmkt AS (
  SELECT product_id, grid_ts, price,
         ${Det.avgDSql("price", 9, " OVER (PARTITION BY grid_ts)")} AS mkt
  FROM filled)
SELECT product_id, grid_ts,
       CAST(count(*) OVER f AS BIGINT) AS n_obs,
       ${s6(Det.betaDSql("price", "mkt", 4, " OVER f"))} AS beta24
FROM withmkt
WINDOW f AS (PARTITION BY product_id ORDER BY grid_ts
             ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)""",
      "variance_ratio" -> {
        // All integer algebra in HUGEINT (sum(BIGINT) already IS
        // HUGEINT); num/den are non-negative by construction (variance
        // numerators × counts), so the direct HUGEINT→DOUBLE cast is
        // correctly rounded — the one final division mirrors the Spark
        // side's string-routed casts bit for bit.
        val lagSel = (1 +: VrQs)
          .map(q => s"k - lag(k, $q) OVER w AS d$q").mkString(",\n         ")
        val mSel = (s"count(d1) AS n1, sum(d1) AS s1, sum(d1*d1) AS s2" +:
          VrQs.map(q =>
            s"count(d$q) AS n$q, sum(d$q) AS t1_$q, sum(d$q*d$q) AS t2_$q"))
          .mkString(",\n         ")
        val arms = VrQs.map(q =>
          s"""SELECT product_id, $q AS q, n$q AS n_pairs,
         CAST(n1 AS HUGEINT)*n1*(CAST(n$q AS HUGEINT)*t2_$q - CAST(t1_$q AS HUGEINT)*t1_$q) AS num,
         $q*CAST(n$q AS HUGEINT)*n$q*(CAST(n1 AS HUGEINT)*s2 - CAST(s1 AS HUGEINT)*s1) AS den
  FROM m""").mkString("\n  UNION ALL\n  ")
        s"""WITH t AS ($uniqTicksSql),
bounds AS (
  SELECT product_id, date_trunc('hour', min(event_time)) AS s, max(event_time) AS e
  FROM t GROUP BY 1),
g AS (
  SELECT product_id, unnest(generate_series(s, e, INTERVAL '1 hour')) AS grid_ts
  FROM bounds),
filled AS (
  SELECT g.product_id, g.grid_ts, t.price
  FROM g ASOF LEFT JOIN t
    ON g.product_id = t.product_id AND g.grid_ts >= t.event_time
  WHERE t.price IS NOT NULL),
seq AS (
  SELECT product_id, grid_ts, ${Det.klSql("price", 4)} AS k FROM filled),
diffs AS (
  SELECT product_id,
         $lagSel
  FROM seq WINDOW w AS (PARTITION BY product_id ORDER BY grid_ts)),
m AS (
  SELECT product_id,
         $mSel
  FROM diffs GROUP BY 1),
un AS (
  $arms)
SELECT product_id, q, n_pairs,
       CASE WHEN den > 0 THEN ${s6("CAST(num AS DOUBLE)/CAST(den AS DOUBLE)")} END AS vr
FROM un"""
      },
      "market_beta" ->
        s"""WITH t AS ($uniqTicksSql),
bounds AS (
  SELECT product_id, date_trunc('hour', min(event_time)) AS s, max(event_time) AS e
  FROM t GROUP BY 1),
g AS (
  SELECT product_id, unnest(generate_series(s, e, INTERVAL '1 hour')) AS grid_ts
  FROM bounds),
filled AS (
  SELECT g.product_id, g.grid_ts, t.price
  FROM g ASOF LEFT JOIN t
    ON g.product_id = t.product_id AND g.grid_ts >= t.event_time
  WHERE t.price IS NOT NULL),
withmkt AS (
  SELECT product_id, price,
         ${Det.avgDSql("price", 9, " OVER (PARTITION BY grid_ts)")} AS mkt
  FROM filled)
SELECT product_id, count(*) AS n_obs,
       ${s6(Det.betaDSql("price", "mkt", 4))} AS beta,
       ${s6(s"(${Det.avgDSql("price", 9)} - ${Det.betaDSql("price", "mkt", 4)} * ${Det.avgDSql("mkt", 9)})")} AS alpha
FROM withmkt
GROUP BY product_id""",
      "kendall_tau" ->
        s"""WITH t AS ($uniqTicksSql),
bounds AS (
  SELECT product_id, date_trunc('hour', min(event_time)) AS s, max(event_time) AS e
  FROM t GROUP BY 1),
g AS (
  SELECT product_id, unnest(generate_series(s, e, INTERVAL '1 hour')) AS grid_ts
  FROM bounds),
filled AS (
  SELECT g.product_id, g.grid_ts, t.price
  FROM g ASOF LEFT JOIN t
    ON g.product_id = t.product_id AND g.grid_ts >= t.event_time
  WHERE t.price IS NOT NULL),
top2 AS (
  SELECT product_id, rk FROM (
    SELECT product_id, row_number() OVER (ORDER BY count(*) DESC, product_id) AS rk
    FROM filled GROUP BY product_id) r
  WHERE rk <= 2),
aligned AS (
  SELECT a.grid_ts, a.price AS xa, b.price AS xb
  FROM (SELECT f.grid_ts, f.price FROM filled f JOIN top2 ON f.product_id = top2.product_id AND top2.rk = 1) a
  JOIN (SELECT f.grid_ts, f.price FROM filled f JOIN top2 ON f.product_id = top2.product_id AND top2.rk = 2) b
    ON a.grid_ts = b.grid_ts),
sg AS (
  SELECT CAST(sign(p2.xa - p1.xa) * sign(p2.xb - p1.xb) AS INTEGER) AS sg
  FROM aligned p1 JOIN aligned p2 ON p1.grid_ts < p2.grid_ts),
agg AS (
  SELECT count(*) AS n_pairs,
         count(CASE WHEN sg = 1 THEN 1 END) AS concordant,
         count(CASE WHEN sg = -1 THEN 1 END) AS discordant,
         count(CASE WHEN sg = 0 THEN 1 END) AS tied
  FROM sg)
SELECT n_pairs, concordant, discordant, tied,
       ${s6("CAST(concordant - discordant AS DOUBLE) / CAST(n_pairs AS DOUBLE)")} AS tau_a
FROM agg""",
      "ewma_var" -> {
        val base = s"""(SELECT product_id, event_time, sequence, r * r AS r2
  FROM (SELECT product_id, event_time, sequence,
               price - lag(price, 1) OVER (PARTITION BY product_id
                   ORDER BY event_time, sequence) AS r
        FROM ($liveTicksSql) lt0) lt1
  WHERE r IS NOT NULL) rsq"""
        val inner = Ewma.finalPerKeySql(base, "product_id", "event_time",
          "sequence", "r2", 0.0625)
        s"""SELECT product_id, n_ticks, ${s6("ewma")} AS var_ewma,
       ${s6("sqrt(ewma)")} AS vol
FROM ($inner) e"""
      },
      "kendall_corr" ->
        s"""WITH t AS ($uniqTicksSql),
bounds AS (
  SELECT product_id, date_trunc('hour', min(event_time)) AS s, max(event_time) AS e
  FROM t GROUP BY 1),
g AS (
  SELECT product_id, unnest(generate_series(s, e, INTERVAL '1 hour')) AS grid_ts
  FROM bounds),
filled AS (
  SELECT g.product_id, g.grid_ts, t.price
  FROM g ASOF LEFT JOIN t
    ON g.product_id = t.product_id AND g.grid_ts >= t.event_time
  WHERE t.price IS NOT NULL),
wm AS (
  SELECT product_id, grid_ts, price,
         ${Det.avgDSql("price", 9, " OVER (PARTITION BY grid_ts)")} AS mkt
  FROM filled),
p AS (
  SELECT x.product_id,
         sign(y.price - x.price) AS sa, sign(y.mkt - x.mkt) AS sb
  FROM wm x JOIN wm y
    ON x.product_id = y.product_id AND x.grid_ts < y.grid_ts),
c AS (
  SELECT product_id,
         CAST(count(*) AS BIGINT) AS n_pairs,
         CAST(count(CASE WHEN sa * sb > 0 THEN 1 END) AS BIGINT) AS concordant,
         CAST(count(CASE WHEN sa * sb < 0 THEN 1 END) AS BIGINT) AS discordant,
         CAST(count(CASE WHEN sa = 0 THEN 1 END) AS BIGINT) AS tied_a,
         CAST(count(CASE WHEN sb = 0 THEN 1 END) AS BIGINT) AS tied_b
  FROM p GROUP BY 1),
n AS (SELECT product_id, CAST(count(*) AS BIGINT) AS n_obs FROM wm GROUP BY 1)
SELECT n.product_id, n.n_obs, c.n_pairs, c.concordant, c.discordant,
       c.tied_a, c.tied_b,
       CASE WHEN c.n_pairs - c.tied_a > 0 AND c.n_pairs - c.tied_b > 0 THEN
         ${s6("CAST(c.concordant - c.discordant AS DOUBLE) / sqrt(CAST(CAST(CAST(c.n_pairs - c.tied_a AS HUGEINT) * (c.n_pairs - c.tied_b) AS VARCHAR) AS DOUBLE))")}
       END AS tau_b
FROM n JOIN c USING (product_id)
WHERE n.n_obs >= 2""",
      "seasonal_decompose" ->
        s"""WITH $seasonalBaseSql,
agg AS (
  SELECT product_id, hour_od, CAST(count(*) AS BIGINT) AS n_obs,
         sum(y) AS sy, sum(y * y) AS sy2
  FROM y GROUP BY 1, 2)
SELECT product_id, hour_od, n_obs,
       ${s6(s"${Det.signedDblSql("sy")} / 48 / 10000 / n_obs")} AS seasonal,
       ${s6("sqrt(CAST(CAST(n_obs * sy2 - sy * sy AS VARCHAR) AS DOUBLE)) / (CAST(480000 AS DOUBLE) * n_obs)")} AS sd_within
FROM agg""",
      "seasonal_anomalies" ->
        s"""WITH $seasonalBaseSql,
agg AS (
  SELECT product_id, hour_od, CAST(count(*) AS BIGINT) AS n_obs,
         sum(y) AS sy, sum(y * y) AS sy2
  FROM y GROUP BY 1, 2),
sc AS (
  SELECT y.product_id, y.grid_ts, y.hour_od, a.n_obs,
         abs(y.y * a.n_obs - a.sy) AS rnum,
         a.n_obs * a.sy2 - a.sy * a.sy AS vnum
  FROM y JOIN agg a ON y.product_id = a.product_id AND y.hour_od = a.hour_od
  WHERE a.n_obs * a.sy2 - a.sy * a.sy > 0),
z AS (
  SELECT product_id, grid_ts, hour_od, n_obs,
         CAST(rnum AS DOUBLE) / sqrt(CAST(CAST(vnum AS VARCHAR) AS DOUBLE)) AS zs
  FROM sc)
SELECT product_id, grid_ts, hour_od, n_obs, ${s6("zs")} AS z_score, rk FROM (
  SELECT *, CAST(row_number() OVER (ORDER BY zs DESC, product_id, grid_ts) AS BIGINT) AS rk
  FROM z WHERE zs > 3)
WHERE rk <= 20""",
      "spearman_corr" ->
        s"""WITH t AS ($uniqTicksSql),
bounds AS (
  SELECT product_id, date_trunc('hour', min(event_time)) AS s, max(event_time) AS e
  FROM t GROUP BY 1),
g AS (
  SELECT product_id, unnest(generate_series(s, e, INTERVAL '1 hour')) AS grid_ts
  FROM bounds),
filled AS (
  SELECT g.product_id, g.grid_ts, t.price
  FROM g ASOF LEFT JOIN t
    ON g.product_id = t.product_id AND g.grid_ts >= t.event_time
  WHERE t.price IS NOT NULL),
withmkt AS (
  SELECT product_id, grid_ts, price,
         ${Det.avgDSql("price", 9, " OVER (PARTITION BY grid_ts)")} AS mkt
  FROM filled),
ranked AS (
  SELECT product_id,
         CAST(row_number() OVER (PARTITION BY product_id ORDER BY price, grid_ts) AS BIGINT)
           - CAST(row_number() OVER (PARTITION BY product_id ORDER BY mkt, grid_ts) AS BIGINT) AS dd
  FROM withmkt),
agg AS (
  SELECT product_id, count(*) AS n_obs, CAST(sum(dd * dd) AS BIGINT) AS sd2
  FROM ranked GROUP BY 1)
SELECT product_id, n_obs,
       ${s6("CAST(1 AS DOUBLE) - CAST(6 AS DOUBLE) * CAST(sd2 AS DOUBLE) / CAST(n_obs * (n_obs * n_obs - 1) AS DOUBLE)")} AS spearman
FROM agg WHERE n_obs >= 2""",
      "lee_ready" ->
        s"""WITH t AS ($liveTicksSql),
s1 AS (
  SELECT product_id, event_time, sequence, price,
         (best_bid + best_ask) / 2 AS mid,
         CASE WHEN price > lag(price, 1) OVER w THEN 1
              WHEN price < lag(price, 1) OVER w THEN -1 END AS tick0
  FROM t WINDOW w AS (PARTITION BY product_id ORDER BY event_time, sequence)),
s2 AS (
  SELECT product_id, price, mid,
         last_value(tick0 IGNORE NULLS) OVER (
             PARTITION BY product_id ORDER BY event_time, sequence
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tick
  FROM s1),
s3 AS (
  SELECT product_id, price,
         CASE WHEN mid IS NOT NULL AND price > mid THEN 1
              WHEN mid IS NOT NULL AND price < mid THEN -1
              ELSE tick END AS dir
  FROM s2)
SELECT product_id, count(*) AS n_ticks,
       count(CASE WHEN dir = 1 THEN 1 END) AS n_buys,
       count(CASE WHEN dir = -1 THEN 1 END) AS n_sells,
       count(CASE WHEN dir IS NULL THEN 1 END) AS n_unclassified,
       ${s6(Det.sumDSql("CASE WHEN dir IS NOT NULL THEN dir * price END", 4))} AS signed_flow
FROM s3 GROUP BY product_id""",
      "vol_signature" -> {
        val arms = SigDeltas.map { dl =>
          s"""SELECT product_id, $dl AS delta_h, count(*) AS n_obs,
       ${s6(s"(CAST(sum(d*d) AS DOUBLE) / 1e8) / CAST(count(*) * $dl AS DOUBLE)")} AS rv_per_hour
  FROM (SELECT product_id, k - lag(k, 1) OVER (PARTITION BY product_id ORDER BY rn) AS d
        FROM seq WHERE (rn - 1) % $dl = 0) a$dl
  WHERE d IS NOT NULL GROUP BY product_id"""
        }.mkString("\n  UNION ALL\n  ")
        s"""WITH t AS ($uniqTicksSql),
bounds AS (
  SELECT product_id, date_trunc('hour', min(event_time)) AS s, max(event_time) AS e
  FROM t GROUP BY 1),
g AS (
  SELECT product_id, unnest(generate_series(s, e, INTERVAL '1 hour')) AS grid_ts
  FROM bounds),
filled AS (
  SELECT g.product_id, g.grid_ts, t.price
  FROM g ASOF LEFT JOIN t
    ON g.product_id = t.product_id AND g.grid_ts >= t.event_time
  WHERE t.price IS NOT NULL),
seq AS (
  SELECT product_id, ${Det.klSql("price", 4)} AS k,
         row_number() OVER (PARTITION BY product_id ORDER BY grid_ts) AS rn
  FROM filled)
$arms"""
      },
      "hurst_rs" -> {
        val armCtes = RsLens.map { l =>
          s"""a$l AS (
  SELECT product_id, (rn - 1) // $l AS blk, (rn - 1) % $l + 1 AS i, price, k
  FROM seq WHERE (rn - 1) // $l < ntot // $l),
d$l AS (
  SELECT product_id, blk, price,
         $l * sum(k) OVER (PARTITION BY product_id, blk ORDER BY i)
           - i * sum(k) OVER (PARTITION BY product_id, blk) AS dd
  FROM a$l),
b$l AS (
  SELECT product_id, blk, max(dd) - min(dd) AS rr,
         ${Det.stddevPopDSql("price", 4)} AS sd
  FROM d$l GROUP BY 1, 2),
r$l AS (
  SELECT product_id,
         ${s6(s"CAST(rr AS DOUBLE) / ${Det.dblLit(l * 1e4)} / sd")} AS rs
  FROM b$l WHERE sd > 0)"""
        }.mkString(",\n")
        val armSelects = RsLens.map { l =>
          s"""SELECT product_id, $l AS block_len, count(*) AS n_blocks,
       ${s6(Det.avgDSql("rs", 6))} AS mean_rs
  FROM r$l GROUP BY product_id"""
        }.mkString("\n  UNION ALL\n  ")
        s"""WITH t AS ($uniqTicksSql),
bounds AS (
  SELECT product_id, date_trunc('hour', min(event_time)) AS s, max(event_time) AS e
  FROM t GROUP BY 1),
g AS (
  SELECT product_id, unnest(generate_series(s, e, INTERVAL '1 hour')) AS grid_ts
  FROM bounds),
filled AS (
  SELECT g.product_id, g.grid_ts, t.price
  FROM g ASOF LEFT JOIN t
    ON g.product_id = t.product_id AND g.grid_ts >= t.event_time
  WHERE t.price IS NOT NULL),
seq AS (
  SELECT product_id, grid_ts, price, ${Det.klSql("price", 4)} AS k,
         row_number() OVER (PARTITION BY product_id ORDER BY grid_ts) AS rn,
         count(*) OVER (PARTITION BY product_id) AS ntot
  FROM filled),
$armCtes
$armSelects"""
      },
      "rolling_corr" ->
        s"""WITH t AS ($uniqTicksSql),
bounds AS (
  SELECT product_id, date_trunc('hour', min(event_time)) AS s, max(event_time) AS e
  FROM t GROUP BY 1),
g AS (
  SELECT product_id, unnest(generate_series(s, e, INTERVAL '1 hour')) AS grid_ts
  FROM bounds),
filled AS (
  SELECT g.product_id, g.grid_ts, t.price
  FROM g ASOF LEFT JOIN t
    ON g.product_id = t.product_id AND g.grid_ts >= t.event_time
  WHERE t.price IS NOT NULL),
top2 AS (
  SELECT product_id, rk FROM (
    SELECT product_id, row_number() OVER (ORDER BY count(*) DESC, product_id) AS rk
    FROM filled GROUP BY product_id) r
  WHERE rk <= 2),
aligned AS (
  SELECT a.grid_ts, a.price AS xa, b.price AS xb
  FROM (SELECT f.grid_ts, f.price FROM filled f JOIN top2 ON f.product_id = top2.product_id AND top2.rk = 1) a
  JOIN (SELECT f.grid_ts, f.price FROM filled f JOIN top2 ON f.product_id = top2.product_id AND top2.rk = 2) b
    ON a.grid_ts = b.grid_ts)
SELECT grid_ts, CAST(count(*) OVER f AS BIGINT) AS n_obs,
       ${s6(Det.corrDSql("xa", "xb", 4, " OVER f"))} AS corr24
FROM aligned
WINDOW f AS (ORDER BY grid_ts ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)""",
      "pairs_spread" ->
        s"""WITH t AS ($uniqTicksSql),
bounds AS (
  SELECT product_id, date_trunc('hour', min(event_time)) AS s, max(event_time) AS e
  FROM t GROUP BY 1),
g AS (
  SELECT product_id, unnest(generate_series(s, e, INTERVAL '1 hour')) AS grid_ts
  FROM bounds),
filled AS (
  SELECT g.product_id, g.grid_ts, t.price
  FROM g ASOF LEFT JOIN t
    ON g.product_id = t.product_id AND g.grid_ts >= t.event_time
  WHERE t.price IS NOT NULL),
top2 AS (
  SELECT product_id, rk FROM (
    SELECT product_id, row_number() OVER (ORDER BY count(*) DESC, product_id) AS rk
    FROM filled GROUP BY product_id) r
  WHERE rk <= 2),
aligned AS (
  SELECT a.grid_ts, a.price AS xa, b.price AS xb, a.price - b.price AS spread
  FROM (SELECT f.grid_ts, f.price FROM filled f JOIN top2 ON f.product_id = top2.product_id AND top2.rk = 1) a
  JOIN (SELECT f.grid_ts, f.price FROM filled f JOIN top2 ON f.product_id = top2.product_id AND top2.rk = 2) b
    ON a.grid_ts = b.grid_ts),
z AS (
  SELECT grid_ts, xa, xb, spread,
         CASE WHEN ${Det.stddevPopDSql("spread", 4, " OVER ()")} > 0
              THEN (spread - ${Det.avgDSql("spread", 9, " OVER ()")})
                   / ${Det.stddevPopDSql("spread", 4, " OVER ()")} END AS z
  FROM aligned)
SELECT grid_ts, ${s6("xa")} AS xa, ${s6("xb")} AS xb,
       ${s6("spread")} AS spread, ${s6("z")} AS z
FROM z WHERE abs(z) > 2.0""",
      // Round-12 capacity rework (the 100× tier couldn't grade this
      // oracle — 70 GB ASOF spill): the top-2 pick now uses the SAME
      // closed-form span count as the Spark side's topProducts (exact
      // integer micros arithmetic over raw tick min/max — provably equal
      // to ranking by filled-grid length, see topProducts' scaladoc), so
      // only the TWO picked instruments' grids are ever built; filled /
      // aligned / top2 are MATERIALIZED so the 7 lag arms and both
      // aligned sides reuse them instead of re-inlining the ASOF join
      // (the DuckDB plain-CTE footgun) — up to 14× redundant before.
      "lead_lag" -> {
        val lags = -3 to 3
        val arms = lags.map { l =>
          val shift = if (l >= 0) s"lead(xb, $l) OVER (ORDER BY grid_ts)"
            else s"lag(xb, ${-l}) OVER (ORDER BY grid_ts)"
          s"SELECT $l AS lag_h, xa, $shift AS xbl FROM aligned"
        }.mkString("\n  UNION ALL\n  ")
        s"""WITH t AS ($uniqTicksSql),
spans AS (
  SELECT product_id,
         (epoch_us(max(event_time)) - epoch_us(date_trunc('hour', min(event_time)))) // 3600000000
         + CASE WHEN min(event_time) = date_trunc('hour', min(event_time))
                THEN 1 ELSE 0 END AS n
  FROM t GROUP BY 1),
top2 AS MATERIALIZED (
  SELECT product_id, CAST(row_number() OVER (ORDER BY n DESC, product_id) AS BIGINT) AS rk
  FROM spans WHERE n > 0
  QUALIFY row_number() OVER (ORDER BY n DESC, product_id) <= 2),
t2 AS MATERIALIZED (
  SELECT t.* FROM t JOIN top2 ON t.product_id = top2.product_id),
bounds AS (
  SELECT product_id, date_trunc('hour', min(event_time)) AS s, max(event_time) AS e
  FROM t2 GROUP BY 1),
g AS (
  SELECT product_id, unnest(generate_series(s, e, INTERVAL '1 hour')) AS grid_ts
  FROM bounds),
filled AS MATERIALIZED (
  SELECT g.product_id, g.grid_ts, t2.price
  FROM g ASOF LEFT JOIN t2
    ON g.product_id = t2.product_id AND g.grid_ts >= t2.event_time
  WHERE t2.price IS NOT NULL),
aligned AS MATERIALIZED (
  SELECT a.grid_ts, a.price AS xa, b.price AS xb
  FROM (SELECT f.grid_ts, f.price FROM filled f JOIN top2 ON f.product_id = top2.product_id AND top2.rk = 1) a
  JOIN (SELECT f.grid_ts, f.price FROM filled f JOIN top2 ON f.product_id = top2.product_id AND top2.rk = 2) b
    ON a.grid_ts = b.grid_ts),
un AS (
  $arms),
c AS (
  SELECT lag_h, count(*) AS n_obs, ${Det.corrDSql("xa", "xbl", 4)} AS xr
  FROM un WHERE xbl IS NOT NULL GROUP BY lag_h),
r AS (
  SELECT *, row_number() OVER (ORDER BY coalesce(abs(xr), -1) DESC, lag_h) AS rk2
  FROM c)
SELECT CAST(lag_h AS BIGINT) AS lag_h, n_obs, ${s6("xr")} AS xcorr,
       rk2 = 1 AS is_best
FROM r"""
      },
      "corr_matrix" ->
        s"""WITH t AS ($uniqTicksSql),
bounds AS (
  SELECT product_id, date_trunc('hour', min(event_time)) AS s, max(event_time) AS e
  FROM t GROUP BY 1),
g AS (
  SELECT product_id, unnest(generate_series(s, e, INTERVAL '1 hour')) AS grid_ts
  FROM bounds),
filled AS (
  SELECT g.product_id, g.grid_ts, t.price
  FROM g ASOF LEFT JOIN t
    ON g.product_id = t.product_id AND g.grid_ts >= t.event_time
  WHERE t.price IS NOT NULL),
topn AS (
  SELECT product_id FROM (
    SELECT product_id, row_number() OVER (ORDER BY count(*) DESC, product_id) AS rk
    FROM filled GROUP BY product_id) r
  WHERE rk <= 15),
f AS (
  SELECT product_id, grid_ts, price FROM filled JOIN topn USING (product_id)),
pairs AS (
  SELECT a.product_id AS pa, b.product_id AS pb, a.price AS xa, b.price AS xb
  FROM f a JOIN f b ON a.grid_ts = b.grid_ts AND a.product_id < b.product_id)
SELECT pa, pb, count(*) AS n_obs, ${s6(Det.corrDSql("xa", "xb", 4))} AS pair_corr
FROM pairs GROUP BY pa, pb""",
      "seq_gaps" ->
        s"""WITH g AS (
  SELECT product_id,
         sequence - lag(sequence, 1) OVER (PARTITION BY product_id ORDER BY sequence) - 1 AS gap
  FROM ($liveTicksSql) lt)
SELECT product_id, count(*) AS n_ticks,
       count(CASE WHEN gap > 0 THEN 1 END) AS n_gaps,
       CAST(coalesce(sum(CASE WHEN gap > 0 THEN gap END), 0) AS BIGINT) AS missing_total,
       CAST(coalesce(max(CASE WHEN gap > 0 THEN gap END), 0) AS BIGINT) AS max_gap
FROM g GROUP BY product_id""",
      "momentum_ranks" ->
        s"""WITH t AS ($uniqTicksSql),
bounds AS (
  SELECT product_id, date_trunc('hour', min(event_time)) AS s, max(event_time) AS e
  FROM t GROUP BY 1),
g AS (
  SELECT product_id, unnest(generate_series(s, e, INTERVAL '1 hour')) AS grid_ts
  FROM bounds),
filled AS (
  SELECT g.product_id, g.grid_ts, t.price
  FROM g ASOF LEFT JOIN t
    ON g.product_id = t.product_id AND g.grid_ts >= t.event_time
  WHERE t.price IS NOT NULL),
mom AS (
  SELECT product_id, grid_ts,
         price / lag(price, 24) OVER (PARTITION BY product_id ORDER BY grid_ts) - 1.0 AS mom
  FROM filled)
SELECT grid_ts, rk, product_id, ${s6("mom")} AS mom, n_products
FROM (SELECT grid_ts, product_id, mom,
        CAST(row_number() OVER (PARTITION BY grid_ts
            ORDER BY mom DESC, product_id) AS BIGINT) AS rk,
        count(*) OVER (PARTITION BY grid_ts) AS n_products
      FROM mom WHERE mom IS NOT NULL)
WHERE rk <= 10""",
      "market_corr" ->
        s"""WITH t AS ($uniqTicksSql),
bounds AS (
  SELECT product_id, date_trunc('hour', min(event_time)) AS s, max(event_time) AS e
  FROM t GROUP BY 1),
g AS (
  SELECT product_id, unnest(generate_series(s, e, INTERVAL '1 hour')) AS grid_ts
  FROM bounds),
filled AS (
  SELECT g.product_id, g.grid_ts, t.price
  FROM g ASOF LEFT JOIN t
    ON g.product_id = t.product_id AND g.grid_ts >= t.event_time
  WHERE t.price IS NOT NULL),
withmkt AS (
  SELECT product_id, price,
         ${Det.avgDSql("price", 9, " OVER (PARTITION BY grid_ts)")} AS mkt
  FROM filled)
SELECT product_id, count(*) AS n_obs,
       ${s6(Det.corrDSql("price", "mkt", 4))} AS mkt_corr
FROM withmkt
GROUP BY product_id""",
      "outliers" -> {
        val ov = " OVER (PARTITION BY product_id)"
        s"""WITH t AS ($liveTicksSql),
z AS (
  SELECT product_id, event_time, sequence, price,
         CASE WHEN ${Det.stddevPopDSql("price", 4, ov)} > 0
              THEN (price - ${Det.avgDSql("price", 9, ov)})
                   / ${Det.stddevPopDSql("price", 4, ov)} END AS z
  FROM t)
SELECT product_id, event_time, sequence, ${s6("price")} AS price, ${s6("z")} AS z
FROM z WHERE abs(z) > 2"""
      }
    )
  }
}

package graft.queries

import graft.ops.Det
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Statistical and curation operators, each with a DuckDB oracle twin:
  * chi-square contingency analysis, deterministic balanced class
  * sampling, and session path mining. Counts are exact integers; derived
  * doubles are fixed IEEE sequences over exactly-converted integers.
  */
object StatQueries {

  private def s6(x: String): String = Det.snapSql(x, 6)

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  // Balanced sampling: per-class quota.
  private val BalanceN = 40
  // Session path mining: inactivity gap + result size.
  private val PathGapUs = 1800L * 1000000L
  private val PathTopK = 15

  /** Chi-square contingency table over (o_orderpriority, o_orderstatus):
    * observed counts, independence-expected counts e = r·c/n, and the
    * per-cell chi² term (o−e)²/e. r·c stays an exact long < 2^53, so its
    * double conversion is exact and the remaining three IEEE ops are
    * correctly rounded — engine-identical without any Det grid. The
    * global total is NOT emitted: a float Σ over cells would reintroduce
    * order-dependence; consumers sum the (snapped) terms themselves.
    *
    * Scale shape: one hash aggregate over the fact table, then window
    * sums over the |prio|×|status| cell table (tiny at any data size).
    */
  private def chi2(s: SparkSession, d: String): DataFrame = {
    val cells = t(s, d, "orders")
      .groupBy(col("o_orderpriority").as("prio"), col("o_orderstatus").as("status"))
      .agg(count(lit(1)).as("n_obs"))
    val r = sum(col("n_obs")).over(Window.partitionBy(col("prio")))
    val c = sum(col("n_obs")).over(Window.partitionBy(col("status")))
    val n = sum(col("n_obs")).over(Window.partitionBy())
    val expected = (r * c).cast("double") / n.cast("double")
    val obs = col("n_obs").cast("double")
    cells
      .withColumn("expected", Det.snap(expected, 6))
      .withColumn("chi2_term",
        Det.snap((obs - expected) * (obs - expected) / expected, 6))
  }

  private val chi2Sql =
    s"""WITH cells AS (
  SELECT o_orderpriority AS prio, o_orderstatus AS status, count(*) AS n_obs
  FROM orders GROUP BY 1, 2
), tot AS (
  SELECT *,
         CAST(sum(n_obs) OVER (PARTITION BY prio) AS BIGINT) AS r,
         CAST(sum(n_obs) OVER (PARTITION BY status) AS BIGINT) AS c,
         CAST(sum(n_obs) OVER () AS BIGINT) AS n
  FROM cells)
SELECT prio, status, n_obs,
       ${s6("CAST(r * c AS DOUBLE) / CAST(n AS DOUBLE)")} AS expected,
       ${s6(
        "(CAST(n_obs AS DOUBLE) - CAST(r * c AS DOUBLE) / CAST(n AS DOUBLE)) * " +
        "(CAST(n_obs AS DOUBLE) - CAST(r * c AS DOUBLE) / CAST(n AS DOUBLE)) / " +
        "(CAST(r * c AS DOUBLE) / CAST(n AS DOUBLE))")} AS chi2_term
FROM tot"""

  /** Deterministic balanced class sample: exactly min(|class|, N) docs per
    * language, ranked by md5 of a salted key — the class-balancing step of
    * a training-data pipeline, reproducible across engines and runs (same
    * md5 everywhere; no RNG). One ranked window per class partition; at
    * 100 TB the rank-limit pushes into each partition (no global sort).
    */
  private def balanced(s: SparkSession, d: String): DataFrame = {
    val rk = row_number().over(Window.partitionBy(col("lang"))
      .orderBy(md5(concat(lit("bal:"), col("doc_id").cast("string")).cast("binary")),
        col("doc_id")))
    t(s, d, "documents")
      .withColumn("rk", rk)
      .filter(col("rk") <= BalanceN)
      .select(col("lang"), col("rk"), col("doc_id"), col("source"), col("n_chars"))
  }

  private val balancedSql =
    s"""SELECT lang, rk, doc_id, source, n_chars
FROM (SELECT lang, doc_id, source, n_chars,
        CAST(row_number() OVER (PARTITION BY lang
            ORDER BY md5('bal:' || CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS rk
      FROM documents)
WHERE rk <= $BalanceN"""

  /** Session path mining: the most common event-type journeys, where a
    * journey is the '>'-joined event sequence of one user session
    * (30-minute inactivity gap, same boundary rule as Sessionize). Path
    * assembly sorts each session's (ts, event_id, type) structs — a
    * deterministic total order — and joins the types; the per-session
    * transform lambda runs interpreted but over session-sized arrays
    * (dozens of elements), not the per-event hot path (CLAUDE.md
    * invariant 4 applies to the latter).
    *
    * Scale shape: one keyed window pass (gaps-and-islands sid), one
    * (user, sid) aggregate, one path aggregate, then a global top-k —
    * rank-limited, no global sort of the path table.
    */
  private def sessionPaths(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val marked = AnalyticsQueries.events(s, d)
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("new_s",
        when(col("us") - lag(col("us"), 1).over(w) < PathGapUs, lit(0L))
          .otherwise(lit(1L)))
      .withColumn("sid", sum(col("new_s")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val paths = marked
      .groupBy(col("user_id"), col("sid"))
      .agg(sort_array(collect_list(
        struct(col("ts"), col("event_id"), col("event_type")))).as("evs"))
      .select(concat_ws(">",
        expr("transform(evs, e -> e.event_type)")).as("path"))
    // Top-K without a global-sort window: orderBy+limit is TakeOrdered
    // (per-partition heaps, driver merge of K rows — the distinct-path
    // frame is unbounded at corpus scale), then the rank window runs on
    // the ≤K-row serving frame only. The (desc, path) key is a total
    // order, so set + ranks are identical to the windowed form.
    paths.groupBy(col("path")).agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path")).limit(PathTopK)
      .withColumn("rk", row_number().over(
        Window.orderBy(col("n_sessions").desc, col("path"))))
  }

  private val sessionPathsSql =
    s"""WITH marked AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                OVER (PARTITION BY user_id ORDER BY ts, event_id) < $PathGapUs
              THEN 0 ELSE 1 END AS new_s
  FROM events
), sess AS (
  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM marked
), paths AS (
  SELECT user_id, sid,
         string_agg(event_type, '>' ORDER BY ts, event_id) AS path
  FROM sess GROUP BY user_id, sid)
SELECT path, n_sessions, rk
FROM (SELECT path, count(*) AS n_sessions,
        CAST(row_number() OVER (ORDER BY count(*) DESC, path) AS BIGINT) AS rk
      FROM paths GROUP BY path)
WHERE rk <= $PathTopK"""

  // Equal-frequency binning: deciles per language.
  private val NtileBins = 10

  /** Quantile (equal-frequency) binning — the feature-engineering
    * bucketizer: per language, documents split into NTILE(10) deciles by
    * (n_chars, doc_id), each bin reported with its count and exact value
    * range. NTILE's fill rule (first `n mod bins` bins get the extra row)
    * is standard SQL, deterministic under the fully tie-broken order.
    * Partitioned by language → each ranking sorts in parallel; at 100 TB
    * an un-partitioned NTILE would need a range-partitioned two-pass rank
    * instead (note, not needed here).
    */
  private def ntileBins(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("lang")).orderBy(col("n_chars"), col("doc_id"))
    t(s, d, "documents")
      .withColumn("bin", ntile(NtileBins).over(w))
      .groupBy(col("lang"), col("bin"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("n_chars")).as("lo_chars"),
        max(col("n_chars")).as("hi_chars"))
  }

  private val ntileBinsSql =
    s"""SELECT lang, bin, count(*) AS n_docs,
       min(n_chars) AS lo_chars, max(n_chars) AS hi_chars
FROM (SELECT lang, n_chars, doc_id,
        CAST(ntile($NtileBins) OVER (PARTITION BY lang
            ORDER BY n_chars, doc_id) AS INT) AS bin
      FROM documents)
GROUP BY lang, bin"""

  /** Skew-safe salted aggregation as a live contract query: per-type Det
    * sums of event value computed through [[graft.ops.Salt]]'s two-phase
    * (salt → partial → combine) plan. event_type has 5 heavy keys — the
    * worst-case shape for single-phase grouping at 100 TB. Because the
    * partials are exact grid longs, the salted combine tree produces the
    * SAME bits as the direct aggregate the oracle runs (the whole point:
    * skew mitigation with zero numeric drift).
    */
  private def saltedAgg(s: SparkSession, d: String): DataFrame =
    graft.ops.Salt.saltedSumD(
      AnalyticsQueries.events(s, d).select(col("event_type"), col("value")),
      Seq("event_type"), col("value"), 4)
      .select(col("event_type"), col("sum").as("total_value"),
        col("count").as("n_events"))

  private val saltedAggSql =
    s"""SELECT event_type, ${s6(Det.sumDSql("value", 4))} AS total_value,
       count(*) AS n_events
FROM events GROUP BY event_type"""

  /** Exact higher moments per instrument — skewness and excess kurtosis
    * from integer POWER SUMS on the price grid (scale 2): Σk, Σk², Σk³,
    * Σk⁴ are exact integers. k ≤ ~6.7·10⁴ here (price ≤ 660), so k²
    * squares in longs and the cube/quartic promote to DECIMAL(38,0) /
    * HUGEINT BEFORE multiplying (k⁴ ≈ 2·10¹⁹ overflows a per-row long);
    * the wide sums stay exact to ~10³⁸ — room for >10¹⁸ rows per key.
    * Every power sum is positive, so each exact→double cast is
    * correctly rounded in BOTH engines with no signed-cast guard; the
    * central-moment finishing (m₂/m₃/m₄ from raw moments, skew =
    * m₃/(m₂·√m₂), kurt = m₄/m₂² − 3) is the identical IEEE sequence on
    * identical operand bits. One hash aggregate, map-side combined —
    * the Det story extended past variance. */
  private def priceMoments(s: SparkSession, d: String): DataFrame = {
    val k = Det.kl(col("price"), 2)
    val dec = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0)
    val base = TickQueries.ticks(s, d)
      .select(col("product_id"), k.as("k"))
      .groupBy(col("product_id"))
      .agg(count(lit(1)).as("n"),
        sum(col("k")).as("s1"),
        sum(col("k") * col("k")).as("s2"),
        // promote BEFORE the cube/quartic multiply: k ≈ 10⁵ makes k⁴
        // overflow a per-row long; k² always fits, so square in longs
        // and finish the powers in exact decimal
        sum((col("k") * col("k")).cast(dec) * col("k")).as("s3"),
        sum((col("k") * col("k")).cast(dec) * (col("k") * col("k"))).as("s4"))
    val nD = col("n").cast("double")
    val g = lit(100.0) // grid divisor 10^2
    // s3/s4 exceed 2^53: JVM Decimal→Double (BigDecimal.doubleValue) is
    // NOT guaranteed correctly rounded there, so route via an exact
    // decimal STRING — string→double parsing IS correctly rounded in
    // both engines at any magnitude (oracle mirrors with VARCHAR).
    def viaString(c: org.apache.spark.sql.Column) =
      c.cast("string").cast("double")
    val mean = col("s1").cast("double") / g / nD
    val r2 = col("s2").cast("double") / (g * g) / nD
    val r3 = viaString(col("s3")) / (g * g * g) / nD
    val r4 = viaString(col("s4")) / (g * g * g * g) / nD
    val m2 = r2 - mean * mean
    val m3 = r3 - lit(3.0) * mean * r2 + lit(2.0) * mean * mean * mean
    val m4 = r4 - lit(4.0) * mean * r3 + lit(6.0) * mean * mean * r2 -
      lit(3.0) * mean * mean * mean * mean
    base.select(col("product_id"), col("n").as("n_ticks"),
      mean.as("mean_price"),
      when(m2 > 0, m3 / (m2 * sqrt(m2))).as("skewness"),
      when(m2 > 0, m4 / (m2 * m2) - lit(3.0)).as("excess_kurtosis"))
  }

  private val priceMomentsSql = {
    val k = Det.klSql("price", 2)
    val pre =
      s"""SELECT product_id, count(*) AS n,
         sum(kk) AS s1, sum(kk * kk) AS s2,
         sum(CAST(kk * kk AS HUGEINT) * kk) AS s3,
         sum(CAST(kk * kk AS HUGEINT) * (kk * kk)) AS s4
  FROM (SELECT product_id, $k AS kk FROM (${TickQueries.liveTicksSql}) lt) t
  GROUP BY product_id"""
    val nD = "CAST(n AS DOUBLE)"
    val mean = s"(CAST(s1 AS DOUBLE) / 100.0 / $nD)"
    val r2 = s"(CAST(s2 AS DOUBLE) / (100.0 * 100.0) / $nD)"
    val r3 = s"(CAST(CAST(s3 AS VARCHAR) AS DOUBLE) / (100.0 * 100.0 * 100.0) / $nD)"
    val r4 = s"(CAST(CAST(s4 AS VARCHAR) AS DOUBLE) / (100.0 * 100.0 * 100.0 * 100.0) / $nD)"
    val m2 = s"($r2 - $mean * $mean)"
    val m3 = s"($r3 - 3.0 * $mean * $r2 + 2.0 * $mean * $mean * $mean)"
    val m4 = s"($r4 - 4.0 * $mean * $r3 + 6.0 * $mean * $mean * $r2 - 3.0 * $mean * $mean * $mean * $mean)"
    s"""SELECT product_id, n AS n_ticks, ${s6(mean)} AS mean_price,
       ${s6(s"CASE WHEN $m2 > 0 THEN $m3 / ($m2 * sqrt($m2)) END")} AS skewness,
       ${s6(s"CASE WHEN $m2 > 0 THEN $m4 / ($m2 * $m2) - 3.0 END")} AS excess_kurtosis
FROM ($pre) agg"""
  }

  /** theil_sen: trailing window of hourly closes per instrument — the
    * window CAP is what makes the estimator scale-safe: pairs are
    * O(SenWindow²) per key regardless of history length (an unbounded
    * Theil–Sen is Θ(hours²) and dies at the 100× span). */
  private val SenWindow = 128

  /** Theil–Sen (Sen's slope) robust trend per instrument: the median of
    * all pairwise slopes over the trailing [[SenWindow]] hourly closes,
    * plus the matching median-residual intercept — the
    * outlier-breakdown-0.29 trend line econometrics reaches for when
    * OLS gets dragged by spikes (Sen 1968). Engine-exact WITHOUT any
    * grid: each slope is ONE correctly-rounded division of parquet
    * doubles by an exact-integer Δt, both engines order identical
    * doubles identically, and the median is the lower order-statistic
    * PICK at rank (m+1) div 2 (ties broken (ta, tb)) — a pick, never an
    * average, so nothing is ever summed. Intercept: same pick over
    * per-point residuals close − slope·t.
    *
    * Scale shape: hourly downsample (one hash agg) → trailing-window
    * rank (one keyed Exchange) → a SenWindow²-bounded per-key self-join
    * → two rank picks on the same key partitioning. */
  private def theilSen(s: SparkSession, d: String): DataFrame = {
    // r16 guide §2.4: the trailing-window frame is referenced THREE
    // times below (both self-join sides + the residual join) — lazy, the
    // whole ticks scan + hourly close + trailing-rank subtree executed
    // 3× (6 parquet scans, 16 Exchanges in the before plan). It is
    // ≤ SenWindow rows per instrument, so one eager checkpoint
    // materializes it once and the pair join reads blocks. Values are
    // untouched — same rows, same doubles. Caller-released at the end is
    // unnecessary: the result frame is small and the checkpoint is the
    // one surviving block set (the walk-family hygiene budget).
    val hourly = TickQueries.ticks(s, d)
      .groupBy(col("product_id"),
        date_trunc("hour", col("event_time")).as("hr"))
      .agg(max_by(col("price"),
        struct(col("event_time"), col("sequence"))).as("close"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("product_id")).orderBy(col("hr").desc)))
      .filter(col("rk") <= SenWindow)
      .select(col("product_id"),
        expr("unix_micros(hr) div 3600000000").as("t"), col("close"))
      .localCheckpoint(true)
    val a = hourly.select(col("product_id"), col("t").as("ta"), col("close").as("pa"))
    val b = hourly.select(col("product_id"), col("t").as("tb"), col("close").as("pb"))
    val w = Window.partitionBy(col("product_id"))
    val sen = a.join(b, Seq("product_id")).filter(col("tb") > col("ta"))
      .withColumn("slope",
        (col("pb") - col("pa")) / (col("tb") - col("ta")).cast("double"))
      .withColumn("rs", row_number().over(
        w.orderBy(col("slope"), col("ta"), col("tb"))))
      .withColumn("np", count(lit(1)).over(w))
      .filter(col("rs") === expr("(np + 1) div 2"))
      .select(col("product_id"), col("np").as("n_pairs"), col("slope").as("sen_slope"))
    hourly.join(sen, Seq("product_id"))
      .withColumn("res", col("close") - col("sen_slope") * col("t").cast("double"))
      .withColumn("ri", row_number().over(w.orderBy(col("res"), col("t"))))
      .withColumn("nn", count(lit(1)).over(w))
      .filter(col("ri") === expr("(nn + 1) div 2"))
      .select(col("product_id"), col("nn").cast("long").as("n_points"),
        col("n_pairs").cast("long").as("n_pairs"),
        Det.snap(col("sen_slope"), 6).as("sen_slope"),
        Det.snap(col("res"), 6).as("intercept"))
  }

  private val theilSenSql =
    s"""WITH t0 AS (
  SELECT product_id, date_trunc('hour', event_time) AS hr, price,
         row_number() OVER (PARTITION BY product_id, date_trunc('hour', event_time)
                            ORDER BY event_time DESC, sequence DESC) AS rn_d
  FROM (${TickQueries.liveTicksSql}) lt),
hourly AS MATERIALIZED (
  SELECT product_id, CAST(epoch_us(hr) // 3600000000 AS BIGINT) AS t,
         price AS close
  FROM (SELECT product_id, hr, price,
               row_number() OVER (PARTITION BY product_id ORDER BY hr DESC) AS rk
        FROM t0 WHERE rn_d = 1)
  WHERE rk <= $SenWindow),
sen AS MATERIALIZED (
  SELECT product_id, np AS n_pairs, slope AS sen_slope FROM (
    SELECT a.product_id, (b.close - a.close) / CAST(b.t - a.t AS DOUBLE) AS slope,
           row_number() OVER (PARTITION BY a.product_id
               ORDER BY (b.close - a.close) / CAST(b.t - a.t AS DOUBLE), a.t, b.t) AS rs,
           count(*) OVER (PARTITION BY a.product_id) AS np
    FROM hourly a JOIN hourly b ON a.product_id = b.product_id AND b.t > a.t)
  WHERE rs = (np + 1) // 2),
resid AS (
  SELECT h.product_id, s.n_pairs, s.sen_slope, h.t,
         h.close - s.sen_slope * CAST(h.t AS DOUBLE) AS res,
         row_number() OVER (PARTITION BY h.product_id
             ORDER BY h.close - s.sen_slope * CAST(h.t AS DOUBLE), h.t) AS ri,
         count(*) OVER (PARTITION BY h.product_id) AS nn
  FROM hourly h JOIN sen s USING (product_id))
SELECT product_id, CAST(nn AS BIGINT) AS n_points,
       CAST(n_pairs AS BIGINT) AS n_pairs,
       ${s6("sen_slope")} AS sen_slope, ${s6("res")} AS intercept
FROM resid WHERE ri = (nn + 1) // 2"""

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "theil_sen" -> ((s, d) => theilSen(s, d)),
    "price_moments" -> ((s, d) => {
      import TickQueries.r6
      r6(priceMoments(s, d))
    }),
    "chi2_contingency" -> ((s, d) => chi2(s, d)),
    "corpus_balance" -> ((s, d) => balanced(s, d)),
    "session_paths" -> ((s, d) => sessionPaths(s, d)),
    "ntile_bins" -> ((s, d) => ntileBins(s, d)),
    "salted_agg" -> ((s, d) => {
      import TickQueries.r6
      r6(saltedAgg(s, d))
    })
  )

  def oracleSql: Map[String, String] = Map(
    "theil_sen" -> theilSenSql,
    "price_moments" -> priceMomentsSql,
    "chi2_contingency" -> chi2Sql,
    "corpus_balance" -> balancedSql,
    "session_paths" -> sessionPathsSql,
    "ntile_bins" -> ntileBinsSql,
    "salted_agg" -> saltedAggSql
  )
}

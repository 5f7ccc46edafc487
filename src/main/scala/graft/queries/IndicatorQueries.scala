package graft.queries

import graft.ops.{Det, Ewma, Indicators}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Technical-indicator contract queries over the tick stream — RSI,
  * MACD, stochastic oscillator, ATR — the standard quant-signal toolkit
  * beyond the reference's SMA/EWMA family (SURVEY §2.5 ends at moving
  * averages). Each has a bit-exact DuckDB oracle twin:
  *
  *   - sequential recurrences (RSI/MACD/ATR's Wilder & EMA smoothings)
  *     replay the IDENTICAL IEEE expression sequence in the identical
  *     (event_time, sequence) total order on both engines —
  *     `list_reduce` twins with [[Det.dblLit]] constants (a bare DECIMAL
  *     literal mis-rounds; quote-then-cast reproduces JVM bits);
  *   - window shapes (stochastic's rolling min/max, ATR's bar lag) are
  *     exact picks / per-row IEEE arithmetic on identical operand bits.
  *
  * Scale: RSI/MACD ride the [[Indicators]] secondary-sort fold (one
  * Exchange, O(1) state/key); stochastic is one Exchange+Sort with all
  * windows on the same partitioning; ATR folds over ALREADY-REDUCED
  * hourly bars (|keys|·|hours| rows), so its fold input is tiny by
  * construction.
  */
object IndicatorQueries {

  import TickQueries.r6

  private def s6(x: String): String = Det.snapSql(x, 6)

  private val RsiPeriod = 14
  private val StochPeriod = 14
  private val AtrAlpha = 1.0 / 14
  private val MacdFast = 12
  private val MacdSlow = 26
  private val MacdSignal = 9

  private def ticksSql = TickQueries.liveTicksSql

  /** Ichimoku periods (tenkan/kijun/senkou-B lookbacks, displacement). */
  private val IchiT = 9
  private val IchiK = 26
  private val IchiS = 52
  private val IchiD = 26

  // ---------------------------------------------------------------- RSI

  private def rsi(s: SparkSession, d: String): DataFrame =
    Indicators.rsiPerKey(TickQueries.ticks(s, d),
      "product_id", "event_time", "sequence", "price", RsiPeriod)

  private val rsiSql = {
    val a = 1.0 / RsiPeriod
    val A = Det.dblLit(a)
    val B = Det.dblLit(1.0 - a)
    s"""WITH per AS (
  SELECT product_id, list(price ORDER BY event_time, sequence) AS xs
  FROM ($ticksSql) t GROUP BY product_id),
d AS (
  SELECT product_id,
         list_transform(generate_series(2, len(xs)), i -> xs[i] - xs[i-1]) AS ds
  FROM per WHERE len(xs) >= 2),
f AS (
  SELECT product_id, CAST(len(ds) AS BIGINT) AS n_deltas,
         list_reduce([CASE WHEN x > 0 THEN x ELSE CAST(0 AS DOUBLE) END for x in ds],
                     (s, x) -> x * $A + s * $B) AS avg_gain,
         list_reduce([CASE WHEN x < 0 THEN -x ELSE CAST(0 AS DOUBLE) END for x in ds],
                     (s, x) -> x * $A + s * $B) AS avg_loss
  FROM d)
SELECT product_id, n_deltas, ${s6("avg_gain")} AS avg_gain,
       ${s6("avg_loss")} AS avg_loss,
       ${s6("""CASE WHEN avg_loss = CAST(0 AS DOUBLE) THEN CAST(100 AS DOUBLE)
            ELSE CAST(100 AS DOUBLE) - CAST(100 AS DOUBLE) /
                 (CAST(1 AS DOUBLE) + avg_gain / avg_loss) END""")} AS rsi
FROM f"""
  }

  // --------------------------------------------------------------- MACD

  private def macd(s: SparkSession, d: String): DataFrame =
    Indicators.macdPerKey(TickQueries.ticks(s, d),
      "product_id", "event_time", "sequence", "price",
      MacdFast, MacdSlow, MacdSignal)

  private val macdSql = {
    val af = 2.0 / (MacdFast + 1); val AF = Det.dblLit(af); val BF = Det.dblLit(1.0 - af)
    val as_ = 2.0 / (MacdSlow + 1); val AS_ = Det.dblLit(as_); val BS = Det.dblLit(1.0 - as_)
    val ag = 2.0 / (MacdSignal + 1); val AG = Det.dblLit(ag); val BG = Det.dblLit(1.0 - ag)
    // The signal update reads the tick's NEW fast/slow EMAs — recomputed
    // inline from the same operand bits the ef/es fields use. Field order
    // matters: DuckDB evaluates struct_pack fields SEQUENTIALLY into the
    // accumulator in place (a later field's `a.ef` sees the already-
    // updated value — verified against 1.0.0), so every expression may
    // only read fields written AFTER it: sg first (reads old ef/es/sg),
    // then ef, es. This ordering is also correct under snapshot
    // semantics, so it cannot break on a DuckDB upgrade.
    s"""WITH per AS (
  SELECT product_id, list(price ORDER BY event_time, sequence) AS xs
  FROM ($ticksSql) t GROUP BY product_id),
m AS (
  SELECT product_id, CAST(len(xs) AS BIGINT) AS n_ticks,
         list_reduce(
           [struct_pack(sg := CAST(0 AS DOUBLE), ef := x, es := x, x := x) for x in xs],
           (a, c) -> struct_pack(
              sg := ((c.x * $AF + a.ef * $BF) - (c.x * $AS_ + a.es * $BS)) * $AG + a.sg * $BG,
              ef := c.x * $AF + a.ef * $BF,
              es := c.x * $AS_ + a.es * $BS,
              x := c.x)) AS st
  FROM per)
SELECT product_id, n_ticks,
       ${s6("st.ef")} AS ema_fast, ${s6("st.es")} AS ema_slow,
       ${s6("st.ef - st.es")} AS macd, ${s6("st.sg")} AS "signal",
       ${s6("(st.ef - st.es) - st.sg")} AS histogram
FROM m"""
  }

  // -------------------------------------------------------------- Kalman

  // Local-level model noise ratio q/r sets the steady-state gain
  // (≈ 0.095 here — a ~20-tick effective window); p0 = r starts the
  // gain at 1/2 so the filter trusts early ticks without a burn-in.
  private val KalmanQ = 0.01
  private val KalmanR = 1.0
  private val KalmanP0 = 1.0

  /** Per-instrument local-level Kalman filter terminal state — see
    * [[Indicators.kalmanPerKey]] for the recurrence and determinism
    * design. */
  private def kalman(s: SparkSession, d: String): DataFrame =
    Indicators.kalmanPerKey(TickQueries.ticks(s, d),
      "product_id", "event_time", "sequence", "price",
      KalmanQ, KalmanR, KalmanP0)

  private val kalmanSql = {
    val Q = Det.dblLit(KalmanQ)
    val R = Det.dblLit(KalmanR)
    val P0 = Det.dblLit(KalmanP0)
    // Snapshot-safe field ordering (cf. macdSql): every field reads only
    // PRE-update state (a.x/a.p/c.z), recomputing the predicted variance
    // a.p + Q and the gain inline — identical operand bits, so the three
    // recomputations reproduce the JVM fold exactly under either
    // struct_pack evaluation semantics.
    s"""WITH per AS (
  SELECT product_id, list(price ORDER BY event_time, sequence) AS xs
  FROM ($ticksSql) t GROUP BY product_id),
m AS (
  SELECT product_id, CAST(len(xs) AS BIGINT) AS n_ticks,
         list_reduce(
           [struct_pack(k := CAST(0 AS DOUBLE), x := x, p := $P0, z := x) for x in xs],
           (a, c) -> struct_pack(
              k := (a.p + $Q) / (a.p + $Q + $R),
              x := a.x + ((a.p + $Q) / (a.p + $Q + $R)) * (c.z - a.x),
              p := (CAST(1 AS DOUBLE) - (a.p + $Q) / (a.p + $Q + $R)) * (a.p + $Q),
              z := c.z)) AS st
  FROM per)
SELECT product_id, n_ticks, ${s6("st.x")} AS level,
       ${s6("st.k")} AS gain, ${s6("st.p")} AS p_var
FROM m"""
  }

  // ---------------------------------------------------------------- Holt

  private val HoltAlpha = 0.2
  private val HoltBeta = 0.1
  private val HoltHorizon = 5
  private val HoltEvalH = 3

  private def holt(s: SparkSession, d: String): DataFrame =
    Indicators.holtPerKey(TickQueries.ticks(s, d),
      "product_id", "event_time", "sequence", "price",
      HoltAlpha, HoltBeta, HoltHorizon)

  /** Holt's level/trend recurrences are MUTUALLY coupled, which a
    * struct_pack accumulator cannot express safely: DuckDB 1.0.0
    * evaluates struct fields SNAPSHOT on the first reduce step but
    * IN PLACE on later steps (probed), so any field order wrong under
    * one semantics breaks somewhere. A LIST accumulator dodges the
    * aliasing entirely — `[expr1, expr2]` constructs a fresh list and
    * both elements read the untouched `acc` (probed: step ≥ 2 still
    * snapshot). The level expression is inlined into the trend element
    * so each element needs only OLD state; identical operand bits →
    * identical nl on both evaluations → bit-exact vs the Scala fold. */
  private val holtSql = {
    val A = Det.dblLit(HoltAlpha); val NA = Det.dblLit(1.0 - HoltAlpha)
    val B = Det.dblLit(HoltBeta); val NB = Det.dblLit(1.0 - HoltBeta)
    val H = Det.dblLit(HoltHorizon.toDouble)
    val nl = s"(e[1] * $A + (acc[1] + acc[2]) * $NA)"
    s"""WITH per AS (
  SELECT product_id, list(price ORDER BY event_time, sequence) AS xs
  FROM ($ticksSql) t GROUP BY product_id),
m AS (
  SELECT product_id, CAST(len(xs) AS BIGINT) AS n_ticks,
         list_reduce(
           [[CAST(x AS DOUBLE), CAST(0 AS DOUBLE)] for x in xs],
           (acc, e) -> [$nl, ($nl - acc[1]) * $B + acc[2] * $NB]) AS st
  FROM per)
SELECT product_id, n_ticks,
       ${s6("st[1]")} AS level, ${s6("st[2]")} AS trend,
       ${s6(s"st[1] + $H * st[2]")} AS forecast
FROM m"""
  }

  /** Twin of holt_eval: the holtSql list-reduce over the xs[1:ntr]
    * train slice (same fold, same list-accumulator aliasing dodge),
    * then per-h element access into the held-out tail. Integer split
    * via `//`; every error is a per-row |sub| of fold-exact doubles. */
  private val holtEvalSql = {
    val A = Det.dblLit(HoltAlpha); val NA = Det.dblLit(1.0 - HoltAlpha)
    val B = Det.dblLit(HoltBeta); val NB = Det.dblLit(1.0 - HoltBeta)
    val nl = s"(e[1] * $A + (acc[1] + acc[2]) * $NA)"
    s"""WITH per AS (
  SELECT product_id, list(price ORDER BY event_time, sequence) AS xs
  FROM ($ticksSql) t GROUP BY product_id),
m AS (
  SELECT product_id, CAST(len(xs) AS BIGINT) AS n,
         (CAST(len(xs) AS BIGINT) * 4) // 5 AS ntr, xs
  FROM per),
f AS (
  SELECT product_id, n, ntr,
         CAST(xs[CAST(ntr AS INTEGER)] AS DOUBLE) AS last_obs,
         list_reduce(
           [[CAST(x AS DOUBLE), CAST(0 AS DOUBLE)] for x in xs[1:CAST(ntr AS INTEGER)]],
           (acc, e) -> [$nl, ($nl - acc[1]) * $B + acc[2] * $NB]) AS st,
         xs
  FROM m WHERE ntr >= 1 AND ntr < n),
hh AS (SELECT unnest([${(1 to HoltEvalH).mkString(", ")}]) AS h)
SELECT product_id, n AS n_ticks, ntr AS n_train, CAST(hh.h AS BIGINT) AS h,
       ${s6("st[1] + CAST(hh.h AS DOUBLE) * st[2]")} AS forecast,
       ${s6("CAST(xs[CAST(ntr + hh.h AS INTEGER)] AS DOUBLE)")} AS actual,
       ${s6("abs((st[1] + CAST(hh.h AS DOUBLE) * st[2]) - CAST(xs[CAST(ntr + hh.h AS INTEGER)] AS DOUBLE))")} AS abs_err_holt,
       ${s6("abs(last_obs - CAST(xs[CAST(ntr + hh.h AS INTEGER)] AS DOUBLE))")} AS abs_err_naive
FROM f CROSS JOIN hh
WHERE ntr + hh.h <= n"""
  }

  // ---------------------------------------------- Conformal intervals

  /** Split-conformal 1-step interval + coverage for the Holt forecaster —
    * see [[Indicators.conformalPerKey]]. */
  private def conformal(s: SparkSession, d: String): DataFrame =
    Indicators.conformalPerKey(TickQueries.ticks(s, d),
      "product_id", "event_time", "sequence", "price",
      HoltAlpha, HoltBeta)

  /** Twin of conformal_holt: the Holt fold with residual accumulation —
    * a LIST-of-lists accumulator `[[lv,tr],[i],rs,ts,[x]]` (the holtSql
    * aliasing dodge; PROBED: a STRUCT accumulator with a growing list
    * field silently drops appends in DuckDB 1.0.0's in-place reduce, a
    * fresh outer list keeps them) — then the identical order-statistic
    * pick `list_sort(rs)[⌈0.9(n_cal+1)⌉]` and bit-identical coverage
    * comparisons against the UNSNAPPED q̂. */
  private val conformalSql = {
    val A = Det.dblLit(HoltAlpha); val NA = Det.dblLit(1.0 - HoltAlpha)
    val B = Det.dblLit(HoltBeta); val NB = Det.dblLit(1.0 - HoltBeta)
    val nl = s"(c[5][1] * $A + (a[1][1] + a[1][2]) * $NA)"
    val resid = "abs(c[5][1] - (a[1][1] + a[1][2]))"
    s"""WITH per AS (
  SELECT product_id, list(price ORDER BY event_time, sequence) AS xs
  FROM ($ticksSql) t GROUP BY product_id),
m AS (
  SELECT product_id, CAST(len(xs) AS BIGINT) AS n,
         (CAST(len(xs) AS BIGINT) * 3) // 5 AS ntr,
         (CAST(len(xs) AS BIGINT) * 4) // 5 AS ncal, xs
  FROM per),
f AS (
  SELECT product_id, n,
         list_reduce(
           [[[CAST(x AS DOUBLE), CAST(0 AS DOUBLE)], [CAST(1 AS DOUBLE)],
             CAST([] AS DOUBLE[]), CAST([] AS DOUBLE[]),
             [CAST(x AS DOUBLE)]] for x in xs],
           (a, c) -> [
             [$nl, ($nl - a[1][1]) * $B + a[1][2] * $NB],
             [a[2][1] + CAST(1 AS DOUBLE)],
             CASE WHEN a[2][1] >= CAST(ntr AS DOUBLE)
                   AND a[2][1] < CAST(ncal AS DOUBLE)
                  THEN list_append(a[3], $resid) ELSE a[3] END,
             CASE WHEN a[2][1] >= CAST(ncal AS DOUBLE)
                  THEN list_append(a[4], $resid) ELSE a[4] END,
             [c[5][1]]
           ]) AS st
  FROM m WHERE ntr >= 1 AND ncal > ntr AND n > ncal),
g AS (
  SELECT product_id, n, CAST(len(st[3]) AS BIGINT) AS n_cal,
         CAST(len(st[4]) AS BIGINT) AS n_test, st[3] AS rs, st[4] AS ts
  FROM f),
q AS (
  SELECT product_id, n, n_cal, n_test,
         list_sort(rs)[CAST(((n_cal + 1) * 9 + 9) // 10 AS INTEGER)] AS qh,
         ts
  FROM g WHERE n_cal >= 9 AND n_test >= 1)
SELECT product_id, n AS n_ticks, n_cal, n_test, ${s6("qh")} AS q_hat,
       CAST(len(list_filter(ts, e -> e <= qh)) AS BIGINT) AS n_covered,
       ${s6("CAST(len(list_filter(ts, e -> e <= qh)) AS DOUBLE) / CAST(n_test AS DOUBLE)")}
         AS coverage
FROM q"""
  }

  /** Split-conformal 1-step interval + coverage for the KALMAN
    * forecaster — see [[Indicators.conformalKalmanPerKey]]. Same q/r/p0
    * as `kalman_level`, same split protocol as `conformal_holt`. */
  private def conformalKalman(s: SparkSession, d: String): DataFrame =
    Indicators.conformalKalmanPerKey(TickQueries.ticks(s, d),
      "product_id", "event_time", "sequence", "price",
      KalmanQ, KalmanR, KalmanP0)

  /** Twin of conformal_kalman: the local-level Kalman fold with residual
    * accumulation under the same LIST-of-lists accumulator dodge
    * (`[[x,p],[i],rs,ts,[z]]`), prediction = pre-update level, then the
    * identical order-statistic pick and coverage comparisons. p+q is
    * recomputed inline per use — same value, deterministic — so every
    * expression reads only the PRE-update accumulator. */
  private val conformalKalmanSql = {
    val Q = Det.dblLit(KalmanQ); val R = Det.dblLit(KalmanR)
    val P0 = Det.dblLit(KalmanP0)
    val p1 = s"(a[1][2] + $Q)"
    val k = s"($p1 / ($p1 + $R))"
    val newx = s"(a[1][1] + $k * (c[5][1] - a[1][1]))"
    val newp = s"((CAST(1 AS DOUBLE) - $k) * $p1)"
    val resid = "abs(c[5][1] - a[1][1])"
    s"""WITH per AS (
  SELECT product_id, list(price ORDER BY event_time, sequence) AS xs
  FROM ($ticksSql) t GROUP BY product_id),
m AS (
  SELECT product_id, CAST(len(xs) AS BIGINT) AS n,
         (CAST(len(xs) AS BIGINT) * 3) // 5 AS ntr,
         (CAST(len(xs) AS BIGINT) * 4) // 5 AS ncal, xs
  FROM per),
f AS (
  SELECT product_id, n,
         list_reduce(
           [[[CAST(x AS DOUBLE), $P0], [CAST(1 AS DOUBLE)],
             CAST([] AS DOUBLE[]), CAST([] AS DOUBLE[]),
             [CAST(x AS DOUBLE)]] for x in xs],
           (a, c) -> [
             [$newx, $newp],
             [a[2][1] + CAST(1 AS DOUBLE)],
             CASE WHEN a[2][1] >= CAST(ntr AS DOUBLE)
                   AND a[2][1] < CAST(ncal AS DOUBLE)
                  THEN list_append(a[3], $resid) ELSE a[3] END,
             CASE WHEN a[2][1] >= CAST(ncal AS DOUBLE)
                  THEN list_append(a[4], $resid) ELSE a[4] END,
             [c[5][1]]
           ]) AS st
  FROM m WHERE ntr >= 1 AND ncal > ntr AND n > ncal),
g AS (
  SELECT product_id, n, CAST(len(st[3]) AS BIGINT) AS n_cal,
         CAST(len(st[4]) AS BIGINT) AS n_test, st[3] AS rs, st[4] AS ts
  FROM f),
q AS (
  SELECT product_id, n, n_cal, n_test,
         list_sort(rs)[CAST(((n_cal + 1) * 9 + 9) // 10 AS INTEGER)] AS qh,
         ts
  FROM g WHERE n_cal >= 9 AND n_test >= 1)
SELECT product_id, n AS n_ticks, n_cal, n_test, ${s6("qh")} AS q_hat,
       CAST(len(list_filter(ts, e -> e <= qh)) AS BIGINT) AS n_covered,
       ${s6("CAST(len(list_filter(ts, e -> e <= qh)) AS DOUBLE) / CAST(n_test AS DOUBLE)")}
         AS coverage
FROM q"""
  }

  // ---------------------------------------------------------------- KAMA

  private val KamaEr = 10
  private val KamaFastSc = 2.0 / 3   // 2/(2+1)
  private val KamaSlowSc = 2.0 / 31  // 2/(30+1)

  /** Kaufman adaptive moving average: smoothing constant
    * sc = (er·(fast−slow)+slow)² from the 10-row efficiency ratio
    * er = |Δ₁₀ price| / Σ|Δ₁ price| — BOTH measured on the 10⁻²
    * price grid, so numerator and denominator are exact longs and er is
    * one exact-integer division (identical bits in both engines). Rows
    * before a full ER window get sc = 0 (the fold holds its seed).
    * The fold itself is the single-state [[Indicators.adaptiveEwmaPerKey]]
    * — robust to either struct-evaluation semantics in the oracle. */
  private def kama(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("product_id"))
      .orderBy(col("event_time"), col("sequence"))
    val k = graft.ops.Det.kl(col("price"), 2)
    val dk = abs(k - lag(k, 1).over(w))
    // explicit v*v, not pow(v, 2): pow is a libm call with no cross-
    // engine bit guarantee, multiplication is IEEE-exact rounding
    val v = col("er") * (lit(KamaFastSc) - lit(KamaSlowSc)) + lit(KamaSlowSc)
    val base = TickQueries.ticks(s, d)
      .withColumn("num_k", abs(k - lag(k, KamaEr).over(w)))
      .withColumn("den_k", sum(dk).over(w.rowsBetween(-(KamaEr - 1), 0)))
      .withColumn("rn", row_number().over(w))
      .withColumn("er",
        when(col("rn") <= KamaEr, lit(null))
          .when(col("den_k") === 0L, lit(1.0))
          .otherwise(col("num_k").cast("double") / col("den_k").cast("double")))
      .withColumn("sc",
        when(col("er").isNull, lit(0.0)).otherwise(v * v))
    Indicators.adaptiveEwmaPerKey(base,
      "product_id", "event_time", "sequence", "price", "sc")
      .withColumnRenamed("adaptive", "kama")
  }

  private val kamaSql = {
    val fs = Det.dblLit(KamaFastSc); val ss = Det.dblLit(KamaSlowSc)
    val k = Det.klSql("price", 2)
    s"""WITH b0 AS (
  SELECT product_id, event_time, sequence, price, $k AS kk,
         lag($k, 1) OVER wo AS kk1, lag($k, $KamaEr) OVER wo AS kk10,
         row_number() OVER wo AS rn
  FROM ($ticksSql) lt
  WINDOW wo AS (PARTITION BY product_id ORDER BY event_time, sequence)),
b AS (
  SELECT product_id, event_time, sequence, price, rn,
         abs(kk - kk10) AS num_k,
         sum(abs(kk - kk1)) OVER wf AS den_k
  FROM b0
  WINDOW wf AS (PARTITION BY product_id ORDER BY event_time, sequence
                ROWS BETWEEN ${KamaEr - 1} PRECEDING AND CURRENT ROW)),
sc AS (
  SELECT product_id, event_time, sequence, price,
         CASE WHEN er IS NULL THEN CAST(0 AS DOUBLE)
              ELSE (er * ($fs - $ss) + $ss) * (er * ($fs - $ss) + $ss) END AS sc
  FROM (SELECT *,
          CASE WHEN rn <= $KamaEr THEN NULL
               WHEN den_k = 0 THEN CAST(1 AS DOUBLE)
               ELSE CAST(num_k AS DOUBLE) / CAST(den_k AS DOUBLE) END AS er
        FROM b) e),
per AS (
  SELECT product_id,
         list(struct_pack(s := price, x := price, c := sc)
              ORDER BY event_time, sequence) AS xs
  FROM sc GROUP BY product_id)
SELECT product_id, CAST(len(xs) AS BIGINT) AS n_ticks,
       ${s6("""list_reduce(xs,
         (a, c) -> struct_pack(s := a.s + c.c * (c.x - a.s), x := c.x, c := c.c)).s""")} AS kama
FROM per"""
  }

  // --------------------------------------------------- Stochastic %K/%D

  /** %K = (close − min14)/(max14 − min14)·100 (50 on a flat frame),
    * %D = ((K + K₋₁) + K₋₂)/3 with explicit association. Rows emitted
    * only once every window input is full (rn ≥ period + 2). */
  private def stochastic(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("product_id"))
      .orderBy(col("event_time"), col("sequence"))
    val f = w.rowsBetween(-(StochPeriod - 1), Window.currentRow)
    TickQueries.ticks(s, d)
      .withColumn("lo", min(col("price")).over(f))
      .withColumn("hi", max(col("price")).over(f))
      .withColumn("rn", row_number().over(w))
      .withColumn("pct_k",
        when(col("hi") === col("lo"), lit(50.0))
          .otherwise(((col("price") - col("lo")) / (col("hi") - col("lo"))) * lit(100.0)))
      .withColumn("k1", lag(col("pct_k"), 1).over(w))
      .withColumn("k2", lag(col("pct_k"), 2).over(w))
      .filter(col("rn") >= StochPeriod + 2)
      .select(col("product_id"), col("event_time"), col("sequence"), col("pct_k"),
        (((col("pct_k") + col("k1")) + col("k2")) / lit(3.0)).as("pct_d"))
  }

  private val stochasticSql =
    s"""WITH base AS (
  SELECT product_id, event_time, sequence, price,
         min(price) OVER wf AS lo, max(price) OVER wf AS hi,
         row_number() OVER wo AS rn
  FROM ($ticksSql) t
  WINDOW wo AS (PARTITION BY product_id ORDER BY event_time, sequence),
         wf AS (PARTITION BY product_id ORDER BY event_time, sequence
                ROWS BETWEEN ${StochPeriod - 1} PRECEDING AND CURRENT ROW)),
k AS (
  SELECT product_id, event_time, sequence, rn,
         CASE WHEN hi = lo THEN CAST(50 AS DOUBLE)
              ELSE ((price - lo) / (hi - lo)) * CAST(100 AS DOUBLE) END AS pct_k
  FROM base),
d AS (
  SELECT product_id, event_time, sequence, rn, pct_k,
         lag(pct_k, 1) OVER wo AS k1, lag(pct_k, 2) OVER wo AS k2
  FROM k
  WINDOW wo AS (PARTITION BY product_id ORDER BY event_time, sequence))
SELECT product_id, event_time, sequence, ${s6("pct_k")} AS pct_k,
       ${s6("((pct_k + k1) + k2) / CAST(3 AS DOUBLE)")} AS pct_d
FROM d WHERE rn >= ${StochPeriod + 2}"""

  // ---------------------------------------------------------------- ATR

  /** True range per hourly OHLC bar (TR₁ = high−low; then
    * max(h−l, |h−prevClose|, |l−prevClose|)), Wilder-smoothed per key via
    * the [[Ewma]] fold (α = 1/14, seed = first TR). Bar values are exact
    * min/max/max_by picks, so TR operand bits match engine-to-engine. */
  private def atr(s: SparkSession, d: String): DataFrame = {
    val bars = TickQueries.ticks(s, d)
      .groupBy(col("product_id"),
        date_trunc("hour", col("event_time")).as("bar_ts"))
      .agg(max(col("price")).as("high"), min(col("price")).as("low"),
        max_by(col("price"), struct(col("event_time"), col("sequence"))).as("close"))
    val wb = Window.partitionBy(col("product_id")).orderBy(col("bar_ts"))
    val tr = bars
      .withColumn("pc", lag(col("close"), 1).over(wb))
      .withColumn("tr",
        when(col("pc").isNull, col("high") - col("low"))
          .otherwise(greatest(col("high") - col("low"),
            abs(col("high") - col("pc")), abs(col("low") - col("pc")))))
      .withColumn("z", lit(0L))
    Ewma.finalPerKey(tr, "product_id", "bar_ts", "z", "tr", AtrAlpha)
      .withColumnRenamed("n_ticks", "n_bars")
      .withColumnRenamed("ewma", "atr")
  }

  private val atrSql = {
    val A = Det.dblLit(AtrAlpha)
    val B = Det.dblLit(1.0 - AtrAlpha)
    s"""WITH t AS (
  SELECT product_id, date_trunc('hour', event_time) AS bar_ts, price,
         row_number() OVER (PARTITION BY product_id, date_trunc('hour', event_time)
                            ORDER BY event_time DESC, sequence DESC) AS rn_d
  FROM ($ticksSql) lt),
bars AS (
  SELECT product_id, bar_ts, max(price) AS high, min(price) AS low,
         max(CASE WHEN rn_d = 1 THEN price END) AS close
  FROM t GROUP BY product_id, bar_ts),
tr AS (
  SELECT product_id, bar_ts,
         CASE WHEN pc IS NULL THEN high - low
              ELSE greatest(high - low, abs(high - pc), abs(low - pc)) END AS tr
  FROM (SELECT *, lag(close) OVER (PARTITION BY product_id ORDER BY bar_ts) AS pc
        FROM bars) b),
per AS (
  SELECT product_id, list(tr ORDER BY bar_ts) AS xs FROM tr GROUP BY product_id)
SELECT product_id, CAST(len(xs) AS BIGINT) AS n_bars,
       ${s6(s"list_reduce(xs, (s, x) -> x * $A + s * $B)")} AS atr
FROM per"""
  }

  // ---------------------------------------------------------------- ADX

  /** Average Directional Index over the hourly bars — Wilder-smoothed
    * ±DM and TR, DI± = 100·sDM/sTR, DX = 100·|DI⁺−DI⁻|/(DI⁺+DI⁻)
    * (sTR cancels in DX, so DX needs only the smoothed DMs), ADX =
    * Wilder-smoothed DX seeded at the second bar. One final row per
    * instrument, like [[atr]].
    *
    * Determinism: the per-key fold replays the IDENTICAL IEEE sequence
    * as the oracle's list_reduce — the accumulator is a DOUBLE list
    * (n, ph, pl, pc, sTR, s+DM, s−DM, adx) with every slot computed
    * from the PREVIOUS accumulator only (snapshot-safe per CLAUDE.md's
    * struct-aliasing rule; the smoothed-DM formulas are repeated inside
    * DX rather than read back), and each element is pre-shaped as its
    * own seed state so list_reduce needs no separate init. Scale: the
    * fold input is the ALREADY-REDUCED bar table (|keys|·|hours|). */
  private def adx(s: SparkSession, d: String): DataFrame = {
    val spark = s
    import spark.implicits._
    val a = AtrAlpha; val b = 1.0 - AtrAlpha
    val bars = TickQueries.ticks(s, d)
      .groupBy(col("product_id"),
        date_trunc("hour", col("event_time")).as("bar_ts"))
      .agg(max(col("price")).as("high"), min(col("price")).as("low"),
        max_by(col("price"), struct(col("event_time"), col("sequence"))).as("close"))
    bars
      .select(col("product_id").cast("string"), col("bar_ts"),
        col("high").cast("double"), col("low").cast("double"),
        col("close").cast("double"))
      .as[(String, java.sql.Timestamp, Double, Double, Double)]
      .repartition(col("product_id"))
      .sortWithinPartitions(col("product_id"), col("bar_ts"))
      .mapPartitions { it =>
        val out = scala.collection.mutable.ArrayBuffer
          .empty[(String, Long, Option[Double], Option[Double], Double)]
        var cur: String = null
        var n = 0L; var ph = 0.0; var pl = 0.0; var pc = 0.0
        var str = 0.0; var spdm = 0.0; var sndm = 0.0; var adx = 0.0
        def flush(): Unit = if (cur != null && n > 0) {
          val dip = if (str > 0) Some(100.0 * spdm / str) else None
          val din = if (str > 0) Some(100.0 * sndm / str) else None
          out += ((cur, n, dip, din, adx))
        }
        it.foreach { case (k, _, h, l, c) =>
          if (k != cur) { flush(); cur = k; n = 0L }
          if (n == 0L) { str = h - l; spdm = 0.0; sndm = 0.0; adx = 0.0 }
          else {
            val tr = math.max(h - l, math.max(math.abs(h - pc), math.abs(l - pc)))
            val up = h - ph; val down = pl - l
            val pdm = if (up > down && up > 0) up else 0.0
            val ndm = if (down > up && down > 0) down else 0.0
            str = tr * a + str * b
            spdm = pdm * a + spdm * b
            sndm = ndm * a + sndm * b
            val dsum = spdm + sndm
            val dx = if (dsum > 0) 100.0 * math.abs(spdm - sndm) / dsum else 0.0
            adx = if (n == 1L) dx else dx * a + adx * b
          }
          ph = h; pl = l; pc = c; n += 1L
        }
        flush()
        out.iterator
      }
      .toDF("product_id", "n_bars", "di_plus", "di_minus", "adx")
  }

  private val adxSql = {
    val A = Det.dblLit(AtrAlpha)
    val B = Det.dblLit(1.0 - AtrAlpha)
    // element e is its own seed state [1, h, l, c, h-l, 0, 0, 0];
    // acc slots: 1=n 2=ph 3=pl 4=pc 5=sTR 6=s+DM 7=s-DM 8=adx.
    // Every expression reads acc (previous state) only — snapshot-safe.
    val tr = "greatest(e[2] - e[3], abs(e[2] - acc[4]), abs(e[3] - acc[4]))"
    val pdm = "(CASE WHEN e[2] - acc[2] > acc[3] - e[3] AND e[2] - acc[2] > 0 " +
      "THEN e[2] - acc[2] ELSE CAST(0 AS DOUBLE) END)"
    val ndm = "(CASE WHEN acc[3] - e[3] > e[2] - acc[2] AND acc[3] - e[3] > 0 " +
      "THEN acc[3] - e[3] ELSE CAST(0 AS DOUBLE) END)"
    val spdm2 = s"($pdm * $A + acc[6] * $B)"
    val sndm2 = s"($ndm * $A + acc[7] * $B)"
    val dsum = s"($spdm2 + $sndm2)"
    val dx = s"(CASE WHEN $dsum > 0 THEN CAST(100 AS DOUBLE) * abs($spdm2 - $sndm2) / $dsum " +
      s"ELSE CAST(0 AS DOUBLE) END)"
    s"""WITH t AS (
  SELECT product_id, date_trunc('hour', event_time) AS bar_ts, price,
         row_number() OVER (PARTITION BY product_id, date_trunc('hour', event_time)
                            ORDER BY event_time DESC, sequence DESC) AS rn_d
  FROM ($ticksSql) lt),
bars AS (
  SELECT product_id, bar_ts, max(price) AS high, min(price) AS low,
         max(CASE WHEN rn_d = 1 THEN price END) AS close
  FROM t GROUP BY product_id, bar_ts),
per AS (
  SELECT product_id,
         list([CAST(1 AS DOUBLE), high, low, close, high - low,
               CAST(0 AS DOUBLE), CAST(0 AS DOUBLE), CAST(0 AS DOUBLE)]
              ORDER BY bar_ts) AS xs
  FROM bars GROUP BY product_id),
m AS (
  SELECT product_id,
         list_reduce(xs, (acc, e) -> [
           acc[1] + 1,
           e[2], e[3], e[4],
           $tr * $A + acc[5] * $B,
           $spdm2,
           $sndm2,
           CASE WHEN acc[1] = 1 THEN $dx ELSE $dx * $A + acc[8] * $B END
         ]) AS st
  FROM per)
SELECT product_id, CAST(st[1] AS BIGINT) AS n_bars,
       CASE WHEN st[5] > 0 THEN ${s6("CAST(100 AS DOUBLE) * st[6] / st[5]")} END AS di_plus,
       CASE WHEN st[5] > 0 THEN ${s6("CAST(100 AS DOUBLE) * st[7] / st[5]")} END AS di_minus,
       ${s6("st[8]")} AS adx
FROM m"""
  }

  // ----------------------------------------------------------- Ichimoku

  /** Ichimoku cloud: midpoint lines (max+min)/2 over 9/26/52 lookbacks,
    * the cloud legs displaced 26 forward (so at row t they are the
    * 26-back values), the lagging span 26 ahead (NULL near series end —
    * that is the indicator's real shape, emitted as-is). Each midpoint
    * is an exact-pick sum of two identical-bit doubles halved (÷2 is an
    * exponent decrement — exact); all frames and shifts share ONE
    * (product_id, event_time, sequence) window family, so the whole
    * indicator rides a single Exchange+Sort like stochastic. */
  private def ichimoku(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("product_id"))
      .orderBy(col("event_time"), col("sequence"))
    def mid(n: Int) = {
      val f = w.rowsBetween(-(n - 1), Window.currentRow)
      (max(col("price")).over(f) + min(col("price")).over(f)) / lit(2.0)
    }
    TickQueries.ticks(s, d)
      .withColumn("tenkan", mid(IchiT))
      .withColumn("kijun", mid(IchiK))
      .withColumn("senkou_a",
        lag((col("tenkan") + col("kijun")) / lit(2.0), IchiD).over(w))
      .withColumn("senkou_b", lag(mid(IchiS), IchiD).over(w))
      .withColumn("chikou", lead(col("price"), IchiD).over(w))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") >= IchiS + IchiD)
      .select(col("product_id"), col("event_time"), col("sequence"),
        col("tenkan"), col("kijun"), col("senkou_a"), col("senkou_b"),
        col("chikou"))
  }

  private val ichimokuSql =
    s"""WITH base AS (
  SELECT product_id, event_time, sequence, price,
         (max(price) OVER ft + min(price) OVER ft) / CAST(2 AS DOUBLE) AS tenkan,
         (max(price) OVER fk + min(price) OVER fk) / CAST(2 AS DOUBLE) AS kijun,
         (max(price) OVER fs + min(price) OVER fs) / CAST(2 AS DOUBLE) AS mid52,
         row_number() OVER wo AS rn
  FROM ($ticksSql) t
  WINDOW wo AS (PARTITION BY product_id ORDER BY event_time, sequence),
         ft AS (PARTITION BY product_id ORDER BY event_time, sequence
                ROWS BETWEEN ${IchiT - 1} PRECEDING AND CURRENT ROW),
         fk AS (PARTITION BY product_id ORDER BY event_time, sequence
                ROWS BETWEEN ${IchiK - 1} PRECEDING AND CURRENT ROW),
         fs AS (PARTITION BY product_id ORDER BY event_time, sequence
                ROWS BETWEEN ${IchiS - 1} PRECEDING AND CURRENT ROW)),
shifted AS (
  SELECT product_id, event_time, sequence, rn, tenkan, kijun,
         lag((tenkan + kijun) / CAST(2 AS DOUBLE), $IchiD) OVER wo AS senkou_a,
         lag(mid52, $IchiD) OVER wo AS senkou_b,
         lead(price, $IchiD) OVER wo AS chikou
  FROM base
  WINDOW wo AS (PARTITION BY product_id ORDER BY event_time, sequence))
SELECT product_id, event_time, sequence,
       ${s6("tenkan")} AS tenkan, ${s6("kijun")} AS kijun,
       ${s6("senkou_a")} AS senkou_a, ${s6("senkou_b")} AS senkou_b,
       ${s6("chikou")} AS chikou
FROM shifted WHERE rn >= ${IchiS + IchiD}"""

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "adx" -> ((s, d) => r6(adx(s, d))),
    "ichimoku" -> ((s, d) => r6(ichimoku(s, d))),
    "kama" -> ((s, d) => r6(kama(s, d))),
    "rsi" -> ((s, d) => r6(rsi(s, d))),
    "macd" -> ((s, d) => r6(macd(s, d))),
    "kalman_level" -> ((s, d) => r6(kalman(s, d))),
    "conformal_holt" -> ((s, d) => r6(conformal(s, d))),
    "conformal_kalman" -> ((s, d) => r6(conformalKalman(s, d))),
    "stochastic" -> ((s, d) => r6(stochastic(s, d))),
    "atr" -> ((s, d) => r6(atr(s, d))),
    "holt_forecast" -> ((s, d) => r6(holt(s, d))),
    // Forecast backtest closing the train→eval loop for holt_forecast:
    // fit on the first ⌊4n/5⌋ ticks per instrument (identical fold
    // bits), forecast 1..3 steps, per-step |error| vs the
    // last-observation persistence baseline — one row per (instrument,
    // h), no float aggregation, so every compared value is a per-row
    // IEEE op on fold-exact operands.
    "holt_eval" -> ((s, d) => r6(Indicators.holtEvalPerKey(
      TickQueries.ticks(s, d), "product_id", "event_time", "sequence",
      "price", HoltAlpha, HoltBeta, HoltEvalH)))
  )

  def oracleSql: Map[String, String] = Map(
    "adx" -> adxSql,
    "ichimoku" -> ichimokuSql,
    "kama" -> kamaSql,
    "rsi" -> rsiSql,
    "macd" -> macdSql,
    "kalman_level" -> kalmanSql,
    "conformal_holt" -> conformalSql,
    "conformal_kalman" -> conformalKalmanSql,
    "stochastic" -> stochasticSql,
    "atr" -> atrSql,
    "holt_forecast" -> holtSql,
    "holt_eval" -> holtEvalSql
  )
}

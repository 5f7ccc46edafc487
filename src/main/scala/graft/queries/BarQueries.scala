package graft.queries

import graft.ops.Det
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Market-bar analytics over the tick stream, each with a DuckDB oracle
  * twin: OHLC candle bars, time-weighted average price (TWAP), and a
  * trailing rolling median. Prices reaching compared columns follow the
  * Det rules (exact-integer grids, fixed IEEE finishing, 6-dp snap).
  */
object BarQueries {

  import TickQueries.r6

  private def s6(x: String): String = Det.snapSql(x, 6)

  // TWAP price grid: scale 2 keeps every per-product Σ(k·dur_us) below
  // 2^63 (k ≤ ~6.6e4 for price ≤ 660, Σdur ≤ the full span in µs ~2.6e12
  // → Σ ≤ ~1.7e17), so the sums stay primitive longs (Det rule 1) and the
  // long→double finish is correctly rounded in both engines (rule 3).
  private val TwapScale = 2
  // Rolling-median trailing window (rows, inclusive of current).
  private val MedianWindow = 25

  /** Hourly OHLC bars — open/close picked by `min_by`/`max_by` over the
    * (event_time, sequence) struct order, high/low/count as plain
    * aggregates. No window pass: partial min_by/max_by combine map-side
    * and merge associatively, so the shuffle moves ONE partial state per
    * (instrument, hour), never the ticks (the struct ordering buffer
    * makes Spark pick SortAggregate over HashAggregate — the sorts are
    * per input partition, the shuffle volume story is unchanged;
    * PlanShapeSpec pins this shape). The oracle picks the same rows via
    * ranked windows — same values, engine-friendly form each side.
    */
  private def ohlc(s: SparkSession, d: String): DataFrame =
    TickQueries.ticks(s, d)
      .groupBy(col("product_id"),
        date_trunc("hour", col("event_time")).as("bar_ts"))
      .agg(
        min_by(col("price"), struct(col("event_time"), col("sequence"))).as("open"),
        max(col("price")).as("high"),
        min(col("price")).as("low"),
        max_by(col("price"), struct(col("event_time"), col("sequence"))).as("close"),
        count(lit(1)).as("n_ticks"))

  private val ohlcSql =
    s"""WITH t AS (
  SELECT product_id, date_trunc('hour', event_time) AS bar_ts,
         event_time, sequence, price,
         row_number() OVER (PARTITION BY product_id, date_trunc('hour', event_time)
                            ORDER BY event_time, sequence) AS rn_a,
         row_number() OVER (PARTITION BY product_id, date_trunc('hour', event_time)
                            ORDER BY event_time DESC, sequence DESC) AS rn_d
  FROM (${TickQueries.liveTicksSql}) lt)
SELECT product_id, bar_ts,
       ${s6("max(CASE WHEN rn_a = 1 THEN price END)")} AS open,
       ${s6("max(price)")} AS high,
       ${s6("min(price)")} AS low,
       ${s6("max(CASE WHEN rn_d = 1 THEN price END)")} AS close,
       count(*) AS n_ticks
FROM t GROUP BY product_id, bar_ts"""

  /** Per-product time-weighted average price: Σ price_i·(t_{i+1}−t_i) /
    * Σ(t_{i+1}−t_i) over consecutive-tick segments (the last tick has no
    * duration and drops out). Prices ride the 10^-2 grid so the weighted
    * sum is an exact long (see [[TwapScale]]); the finish is the fixed
    * sequence `(double)Σ(k·d) / 10² / (double)Σd` — three correctly-
    * rounded ops, engine-identical. One window pass for the segment
    * durations (the usual per-key Exchange+Sort), then a hash aggregate.
    */
  private def twap(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("product_id"))
      .orderBy(col("event_time"), col("sequence"))
    val seg = TickQueries.ticks(s, d)
      .withColumn("us", unix_micros(col("event_time")))
      .withColumn("dur_us", lead(col("us"), 1).over(w) - col("us"))
      .filter(col("dur_us").isNotNull)
    seg
      .groupBy(col("product_id"))
      .agg(
        count(lit(1)).as("n_segments"),
        sum(col("dur_us")).as("total_dur_us"),
        ((sum(Det.kl(col("price"), TwapScale) * col("dur_us")).cast("double") /
          lit(math.pow(10, TwapScale))) / sum(col("dur_us")).cast("double")).as("twap"))
  }

  private val twapSql = {
    val k = Det.klSql("price", TwapScale)
    s"""WITH seg AS (
  SELECT product_id, price,
         lead(epoch_us(event_time)) OVER (PARTITION BY product_id
             ORDER BY event_time, sequence) - epoch_us(event_time) AS dur_us
  FROM (${TickQueries.liveTicksSql}) lt)
SELECT product_id, count(*) AS n_segments,
       CAST(sum(dur_us) AS BIGINT) AS total_dur_us,
       ${s6(s"(CAST(sum($k * dur_us) AS DOUBLE) / 1e$TwapScale) / CAST(sum(dur_us) AS DOUBLE)")} AS twap
FROM seg WHERE dur_us IS NOT NULL
GROUP BY product_id"""
  }

  /** Trailing rolling median of price over the last [[MedianWindow]] rows
    * per product — the percentile_disc pick at rank ceil(n/2) of the
    * frame's sorted values, so a REAL input value with no interpolation
    * (engine-exact like rel_quantiles/mad_outliers). The frame is
    * materialized per row (collect_list → sort_array → element_at, all
    * native codegen'd expressions — O(n·w log w)); at 100 TB swap the
    * per-row rebuild for a typed two-heap fold per key, same output.
    */
  private def rollingMedian(s: SparkSession, d: String): DataFrame = {
    val frame = Window.partitionBy(col("product_id"))
      .orderBy(col("event_time"), col("sequence"))
      .rowsBetween(-(MedianWindow - 1), Window.currentRow)
    r6(TickQueries.ticks(s, d)
      .withColumn("arr", sort_array(collect_list(col("price")).over(frame)))
      .select(col("product_id"), col("event_time"), col("sequence"), col("price"),
        element_at(col("arr"), ((size(col("arr")) + 1) / 2).cast("int")).as("roll_med")))
  }

  private val rollingMedianSql =
    s"""SELECT product_id, event_time, sequence, ${s6("price")} AS price,
       ${s6("l[CAST((len(l) + 1) // 2 AS INT)]")} AS roll_med
FROM (SELECT product_id, event_time, sequence, price,
        list_sort(list(price) OVER (PARTITION BY product_id
            ORDER BY event_time, sequence
            ROWS BETWEEN ${MedianWindow - 1} PRECEDING AND CURRENT ROW)) AS l
      FROM (${TickQueries.liveTicksSql}) lt)"""

  // CUSUM profile: price grid scale 4, drift 0.05 price units, alarm
  // threshold 5.0 price units — all carried as exact grid-integer longs.
  private val CusumScale = 4
  private val CusumDriftK = 500L   // 0.05 · 10^4
  private val CusumThreshK = 50000L // 5.0 · 10^4

  /** Per-key CUSUM change-point summary — see [[graft.ops.Cusum]] for
    * the prefix-min window formulation and
    * [[graft.streaming.StatefulCusum]] for the O(1)-state streaming
    * twin (bit-equality proved in StatefulCusumSpec). */
  private def cusum(s: SparkSession, d: String): DataFrame =
    graft.ops.Cusum.perKey(TickQueries.ticks(s, d), "product_id",
      "event_time", "sequence", "price", CusumScale, CusumDriftK, CusumThreshK)

  private val cusumSql = {
    val k = Det.klSql("price", CusumScale)
    val ord = "PARTITION BY product_id ORDER BY event_time, sequence"
    val run = s"OVER ($ord ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
    s"""WITH base AS (
  SELECT product_id, event_time, sequence,
         $k - first_value($k) $run - $CusumDriftK AS d
  FROM (${TickQueries.liveTicksSql}) lt
), pre AS (
  SELECT *, CAST(sum(d) $run AS BIGINT) AS p FROM base
), st AS (
  SELECT *, p - least(CAST(min(p) $run AS BIGINT), 0) AS s_k,
         row_number() OVER (PARTITION BY product_id
             ORDER BY event_time DESC, sequence DESC) AS rn_d
  FROM pre)
SELECT product_id, count(*) AS n_ticks,
       CAST(sum(CASE WHEN s_k > $CusumThreshK THEN 1 ELSE 0 END) AS BIGINT) AS n_alarms,
       ${s6(s"CAST(max(s_k) AS DOUBLE) / 1e$CusumScale")} AS max_s,
       ${s6(s"CAST(max(CASE WHEN rn_d = 1 THEN s_k END) AS DOUBLE) / 1e$CusumScale")} AS final_s
FROM st GROUP BY product_id"""
  }

  /** Per-product maximum drawdown: peak-to-trough drop of the price path
    * (running max minus current, on exact grid longs) plus the worst
    * relative drop. The integer drawdown is engine-exact; the relative
    * form divides the two exact ints per row (one correctly-rounded op)
    * and takes MAX — which, unlike SUM, is order-independent over
    * doubles, so no grid tricks are needed. One Exchange+Sort, then a
    * hash aggregate.
    */
  private def drawdown(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("product_id"))
      .orderBy(col("event_time"), col("sequence"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val k = Det.kl(col("price"), CusumScale)
    val scale = lit(math.pow(10, CusumScale))
    TickQueries.ticks(s, d)
      .withColumn("runmax", max(k).over(w))
      .withColumn("dd", col("runmax") - k)
      .groupBy(col("product_id"))
      .agg(
        count(lit(1)).as("n_ticks"),
        (max(col("runmax")).cast("double") / scale).as("peak_price"),
        (max(col("dd")).cast("double") / scale).as("max_drawdown"),
        max(col("dd").cast("double") / col("runmax").cast("double")).as("max_dd_frac"))
  }

  private val drawdownSql = {
    val k = Det.klSql("price", CusumScale)
    val run = "OVER (PARTITION BY product_id ORDER BY event_time, sequence " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
    s"""WITH base AS (
  SELECT product_id, CAST(max($k) $run AS BIGINT) AS runmax,
         CAST(max($k) $run AS BIGINT) - $k AS dd
  FROM (${TickQueries.liveTicksSql}) lt)
SELECT product_id, count(*) AS n_ticks,
       ${s6(s"CAST(max(runmax) AS DOUBLE) / 1e$CusumScale")} AS peak_price,
       ${s6(s"CAST(max(dd) AS DOUBLE) / 1e$CusumScale")} AS max_drawdown,
       ${s6("max(CAST(dd AS DOUBLE) / CAST(runmax AS DOUBLE))")} AS max_dd_frac
FROM base GROUP BY product_id"""
  }

  // Bollinger profile: 20-row trailing SMA ± 2σ.
  private val BollWindow = 20

  /** Bollinger-band breaches: ticks outside SMA ± 2·σ over the trailing
    * 20 rows — a composition of the O(n) exact trailing helpers
    * (Det.avgDTrailing / stddevPopDTrailing: prefix-sum rewrites that are
    * only sound because grid sums never round). Single Exchange+Sort;
    * emits breach rows only.
    */
  private def bollinger(s: SparkSession, d: String): DataFrame = {
    val base = Window.partitionBy(col("product_id"))
      .orderBy(col("event_time"), col("sequence"))
    val sma = Det.avgDTrailing(col("price"), 9, BollWindow, base)
    val sd = Det.stddevPopDTrailing(col("price"), 4, BollWindow, base)
    TickQueries.ticks(s, d)
      .withColumn("sma", sma)
      .withColumn("upper", col("sma") + lit(2.0) * sd)
      .withColumn("lower", col("sma") - lit(2.0) * sd)
      .withColumn("side",
        when(col("price") > col("upper"), lit("above"))
          .when(col("price") < col("lower"), lit("below")))
      .filter(col("side").isNotNull)
      .select(col("product_id"), col("event_time"), col("sequence"),
        col("price"), col("sma"), col("upper"), col("lower"), col("side"))
  }

  private val bollingerSql = {
    val ord = "PARTITION BY product_id ORDER BY event_time, sequence"
    val frame = s" OVER ($ord ROWS BETWEEN ${BollWindow - 1} PRECEDING AND CURRENT ROW)"
    val sma = Det.avgDSql("price", 9, frame)
    val sd = Det.stddevPopDSql("price", 4, frame)
    s"""WITH b AS (
  SELECT product_id, event_time, sequence, price,
         $sma AS sma, $sma + 2.0 * $sd AS upper, $sma - 2.0 * $sd AS lower
  FROM (${TickQueries.liveTicksSql}) lt)
SELECT product_id, event_time, sequence, ${s6("price")} AS price,
       ${s6("sma")} AS sma, ${s6("upper")} AS upper, ${s6("lower")} AS lower,
       CASE WHEN price > upper THEN 'above' ELSE 'below' END AS side
FROM b WHERE price > upper OR price < lower"""
  }

  /** Market-microstructure quote stats per instrument — the only query
    * family exercising best_bid/best_ask end-to-end: quoted share
    * (non-error rows carry a two-sided quote), Det-exact mean absolute
    * spread, exact max-spread pick, and mean relative spread in bps
    * ((ask−bid)/mid·10⁴ — per-row IEEE on identical operand bits, then
    * a scale-6 grid mean). One hash aggregate over a pruned scan; the
    * spread grid envelope is tiny (spread ≈ 0.2 → k ≈ 2·10⁵/row). */
  private def spreadStats(s: SparkSession, d: String): DataFrame = {
    val spread = col("best_ask") - col("best_bid")
    val mid = (col("best_bid") + col("best_ask")) / lit(2.0)
    val relBps = spread / mid * lit(10000.0)
    TickQueries.ticks(s, d)
      .groupBy(col("product_id"))
      .agg(count(lit(1)).as("n_ticks"),
        count(col("best_bid")).as("n_quoted"),
        (count(col("best_bid")).cast("double") /
          count(lit(1)).cast("double")).as("quoted_share"),
        Det.avgD(spread, 6).as("mean_spread"),
        max(spread).as("max_spread"),
        Det.avgD(relBps, 6).as("mean_rel_bps"))
  }

  private val spreadStatsSql = {
    val spread = "(best_ask - best_bid)"
    val relBps = s"($spread / ((best_bid + best_ask) / CAST(2 AS DOUBLE)) * CAST(10000 AS DOUBLE))"
    s"""SELECT product_id, count(*) AS n_ticks,
       count(best_bid) AS n_quoted,
       ${s6("CAST(count(best_bid) AS DOUBLE) / CAST(count(*) AS DOUBLE)")} AS quoted_share,
       ${s6(Det.avgDSql(spread, 6))} AS mean_spread,
       ${s6(s"max$spread")} AS max_spread,
       ${s6(Det.avgDSql(relBps, 6))} AS mean_rel_bps
FROM (${TickQueries.liveTicksSql}) lt
GROUP BY product_id"""
  }

  /** Intraday seasonality profile: per (instrument, hour-of-day), the
    * Det-exact mean price and its deviation from the instrument's
    * overall mean. Two-level exact arithmetic: grid-long sums aggregate
    * once per (instrument, hour) — 24 rows per key — and the overall
    * mean is a window SUM of those partial longs (associative), so both
    * means and their difference are fixed IEEE sequences over exact
    * integers. One fact shuffle; the window pass runs over the tiny
    * aggregated table. */
  private def seasonality(s: SparkSession, d: String): DataFrame = {
    val byProd = Window.partitionBy(col("product_id"))
    val base = TickQueries.ticks(s, d)
      .groupBy(col("product_id"), hour(col("event_time")).as("hour_of_day"))
      .agg(count(lit(1)).as("n_ticks"),
        sum(Det.kl(col("price"), 4)).as("sk"))
    val hourMean = (col("sk").cast("double") / lit(1e4)) / col("n_ticks").cast("double")
    val overallMean = (sum(col("sk")).over(byProd).cast("double") / lit(1e4)) /
      sum(col("n_ticks")).over(byProd).cast("double")
    base.select(col("product_id"), col("hour_of_day"), col("n_ticks"),
      hourMean.as("hour_mean"), (hourMean - overallMean).as("deviation"))
  }

  private val seasonalitySql = {
    val k = Det.klSql("price", 4)
    s"""WITH per AS (
  SELECT product_id, hour(event_time) AS hour_of_day, count(*) AS n_ticks,
         CAST(sum($k) AS BIGINT) AS sk
  FROM (${TickQueries.liveTicksSql}) lt
  GROUP BY product_id, hour(event_time))
SELECT product_id, hour_of_day, n_ticks,
       ${s6("(CAST(sk AS DOUBLE) / 1e4) / CAST(n_ticks AS DOUBLE)")} AS hour_mean,
       ${s6("""((CAST(sk AS DOUBLE) / 1e4) / CAST(n_ticks AS DOUBLE)) -
          ((CAST(sum(sk) OVER w AS DOUBLE) / 1e4) / CAST(sum(n_ticks) OVER w AS DOUBLE))""")} AS deviation
FROM per
WINDOW w AS (PARTITION BY product_id)"""
  }

  /** Donchian channel breakouts: price vs the rolling high/low of the
    * PREVIOUS 20 rows (frame excludes the current row, the standard
    * breakout definition — a new extreme IS the breakout). Exact picks
    * and integer comparisons only; one Exchange+Sort shared by both
    * frames. Emits breakout rows with the channel they pierced. */
  private def donchian(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("product_id"))
      .orderBy(col("event_time"), col("sequence"))
    val prev = w.rowsBetween(-20, -1)
    TickQueries.ticks(s, d)
      .withColumn("ch_high", max(col("price")).over(prev))
      .withColumn("ch_low", min(col("price")).over(prev))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") > 20 &&
        (col("price") > col("ch_high") || col("price") < col("ch_low")))
      .select(col("product_id"), col("event_time"), col("sequence"),
        col("price"), col("ch_high"), col("ch_low"),
        when(col("price") > col("ch_high"), "up").otherwise("down").as("direction"))
  }

  private val donchianSql =
    s"""WITH b AS (
  SELECT product_id, event_time, sequence, price,
         max(price) OVER wp AS ch_high, min(price) OVER wp AS ch_low,
         row_number() OVER wo AS rn
  FROM (${TickQueries.liveTicksSql}) lt
  WINDOW wo AS (PARTITION BY product_id ORDER BY event_time, sequence),
         wp AS (PARTITION BY product_id ORDER BY event_time, sequence
                ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING))
SELECT product_id, event_time, sequence, ${s6("price")} AS price,
       ${s6("ch_high")} AS ch_high, ${s6("ch_low")} AS ch_low,
       CASE WHEN price > ch_high THEN 'up' ELSE 'down' END AS direction
FROM b WHERE rn > 20 AND (price > ch_high OR price < ch_low)"""

  /** Tick-rule order-flow imbalance: classify each tick buy/sell by the
    * sign of the price change vs the previous DIFFERENT price (zero
    * changes inherit the last direction — the classic Lee–Ready tick
    * test without quotes), then aggregate hourly signed counts and an
    * imbalance ratio. All integer state: direction is a keyed window
    * chain (last non-zero sign via IGNORE-NULLS running last), counts
    * are exact, the ratio is one division of exact longs. */
  private def tickImbalance(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("product_id"))
      .orderBy(col("event_time"), col("sequence"))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val diff = col("price") - lag(col("price"), 1).over(w)
    TickQueries.ticks(s, d)
      .withColumn("raw_sign",
        when(diff > 0, 1L).when(diff < 0, -1L))
      .withColumn("dir", last(col("raw_sign"), ignoreNulls = true).over(run))
      .filter(col("dir").isNotNull)
      .groupBy(col("product_id"),
        date_trunc("hour", col("event_time")).as("bucket"))
      .agg(count(when(col("dir") === 1L, 1)).as("n_buy"),
        count(when(col("dir") === -1L, 1)).as("n_sell"),
        ((count(when(col("dir") === 1L, 1)) - count(when(col("dir") === -1L, 1))).cast("double") /
          count(lit(1)).cast("double")).as("imbalance"))
  }

  private val tickImbalanceSql =
    s"""WITH b AS (
  SELECT product_id, event_time,
         last_value(CASE WHEN d > 0 THEN 1 WHEN d < 0 THEN -1 END IGNORE NULLS)
           OVER (PARTITION BY product_id ORDER BY event_time, sequence
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS dir
  FROM (SELECT product_id, event_time, sequence, price,
               price - lag(price, 1) OVER (PARTITION BY product_id
                   ORDER BY event_time, sequence) AS d
        FROM (${TickQueries.liveTicksSql}) lt) t)
SELECT product_id, date_trunc('hour', event_time) AS bucket,
       count(CASE WHEN dir = 1 THEN 1 END) AS n_buy,
       count(CASE WHEN dir = -1 THEN 1 END) AS n_sell,
       ${s6(s"""${Det.signedDblSql("""(count(CASE WHEN dir = 1 THEN 1 END) -
             count(CASE WHEN dir = -1 THEN 1 END))""")} /
           CAST(count(*) AS DOUBLE)""")} AS imbalance
FROM b WHERE dir IS NOT NULL
GROUP BY product_id, date_trunc('hour', event_time)"""

  /** Candlestick pattern detection on the hourly OHLC bars: doji
    * (body ≤ 10% of range), hammer (long lower shadow), bullish/bearish
    * engulfing (current body swallows the previous bar's body). Every
    * predicate is a comparison over exact bar picks — the pattern label
    * is engine-identical by construction. The bar table is already
    * reduced (|keys|·|hours|), so the lag window and filters are
    * dimension-cheap. */
  private def candlePatterns(s: SparkSession, d: String): DataFrame = {
    val bars = TickQueries.ticks(s, d)
      .groupBy(col("product_id"),
        date_trunc("hour", col("event_time")).as("bar_ts"))
      .agg(
        min_by(col("price"), struct(col("event_time"), col("sequence"))).as("open"),
        max(col("price")).as("high"),
        min(col("price")).as("low"),
        max_by(col("price"), struct(col("event_time"), col("sequence"))).as("close"))
    val w = Window.partitionBy(col("product_id")).orderBy(col("bar_ts"))
    val body = abs(col("close") - col("open"))
    val range = col("high") - col("low")
    val lowerShadow = least(col("open"), col("close")) - col("low")
    val upperShadow = col("high") - greatest(col("open"), col("close"))
    val po = lag(col("open"), 1).over(w)
    val pc = lag(col("close"), 1).over(w)
    val pattern =
      when(po.isNotNull && pc < po && col("close") > col("open") &&
        col("open") <= pc && col("close") >= po, "bull_engulfing")
      .when(po.isNotNull && pc > po && col("close") < col("open") &&
        col("open") >= pc && col("close") <= po, "bear_engulfing")
      .when(range > 0 && body * lit(10.0) <= range, "doji")
      .when(body > 0 && lowerShadow >= body * lit(2.0) && upperShadow <= body, "hammer")
    bars
      .withColumn("prev_open", po).withColumn("prev_close", pc)
      .withColumn("pattern", pattern)
      .filter(col("pattern").isNotNull)
      .select(col("product_id"), col("bar_ts"), col("open"), col("high"),
        col("low"), col("close"), col("pattern"))
  }

  private val candlePatternsSql =
    s"""WITH t AS (
  SELECT product_id, date_trunc('hour', event_time) AS bar_ts, price,
         row_number() OVER (PARTITION BY product_id, date_trunc('hour', event_time)
                            ORDER BY event_time, sequence) AS rn_a,
         row_number() OVER (PARTITION BY product_id, date_trunc('hour', event_time)
                            ORDER BY event_time DESC, sequence DESC) AS rn_d
  FROM (${TickQueries.liveTicksSql}) lt),
bars AS (
  SELECT product_id, bar_ts,
         max(CASE WHEN rn_a = 1 THEN price END) AS open,
         max(price) AS high, min(price) AS low,
         max(CASE WHEN rn_d = 1 THEN price END) AS close
  FROM t GROUP BY product_id, bar_ts),
b AS (
  SELECT *, lag(open) OVER w AS po, lag(close) OVER w AS pc,
         abs(close - open) AS body, high - low AS rng,
         least(open, close) - low AS ls, high - greatest(open, close) AS us
  FROM bars WINDOW w AS (PARTITION BY product_id ORDER BY bar_ts))
SELECT product_id, bar_ts, ${s6("open")} AS open, ${s6("high")} AS high,
       ${s6("low")} AS low, ${s6("close")} AS close,
       CASE WHEN po IS NOT NULL AND pc < po AND close > open
                 AND open <= pc AND close >= po THEN 'bull_engulfing'
            WHEN po IS NOT NULL AND pc > po AND close < open
                 AND open >= pc AND close <= po THEN 'bear_engulfing'
            WHEN rng > 0 AND body * CAST(10 AS DOUBLE) <= rng THEN 'doji'
            WHEN body > 0 AND ls >= body * CAST(2 AS DOUBLE) AND us <= body THEN 'hammer'
       END AS pattern
FROM b
WHERE (po IS NOT NULL AND pc < po AND close > open AND open <= pc AND close >= po)
   OR (po IS NOT NULL AND pc > po AND close < open AND open >= pc AND close <= po)
   OR (rng > 0 AND body * CAST(10 AS DOUBLE) <= rng)
   OR (body > 0 AND ls >= body * CAST(2 AS DOUBLE) AND us <= body)"""

  /** Direction-run analysis (gaps-and-islands): consecutive same-sign
    * tick runs per instrument — run id = global row number minus
    * per-direction row number (the classic islands identity, two
    * windows over ONE Exchange+Sort), then a run-level aggregate.
    * Emits runs of length ≥ 5 with exact integer bounds. */
  private def signalRuns(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("product_id"))
      .orderBy(col("event_time"), col("sequence"))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val diff = col("price") - lag(col("price"), 1).over(w)
    val wd = Window.partitionBy(col("product_id"), col("dir"))
      .orderBy(col("event_time"), col("sequence"))
    TickQueries.ticks(s, d)
      .withColumn("raw_sign", when(diff > 0, 1L).when(diff < 0, -1L))
      .withColumn("dir", last(col("raw_sign"), ignoreNulls = true).over(run))
      .filter(col("dir").isNotNull)
      .withColumn("island", row_number().over(w) - row_number().over(wd))
      .groupBy(col("product_id"), col("dir"), col("island"))
      .agg(count(lit(1)).as("run_len"),
        min(col("sequence")).as("first_seq"),
        max(col("sequence")).as("last_seq"))
      .filter(col("run_len") >= 5)
      .select(col("product_id"), col("dir"), col("run_len"),
        col("first_seq"), col("last_seq"))
  }

  private val signalRunsSql =
    s"""WITH c AS (
  SELECT product_id, event_time, sequence,
         last_value(CASE WHEN d > 0 THEN 1 WHEN d < 0 THEN -1 END IGNORE NULLS)
           OVER (PARTITION BY product_id ORDER BY event_time, sequence
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS dir
  FROM (SELECT product_id, event_time, sequence, price,
               price - lag(price, 1) OVER (PARTITION BY product_id
                   ORDER BY event_time, sequence) AS d
        FROM (${TickQueries.liveTicksSql}) lt) t),
isl AS (
  SELECT product_id, dir, sequence,
         row_number() OVER (PARTITION BY product_id ORDER BY event_time, sequence)
         - row_number() OVER (PARTITION BY product_id, dir ORDER BY event_time, sequence)
           AS island
  FROM c WHERE dir IS NOT NULL)
SELECT product_id, CAST(dir AS BIGINT) AS dir, count(*) AS run_len,
       min(sequence) AS first_seq, max(sequence) AS last_seq
FROM isl GROUP BY product_id, dir, island
HAVING count(*) >= 5"""

  // ------------------------------------------------------------- vpin

  // Ticks per volume-synchronized bucket (unit tick volume → equal-count
  // buckets, the tick-based VPIN variant).
  private val VpinBucket = 50L

  /** dollar_bars notional-clock target, in price cents per bar (shared
    * Spark/oracle constant). */
  private val DollarTargetCents = 3000000L

  /** Notional-clock (dollar) bars — information-driven bar sampling
    * (López de Prado): instead of wall-clock hours (ohlc_bars) or equal
    * tick counts (vpin's clock), a bar closes when ~DollarTargetCents of
    * notional has printed, so bars carry comparable information content
    * across slow and frantic regimes. The clock is a per-key running sum
    * of EXACT cent-grid prices (associative longs — partitioning cannot
    * move a bar boundary), bar id = (cum−1) div target, then the ohlc
    * pick aggregate per (instrument, bar). Same single per-instrument
    * Exchange as every rolling operator; the aggregate ships one partial
    * state per bar. */
  private def dollarBars(s: SparkSession, d: String): DataFrame =
    TickQueries.ticks(s, d)
      .withColumn("cents", expr("cast(floor(price * 100 + 0.5) as long)"))
      .withColumn("bar",
        expr(s"(sum(cents) over (partition by product_id order by event_time, sequence rows between unbounded preceding and current row) - 1) div $DollarTargetCents"))
      .groupBy(col("product_id"), col("bar"))
      .agg(
        min_by(col("price"), struct(col("event_time"), col("sequence"))).as("open"),
        max(col("price")).as("high"),
        min(col("price")).as("low"),
        max_by(col("price"), struct(col("event_time"), col("sequence"))).as("close"),
        count(lit(1)).as("n_ticks"),
        sum(col("cents")).as("notional_cents"))

  /** imbalance_bars close threshold: |Σdir since bar start| ≥ T closes
    * the bar (shared Spark/oracle constant). */
  private val ImbalanceT = 4L

  /** Tick-IMBALANCE bars — the third information clock (López de Prado):
    * a bar closes when the tick-rule order-flow imbalance since the bar
    * opened reaches ±[[ImbalanceT]], so bars align with bursts of
    * one-sided flow. Unlike dollar_bars' prefix clock, the ±T reset is a
    * GENUINE reset recurrence (no closed form — CUSUM's prefix-min trick
    * does not apply to a two-sided threshold), so this is the
    * secondary-sort fold pattern: the tick-rule direction chain comes
    * from the shared per-instrument window Exchange (same chain as
    * vpin), then ONE compiled pass per key folds the all-integer
    * (imb, bar, counts) state — O(1) state, keys contiguous after the
    * sort, a key's history streams through the external sort. Integer
    * arithmetic end-to-end ⇒ engine-exact with no Det grid; the oracle
    * replays the identical fold via a LIST-accumulator list_reduce
    * (closed bars accumulate in the list tail, the partial tail bar
    * appends at the end — the holt_forecast oracle pattern). */
  private def imbalanceBars(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("product_id"))
      .orderBy(col("event_time"), col("sequence"))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val diff = col("price") - lag(col("price"), 1).over(w)
    val spark = s
    import spark.implicits._
    TickQueries.ticks(s, d)
      .withColumn("raw_sign", when(diff > 0, 1L).when(diff < 0, -1L))
      .withColumn("dir", last(col("raw_sign"), ignoreNulls = true).over(run))
      .filter(col("dir").isNotNull)
      .select(col("product_id"), col("event_time"), col("sequence"),
        col("dir").cast("int"))
      .as[(String, java.sql.Timestamp, Long, Int)]
      .repartition(col("product_id"))
      .sortWithinPartitions(col("product_id"), col("event_time"), col("sequence"))
      .mapPartitions { it =>
        val out = scala.collection.mutable.ArrayBuffer[(String, Long, Long, Long, Long)]()
        var cur: String = null
        var imb = 0L; var bar = 0L; var n = 0L; var nb = 0L; var ns = 0L
        def flush(): Unit = if (cur != null && n > 0) out += ((cur, bar, n, nb, ns))
        for ((k, _, _, dir) <- it) {
          if (k != cur) { flush(); cur = k; imb = 0; bar = 0; n = 0; nb = 0; ns = 0 }
          imb += dir; n += 1; if (dir > 0) nb += 1 else ns += 1
          if (math.abs(imb) >= ImbalanceT) {
            out += ((cur, bar, n, nb, ns)); bar += 1; imb = 0; n = 0; nb = 0; ns = 0
          }
        }
        flush()
        out.iterator
      }
      .toDF("product_id", "bar", "n_ticks", "n_buy", "n_sell")
      .withColumn("net", col("n_buy") - col("n_sell"))
  }

  /** Twin of the imbalance-bars fold, reformulated so the zipf tier can
    * grade the hot key: the naive sequential unroll carries the
    * closed-bars tail in its accumulator — Θ(n·bars) per key, ~10¹²
    * element copies on a 1.69M-tick hot key at T=4 — so this twin
    * solves the SAME recurrence in closed form over prefix sums.
    * With ±1 steps the running imbalance first leaves (−T, T) exactly
    * AT ±T, so a bar starting at position s closes at
    * f(s) = min j > s with P_j ∈ {P_s ± T} (P = dir prefix sum,
    * P_0 = 0). f is computed for EVERY position by one reversed
    * running-min window per (key, target-value) partition; bar starts
    * are the f-orbit of 0, enumerated by BINARY LIFTING (jump tables
    * f^(2^k), orbit doubled per level — the kcore/communities
    * MATERIALIZED-unroll pattern applied to pointer jumping), and every
    * bar's stats drop out arithmetically: n_ticks = e−s,
    * net = P_e − P_s, n_buy = (n_ticks+net)/2. Θ((n + bars)·log n)
    * per key, no growing accumulator anywhere. The per-key sentinel
    * n+1 absorbs ended chains (a real close AT the last tick is j = n,
    * which the sentinel must not shadow); the trailing open bar is the
    * orbit point whose jump exceeds n, clamped to e = n and emitted
    * only if non-empty — exactly the engine fold's flush. */
  private val imbalanceBarsSql = {
    val T = ImbalanceT
    val levels = 21 // 2^21 chain steps ≫ any fixture's bars-per-key
    val lifts = (0 until levels).map { k =>
      val step = 1L << k
      val jNext =
        if (k == levels - 1) "" // the last jump table is never composed
        else s""",
j${k + 1} AS MATERIALIZED (
  SELECT a.product_id, a.s, b.f
  FROM j$k a JOIN j$k b ON b.product_id = a.product_id AND b.s = a.f)"""
      s"""o${k + 1} AS MATERIALIZED (
  SELECT * FROM o$k
  UNION ALL
  SELECT o.product_id, o.bar + $step AS bar, j.f AS s
  FROM o$k o
  JOIN j$k j ON j.product_id = o.product_id AND j.s = o.s
  JOIN keys k2 ON k2.product_id = o.product_id
  WHERE j.f <= k2.n)$jNext"""
    }.mkString(",\n")
    s"""WITH b AS (
  SELECT product_id, event_time, sequence,
         last_value(CASE WHEN d > 0 THEN 1 WHEN d < 0 THEN -1 END IGNORE NULLS)
           OVER (PARTITION BY product_id ORDER BY event_time, sequence
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS dir
  FROM (SELECT product_id, event_time, sequence, price,
               price - lag(price, 1) OVER (PARTITION BY product_id
                   ORDER BY event_time, sequence) AS d
        FROM (${TickQueries.liveTicksSql}) lt) t),
d AS (
  SELECT product_id, CAST(dir AS BIGINT) AS dir,
         CAST(row_number() OVER (PARTITION BY product_id
             ORDER BY event_time, sequence) AS BIGINT) AS j
  FROM b WHERE dir IS NOT NULL),
p AS MATERIALIZED (
  SELECT product_id, j,
         CAST(sum(dir) OVER (PARTITION BY product_id ORDER BY j
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS pv
  FROM d
  UNION ALL
  SELECT DISTINCT product_id, CAST(0 AS BIGINT) AS j, CAST(0 AS BIGINT) AS pv
  FROM d),
keys AS MATERIALIZED (
  SELECT product_id, CAST(max(j) AS BIGINT) AS n FROM p GROUP BY 1),
ev AS (
  SELECT product_id, pv + $T AS v, j AS pos, 0 AS is_hit FROM p
  UNION ALL SELECT product_id, pv - $T AS v, j AS pos, 0 AS is_hit FROM p
  UNION ALL SELECT product_id, pv AS v, j AS pos, 1 AS is_hit FROM p),
nx AS (
  SELECT product_id, pos, is_hit,
         min(CASE WHEN is_hit = 1 THEN pos END)
           OVER (PARTITION BY product_id, v ORDER BY pos DESC, is_hit ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS nhit
  FROM ev),
j0 AS MATERIALIZED (
  SELECT q.product_id, q.pos AS s, COALESCE(min(q.nhit), k.n + 1) AS f
  FROM nx q JOIN keys k USING (product_id)
  WHERE q.is_hit = 0
  GROUP BY q.product_id, q.pos, k.n
  UNION ALL
  SELECT product_id, n + 1 AS s, n + 1 AS f FROM keys),
o0 AS (
  SELECT product_id, CAST(0 AS BIGINT) AS bar, CAST(0 AS BIGINT) AS s
  FROM keys),
$lifts,
guard AS (
  -- a key whose chain could exceed the unrolled orbit cap must fail
  -- LOUDLY with the cause named, never as a silent truncation that
  -- surfaces as an opaque hash mismatch (max bars per key = n/T + 1)
  SELECT CASE WHEN max(n) // $T + 2 > ${1L << levels}
              THEN error('imbalance_bars oracle: orbit cap 2^' || '$levels'
                         || ' exceeded - raise levels')
              ELSE CAST(0 AS BIGINT) END AS ok
  FROM keys),
bars0 AS (
  SELECT o.product_id, o.bar, o.s,
         LEAST(j.f, k.n) AS e
  FROM o$levels o
  JOIN j0 j ON j.product_id = o.product_id AND j.s = o.s
  JOIN keys k ON k.product_id = o.product_id),
stats AS (
  SELECT b.product_id, b.bar, b.e - b.s AS n_ticks, pe.pv - ps.pv AS net
  FROM bars0 b
  JOIN p ps ON ps.product_id = b.product_id AND ps.j = b.s
  JOIN p pe ON pe.product_id = b.product_id AND pe.j = b.e
  CROSS JOIN guard
  WHERE b.e > b.s AND guard.ok = 0)
SELECT product_id, bar, n_ticks,
       CAST((n_ticks + net) // 2 AS BIGINT) AS n_buy,
       CAST((n_ticks - net) // 2 AS BIGINT) AS n_sell,
       net
FROM stats"""
  }

  private val dollarBarsSql =
    s"""WITH t AS (
  SELECT product_id, event_time, sequence, price,
         CAST(floor(price * 100 + 0.5) AS BIGINT) AS cents
  FROM (${TickQueries.liveTicksSql}) lt),
c AS (
  SELECT *,
         CAST((sum(cents) OVER (PARTITION BY product_id
                 ORDER BY event_time, sequence
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1)
              // $DollarTargetCents AS BIGINT) AS bar
  FROM t),
r AS (
  SELECT *,
         row_number() OVER (PARTITION BY product_id, bar
                            ORDER BY event_time, sequence) AS rn_a,
         row_number() OVER (PARTITION BY product_id, bar
                            ORDER BY event_time DESC, sequence DESC) AS rn_d
  FROM c)
SELECT product_id, bar,
       ${s6("max(CASE WHEN rn_a = 1 THEN price END)")} AS open,
       ${s6("max(price)")} AS high,
       ${s6("min(price)")} AS low,
       ${s6("max(CASE WHEN rn_d = 1 THEN price END)")} AS close,
       count(*) AS n_ticks,
       CAST(sum(cents) AS BIGINT) AS notional_cents
FROM r GROUP BY product_id, bar"""

  /** Volume-synchronized order-flow toxicity (tick-based VPIN): classify
    * ticks with the same Lee–Ready sign chain as [[tickImbalance]], cut
    * each instrument's classified stream into equal-count buckets (the
    * volume clock — unit volumes here), and report each bucket's
    * |buy − sell| / n imbalance. The bucket index comes from a per-key
    * row_number on the SAME partitioning as the sign chain (one
    * Exchange); all counts exact, the ratio one exact-int division.
    */
  private def vpin(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("product_id"))
      .orderBy(col("event_time"), col("sequence"))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val diff = col("price") - lag(col("price"), 1).over(w)
    TickQueries.ticks(s, d)
      .withColumn("raw_sign", when(diff > 0, 1L).when(diff < 0, -1L))
      .withColumn("dir", last(col("raw_sign"), ignoreNulls = true).over(run))
      .filter(col("dir").isNotNull)
      .withColumn("rn", row_number().over(w))
      .withColumn("bucket", expr(s"(rn - 1) div $VpinBucket"))
      .groupBy(col("product_id"), col("bucket"))
      .agg(count(lit(1)).as("n_ticks"),
        count(when(col("dir") === 1L, 1)).as("n_buy"),
        count(when(col("dir") === -1L, 1)).as("n_sell"))
      .withColumn("vpin",
        abs(col("n_buy") - col("n_sell")).cast("double") /
          col("n_ticks").cast("double"))
  }

  private val vpinSql =
    s"""WITH b AS (
  SELECT product_id, event_time, sequence,
         last_value(CASE WHEN d > 0 THEN 1 WHEN d < 0 THEN -1 END IGNORE NULLS)
           OVER (PARTITION BY product_id ORDER BY event_time, sequence
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS dir
  FROM (SELECT product_id, event_time, sequence, price,
               price - lag(price, 1) OVER (PARTITION BY product_id
                   ORDER BY event_time, sequence) AS d
        FROM (${TickQueries.liveTicksSql}) lt) t),
r AS (
  SELECT product_id, dir,
         row_number() OVER (PARTITION BY product_id
                            ORDER BY event_time, sequence) AS rn
  FROM b WHERE dir IS NOT NULL),
g AS (
  SELECT product_id, (rn - 1) // $VpinBucket AS bucket,
         count(*) AS n_ticks,
         count(CASE WHEN dir = 1 THEN 1 END) AS n_buy,
         count(CASE WHEN dir = -1 THEN 1 END) AS n_sell
  FROM r GROUP BY 1, 2)
SELECT product_id, bucket, n_ticks, n_buy, n_sell,
       -- abs() makes the difference provably non-negative, so the direct
       -- cast is exempt from the signedDblSql rule (CLAUDE.md invariant 1)
       ${s6("CAST(abs(n_buy - n_sell) AS DOUBLE) / CAST(n_ticks AS DOUBLE)")} AS vpin
FROM g"""

  // ------------------------------------------------ realized_variance

  private val RvScale = 4 // price-diff grid 10^-4 → k² sums scaled 10^-8

  /** Realized variance vs bipower variation (Barndorff-Nielsen–Shephard
    * jump diagnostics) per (instrument, hour): RV = Σ r², BV =
    * (π/2)·Σ|r_i|·|r_{i−1}|, jump component = RV − BV (BV is robust to
    * jumps, so the gap isolates them). Price diffs ride the 10^-4 grid:
    * k² and |k_i|·|k_{i−1}| are exact longs, both sums are non-negative
    * (direct casts), the π/2 factor crosses via [[Det.dblLit]], and the
    * finishing arithmetic is the same fixed IEEE sequence on identical
    * operand bits. One keyed window pass (shared Exchange) + one hash
    * aggregate.
    */
  private def realizedVariance(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("product_id"))
      .orderBy(col("event_time"), col("sequence"))
    // a Scala double literal IS the exact bits in Spark; the SQL twin
    // crosses the same constant via Det.dblLit (string-parse path)
    val halfPi = lit(math.Pi / 2)
    TickQueries.ticks(s, d)
      .withColumn("k", Det.kl(col("price") - lag(col("price"), 1).over(w), RvScale))
      .withColumn("kp", lag(col("k"), 1).over(w))
      .filter(col("k").isNotNull)
      .groupBy(col("product_id"),
        date_trunc("hour", col("event_time")).as("bucket"))
      .agg(count(lit(1)).as("n_diffs"),
        (sum(col("k") * col("k")).cast("double") / lit(1e8)).as("rv"),
        (halfPi *
          (coalesce(sum(abs(col("k")) * abs(col("kp"))), lit(0L)).cast("double") /
            lit(1e8))).as("bv"))
      .withColumn("jump_stat", Det.snap(col("rv") - col("bv"), 6))
      .withColumn("rv", Det.snap(col("rv"), 6))
      .withColumn("bv", Det.snap(col("bv"), 6))
  }

  private val realizedVarianceSql = {
    val halfPi = Det.dblLit(math.Pi / 2)
    s"""WITH d AS (
  SELECT product_id, event_time, sequence,
         ${Det.klSql("price - lag(price, 1) OVER w", RvScale)} AS k
  FROM (${TickQueries.liveTicksSql}) lt
  WINDOW w AS (PARTITION BY product_id ORDER BY event_time, sequence)),
k AS (
  SELECT product_id, event_time, k,
         lag(k, 1) OVER (PARTITION BY product_id
                         ORDER BY event_time, sequence) AS kp
  FROM d),
g AS (
  SELECT product_id, date_trunc('hour', event_time) AS bucket,
         count(*) AS n_diffs,
         CAST(sum(k*k) AS DOUBLE) / 1e8 AS rv,
         $halfPi * (CAST(coalesce(sum(abs(k)*abs(kp)), 0) AS DOUBLE) / 1e8) AS bv
  FROM k WHERE k IS NOT NULL
  GROUP BY 1, 2)
SELECT product_id, bucket, n_diffs, ${s6("rv")} AS rv, ${s6("bv")} AS bv,
       ${s6("rv - bv")} AS jump_stat
FROM g"""
  }

  // --------------------------------------------------- forward_labels

  private val LabelHorizonS = 60L

  /** Forward-return labeling — the training-label generator: every tick
    * looks AHEAD to the first price at or after t+60 s (same instrument)
    * and gets its realized forward return, NULL when the series ends
    * first. This is [[graft.ops.AsofJoin.forward]] — union + ONE
    * Exchange + one Sort, no per-row lookups — against the per-(key,
    * time) deduped price (as-of uniqueness precondition). The return is
    * a division of identical operand bits, snapped to 1e-6; DuckDB's
    * `ASOF ... ON l.t <= r.t` is the oracle twin. */
  private def forwardLabels(s: SparkSession, d: String): DataFrame = {
    val base = TickQueries.ticks(s, d)
      .select(col("product_id"), col("event_time"), col("sequence"), col("price"))
    val probes = base.withColumn("probe_time",
      col("event_time") + expr(s"INTERVAL $LabelHorizonS SECONDS"))
    val uniq = base.groupBy(col("product_id"), col("event_time"))
      .agg(max(col("price")).as("r_price"))
      .select(col("product_id"), col("event_time").as("r_time"), col("r_price"))
    graft.ops.AsofJoin.forward(probes, uniq, Seq("product_id"),
        "probe_time", "r_time",
        Seq("r_time" -> "fwd_time", "r_price" -> "fwd_price"))
      .drop("probe_time")
      .withColumn("fwd_return",
        Det.snap((col("fwd_price") - col("price")) / col("price"), 6))
  }

  private val forwardLabelsSql =
    s"""WITH lt AS (${TickQueries.liveTicksSql}),
u AS (
  SELECT product_id, event_time AS r_time, max(price) AS r_price
  FROM lt GROUP BY 1, 2),
p AS (
  SELECT product_id, event_time, sequence, price,
         event_time + INTERVAL '$LabelHorizonS seconds' AS probe_time
  FROM lt)
SELECT p.product_id, p.event_time, p.sequence, ${s6("p.price")} AS price,
       u.r_time AS fwd_time, ${s6("u.r_price")} AS fwd_price,
       ${s6("(u.r_price - p.price) / p.price")} AS fwd_return
FROM p ASOF LEFT JOIN u
  ON p.product_id = u.product_id AND p.probe_time <= u.r_time"""

  // ------------------------------------------------------ roll_spread

  /** Roll's implied effective spread (Roll 1984): s = 2·√(−cov(Δp_t,
    * Δp_{t−1})) per (instrument, hour) — bid-ask bounce makes consecutive
    * price changes negatively serially correlated, and the magnitude
    * implies the spread without quote data. The serial covariance is
    * [[Det.covD]] (exact integer moments on the 10^-4 diff grid, one
    * fixed finishing sequence); the spread is NULL when the covariance
    * is non-negative (no bounce signal), 2·√(−cov) otherwise — negation
    * and the ×2 are exact IEEE ops, √ is correctly rounded. Same single
    * Exchange shape as [[realizedVariance]]. */
  private def rollSpread(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("product_id"))
      .orderBy(col("event_time"), col("sequence"))
    TickQueries.ticks(s, d)
      .withColumn("d", col("price") - lag(col("price"), 1).over(w))
      .withColumn("dprev", lag(col("d"), 1).over(w))
      .filter(col("d").isNotNull && col("dprev").isNotNull)
      .groupBy(col("product_id"),
        date_trunc("hour", col("event_time")).as("bucket"))
      .agg(count(lit(1)).as("n_pairs"),
        Det.covD(col("d"), col("dprev"), RvScale).as("cov_raw"))
      .select(col("product_id"), col("bucket"), col("n_pairs"),
        Det.snap(col("cov_raw"), 6).as("serial_cov"),
        Det.snap(when(col("cov_raw") < 0, lit(2.0) * sqrt(-col("cov_raw"))), 6)
          .as("roll_spread"))
  }

  private val rollSpreadSql =
    s"""WITH dd AS (
  SELECT product_id, event_time, sequence,
         price - lag(price, 1) OVER w AS d
  FROM (${TickQueries.liveTicksSql}) lt
  WINDOW w AS (PARTITION BY product_id ORDER BY event_time, sequence)),
p AS (
  SELECT product_id, event_time, d,
         lag(d, 1) OVER (PARTITION BY product_id
                         ORDER BY event_time, sequence) AS dprev
  FROM dd),
g AS (
  SELECT product_id, date_trunc('hour', event_time) AS bucket,
         count(*) AS n_pairs,
         ${Det.covDSql("d", "dprev", RvScale)} AS cov_raw
  FROM p WHERE d IS NOT NULL AND dprev IS NOT NULL
  GROUP BY 1, 2)
SELECT product_id, bucket, n_pairs, ${s6("cov_raw")} AS serial_cov,
       ${s6("CASE WHEN cov_raw < 0 THEN 2 * sqrt(-cov_raw) END")} AS roll_spread
FROM g"""

  // ------------------------------------------------------ kyle_lambda

  private val KyleScale = 4
  private val KyleBarUs = 300000000L // 5-minute bars

  /** Kyle's lambda — price impact per unit signed order flow: per
    * instrument, regress 5-min bar price changes on the bar's net
    * tick-rule flow, λ = cov(Δp, q) / var(q) via [[Det.betaD]] (exact
    * integer moment sums, one correctly-rounded division; NULL when the
    * flow has zero variance). Bars are epoch-aligned integer buckets;
    * open/close are deterministic (event_time, sequence) picks, so Δp is
    * an IEEE subtraction of identical operand bits in both engines.
    */
  private def kyleLambda(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("product_id"))
      .orderBy(col("event_time"), col("sequence"))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val diff = col("price") - lag(col("price"), 1).over(w)
    TickQueries.ticks(s, d)
      .withColumn("raw_sign", when(diff > 0, 1L).when(diff < 0, -1L))
      .withColumn("dir", last(col("raw_sign"), ignoreNulls = true).over(run))
      .filter(col("dir").isNotNull)
      .groupBy(col("product_id"),
        expr(s"unix_micros(event_time) div $KyleBarUs").as("bar"))
      .agg(
        min_by(col("price"), struct(col("event_time"), col("sequence"))).as("open"),
        max_by(col("price"), struct(col("event_time"), col("sequence"))).as("close"),
        sum(col("dir")).as("flow"))
      .select(col("product_id"), (col("close") - col("open")).as("dp"),
        col("flow").cast("double").as("flow"))
      .groupBy(col("product_id"))
      .agg(count(lit(1)).as("n_bars"),
        Det.snap(Det.betaD(col("dp"), col("flow"), KyleScale), 6).as("kyle_lambda"))
  }

  private val kyleLambdaSql =
    s"""WITH b AS (
  SELECT product_id, event_time, sequence, price,
         epoch_us(event_time) // $KyleBarUs AS bar,
         last_value(CASE WHEN d > 0 THEN 1 WHEN d < 0 THEN -1 END IGNORE NULLS)
           OVER (PARTITION BY product_id ORDER BY event_time, sequence
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS dir
  FROM (SELECT product_id, event_time, sequence, price,
               price - lag(price, 1) OVER (PARTITION BY product_id
                   ORDER BY event_time, sequence) AS d
        FROM (${TickQueries.liveTicksSql}) lt) t),
c AS (
  SELECT *, row_number() OVER (PARTITION BY product_id, bar
                               ORDER BY event_time, sequence) AS rn_a,
         row_number() OVER (PARTITION BY product_id, bar
                            ORDER BY event_time DESC, sequence DESC) AS rn_d
  FROM b WHERE dir IS NOT NULL),
bars AS (
  SELECT product_id, bar,
         max(CASE WHEN rn_a = 1 THEN price END) AS open,
         max(CASE WHEN rn_d = 1 THEN price END) AS close,
         CAST(sum(dir) AS BIGINT) AS flow
  FROM c GROUP BY 1, 2),
d AS (
  SELECT product_id, close - open AS dp, CAST(flow AS DOUBLE) AS flow
  FROM bars)
SELECT product_id, count(*) AS n_bars,
       ${s6(Det.betaDSql("dp", "flow", KyleScale))} AS kyle_lambda
FROM d GROUP BY product_id"""

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "vpin" -> ((s, d) => r6(vpin(s, d))),
    "kyle_lambda" -> ((s, d) => kyleLambda(s, d)),
    "realized_variance" -> ((s, d) => realizedVariance(s, d)),
    "roll_spread" -> ((s, d) => rollSpread(s, d)),
    "forward_labels" -> ((s, d) => r6(forwardLabels(s, d))),
    "candle_patterns" -> ((s, d) => r6(candlePatterns(s, d))),
    "signal_runs" -> ((s, d) => signalRuns(s, d)),
    "donchian_breakouts" -> ((s, d) => r6(donchian(s, d))),
    "tick_imbalance" -> ((s, d) => r6(tickImbalance(s, d))),
    "seasonality" -> ((s, d) => r6(seasonality(s, d))),
    "spread_stats" -> ((s, d) => r6(spreadStats(s, d))),
    "ohlc_bars" -> ((s, d) => r6(ohlc(s, d))),
    "dollar_bars" -> ((s, d) => r6(dollarBars(s, d))),
    "imbalance_bars" -> ((s, d) => imbalanceBars(s, d)),
    "twap" -> ((s, d) => r6(twap(s, d))),
    "rolling_median" -> ((s, d) => rollingMedian(s, d)),
    "cusum" -> ((s, d) => r6(cusum(s, d))),
    "drawdown" -> ((s, d) => r6(drawdown(s, d))),
    "bollinger_breaches" -> ((s, d) => r6(bollinger(s, d)))
  )

  def oracleSql: Map[String, String] = Map(
    "vpin" -> vpinSql,
    "dollar_bars" -> dollarBarsSql,
    "imbalance_bars" -> imbalanceBarsSql,
    "kyle_lambda" -> kyleLambdaSql,
    "realized_variance" -> realizedVarianceSql,
    "roll_spread" -> rollSpreadSql,
    "forward_labels" -> forwardLabelsSql,
    "candle_patterns" -> candlePatternsSql,
    "signal_runs" -> signalRunsSql,
    "donchian_breakouts" -> donchianSql,
    "tick_imbalance" -> tickImbalanceSql,
    "seasonality" -> seasonalitySql,
    "spread_stats" -> spreadStatsSql,
    "ohlc_bars" -> ohlcSql,
    "twap" -> twapSql,
    "rolling_median" -> rollingMedianSql,
    "cusum" -> cusumSql,
    "drawdown" -> drawdownSql,
    "bollinger_breaches" -> bollingerSql
  )
}

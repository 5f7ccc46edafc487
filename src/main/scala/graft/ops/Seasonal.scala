package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Classical additive seasonal decomposition on a filled hourly grid —
  * the moving-average STL ancestor (trend = centered 2×24 MA, seasonal =
  * per-hour-of-day mean of the detrended series, remainder variability
  * per seasonal slot), done entirely in EXACT integer arithmetic so the
  * DuckDB twin reproduces every bit.
  *
  * Exactness design: with k = floor(price·10⁴ + 0.5) grid longs, the
  * centered even-period MA has the classic half-weight ends —
  * trend_t = (k_{t−12} + 2·Σ_{t−11..t+11} k + k_{t+12}) / 48 / 10⁴ —
  * so N_t = 2·S_inner + k_{t−12} + k_{t+12} IS 48·10⁴·trend as an exact
  * long, and the detrended series y_t = 48·k_t − N_t is exact on the
  * 48·10⁴ grid. Per (instrument, hour-of-day) slot the seasonal mean is
  * (double)Σy / 48 / 10⁴ / n (one signed long → correctly-rounded double
  * in both engines), and the within-slot variability rides the exact
  * population-variance numerator n·Σy² − (Σy)² in DECIMAL(38)/HUGEINT,
  * finished through an exact decimal STRING cast (the > 2⁵³ rule) and
  * one correctly-rounded sqrt. Slots need the FULL ±12 window (count
  * = 25), so boundary rows never contribute a partial trend.
  *
  * Scale shape: two keyed window passes over the grid (one Exchange on
  * product_id), one grouped aggregate on (product_id, hour) — 24 rows
  * per instrument out. No collect, no global sort; the hour dimension
  * bounds the output, the grid bounds the windows.
  */
object Seasonal {

  /** `filled`: (product_id, grid_ts timestamp, price double) — a
    * gap-filled hourly grid (no missing hours inside each instrument's
    * span, e.g. from [[GapFill]]). Output: one row per (product_id,
    * hour_od) with n_obs, the seasonal mean and within-slot stddev. */
  private def dec(c: Column) = c.cast(DecimalType(19, 0))
  private def exact(c: Column) = c.cast("string").cast("double")

  /** The per-row exact detrend frame shared by the profile and the
    * anomaly scorer: (product_id, grid_ts, hour_od, y) with
    * y = 48·k − N on the 48·10⁴ grid, full-window rows only.
    *
    * r17 (guide §1.2 per-task work — the betaDTrailing idiom): Spark
    * rebuilds a sliding ROWS frame per output row, so the ±11 inner sum
    * and the ±12 count cost O(n·w) over the ~1M-row grid. Rewritten as
    * exact prefix-sum differences, O(n):
    *   Σ_{t−11..t+11} k = cum_{t+11} − cum_{t−12}
    *                    = lead(cum, 11) − lag(cum, 12),
    * and the full-window test `count over ±12 == 25` (k is never null —
    * callers filter price IS NOT NULL before the grid) is exactly
    * `lag(k,12) IS NOT NULL AND lead(k,12) IS NOT NULL` — both offsets
    * already computed for num48. Prefix difference of exact longs ≡
    * frame sum bit-for-bit. Envelope: the CUMULATIVE Σk per instrument
    * must stay under 2^63 (ANSI throws loudly past it) — at k ≈ 10^8
    * (price·10⁴) that is ~10^10 grid rows per key, five orders past the
    * 100× tiers. Surviving rows have both lag12/lead12 non-null, hence
    * both cum offsets defined (the coalesce only feeds filtered rows). */
  private def detrended(filled: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("product_id")).orderBy(col("grid_ts"))
    val cum = sum(col("k")).over(
      w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    filled
      .withColumn("k", Det.kl(col("price"), 4))
      .withColumn("lag12", lag(col("k"), 12).over(w))
      .withColumn("lead12", lead(col("k"), 12).over(w))
      .withColumn("sinner",
        lead(cum, 11).over(w) - coalesce(lag(cum, 12).over(w), lit(0L)))
      .filter(col("lag12").isNotNull && col("lead12").isNotNull)
      .select(col("product_id"), col("grid_ts"),
        hour(col("grid_ts")).cast("long").as("hour_od"),
        (lit(48L) * col("k") -
          (lit(2L) * col("sinner") + col("lag12") + col("lead12"))).as("y"))
  }

  def hourOfDayProfile(filled: DataFrame): DataFrame = {
    val y = detrended(filled)
    val agg = y.groupBy(col("product_id"), col("hour_od"))
      .agg(count(lit(1)).as("n_obs"),
        sum(col("y")).as("sy"),
        sum(dec(col("y")) * dec(col("y"))).as("sy2"))
    val vnum = dec(col("n_obs")) * col("sy2") - dec(col("sy")) * dec(col("sy"))
    agg.select(col("product_id"), col("hour_od"), col("n_obs"),
      Det.snap(col("sy").cast("double") / 48 / 10000 / col("n_obs"), 6)
        .as("seasonal"),
      Det.snap(sqrt(exact(vnum)) / (lit(480000.0) * col("n_obs")), 6)
        .as("sd_within"))
  }

  /** Seasonally-adjusted outliers: grid points whose detrended value
    * sits more than `zThresh` within-slot standard deviations from the
    * slot mean. The z-score needs NO division by the grid scale — the
    * 48·10⁴·n denominators of remainder and sd cancel, leaving
    * z = |y·n − Σy| / √(n·Σy² − (Σy)²) with an exact-long numerator
    * (≤ ~10¹² ≪ 2⁵³, so its double cast is exact in both engines) and
    * the DECIMAL38/HUGEINT variance under one string-routed cast and
    * sqrt. Top-K via TakeOrdered on the (z desc, product, grid_ts)
    * total order — no global-sort window. */
  def anomalies(filled: DataFrame, zThresh: Double = 3.0,
                topK: Int = 20): DataFrame = {
    val y = detrended(filled)
    // Slot moments as whole-partition window aggregates instead of
    // groupBy + self-join: HashPartitioning(product_id) from the
    // detrend pass already satisfies the (product_id, hour_od)
    // clustering (subset rule), so this adds one sort and ZERO
    // Exchanges where the join formulation paid an aggregate Exchange
    // plus a join back. Sums are exact longs/decimals — bit-identical
    // to the grouped form under any evaluation order.
    val wslot = Window.partitionBy(col("product_id"), col("hour_od"))
    val vnum = dec(col("n_obs")) * col("sy2") - dec(col("sy")) * dec(col("sy"))
    y.withColumn("n_obs", count(lit(1)).over(wslot))
      .withColumn("sy", sum(col("y")).over(wslot))
      .withColumn("sy2", sum(dec(col("y")) * dec(col("y"))).over(wslot))
      .withColumn("vnum", vnum)
      .drop("sy2")
      .filter(col("vnum") > 0)
      .withColumn("zs",
        abs(col("y") * col("n_obs") - col("sy")).cast("double") /
          sqrt(exact(col("vnum"))))
      .filter(col("zs") > zThresh)
      .orderBy(col("zs").desc, col("product_id"), col("grid_ts"))
      .limit(topK)
      // unpartitioned rank window is BOUNDED: it runs on the ≤topK
      // TakeOrdered survivors above, never the full anomaly frame
      .withColumn("rk", row_number().over(Window.orderBy(
        col("zs").desc, col("product_id"), col("grid_ts"))).cast("long"))
      .select(col("product_id"), col("grid_ts"), col("hour_od"),
        col("n_obs"), Det.snap(col("zs"), 6).as("z_score"), col("rk"))
  }
}

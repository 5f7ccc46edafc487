package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate aggregates — the 100 TB path next to the exact contract
  * queries. COUNT(DISTINCT) and exact per-group quantiles
  * (`rel_distinct_agg`, `rel_quantiles`) are the verified oracle
  * contract; at cluster scale you swap in these sketches when the exact
  * forms' shuffles dominate:
  *
  *   - HLL++ `approx_count_distinct`: fixed-size sketch per group
  *     (no Expand + two-phase distinct dedup shuffle), mergeable
  *     map-side, relative error ~rsd.
  *   - `approx_percentile` (KLL-ish): one pass, bounded memory,
  *     rank error ≤ 1/accuracy — vs the exact form's full sort per key.
  *
  * Sketch values are engine-specific (deterministic per engine+data, but
  * NOT portable bits), so these carry spec-level error-bound verification
  * against the exact aggregates instead of DuckDB oracle twins —
  * ApproxSpec pins the bounds.
  */
object Approx {

  /** Per-group distinct-count estimates alongside the exact counts they
    * approximate. `rsd` = target relative standard deviation. */
  def distinct(df: DataFrame, key: Column, value: Column,
               rsd: Double = 0.05): DataFrame =
    df.groupBy(key.as("key"))
      .agg(countDistinct(value).as("exact"),
        approx_count_distinct(value, rsd).as("approx"))

  /** Per-group p50/p90/p99 estimates; rank error ≤ 1/accuracy. */
  def percentiles(df: DataFrame, key: Column, value: Column,
                  accuracy: Int = 10000): DataFrame =
    df.groupBy(key.as("key"))
      .agg(percentile_approx(value, array(lit(0.5), lit(0.9), lit(0.99)),
        lit(accuracy)).as("approx_p"),
        count(value).as("n"))
}

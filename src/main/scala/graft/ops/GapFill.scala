package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Gap-fill / resample-to-grid: project an irregular per-key time series
  * onto a regular step grid, forward-filling the latest observation at or
  * before each grid point (TimescaleDB's `time_bucket_gapfill` +
  * `locf()`, the standard serving-layer densification the reference's
  * warehouse world provides; the engine version is just [[AsofJoin]]
  * against a generated grid).
  *
  * Shape: one groupBy per key for the (min, max) span, `sequence()`
  * explode to grid rows — output size is span/step per key, independent
  * of input row count — then the as-of union join (one shuffle + sort on
  * the key). Grid points before a key's first observation stay NULL
  * (nothing to carry), matching ASOF LEFT JOIN.
  */
object GapFill {

  /** @param valueCols observed column → output name, as in AsofJoin
    *                  (include the source time column renamed to expose
    *                  staleness).
    *
    * The grid-bounds side evaluates the `obs` subtree a second time,
    * but column pruning collapses any value-only derivation out of it —
    * e.g. with a per-(key, time) dedup aggregate as `obs` (uniqTicks),
    * the bounds side plans as ONE min/max aggregate straight off the
    * scan, no dedup Exchange (r17 probe: a raw-table bounds override
    * was plan-identical to what Catalyst already produces — don't add
    * one). */
  def apply(obs: DataFrame, keys: Seq[String], timeCol: String,
            step: String, valueCols: Seq[(String, String)],
            truncUnit: String = "minute"): DataFrame = {
    val keyCols = keys.map(col)
    val grid = obs
      .groupBy(keyCols: _*)
      .agg(date_trunc(truncUnit, min(col(timeCol))).as("__start"),
        max(col(timeCol)).as("__end"))
      .select(keyCols :+ explode(
        sequence(col("__start"), col("__end"), expr(s"interval $step")))
        .as("grid_ts"): _*)
    AsofJoin(grid, obs, keys, "grid_ts", timeCol, valueCols)
  }
}

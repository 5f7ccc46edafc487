package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CUSUM change-point detection — the upward-shift statistic
  * `S_t = max(0, S_{t-1} + (k_t − k_ref − drift))` over grid integers
  * k = value·10^scale, with k_ref the key's first observation.
  *
  * The recurrence is not folded sequentially: it has the exact prefix
  * form `S_t = P_t − min(0, min_{j≤t} P_j)` over prefix sums P of the
  * drift-adjusted deltas, so two running windows over ONE Exchange+Sort
  * compute it. Every quantity is an exact long — any engine agrees
  * bit-for-bit, and the streaming twin ([[graft.streaming.StatefulCusum]])
  * folds the same integers to the same bits with O(1) per-key state.
  */
object Cusum {

  /** One summary row per key: (key, n_ticks, n_alarms, max_s, final_s) —
    * alarm = S above `threshK` grid units; max_s/final_s finished as
    * `(double)S / 10^scale` (Det rule 3, non-negative so any engine's
    * cast agrees). */
  def perKey(df: DataFrame, key: String, time: String, seq: String,
             value: String, scale: Int, driftK: Long, threshK: Long): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(time), col(seq))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val k = Det.kl(col(value), scale)
    val pow = lit(s"1e$scale".toDouble)
    df
      .withColumn("d", k - first(k).over(run) - lit(driftK))
      .withColumn("p", sum(col("d")).over(run))
      .withColumn("s_k", col("p") - least(min(col("p")).over(run), lit(0L)))
      .groupBy(col(key))
      .agg(
        count(lit(1)).as("n_ticks"),
        sum(when(col("s_k") > threshK, 1L).otherwise(0L)).as("n_alarms"),
        (max(col("s_k")).cast("double") / pow).as("max_s"),
        (max_by(col("s_k"), struct(col(time), col(seq)))
          .cast("double") / pow).as("final_s"))
  }
}

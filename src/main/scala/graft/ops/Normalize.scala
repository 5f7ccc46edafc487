package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** Shared per-instrument event-time window specs.
  *
  * Every stateful computation in the reference partitions by `product_id`
  * and orders by `event_time` (e.g. `sma_cross.py:89-105`). We additionally
  * tie-break on `sequence` so results are deterministic under equal
  * timestamps — semantics-preserving (the reference's streams carry a
  * monotone Kafka offset implicitly) and required for oracle reproducibility.
  *
  * Scale note: one `Window.partitionBy(product_id)` spec is reused by every
  * downstream operator, so Catalyst plans ONE Exchange(hashpartitioning
  * (product_id)) + ONE per-partition sort and runs all window functions of a
  * stage in a single `Window` physical node — per-key state never leaves its
  * partition, which is exactly the layout a 1000-executor cluster needs.
  */
object Ticks {
  def byInstrument: WindowSpec =
    Window.partitionBy(col("product_id")).orderBy(col("event_time"), col("sequence"))
}

/** Tick normalization: mid-price, simple returns, rolling volatility.
  *
  * Reference semantics: `normalized_base` + `normalized_prices` views,
  * `flink_jobs/strategies/sma_cross.py:57-109` —
  *   - mid_price = (best_bid+best_ask)/2 when both present, else price  (P1)
  *   - returns   = (mid - prev_mid)/prev_mid, NULL on first tick / zero prev (P2, W1)
  *   - volatility = STDDEV_POP(mid_price) over trailing 60 rows          (W2)
  */
object Normalize {

  val VolatilityLookback = 60 // rows, `ROWS BETWEEN 59 PRECEDING` (sma_cross.py:92)

  /** Input: raw ticks (Schemas.rawPrice). Output: Schemas.normalizedPrice. */
  def apply(raw: DataFrame): DataFrame = {
    val w = Ticks.byInstrument
    raw
      .select(
        col("product_id"),
        col("event_time"),
        col("sequence").cast("long").as("sequence"),
        col("price").cast("double").as("price"),
        col("best_bid").cast("double").as("best_bid"),
        col("best_ask").cast("double").as("best_ask"),
        when(col("best_bid").isNotNull && col("best_ask").isNotNull,
          (col("best_bid").cast("double") + col("best_ask").cast("double")) / 2d)
          .otherwise(col("price").cast("double"))
          .as("mid_price")
      )
      .withColumn("prev_mid_price", lag(col("mid_price"), 1).over(w))
      .select(
        col("product_id"),
        col("event_time"),
        col("sequence"),
        col("mid_price"),
        col("best_bid"),
        col("best_ask"),
        when(col("prev_mid_price").isNull || col("prev_mid_price") === 0d, lit(null).cast("double"))
          .otherwise((col("mid_price") - col("prev_mid_price")) / col("prev_mid_price"))
          .as("returns"),
        // STDDEV_POP over the trailing 60 rows, via Det for run-to-run
        // bit-reproducibility, in O(n) prefix-sum form (see Det scaladoc).
        Det.stddevPopDTrailing(col("mid_price"), 4, VolatilityLookback, w)
          .as("volatility")
      )
  }
}

package graft.streaming

import graft.ops.Det
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming-native aggregation operators that run the SAME code path in
  * batch and streaming (invariant 5) — the `window(slide)` and
  * `dropDuplicatesWithinWatermark` counterparts of the batch
  * `sliding_windows` contract query and the Dedup family.
  *
  * Both take an already-watermarked (or batch) frame: `withWatermark` is
  * a no-op in batch, so callers can `.withWatermark("event_time", "10
  * minutes")` unconditionally and feed either a parquet scan or a Kafka
  * stream. At scale the hopping aggregation keeps one state row per open
  * (window, key) — bounded by slide-count × key-cardinality, not data
  * volume — and the dedup keeps one state row per key seen within the
  * watermark horizon, evicted as event time advances (unlike plain
  * streaming `dropDuplicates`, whose state never shrinks).
  */
object StreamingAggs {

  /** Hopping count + exact long-grid sum per (window, key) at scale 4
    * (Det rule 3 envelope: Σ|x|·10^4 < 2^63 per window). */
  def hoppingStats(ticks: DataFrame, keyCol: String, valCol: String,
                   duration: String, slide: String): DataFrame =
    ticks
      .groupBy(window(col("event_time"), duration, slide), col(keyCol))
      .agg(count(lit(1)).as("n"),
        Det.sumD(col(valCol), 4).as("sum_value"))
      .select(col("window.start").as("w_start"), col("window.end").as("w_end"),
        col(keyCol), col("n"), col("sum_value"))

  /** Tumbling OHLC candle bars — the streaming twin of the `ohlc_bars`
    * contract query's no-window aggregate shape: open/close are
    * `min_by`/`max_by` picks over the (event_time, sequence) struct
    * order, high/low/count plain aggregates. All five partial states
    * combine associatively, so micro-batch boundaries cannot change the
    * result (exact picks, no float accumulation) and streaming state is
    * one partial bar per open (window, key). Requires `event_time` and
    * `sequence` columns on the input frame. */
  def ohlcBars(ticks: DataFrame, keyCol: String, priceCol: String,
               duration: String): DataFrame =
    ticks
      .groupBy(window(col("event_time"), duration), col(keyCol))
      .agg(
        min_by(col(priceCol), struct(col("event_time"), col("sequence"))).as("open"),
        max(col(priceCol)).as("high"),
        min(col(priceCol)).as("low"),
        max_by(col(priceCol), struct(col("event_time"), col("sequence"))).as("close"),
        count(lit(1)).as("n_ticks"))
      .select(col("window.start").as("bar_ts"), col(keyCol),
        col("open"), col("high"), col("low"), col("close"), col("n_ticks"))

  /** Exactly-once tick dedup on (key, sequence). Streaming keeps
    * watermark-bounded state (evicted as event time advances — a plain
    * streaming dropDuplicates would grow forever); batch is plain
    * dropDuplicates, which Spark refuses to spell
    * dropDuplicatesWithinWatermark (analysis error), hence the branch —
    * semantics are identical because a tick is immutable per key. */
  def dedupTicks(ticks: DataFrame): DataFrame =
    if (ticks.isStreaming)
      ticks.dropDuplicatesWithinWatermark("product_id", "sequence")
    else ticks.dropDuplicates("product_id", "sequence")
}

package graft.ops

import graft.config.StrategyConfig
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SMA crossover signal generation.
  *
  * Reference semantics: `sma_enriched` + `crossover_signals` views,
  * `flink_jobs/strategies/sma_cross.py:127-184` —
  *   - fast/slow SMA = AVG(mid_price) over trailing fast/slow rows (W3, W4)
  *   - spread = fast − slow; prev_spread = LAG(spread, confirmation) (W5)
  *   - signal: spread>0 & prev<=0 → LONG(+1); spread<0 & prev>=0 → SHORT(−1);
  *     else HOLD(0); confidence = |spread|                            (P3)
  *   - metadata = JSON object of the inputs                           (P4)
  *
  * All three window functions share one partitioning/sort, so the physical
  * plan is a single Exchange + Sort + Window — no extra shuffle per SMA.
  */
object SmaCross {

  /** Input: normalized ticks. Output adds price/fast_sma/slow_sma/spread/prev_spread. */
  def enrich(normalized: DataFrame, cfg: StrategyConfig): DataFrame = {
    val w = Ticks.byInstrument
    normalized
      // O(n) prefix-sum trailing means (Det scaladoc) — bit-identical to
      // the direct frame sums because the decimal arithmetic is exact.
      .withColumn("fast_sma",
        Det.avgDTrailing(col("mid_price"), 9, cfg.smaFastWindow, w))
      .withColumn("slow_sma",
        Det.avgDTrailing(col("mid_price"), 9, cfg.smaSlowWindow, w))
      .withColumn("spread", col("fast_sma") - col("slow_sma"))
      .withColumn("prev_spread", lag(col("spread"), cfg.confirmation).over(w))
  }

  /** Crossover classification (sma_cross.py:148-184). Emits one row per tick
    * (HOLD included); callers filter `signal_type <> 'HOLD'` for the decisions
    * sink (P12, sma_cross.py:393).
    */
  def signals(enriched: DataFrame, cfg: StrategyConfig): DataFrame = {
    val isLong = col("spread") > 0d && col("prev_spread") <= 0d
    val isShort = col("spread") < 0d && col("prev_spread") >= 0d
    enriched.select(
      lit(cfg.strategyRunId).as("strategy_run_id"),
      col("product_id").as("instrument_id"),
      col("event_time").as("signal_time"),
      col("sequence"),
      when(isLong, lit("LONG")).when(isShort, lit("SHORT")).otherwise(lit("HOLD"))
        .as("signal_type"),
      when(isLong, lit(1.0)).when(isShort, lit(-1.0)).otherwise(lit(0.0))
        .as("position"),
      abs(col("spread")).as("confidence"),
      // JSON_OBJECT(...) with casts-to-string, sma_cross.py:166-172 (P4).
      to_json(map(
        lit("fast_sma"), col("fast_sma").cast("string"),
        lit("slow_sma"), col("slow_sma").cast("string"),
        lit("spread"), col("spread").cast("string"),
        lit("confirmation_window"), lit(cfg.confirmation.toString),
        lit("execution_mode"), lit(cfg.executionMode)
      )).as("metadata")
    )
  }

  /** Full normalize → enrich → classify chain from raw ticks. */
  def apply(raw: DataFrame, cfg: StrategyConfig): DataFrame =
    signals(enrich(Normalize(raw), cfg), cfg)
}

package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hourly metrics rollup — the Spark equivalent of the reference's
  * TimescaleDB continuous aggregate `strategy_metrics_hourly`
  * (`docker/postgres/init/03_continuous_aggregates.sql:3-22`, A7):
  * `time_bucket('1 hour', metric_time)` + AVG(sharpe), AVG(sortino),
  * LAST(cumulative_return ORDER BY metric_time), MAX(drawdown), SUM(trades).
  *
  * Runs identically as a batch rollup over persisted metric history or a
  * streaming windowed aggregate with a watermark (the 15-min refresh policy
  * becomes the micro-batch trigger). `max_by` gives Timescale's
  * `LAST(value, time)` without a sort.
  */
object Rollup {

  /** Streaming continuous-aggregate form: the 15-min refresh policy
    * becomes the trigger interval of the query that runs this with
    * `metrics.withWatermark("metric_time", delay)` upstream — same
    * aggregate, watermark closes hourly buckets (A7,
    * docker/postgres/init/03_continuous_aggregates.sql:17-22). */
  def hourlyStream(metricsWithWatermark: DataFrame): DataFrame =
    hourly(metricsWithWatermark)

  def hourly(metrics: DataFrame): DataFrame =
    metrics
      .groupBy(
        col("strategy_run_id"),
        window(col("metric_time"), "1 hour").as("win"))
      .agg(
        // Det.avgD: order-independent means (see Det's scaladoc).
        Det.avgD(col("sharpe_ratio"), 6).as("avg_sharpe"),
        Det.avgD(col("sortino_ratio"), 6).as("avg_sortino"),
        max_by(col("cumulative_return"), col("metric_time")).as("last_cumulative_return"),
        max(col("drawdown")).as("max_drawdown"),
        sum(col("trades_executed")).as("total_trades")
      )
      .select(
        col("strategy_run_id"),
        col("win.start").as("bucket"),
        col("avg_sharpe"), col("avg_sortino"),
        col("last_cumulative_return"), col("max_drawdown"), col("total_trades")
      )

  // ------------------------------------------------------------------
  // Incremental maintenance (the continuous aggregate's 15-min refresh
  // without recomputing history): keep PARTIAL states per bucket, merge
  // a new slice's partials in, finalize on read. Every partial field is
  // associative-exact — grid-long sums, counts, max picks — so
  // finalize(merge(partials(A), partials(B))) produces the IDENTICAL
  // BITS to hourly(A ∪ B), proven in RollupSpec. At 100 TB this is the
  // difference between touching one day and touching three years.
  // ------------------------------------------------------------------

  private val AvgScale = 6

  /** Associative per-bucket partial state. `last_state` packs
    * (metric_time, value) so max() picks the latest row exactly like
    * hourly's max_by (metric_time is unique per run by construction). */
  def hourlyPartials(metrics: DataFrame): DataFrame =
    metrics
      .groupBy(col("strategy_run_id"),
        window(col("metric_time"), "1 hour").as("win"))
      .agg(
        sum(Det.kl(col("sharpe_ratio"), AvgScale)).as("sharpe_k"),
        count(col("sharpe_ratio")).as("sharpe_n"),
        sum(Det.kl(col("sortino_ratio"), AvgScale)).as("sortino_k"),
        count(col("sortino_ratio")).as("sortino_n"),
        max(struct(col("metric_time"), col("cumulative_return"))).as("last_state"),
        max(col("drawdown")).as("max_drawdown"),
        sum(col("trades_executed")).as("total_trades"))
      .select(col("strategy_run_id"), col("win.start").as("bucket"),
        col("sharpe_k"), col("sharpe_n"), col("sortino_k"), col("sortino_n"),
        col("last_state"), col("max_drawdown"), col("total_trades"))

  /** Merge two partial-state frames (existing rollup + a new slice) —
    * pure associative combination, one shuffle on the bucket key. */
  def mergeHourly(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy(col("strategy_run_id"), col("bucket"))
      .agg(
        sum(col("sharpe_k")).as("sharpe_k"),
        sum(col("sharpe_n")).as("sharpe_n"),
        sum(col("sortino_k")).as("sortino_k"),
        sum(col("sortino_n")).as("sortino_n"),
        max(col("last_state")).as("last_state"),
        max(col("max_drawdown")).as("max_drawdown"),
        sum(col("total_trades")).as("total_trades"))

  /** Finalize partials to the exact [[hourly]] output bits: the same
    * fixed sequence `(double)Σk / 10^s / n` Det.avgD uses. */
  def finalizeHourly(partials: DataFrame): DataFrame =
    partials.select(
      col("strategy_run_id"), col("bucket"),
      (col("sharpe_k").cast("double") / lit(math.pow(10, AvgScale)) /
        col("sharpe_n")).as("avg_sharpe"),
      (col("sortino_k").cast("double") / lit(math.pow(10, AvgScale)) /
        col("sortino_n")).as("avg_sortino"),
      col("last_state.cumulative_return").as("last_cumulative_return"),
      col("max_drawdown"), col("total_trades"))
}

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
}

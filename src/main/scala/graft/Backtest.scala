package graft

import graft.config.StrategyConfig
import graft.io.History
import graft.strategy.{Strategy, StrategyOutputs}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Replay-as-a-mode backtesting (SURVEY §3.3, T8): the reference pairs a
  * Kafka replay service (seek by timestamp, paced republish,
  * flink_jobs/replay/service.py) with a UNION-ALL backtest hook
  * (sma_cross.py:43-52). Because every operator here is a pure
  * DataFrame transform, a backtest is just the same strategy applied to a
  * time-bounded read of the tick warehouse — partition pruning does the
  * "seek", and there is nothing to pace.
  */
object Backtest {

  /** Run `strategy` over archived ticks in [startTs, endTs). */
  def run(spark: SparkSession, historyPath: String, strategy: Strategy,
          cfg: StrategyConfig, startTs: String, endTs: String): StrategyOutputs = {
    val slice = History.read(spark, historyPath)
      .filter(col("event_time") >= to_timestamp(lit(startTs)) &&
        col("event_time") < to_timestamp(lit(endTs)))
      .drop("event_date")
    strategy(slice, cfg)
  }
}

package graft.schemas

import org.apache.spark.sql.types._
import java.sql.Timestamp

/** Explicit schemas for every stream/table in the engine, one constant per
  * topic/table — the Spark equivalent of the reference's three manually-synced
  * schema declarations (Flink DDL `flink_jobs/__main__.py:51-227`, dataclasses
  * under `flink_jobs/schemas/`, Postgres DDL `docker/postgres/init/02_schema.sql`).
  * Here there is exactly ONE source of truth per record type: the case class;
  * the StructType is what `from_json`/`readStream` consume.
  */
object Schemas {

  /** Raw tick (`prices_raw` DDL, __main__.py:51-74). */
  val rawPrice: StructType = StructType(Seq(
    StructField("product_id", StringType, nullable = false),
    StructField("price", DoubleType, nullable = true),
    StructField("best_bid", DoubleType, nullable = true),
    StructField("best_ask", DoubleType, nullable = true),
    StructField("volume_24h", DoubleType, nullable = true),
    StructField("sequence", LongType, nullable = true),
    StructField("side", StringType, nullable = true),
    StructField("event_time", TimestampType, nullable = false),
    StructField("source", StringType, nullable = true)
  ))

  /** Normalized tick (`prices_normalized` DDL, __main__.py:76-95). */
  val normalizedPrice: StructType = StructType(Seq(
    StructField("product_id", StringType, nullable = false),
    StructField("event_time", TimestampType, nullable = false),
    StructField("sequence", LongType, nullable = true),
    StructField("mid_price", DoubleType, nullable = true),
    StructField("best_bid", DoubleType, nullable = true),
    StructField("best_ask", DoubleType, nullable = true),
    StructField("returns", DoubleType, nullable = true),
    StructField("volatility", DoubleType, nullable = true)
  ))

  /** Signal decision (`signals_decisions` DDL, __main__.py:97-115). */
  val strategySignal: StructType = StructType(Seq(
    StructField("strategy_run_id", StringType, nullable = false),
    StructField("instrument_id", StringType, nullable = false),
    StructField("signal_time", TimestampType, nullable = false),
    StructField("signal_type", StringType, nullable = false),
    StructField("position", DoubleType, nullable = false),
    StructField("confidence", DoubleType, nullable = true),
    StructField("metadata", StringType, nullable = true)
  ))

  /** Performance metric (`metrics_performance` DDL, __main__.py:117-142). */
  val strategyMetric: StructType = StructType(Seq(
    StructField("strategy_run_id", StringType, nullable = false),
    StructField("metric_time", TimestampType, nullable = false),
    StructField("window_label", StringType, nullable = false),
    StructField("sharpe_ratio", DoubleType, nullable = true),
    StructField("sortino_ratio", DoubleType, nullable = true),
    StructField("cumulative_return", DoubleType, nullable = true),
    StructField("drawdown", DoubleType, nullable = true),
    StructField("volatility", DoubleType, nullable = true),
    StructField("trades_executed", LongType, nullable = true),
    StructField("avg_exposure_notional", DoubleType, nullable = true),
    StructField("total_trade_cost", DoubleType, nullable = true),
    StructField("total_transaction_cost", DoubleType, nullable = true),
    StructField("total_slippage_cost", DoubleType, nullable = true),
    StructField("metadata", StringType, nullable = true)
  ))
}

/** Typed row mirrors (reference dataclasses `flink_jobs/schemas/prices.py`,
  * `flink_jobs/schemas/signals.py`) for `Dataset[T]` use where compile-time
  * field checks help. Compute stays DataFrame/Column (codegen-friendly).
  */
final case class RawPrice(
    product_id: String,
    price: java.lang.Double,
    best_bid: java.lang.Double,
    best_ask: java.lang.Double,
    volume_24h: java.lang.Double,
    sequence: java.lang.Long,
    side: String,
    event_time: Timestamp,
    source: String
)

final case class NormalizedPrice(
    product_id: String,
    event_time: Timestamp,
    sequence: java.lang.Long,
    mid_price: java.lang.Double,
    best_bid: java.lang.Double,
    best_ask: java.lang.Double,
    returns: java.lang.Double,
    volatility: java.lang.Double
)

final case class StrategySignal(
    strategy_run_id: String,
    instrument_id: String,
    signal_time: Timestamp,
    signal_type: String,
    position: Double,
    confidence: java.lang.Double,
    metadata: String
)

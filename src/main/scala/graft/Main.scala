package graft

import graft.config.StrategyConfig
import graft.io.{JdbcSink, KafkaJson}
import graft.schemas.Schemas
import graft.strategy.StrategyRegistry
import graft.streaming.{Sinks, StreamingJob}
import org.apache.spark.sql.SparkSession

/** The `python -m flink_jobs` equivalent (SURVEY §3.1): env-driven config,
  * strategy resolution from the registry, one Kafka source, one multi-sink
  * streaming job (Kafka topics + JDBC tables), blocking on termination.
  *
  * Env surface mirrors the reference (flink_jobs/config.py, __main__.py):
  * STRATEGY_MODULE, KAFKA_BOOTSTRAP_SERVERS, topic names, JDBC_* for the
  * warehouse sinks, SPARK_PARALLELISM, CHECKPOINT_DIR, plus every
  * StrategyConfig knob (SMA_*, *_BPS, FILL_LATENCY_*).
  */
object Main {
  def main(args: Array[String]): Unit = {
    val env = sys.env
    def e(k: String, d: String): String = env.getOrElse(k, d)

    val cfg = StrategyConfig.fromEnv(env)
    val strategy = StrategyRegistry.resolve(e("STRATEGY_MODULE", "sma_cross"))
    val parallelism = e("SPARK_PARALLELISM", "2") // FLINK_PARALLELISM default 2

    val spark = SparkSession.builder()
      .appName(s"${strategy.name}-pipeline") // "{strategy}-pipeline", __main__.py:241
      .config("spark.sql.shuffle.partitions", parallelism)
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()

    val servers = e("KAFKA_BOOTSTRAP_SERVERS", "localhost:9092")
    val raw = KafkaJson.source(
      spark, servers,
      topic = e("PRICES_RAW_TOPIC", "prices.raw"),
      schema = Schemas.rawPrice,
      watermarkDelay = e("WATERMARK_DELAY", "5 seconds"),
      startingOffsets = e("STARTING_OFFSETS", "latest"))

    def jdbc(table: String) = JdbcSink.writer(
      url = e("JDBC_URL", "jdbc:postgresql://localhost:5432/quant"),
      table = table,
      user = e("JDBC_USER", "quant"),
      password = e("JDBC_PASSWORD", ""),
      batchSize = e("JDBC_BATCH_SIZE", "200").toInt)

    val sinks = Sinks(
      normalized = df => KafkaJson.writeBatch(df, servers,
        e("PRICES_NORMALIZED_TOPIC", "prices.normalized"), keyCol = Some("product_id")),
      signals = df => KafkaJson.writeBatch(df, servers,
        e("SIGNALS_TOPIC", "signals.decisions"), keyCol = Some("instrument_id")),
      positions = jdbc(e("POSITIONS_TABLE", "strategy_positions_stream")),
      executions = jdbc(e("EXECUTIONS_TABLE", "strategy_executions_stream")),
      metrics = { df =>
        KafkaJson.writeBatch(df, servers, e("METRICS_TOPIC", "metrics.performance"))
        jdbc(e("METRICS_TABLE", "strategy_metrics"))(df)
      })

    val job = new StreamingJob(strategy, cfg, sinks,
      watermarkDelay = e("WATERMARK_DELAY", "5 seconds"),
      checkpointDir = env.get("CHECKPOINT_DIR"))
    val query = job.start(raw)
    query.awaitTermination()
  }
}

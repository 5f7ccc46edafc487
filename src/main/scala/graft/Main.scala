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

  /** The metrics table's PK (02_schema.sql:104) — the upsert key. */
  private[graft] val MetricsPk = Seq("strategy_run_id", "window_label", "metric_time")

  /** S5-S7 metrics-writer selection (r14 verdict: ship the stronger
    * writer): `JDBC_WRITE_MODE=upsert` swaps the METRICS sink to the
    * exactly-once PK upsert ([[JdbcSink.upsert]]) — its frame is a keyed
    * aggregate, one row per (strategy_run_id, window_label, metric_time)
    * per micro-batch, which is exactly the upsert's one-row-per-PK
    * contract, and refined re-emissions of a still-open window NEED
    * last-write-wins. Positions/executions stay append + server-side PK
    * dedup in BOTH modes: their PKs (02_schema.sql:149,175) are event-time
    * columns, not aggregation keys, so one-row-per-PK is not structural
    * there. Default `append` is the reference-faithful at-least-once
    * (__main__.py:144-227). MultiSinkExactlyOnceSpec drives this exact
    * factory through StreamingJob's fan-out against embedded Derby. */
  private[graft] def metricsWriter(mode: String, url: String, table: String,
      user: String, password: String, batchSize: Int): org.apache.spark.sql.DataFrame => Unit =
    mode match {
      case "upsert" => JdbcSink.upsert(url, table, MetricsPk, batchSize,
        connProps = Map("user" -> user, "password" -> password))
      case "append" => JdbcSink.writer(url, table, user, password, batchSize)
      case m => throw new IllegalArgumentException(
        s"JDBC_WRITE_MODE=$m (expected append|upsert)")
    }

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

    val jdbcUrl = e("JDBC_URL", "jdbc:postgresql://localhost:5432/quant")
    val jdbcUser = e("JDBC_USER", "quant")
    val jdbcPass = e("JDBC_PASSWORD", "")
    val jdbcBatch = e("JDBC_BATCH_SIZE", "200").toInt
    def jdbc(table: String) =
      JdbcSink.writer(jdbcUrl, table, jdbcUser, jdbcPass, jdbcBatch)
    val metricsJdbc = metricsWriter(e("JDBC_WRITE_MODE", "append"), jdbcUrl,
      e("METRICS_TABLE", "strategy_metrics"), jdbcUser, jdbcPass, jdbcBatch)

    val sinks = Sinks(
      normalized = df => KafkaJson.writeBatch(df, servers,
        e("PRICES_NORMALIZED_TOPIC", "prices.normalized"), keyCol = Some("product_id")),
      signals = df => KafkaJson.writeBatch(df, servers,
        e("SIGNALS_TOPIC", "signals.decisions"), keyCol = Some("instrument_id")),
      positions = jdbc(e("POSITIONS_TABLE", "strategy_positions_stream")),
      executions = jdbc(e("EXECUTIONS_TABLE", "strategy_executions_stream")),
      metrics = { df =>
        KafkaJson.writeBatch(df, servers, e("METRICS_TOPIC", "metrics.performance"))
        metricsJdbc(df)
      })

    val job = new StreamingJob(strategy, cfg, sinks,
      watermarkDelay = e("WATERMARK_DELAY", "5 seconds"),
      checkpointDir = env.get("CHECKPOINT_DIR"))
    val query = job.start(raw)
    query.awaitTermination()
  }
}

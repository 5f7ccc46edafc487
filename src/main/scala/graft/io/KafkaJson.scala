package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType

/** Kafka JSON source/sink wrappers — the Spark equivalents of the
  * reference's Flink DDL tables (SURVEY §2.1 S1-S4, flink_jobs/__main__.py
  * :51-142) and the replay service (S8, flink_jobs/replay/service.py).
  * Thin by design: all logic lives in the pure operators; these only bind
  * them to transports, so unit tests run on parquet/memory sources and the
  * wrappers stay a few declarative lines.
  */
object KafkaJson {

  /** Streaming JSON source (S1): topic → typed columns + watermark.
    * PERMISSIVE from_json yields null structs on parse errors; dropping
    * them reproduces 'json.ignore-parse-errors' (__main__.py:71). Rows
    * must carry a non-null event_time (the event-time attribute).
    */
  def source(spark: SparkSession, servers: String, topic: String,
             schema: StructType, watermarkDelay: String = "5 seconds",
             startingOffsets: String = "latest", // T10, __main__.py:68
             minPartitions: Option[Int] = None): DataFrame = {
    val r = spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", servers)
      .option("subscribe", topic)
      .option("startingOffsets", startingOffsets)
      .option("failOnDataLoss", "false")
    val withMin = minPartitions.fold(r)(n => r.option("minPartitions", n))
    withMin.load()
      .select(from_json(col("value").cast("string"), schema).as("r"))
      .filter(col("r").isNotNull && col("r.event_time").isNotNull)
      .select(col("r.*"))
      .withWatermark("event_time", watermarkDelay) // T1, __main__.py:63
  }

  /** All columns → one JSON `value` (ISO-8601 timestamps, like the
    * reference's Kafka sinks S2-S4). */
  def toJsonValue(df: DataFrame, keyCol: Option[String] = None): DataFrame = {
    val value = to_json(struct(df.columns.map(col).toIndexedSeq: _*)).as("value")
    keyCol.fold(df.select(value))(k => df.select(col(k).cast("string").as("key"), value))
  }

  /** Batch write of a micro-batch slice to a topic — used inside
    * foreachBatch so all sinks share one computed core (T7). */
  def writeBatch(df: DataFrame, servers: String, topic: String,
                 keyCol: Option[String] = None): Unit =
    toJsonValue(df, keyCol).write.format("kafka")
      .option("kafka.bootstrap.servers", servers)
      .option("topic", topic)
      .save()

  /** Standalone streaming JSON sink (S2-S4) for single-output jobs. */
  def sink(df: DataFrame, servers: String, topic: String,
           checkpointLocation: String, keyCol: Option[String] = None): StreamingQuery =
    toJsonValue(df, keyCol).writeStream.format("kafka")
      .option("kafka.bootstrap.servers", servers)
      .option("topic", topic)
      .option("checkpointLocation", checkpointLocation)
      .start()

  /** Replay as a bounded batch read (S8/T8): the reference's seek-by-
    * timestamp/offset + paced republish collapses into a timestamp-bounded
    * Kafka scan feeding the identical pipeline — replay is a mode, not a
    * service. Pacing (speedup_factor) is unnecessary in batch; to
    * re-publish paced output, pair with a Trigger.AvailableNow stream.
    */
  def replay(spark: SparkSession, servers: String, topic: String,
             schema: StructType, startMs: Long, endMs: Option[Long] = None): DataFrame = {
    val r = spark.read.format("kafka")
      .option("kafka.bootstrap.servers", servers)
      .option("subscribe", topic)
      .option("startingTimestamp", startMs.toString)
    endMs.fold(r)(e => r.option("endingTimestamp", e.toString))
      .load()
      .select(from_json(col("value").cast("string"), schema).as("r"))
      .filter(col("r").isNotNull && col("r.event_time").isNotNull)
      .select(col("r.*"))
  }
}

/** JDBC sink for foreachBatch fan-out (S5-S7). The reference's buffered
  * at-least-once inserts with PK dedup (sink.buffer-flush.*,
  * __main__.py:144-227) map to per-batch appends with `batchsize`; target
  * tables keep the same primary keys so replays dedup server-side.
  */
object JdbcSink {
  def writer(url: String, table: String, user: String, password: String,
             batchSize: Int = 200): DataFrame => Unit = { df =>
    df.write.mode("append")
      .option("batchsize", batchSize)
      .format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("user", user)
      .option("password", password)
      .save()
  }
}

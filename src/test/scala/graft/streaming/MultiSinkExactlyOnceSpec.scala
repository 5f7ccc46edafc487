package graft.streaming

import graft.TestSpark
import graft.config.StrategyConfig
import graft.io.JdbcSink
import graft.strategy.SmaCrossStrategy
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end exactly-once through StreamingJob's ACTUAL multi-sink
  * fan-out (T7) — the composition of StreamingFailureInjectionSpec
  * (compute-side bit-stability) with ExactlyOnceJdbcSpec (sink-side
  * idempotence), which each prove their half in isolation (r14 verdict
  * #3/#5):
  *
  *  1. `JDBC_WRITE_MODE=upsert` wiring: the metrics writer exactly as
  *     [[graft.Main.metricsWriter]] constructs it (the production
  *     factory, not a spec re-implementation) runs through the
  *     micro-batched job against embedded Derby and converges to the
  *     one-shot batch run's metrics — refined re-emissions of
  *     still-open windows last-write-win on the reference PK
  *     (02_schema.sql:104).
  *  2. A sink failure INSIDE one foreachBatch invocation: positions
  *     (sink 1) commits, then executions (sink 2) commits HALF its
  *     frame and crashes, so metrics (sink 3) never runs and the
  *     micro-batch commit is lost. A fresh job instance (the restart)
  *     replays the batch; all three JDBC tables must equal the clean
  *     run byte-for-byte. The tail is persisted only AFTER all sinks
  *     succeed, so the replay recomputes the identical frames, and the
  *     PK upserts absorb both the re-delivery and the half-committed
  *     executions prefix.
  */
class MultiSinkExactlyOnceSpec extends AnyFunSuite {
  import TestSpark._

  private val cfg = StrategyConfig(
    smaFastWindow = 3, smaSlowWindow = 6, smaConfirmationWindow = 1)

  // the StreamingJobSpec fixture: wavy prices, two instruments
  private def price(i: Int): Double = 100.0 + 3.0 * math.sin(i / 7.0) + (i % 5) * 0.2
  private val rows: Seq[Tick] = (for {
    p <- Seq("A", "B")
    i <- 0 until 180
  } yield Tick(p, ts(i * 10L), i.toLong, price(i) + (if (p == "A") 0 else 5),
    price(i) * 0.999, price(i) * 1.001)).toVector

  private def ticksOf(ts0: Seq[Tick]) = ticks(ts0.map(t =>
    (t.product_id, (t.event_time.getTime - ts(0).getTime) / 1000, t.sequence,
      t.price: Double, Option(t.best_bid).map(Double.unbox),
      Option(t.best_ask).map(Double.unbox))))

  private val sorted = rows.sortBy(t => (t.event_time.getTime, t.product_id))
  private val chunks = Seq(sorted.slice(0, 130), sorted.slice(130, 220),
    sorted.slice(220, 360))

  private lazy val batchOut = SmaCrossStrategy(ticksOf(rows), cfg)

  private def url(db: String) = s"jdbc:derby:memory:$db;create=true"

  /** CREATE TABLE from the frame's schema (PK columns NOT NULL). */
  private def createTable(db: String, table: String, schema: StructType,
                          pk: Seq[String]): Unit = {
    def ddl(f: StructField): String = {
      val t = f.dataType match {
        case LongType => "BIGINT"
        case DoubleType => "DOUBLE"
        case StringType => "VARCHAR(2048)"
        case TimestampType => "TIMESTAMP"
        case d => fail(s"unmapped Derby type for ${f.name}: $d")
      }
      val nn = if (pk.contains(f.name)) " NOT NULL" else ""
      s"\"${f.name.toUpperCase}\" $t$nn"
    }
    val c = java.sql.DriverManager.getConnection(url(db))
    try {
      val st = c.createStatement()
      st.executeUpdate(s"CREATE TABLE $table (" +
        schema.fields.map(ddl).mkString(", ") +
        s", PRIMARY KEY (${pk.map(p => "\"" + p.toUpperCase + "\"").mkString(", ")}))")
      st.close()
    } finally c.close()
  }

  /** Canonical table snapshot: one sorted string per row, columns in
    * the frame's schema order. */
  private def snapshot(db: String, table: String, schema: StructType): Seq[String] = {
    val c = java.sql.DriverManager.getConnection(url(db))
    try {
      val cols = schema.fieldNames.map(n => "\"" + n.toUpperCase + "\"").mkString(", ")
      val rs = c.createStatement().executeQuery(s"SELECT $cols FROM $table")
      val b = Seq.newBuilder[String]
      while (rs.next())
        b += schema.indices.map(i => String.valueOf(rs.getObject(i + 1))).mkString("|")
      b.result().sorted
    } finally c.close()
  }

  private def canon(df: DataFrame): Seq[String] =
    df.collect().toSeq.map(_.toSeq.map(String.valueOf).mkString("|")).sorted

  // reference PKs, 02_schema.sql:104,149,175
  private val PosPk = Seq("strategy_run_id", "product_id", "event_time")
  private val ExePk = Seq("strategy_run_id", "product_id", "execution_time")

  test("JDBC_WRITE_MODE=upsert: Main's metrics writer through the streaming " +
      "fan-out converges to the batch metrics") {
    val db = "ms_metrics"
    createTable(db, "strategy_metrics", batchOut.metrics.schema, graft.Main.MetricsPk)
    // the exact production construction (Main.metricsWriter), just with
    // the Derby URL where Main's env would put the Postgres one
    val sink = graft.Main.metricsWriter("upsert", url(db), "strategy_metrics",
      user = "", password = "", batchSize = 50)
    val job = new StreamingJob(SmaCrossStrategy, cfg, Sinks(metrics = sink))
    chunks.zipWithIndex.foreach { case (c, i) => job.processBatch(ticksOf(c), i.toLong) }
    assert(snapshot(db, "strategy_metrics", batchOut.metrics.schema) ==
      canon(batchOut.metrics),
      "upserted Derby metrics must equal the one-shot batch metrics")
  }

  test("a mid-fan-out sink crash (positions committed, executions half-" +
      "committed) replays to the clean run on all three tables") {
    def mkTables(db: String): Unit = {
      createTable(db, "positions_sink", batchOut.positions.schema, PosPk)
      createTable(db, "executions_sink", batchOut.executions.schema, ExePk)
      createTable(db, "metrics_sink", batchOut.metrics.schema, graft.Main.MetricsPk)
    }
    def sinksFor(db: String, poisonExecutions: java.util.concurrent.atomic.AtomicInteger): Sinks =
      Sinks(
        positions = JdbcSink.upsert(url(db), "positions_sink", PosPk, 50),
        executions = { df =>
          val w = JdbcSink.upsert(url(db), "executions_sink", ExePk, 50)
          if (poisonExecutions.getAndDecrement() == 1) {
            // half the frame commits (a partial flush), then the sink
            // crashes — metrics never runs, the batch commit is lost
            w(df.filter(col("sequence") % 2 === 0))
            throw new RuntimeException("executions sink crash")
          } else w(df)
        },
        metrics = JdbcSink.upsert(url(db), "metrics_sink", graft.Main.MetricsPk, 50))

    def snaps(db: String): (Seq[String], Seq[String], Seq[String]) = (
      snapshot(db, "positions_sink", batchOut.positions.schema),
      snapshot(db, "executions_sink", batchOut.executions.schema),
      snapshot(db, "metrics_sink", batchOut.metrics.schema))

    // clean run (no poison): three micro-batches straight through
    mkTables("ms_clean")
    val never = new java.util.concurrent.atomic.AtomicInteger(-1000)
    val cleanJob = new StreamingJob(SmaCrossStrategy, cfg, sinksFor("ms_clean", never))
    chunks.zipWithIndex.foreach { case (c, i) => cleanJob.processBatch(ticksOf(c), i.toLong) }
    val clean = snaps("ms_clean")

    // poisoned run: batch 1's SECOND sink call crashes mid-fan-out
    mkTables("ms_poison")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-eo-fanout").toString
    // executions sink call #2 (batch 0 consumes #1) poisons exactly once
    val poison = new java.util.concurrent.atomic.AtomicInteger(2)
    val job1 = new StreamingJob(SmaCrossStrategy, cfg,
      sinksFor("ms_poison", poison), checkpointDir = Some(ckpt))
    job1.processBatch(ticksOf(chunks(0)), 0L)
    val thrown = intercept[RuntimeException](job1.processBatch(ticksOf(chunks(1)), 1L))
    assert(thrown.getMessage.contains("executions sink crash"))
    val mid = snaps("ms_poison")
    assert(mid != clean, "the crash must leave a really-partial state")
    assert(mid._3 != clean._3, "metrics (sink 3) must be missing batch 1's windows")

    // restart: fresh job instance, same checkpoint (the tail persisted
    // after batch 0 — never after the failed batch), replay batch 1, go on
    val job2 = new StreamingJob(SmaCrossStrategy, cfg,
      sinksFor("ms_poison", new java.util.concurrent.atomic.AtomicInteger(-1000)),
      checkpointDir = Some(ckpt))
    job2.processBatch(ticksOf(chunks(1)), 1L)
    job2.processBatch(ticksOf(chunks(2)), 2L)
    assert(snaps("ms_poison") == clean,
      "all three tables must converge to the clean run after the replay")
  }
}

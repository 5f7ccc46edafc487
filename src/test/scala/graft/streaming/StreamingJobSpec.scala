package graft.streaming

import graft.TestSpark
import graft.config.StrategyConfig
import graft.strategy.SmaCrossStrategy
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable

/** The load-bearing streaming property: feeding the pipeline in
  * micro-batches yields EXACTLY the rows of one batch run (SURVEY §7
  * "hard parts" 1-3: rolling state across batch boundaries via the
  * carried tail).
  */
class StreamingJobSpec extends AnyFunSuite {
  import TestSpark._

  private val cfg = StrategyConfig(
    smaFastWindow = 3, smaSlowWindow = 6, smaConfirmationWindow = 1)

  // 180 ticks per key, wavy so crossovers occur throughout; 2 instruments
  // to exercise per-key bounds.
  private def price(i: Int): Double = 100.0 + 3.0 * math.sin(i / 7.0) + (i % 5) * 0.2
  private val rows: Seq[Tick] = (for {
    p <- Seq("A", "B")
    i <- 0 until 180
  } yield Tick(p, ts(i * 10L), i.toLong, price(i) + (if (p == "A") 0 else 5),
    price(i) * 0.999, price(i) * 1.001)).toVector

  test("micro-batched streaming equals one-shot batch for every sink") {
    val s = spark
    import s.implicits._

    val sigBuf = mutable.ArrayBuffer[Row]()
    val posBuf = mutable.ArrayBuffer[Row]()
    val exeBuf = mutable.ArrayBuffer[Row]()
    val metBuf = mutable.LinkedHashMap[Any, Row]() // upsert on metric_time
    val sinks = Sinks(
      signals = df => sigBuf ++= df.collect(),
      positions = df => posBuf ++= df.collect(),
      executions = df => exeBuf ++= df.collect(),
      metrics = df => df.collect().foreach(r => metBuf(r.getAs[Any]("metric_time")) = r))

    val job = new StreamingJob(SmaCrossStrategy, cfg, sinks)
    implicit val sq = s.sqlContext
    val ms = MemoryStream[Tick]
    val q = job.start(ms.toDF())
    try {
      // three uneven chunks, interleaving both keys (ordered by time)
      val sorted = rows.sortBy(t => (t.event_time.getTime, t.product_id))
      Seq(sorted.slice(0, 130), sorted.slice(130, 220), sorted.slice(220, 360))
        .foreach { chunk => ms.addData(chunk); q.processAllAvailable() }
    } finally q.stop()

    val batchOut = SmaCrossStrategy(ticks(rows.map(t =>
      (t.product_id, (t.event_time.getTime - ts(0).getTime) / 1000, t.sequence,
        t.price: Double, Option(t.best_bid).map(Double.unbox),
        Option(t.best_ask).map(Double.unbox)))), cfg)

    def key(r: Row): (String, Long) =
      (r.getAs[String](r.schema.fieldNames.find(_.contains("product_id"))
        .getOrElse("instrument_id")), r.getAs[Long]("sequence"))
    def canon(rs: Seq[Row]): Seq[String] =
      rs.map(r => r.toSeq.map(String.valueOf).mkString("|")).sorted

    assert(canon(sigBuf.toSeq) == canon(batchOut.signals.collect().toSeq),
      "signals must match batch run")
    assert(canon(posBuf.toSeq) == canon(batchOut.positions.collect().toSeq),
      "positions must match batch run")
    assert(canon(exeBuf.toSeq) == canon(batchOut.executions.collect().toSeq),
      "executions must match batch run")
    assert(canon(metBuf.values.toSeq) == canon(batchOut.metrics.collect().toSeq),
      "upserted metrics must converge to batch metrics")
  }

  test("restart from checkpoint: a fresh job resumes from persisted tail state") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    val sorted = rows.sortBy(t => (t.event_time.getTime, t.product_id))
    val (chunk1, chunk2) = sorted.splitAt(200)
    def mkSinks(sig: mutable.ArrayBuffer[Row]) = Sinks(signals = df => sig ++= df.collect())

    val sig1 = mutable.ArrayBuffer[Row]()
    val job1 = new StreamingJob(SmaCrossStrategy, cfg, mkSinks(sig1),
      checkpointDir = Some(dir))
    job1.processBatch(ticksOf(chunk1), 0L)

    // simulate process restart: brand-new job instance, same checkpoint dir.
    // The resumed batchId is NOT 0 — a real checkpoint restart re-enters
    // foreachBatch at the last uncommitted id, and the tail must load anyway.
    val sig2 = mutable.ArrayBuffer[Row]()
    val job2 = new StreamingJob(SmaCrossStrategy, cfg, mkSinks(sig2),
      checkpointDir = Some(dir))
    job2.processBatch(ticksOf(chunk2), 7L)

    val batchSignals = SmaCrossStrategy(ticksOf(rows), cfg).signals.collect().toSeq
    def canon(rs: Seq[Row]): Seq[String] =
      rs.map(r => r.toSeq.map(String.valueOf).mkString("|")).sorted
    assert(canon(sig1.toSeq ++ sig2.toSeq) == canon(batchSignals),
      "signals across a restart must equal the batch run")
  }

  private def ticksOf(ts0: Seq[Tick]) = ticks(ts0.map(t =>
    (t.product_id, (t.event_time.getTime - ts(0).getTime) / 1000, t.sequence,
      t.price: Double, Option(t.best_bid).map(Double.unbox),
      Option(t.best_ask).map(Double.unbox))))

  private def canonRows(rs: Iterable[Row]): Seq[String] =
    rs.map(r => r.toSeq.map(String.valueOf).mkString("|")).toSeq.sorted

  test("restart through start()+checkpointLocation: tail loads at batchId > 0") {
    val s = spark
    val base = java.nio.file.Files.createTempDirectory("graft-restart").toString
    val ckpt = base + "/ckpt"
    val srcDir = base + "/src"
    val sorted = rows.sortBy(t => (t.event_time.getTime, t.product_id))
    val (chunk1, chunk2) = sorted.splitAt(200)
    val schema = ticksOf(chunk1).schema

    // Each call is a fresh "process": new StreamingJob instance, same
    // checkpoint. The file source resumes from the committed offsets, so the
    // second run's first foreachBatch call arrives with batchId = 1.
    def runProcess(chunk: Seq[Tick], sig: mutable.ArrayBuffer[Row]): Unit = {
      ticksOf(chunk).coalesce(1).write.mode("append").parquet(srcDir)
      val job = new StreamingJob(SmaCrossStrategy, cfg,
        Sinks(signals = df => sig ++= df.collect()), checkpointDir = Some(ckpt))
      val q = job.start(s.readStream.schema(schema).parquet(srcDir))
      try q.processAllAvailable() finally q.stop()
    }
    val sig1 = mutable.ArrayBuffer[Row]()
    val sig2 = mutable.ArrayBuffer[Row]()
    runProcess(chunk1, sig1)
    runProcess(chunk2, sig2)

    val batchSignals = SmaCrossStrategy(ticksOf(rows), cfg).signals.collect().toSeq
    assert(canonRows(sig1.toSeq ++ sig2.toSeq) == canonRows(batchSignals),
      "signals across a real checkpointed restart must equal the batch run")
  }

  test("a replayed micro-batch (tail persisted, commit lost) upserts the batch values") {
    val dir = java.nio.file.Files.createTempDirectory("graft-replay").toString
    val sorted = rows.sortBy(t => (t.event_time.getTime, t.product_id))
    val (c1, rest) = sorted.splitAt(150)
    val (c2, c3) = rest.splitAt(120)
    val sig = mutable.LinkedHashMap[(String, Long), Row]() // upsert on PK
    def upsert(df: DataFrame): Unit = df.collect().foreach(r =>
      sig((r.getAs[String]("instrument_id"), r.getAs[Long]("sequence"))) = r)

    val job1 = new StreamingJob(SmaCrossStrategy, cfg,
      Sinks(signals = upsert), checkpointDir = Some(dir))
    job1.processBatch(ticksOf(c1), 0L)
    job1.processBatch(ticksOf(c2), 1L) // tail (incl. c2) persisted...
    // ...but the micro-batch commit is lost: the restarted process replays
    // batch 1, whose rows are now ALSO in the loaded tail.
    val job2 = new StreamingJob(SmaCrossStrategy, cfg,
      Sinks(signals = upsert), checkpointDir = Some(dir))
    job2.processBatch(ticksOf(c2), 1L) // replay
    job2.processBatch(ticksOf(c3), 2L)

    val batchSignals = SmaCrossStrategy(ticksOf(rows), cfg).signals.collect().toSeq
    assert(canonRows(sig.values) == canonRows(batchSignals),
      "upserted signals after a replayed batch must equal the batch run")
  }

  test("a late row within the carried tail is reordered into its correct place") {
    val sig = mutable.ArrayBuffer[Row]()
    val job = new StreamingJob(SmaCrossStrategy, cfg,
      Sinks(signals = df => sig ++= df.collect()))
    val a = (0 until 40).map(i =>
      ("A", i * 10L, i.toLong, 100.0 + (i % 9), Option(99.0), Option(101.0)))
    // batch 1: everything except row 35; batch 2: rows 40.. plus LATE row 35
    job.processBatch(ticks(a.filterNot(_._3 == 35L)), 0L)
    val later = (40 until 60).map(i =>
      ("A", i * 10L, i.toLong, 100.0 + (i % 9), Option(99.0), Option(101.0)))
    job.processBatch(ticks(later ++ a.filter(_._3 == 35L)), 1L)

    val batchSignals = SmaCrossStrategy(ticks(a ++ later), cfg).signals.collect()
    def canon(rs: Seq[Row]): Seq[String] =
      rs.map(r => r.toSeq.map(String.valueOf).mkString("|")).sorted
    // every signal at/after the late row's position is recomputed with it
    // in place; earlier ones were already emitted from batch 1 — so the
    // union of emissions must contain the batch result for rows >= 35
    val emitted = canon(sig.toSeq)
    val expectedLateOn = canon(batchSignals.filter(_.getAs[Long]("sequence") >= 35L).toSeq)
    expectedLateOn.foreach(e => assert(emitted.contains(e),
      s"late-row-corrected signal missing: $e"))
  }

  test("tail size covers every rolling operator's lookback") {
    val job = new StreamingJob(SmaCrossStrategy, StrategyConfig(), Sinks())
    // slow=60 < volatility lookback 60; + confirmation 3 + 1 for lag
    assert(job.tailRows == 64)
  }
}

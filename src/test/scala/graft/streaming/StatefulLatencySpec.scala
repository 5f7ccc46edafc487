package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

/** Chained stateful gap chain → windowed lag rollup ≡ the batch
  * latency_metrics window form, across micro-batch boundaries. */
class StatefulLatencySpec extends AnyFunSuite {
  import TestSpark._
  import StatefulLatency.EventIn

  private val MaxLagUs = 90000000L // 90 s budget

  // 3 event types with different cadences (31 s / 67 s / 131 s — the slow
  // ones breach the 90 s budget), spanning ~3 hours
  private val rows: Seq[EventIn] = (for {
    (t, step) <- Seq(("view", 31L), ("click", 67L), ("error", 131L))
    i <- 0 until 80
  } yield EventIn(t, ts(i * step), i.toLong))
    .sortBy(e => (e.ts.getTime, e.event_type))

  private def canon(rs: Seq[Row]): Seq[String] =
    rs.map(r => r.toSeq.map(String.valueOf).mkString("|")).sorted

  test("chained streaming gap + windowed lag rollup equals the batch window form") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext

    val ms = MemoryStream[EventIn]
    val streamed = StatefulLatency.hourlyLag(ms.toDS(), "10 minutes", MaxLagUs)
    val q = streamed.writeStream.format("memory").queryName("lagmon")
      .outputMode(OutputMode.Complete()).start()
    try {
      Seq(rows.slice(0, 60), rows.slice(60, 150), rows.slice(150, rows.size))
        .foreach { c => ms.addData(c); q.processAllAvailable() }
      val streamOut = s.table("lagmon").collect().toSeq

      // batch twin: keyed lag window, identical to the latency_metrics shape
      val w = Window.partitionBy(col("event_type")).orderBy(col("ts"), col("event_id"))
      val batchOut = rows.toDF()
        .withColumn("us", unix_micros(col("ts")))
        .withColumn("gap_us", col("us") - lag(col("us"), 1).over(w))
        .filter(col("gap_us").isNotNull)
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("bucket"))
        .agg(count(lit(1)).as("n_arrivals"),
          max(col("gap_us")).as("max_gap_us"),
          sum(col("gap_us")).as("sum_gap_us"),
          count(when(col("gap_us") > MaxLagUs, lit(1))).as("lag_breaches"))
        .withColumn("offending", col("max_gap_us") > MaxLagUs)
        .select("event_type", "bucket", "n_arrivals", "max_gap_us",
          "sum_gap_us", "lag_breaches", "offending")
        .collect().toSeq

      assert(streamOut.nonEmpty)
      assert(batchOut.exists(_.getAs[Boolean]("offending")),
        "fixture must contain budget breaches")
      assert(canon(streamOut) == canon(batchOut),
        "streaming lag rollup must equal the batch window bits")
    } finally q.stop()
  }

  test("ordering contract: a cross-batch straggler is dropped, not spliced") {
    // Pins the documented precondition (StatefulLatency.gaps scaladoc):
    // streaming≡batch requires per-key order at micro-batch granularity.
    // An event older than a previous batch's state pair must be DROPPED
    // (O(1) state) — if this test ever sees it spliced in, the state
    // contract changed and the scaladoc + equality claims must be
    // revisited together.
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext

    val ms = MemoryStream[EventIn]
    val q = StatefulLatency.gaps(ms.toDS()).writeStream.format("memory")
      .queryName("gapdrop").outputMode(OutputMode.Append()).start()
    try {
      // batch 1: t=0s and t=100s; batch 2: a straggler at t=50s, then t=160s
      ms.addData(Seq(EventIn("view", ts(0), 0L), EventIn("view", ts(100), 1L)))
      q.processAllAvailable()
      ms.addData(Seq(EventIn("view", ts(50), 2L), EventIn("view", ts(160), 3L)))
      q.processAllAvailable()
      val gaps = s.table("gapdrop").collect()
        .map(r => r.getAs[Long]("gap_us")).sorted.toSeq
      // within-batch: 100s gap; cross-batch: 160-100=60s — the 50s
      // straggler contributes NOTHING (neither 50s nor a rewritten gap)
      assert(gaps == Seq(60000000L, 100000000L),
        s"straggler must be dropped under the O(1) state contract, got $gaps")
    } finally q.stop()
  }

  test("buffered mode splices cross-batch stragglers into the batch gap bits") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext

    val L = 120000000L // 120 s allowed lateness
    val ms = MemoryStream[EventIn]
    val q = StatefulLatency.gapsBuffered(ms.toDS(), L).writeStream
      .format("memory").queryName("gapsplice")
      .outputMode(OutputMode.Append()).start()
    try {
      // batch 1: t=0s, t=100s; batch 2: a straggler at t=50s (within the
      // 120 s window of the t=160s high-water mark) + t=160s; batch 3: an
      // event-time advance that pushes the horizon past every real event
      ms.addData(Seq(EventIn("view", ts(0), 0L), EventIn("view", ts(100), 1L)))
      q.processAllAvailable()
      ms.addData(Seq(EventIn("view", ts(50), 2L), EventIn("view", ts(160), 3L)))
      q.processAllAvailable()
      ms.addData(Seq(EventIn("view", ts(400), 4L)))
      q.processAllAvailable()
      val got = s.table("gapsplice").collect()
        .map(r => (r.getAs[java.sql.Timestamp]("ts").getTime, r.getAs[Long]("gap_us")))
        .sorted.toSeq
      // the batch chain over {0,50,100,160}: 50s, 50s, 60s — the
      // straggler SPLICED (strict mode emitted 100s and dropped it);
      // t=400 stays pending (tail completes on the next advance)
      val batch = Seq(ts(50), ts(100), ts(160)).map(_.getTime)
        .zip(Seq(50000000L, 50000000L, 60000000L))
      assert(got == batch, s"buffered gaps must equal the batch chain, got $got")
    } finally q.stop()
  }

  test("buffered mode still drops a straggler beyond the lateness window") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext

    val L = 120000000L
    val ms = MemoryStream[EventIn]
    val q = StatefulLatency.gapsBuffered(ms.toDS(), L).writeStream
      .format("memory").queryName("gapbounded")
      .outputMode(OutputMode.Append()).start()
    try {
      // batch 1 finalizes t=0,100 (horizon = 300−120 = 180 s); the t=50
      // straggler of batch 2 then sorts BEFORE the finalized head → drop
      ms.addData(Seq(EventIn("view", ts(0), 0L), EventIn("view", ts(100), 1L),
        EventIn("view", ts(300), 2L)))
      q.processAllAvailable()
      ms.addData(Seq(EventIn("view", ts(50), 3L), EventIn("view", ts(500), 4L)))
      q.processAllAvailable()
      val got = s.table("gapbounded").collect()
        .map(_.getAs[Long]("gap_us")).sorted.toSeq
      // 0→100 (batch 1), 100→300 (batch 2 horizon advance); nothing from
      // the too-late t=50, and 300→500 stays pending
      assert(got == Seq(100000000L, 200000000L),
        s"beyond-lateness straggler must drop, got $got")
    } finally q.stop()
  }

  test("buffered hourly rollup equals batch under cross-batch reordering") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext

    val L = 7200000000L // 2 h lateness — covers the fixture reorder below
    // displace a mid-fixture slice of 'view' arrivals one batch later
    // (late but inside L), then advance event time past maxTs + L so
    // every real gap finalizes
    val (lateSlice, onTime) = rows.zipWithIndex.partition { case (e, i) =>
      e.event_type == "view" && i >= 60 && i < 90
    }
    val real = rows.map(e => EventTime.micros(e.ts)).max
    val sentinels = Seq("view", "click", "error").map(t =>
      EventIn(t, EventTime.toTimestamp(real + L + 1000000L), 9999L))
    val sentinelHour = java.sql.Timestamp.from(
      sentinels.head.ts.toInstant.truncatedTo(java.time.temporal.ChronoUnit.HOURS))

    val ms = MemoryStream[EventIn]
    val streamed = StatefulLatency.hourlyLagBuffered(
      ms.toDS(), "10 minutes", MaxLagUs, L)
    val q = streamed.writeStream.format("memory").queryName("lagbuf")
      .outputMode(OutputMode.Complete()).start()
    try {
      val t1 = onTime.map(_._1).take(100)
      val t2 = onTime.map(_._1).drop(100) ++ lateSlice.map(_._1) // stragglers
      Seq(t1, t2, sentinels).foreach { c => ms.addData(c); q.processAllAvailable() }
      val streamOut = s.table("lagbuf")
        .filter(col("bucket") < lit(sentinelHour)).collect().toSeq

      // batch twin over the SAME events (sentinels included — their own
      // gaps land in the sentinel hour, excluded on both sides)
      val w = Window.partitionBy(col("event_type")).orderBy(col("ts"), col("event_id"))
      val batchOut = (rows ++ sentinels).toDF()
        .withColumn("us", unix_micros(col("ts")))
        .withColumn("gap_us", col("us") - lag(col("us"), 1).over(w))
        .filter(col("gap_us").isNotNull)
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("bucket"))
        .agg(count(lit(1)).as("n_arrivals"),
          max(col("gap_us")).as("max_gap_us"),
          sum(col("gap_us")).as("sum_gap_us"),
          count(when(col("gap_us") > MaxLagUs, lit(1))).as("lag_breaches"))
        .withColumn("offending", col("max_gap_us") > MaxLagUs)
        .select("event_type", "bucket", "n_arrivals", "max_gap_us",
          "sum_gap_us", "lag_breaches", "offending")
        .filter(col("bucket") < lit(sentinelHour))
        .collect().toSeq

      assert(streamOut.nonEmpty && batchOut.nonEmpty)
      assert(canon(streamOut) == canon(batchOut),
        "buffered streaming rollup must equal the batch window bits under reordering")
    } finally q.stop()
  }
}

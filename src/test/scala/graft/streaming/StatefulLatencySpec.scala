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
}

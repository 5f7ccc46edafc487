package graft.streaming

import graft.TestSpark
import graft.ops.Funnel
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable

/** Streaming incremental funnel ≡ batch Funnel.threeStep. */
class StatefulFunnelSpec extends AnyFunSuite {
  import TestSpark._
  import StatefulFunnel.EventIn

  // Deterministic pseudo-random journeys: 40 users × up to 12 events.
  // Event times carry sub-millisecond micros (h*13 µs) — the real events
  // table is micro-granular, and the streaming fold must sort/compare on
  // exact micros, not Timestamp.getTime ms (round-2 ADVICE).
  private val types = Vector("view", "click", "purchase", "signup", "error")
  private val rows: Seq[EventIn] = (for {
    u <- 1L to 40L
    i <- 0 until ((u % 7) + 5).toInt
  } yield {
    val h = (u * 31 + i * 17) % 97
    EventIn(u, tsUs((u + i * 20 + (h % 5)) * 1000000L + h * 13), types((h % types.size).toInt))
  }).sortBy(e => (EventTime.micros(e.ts), e.user_id))

  test("final upserted streaming rows equal the batch funnel") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext

    val latest = mutable.LinkedHashMap[Long, (Int, Long, Option[Long], Option[Long])]()
    val ms = MemoryStream[EventIn]
    val q = StatefulFunnel.funnel(ms.toDS(), "view", "click", "purchase", 3600L)
      .writeStream.outputMode(OutputMode.Append())
      .foreachBatch { (df: org.apache.spark.sql.Dataset[StatefulFunnel.FunnelOut], _: Long) =>
        df.collect().foreach { o =>
          latest(o.user_id) = (o.reached, o.t1_us,
            Option(o.t2_us).map(Long.unbox), Option(o.t3_us).map(Long.unbox))
        }
      }.start()
    try {
      Seq(rows.slice(0, 120), rows.slice(120, 250), rows.slice(250, rows.size))
        .foreach { c => ms.addData(c); q.processAllAvailable() }
    } finally q.stop()

    val batch = Funnel.threeStep(rows.toDF(), "user_id", "ts", "event_type",
        "view", "click", "purchase", horizonSec = 3600L)
      .select(col("user_id"), col("reached"),
        unix_micros(col("t_view")).as("u1"), unix_micros(col("t_click")).as("u2"),
        unix_micros(col("t_purchase")).as("u3"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4)))))
      .toMap

    assert(latest.nonEmpty)
    assert(latest.toMap == batch, "streaming upserts must converge to batch funnel")
  }
}

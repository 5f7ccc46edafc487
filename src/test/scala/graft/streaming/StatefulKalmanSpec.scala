package graft.streaming

import graft.TestSpark
import graft.ops.Indicators
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable

/** Streaming Kalman filter ≡ batch Indicators.kalmanPerKey bits, under
  * chunked delivery and with late/duplicate ticks dropped by the
  * high-water mark. */
class StatefulKalmanSpec extends AnyFunSuite {
  import TestSpark._
  import StatefulKalman.TickIn

  private val (q, r, p0) = (0.01, 1.0, 1.0)

  private val rows: Seq[TickIn] = (for {
    p <- Seq("A", "B", "C")
    i <- 0 until 150
  } yield {
    val hsh = (p.hashCode.abs + i * 43) % 83
    TickIn(p, tsUs(i.toLong * 700000L + hsh * 13), i.toLong,
      100.0 + (hsh % 17) * 0.59 - 4.0)
  }).sortBy(t => (EventTime.micros(t.event_time), t.product_id))

  private def batch: Map[String, (Long, Double, Double, Double)] = {
    val s = spark
    import s.implicits._
    Indicators.kalmanPerKey(rows.toDF(), "product_id", "event_time",
        "sequence", "price", q, r, p0)
      .collect()
      .map(rr => rr.getString(0) -> ((rr.getLong(1), rr.getDouble(2),
        rr.getDouble(3), rr.getDouble(4))))
      .toMap
  }

  private def runStream(chunks: Seq[Seq[TickIn]]): Map[String, (Long, Double, Double, Double)] = {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val latest = mutable.LinkedHashMap[String, (Long, Double, Double, Double)]()
    val ms = MemoryStream[TickIn]
    val qy = StatefulKalman.filter(ms.toDS(), q, r, p0)
      .writeStream.outputMode(OutputMode.Append())
      .foreachBatch { (df: org.apache.spark.sql.Dataset[StatefulKalman.KOut], _: Long) =>
        df.collect().foreach(o =>
          latest(o.product_id) = (o.n_ticks, o.level, o.gain, o.p_var))
      }.start()
    try chunks.foreach { c => ms.addData(c); qy.processAllAvailable() }
    finally qy.stop()
    latest.toMap
  }

  test("final streaming upserts equal the batch Kalman fold") {
    val got = runStream(Seq(rows.slice(0, 100), rows.slice(100, 310),
      rows.slice(310, rows.size)))
    assert(got == batch)
  }

  test("re-delivered and stale ticks are no-ops under the high-water mark") {
    // replay an already-seen chunk, then a strictly-older tick
    val stale = rows.take(5)
    val got = runStream(Seq(rows.slice(0, 200), rows.slice(100, 200),
      rows.slice(200, rows.size), stale))
    assert(got == batch)
  }
}

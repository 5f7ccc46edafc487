package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

/** Streaming ≡ batch for the hopping-window aggregation and the
  * watermark-bounded dedup — same code path, same bits (invariant 5). */
class StreamingAggsSpec extends AnyFunSuite {
  import TestSpark._

  private def canon(rs: Seq[Row]): Seq[String] =
    rs.map(r => r.toSeq.map(String.valueOf).mkString("|")).sorted

  // 2 keys × 240 ticks, 10 s apart → 40-minute span, price wave.
  private val rows: Seq[Tick] = (for {
    p <- Seq("A", "B")
    i <- 0 until 240
  } yield Tick(p, ts(i * 10L), i.toLong,
    100.0 + 3.0 * math.sin(i / 5.0) + (if (p == "A") 0 else 7),
    null, null)).toVector

  test("hopping windows: micro-batched streaming equals one-shot batch") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext

    val ms = MemoryStream[Tick]
    val streamed = StreamingAggs.hoppingStats(
      ms.toDF().withWatermark("event_time", "10 minutes"),
      "product_id", "price", "10 minutes", "5 minutes")
    val q = streamed.writeStream.format("memory").queryName("hop")
      .outputMode(OutputMode.Complete()).start()
    try {
      val sorted = rows.sortBy(t => (t.event_time.getTime, t.product_id))
      Seq(sorted.slice(0, 100), sorted.slice(100, 310), sorted.slice(310, 480))
        .foreach { c => ms.addData(c); q.processAllAvailable() }
      val streamOut = s.table("hop").collect().toSeq

      val batchOut = StreamingAggs.hoppingStats(
        ticks(rows.map(t => (t.product_id,
          (t.event_time.getTime - ts(0).getTime) / 1000, t.sequence,
          t.price: Double, None, None))),
        "product_id", "price", "10 minutes", "5 minutes").collect().toSeq

      assert(streamOut.nonEmpty)
      assert(canon(streamOut) == canon(batchOut))
    } finally q.stop()
  }

  test("dedupTicks: replayed rows across micro-batches are dropped once watermarked") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext

    val ms = MemoryStream[Tick]
    val q = StreamingAggs.dedupTicks(
      ms.toDF().withWatermark("event_time", "10 minutes"))
      .writeStream.format("memory").queryName("dedup")
      .outputMode(OutputMode.Append()).start()
    try {
      val sorted = rows.sortBy(t => (t.event_time.getTime, t.product_id))
      val (c1, c2) = (sorted.slice(0, 200), sorted.slice(200, 480))
      ms.addData(c1); q.processAllAvailable()
      // replay the last 50 rows of chunk 1 (at-least-once source) + chunk 2
      ms.addData(c1.takeRight(50) ++ c2); q.processAllAvailable()
      val streamOut = s.table("dedup").collect().toSeq

      assert(streamOut.size == rows.size,
        "each (product_id, sequence) must be emitted exactly once")
      val batchOut = StreamingAggs.dedupTicks(
        ticks(rows.map(t => (t.product_id,
          (t.event_time.getTime - ts(0).getTime) / 1000, t.sequence,
          t.price: Double, None, None)))).collect().toSeq
      assert(canon(streamOut.map(r => Row(r.getAs[String]("product_id"),
        r.getAs[Long]("sequence")))) ==
        canon(batchOut.map(r => Row(r.getAs[String]("product_id"),
          r.getAs[Long]("sequence")))))
    } finally q.stop()
  }

  test("ohlc bars: streaming min_by/max_by picks equal one-shot batch") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext

    val ms = MemoryStream[Tick]
    val streamed = StreamingAggs.ohlcBars(
      ms.toDF().withWatermark("event_time", "10 minutes"),
      "product_id", "price", "15 minutes")
    val q = streamed.writeStream.format("memory").queryName("ohlc")
      .outputMode(OutputMode.Complete()).start()
    try {
      // deliberately NOT time-ordered chunks: the open/close picks must
      // come out identical because min_by/max_by merge associatively
      val shuffled = rows.sortBy(t => (t.sequence % 7, t.product_id, t.sequence))
      Seq(shuffled.slice(0, 111), shuffled.slice(111, 333), shuffled.slice(333, 480))
        .foreach { c => ms.addData(c); q.processAllAvailable() }
      val streamOut = s.table("ohlc").collect().toSeq

      val batchOut = StreamingAggs.ohlcBars(
        ticks(rows.map(t => (t.product_id,
          (t.event_time.getTime - ts(0).getTime) / 1000, t.sequence,
          t.price: Double, None, None))),
        "product_id", "price", "15 minutes").collect().toSeq

      assert(streamOut.nonEmpty)
      assert(canon(streamOut) == canon(batchOut))
    } finally q.stop()
  }
}

package graft.streaming

import graft.TestSpark
import graft.ops.RangeJoin
import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

/** Stream-stream interval join ≡ batch RangeJoin (same rows, either
  * execution strategy). */
class StreamJoinsSpec extends AnyFunSuite {
  import TestSpark._

  private def canon(rs: Seq[Row]): Seq[String] =
    rs.map(r => r.toSeq.map(String.valueOf).mkString("|")).sorted

  // errors at t=100/200s per key; activity rows spread around them
  private val probeRows: Seq[Tick] = (for {
    p <- Seq("A", "B"); i <- Seq(100L, 200L)
  } yield Tick(p, ts(i), i, 0.0, null, null)).toVector
  private val buildRows: Seq[Tick] = (for {
    p <- Seq("A", "B"); i <- 40L to 260L by 7L
  } yield Tick(p, ts(i), 1000 + i, i.toDouble, null, null)).toVector

  test("streaming interval join emits exactly the batch RangeJoin pairs") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext

    val msP = MemoryStream[Tick]
    val msB = MemoryStream[Tick]
    val joined = StreamJoins.intervalJoin(
      msP.toDF().withWatermark("event_time", "10 minutes")
        .select($"product_id", $"event_time", $"sequence"),
      msB.toDF().withWatermark("event_time", "10 minutes"),
      Seq("product_id"), "event_time", "event_time",
      lowerSec = -60L, upperSec = 0L, Seq("price" -> "b_value"))
    val q = joined.writeStream.format("memory").queryName("ssj")
      .outputMode(OutputMode.Append()).start()
    try {
      // interleave both sides across micro-batches
      msP.addData(probeRows.take(2)); msB.addData(buildRows.take(20))
      q.processAllAvailable()
      msB.addData(buildRows.drop(20)); msP.addData(probeRows.drop(2))
      q.processAllAvailable()
      val streamOut = s.table("ssj").collect().toSeq

      val batch = RangeJoin.pairs(
        ticks(probeRows.map(t => (t.product_id, (t.event_time.getTime - ts(0).getTime) / 1000,
          t.sequence, t.price: Double, None, None)))
          .select($"product_id", $"event_time", $"sequence"),
        ticks(buildRows.map(t => (t.product_id, (t.event_time.getTime - ts(0).getTime) / 1000,
          t.sequence, t.price: Double, None, None))),
        Seq("product_id"), "event_time", "event_time",
        lowerSec = -60L, upperSec = 0L, Seq("price" -> "b_value")).collect().toSeq

      assert(streamOut.nonEmpty)
      assert(canon(streamOut) == canon(batch))
    } finally q.stop()
  }
}

package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable

/** Streaming FIFO summaries ≡ the batch fold over every exactly-once
  * prefix under any chunking; cross-batch stragglers drop under the
  * monotone guard; state carries only the open inventory. */
class StatefulFifoSpec extends AnyFunSuite {
  import TestSpark._
  import StatefulFifo.{FifoIn, FifoOut}

  private def ts(ms: Long) = new java.sql.Timestamp(ms)

  // two keys; deterministic price walk with sells outpacing buys at the
  // start (exercises the skip branch) and a nonempty final inventory
  private val rows: Seq[FifoIn] = (0 until 300).map { i =>
    val kind = if (i % 7 < 3) 2 else 1
    FifoIn(i % 2, ts(1000L * i), i.toLong, kind, 1000000L + (i % 37) * 100L)
  }

  private def batchFold(rs: Seq[FifoIn]): Map[Long, FifoOut] =
    rs.groupBy(_.user_id).map { case (u, urs) =>
      val q = mutable.Queue.empty[Long]
      var realized = 0L; var nb = 0L; var ns = 0L; var nk = 0L
      urs.sortBy(r => (r.ts.getTime, r.event_id)).foreach { r =>
        if (r.kind == 1) { q.enqueue(r.px); nb += 1 }
        else if (q.nonEmpty) { realized += r.px - q.dequeue(); ns += 1 }
        else nk += 1
      }
      u -> FifoOut(u, nb, ns, nk, realized, q.size.toLong, q.sum)
    }

  private def runStream(chunks: Seq[Seq[FifoIn]]): Map[Long, FifoOut] = {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val latest = mutable.LinkedHashMap[Long, FifoOut]()
    val ms = MemoryStream[FifoIn]
    val q = StatefulFifo.summaries(ms.toDS())
      .writeStream.outputMode(OutputMode.Append())
      .foreachBatch { (df: org.apache.spark.sql.Dataset[FifoOut], _: Long) =>
        df.collect().foreach(o => latest(o.user_id) = o)
      }.start()
    try chunks.foreach { c => ms.addData(c); q.processAllAvailable() }
    finally q.stop()
    latest.toMap
  }

  test("latest summary equals the batch fold, any chunking") {
    val c1 = rows.take(97); val c2 = rows.slice(97, 300)
    for ((chunks, seen) <- Seq(
        Seq(c1) -> c1,
        Seq(c1, c2) -> rows,
        Seq(rows.take(1), rows.drop(1)) -> rows)) {
      assert(runStream(chunks) == batchFold(seen))
    }
    // the fixture exercises both branches
    val fin = batchFold(rows)
    assert(fin.values.exists(_.n_skipped > 0) && fin.values.forall(_.open_qty > 0))
  }

  test("cross-batch stragglers drop under the monotone guard") {
    val late = FifoIn(0, ts(5), 999, 1, 1234500L) // older than batch-1 tail
    val got = runStream(Seq(rows.take(100), Seq(late) ++ rows.slice(100, 200)))
    assert(got == batchFold(rows.take(200))) // late row ignored
  }
}

package graft.streaming

import graft.TestSpark
import org.apache.spark.TaskContext
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import java.util.concurrent.atomic.AtomicLong
import scala.collection.mutable

/** Bit-stability of the STREAMING twins under task failure — the
  * streaming sibling of [[graft.FailureInjectionSpec]] (which proves the
  * batch engine): the injector here is a narrow map placed AFTER the
  * stateful operator, so the throw kills the STATE-STORE TASK ITSELF
  * mid-emission — after the store has already absorbed puts for earlier
  * groups in the partition. The retry must (a) abort the uncommitted
  * state-store version, (b) reproduce byte-identical emissions with no
  * duplicates (emit-exactly-once survives the retry, not just the
  * happy path), and (c) leave state that continues correctly in LATER
  * micro-batches — which is precisely the transactional contract the
  * twins' restart-from-checkpoint tests assume but never stress.
  *
  * TestSpark runs `local[4, 4]` (spark.task.maxFailures = 4) so the
  * retries are real; a fired-counter proves the failures happened, so
  * the spec can never pass vacuously.
  */
object StreamingFailureInjection {
  val fired = new AtomicLong(0)

  /** Same-stage (narrow) injector: the first attempt of every odd
    * post-shuffle partition dies after emitting ONE row. */
  def injected[T: org.apache.spark.sql.Encoder](ds: Dataset[T]): Dataset[T] =
    ds.mapPartitions { it =>
      val tc = TaskContext.get()
      if (tc != null && tc.attemptNumber() == 0 && tc.partitionId() % 2 == 1) {
        new Iterator[T] {
          private var served = 0
          def hasNext: Boolean = it.hasNext
          def next(): T = {
            if (served >= 1) {
              fired.incrementAndGet()
              throw new RuntimeException("injected streaming task failure (spec)")
            }
            served += 1; it.next()
          }
        }
      } else it
    }
}

class StreamingFailureInjectionSpec extends AnyFunSuite {
  import TestSpark._

  private def t(mmss: String): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(s"2024-03-01 10:$mmss")

  // enough keys that every shuffle partition (4) holds several groups —
  // the dying task has already put state for earlier groups
  private val keys = ('A' to 'H').map(_.toString)

  private val quantObs: Seq[StatefulQuantile.ObsIn] =
    for (k <- keys; i <- 1 to 6) yield
      StatefulQuantile.ObsIn(k, t(f"0$i:00"), i.toLong,
        ((i * 7 + k.hashCode % 13) % 19).toDouble)

  private val ohlcTicks: Seq[StatefulOhlc.TickIn] =
    for (k <- keys; i <- 1 to 8) yield
      StatefulOhlc.TickIn(k,
        java.sql.Timestamp.valueOf(f"2024-03-01 ${10 + (i - 1) / 4}%02d:${(i - 1) % 4 * 10 + 1}%02d:00"),
        i.toLong, ((i * 11 + k.hashCode % 17) % 23).toDouble)

  /** Drive `op` over two chunks with and without injection; both runs
    * must produce identical multisets of rows and the injection must
    * actually fire. */
  private def prove[I: org.apache.spark.sql.Encoder,
                    O: org.apache.spark.sql.Encoder](
      chunks: Seq[Seq[I]], inject: Boolean)(
      op: Dataset[I] => Dataset[O]): Seq[String] = {
    val s = spark
    implicit val sq = s.sqlContext
    val got = mutable.ArrayBuffer[String]()
    val ms = MemoryStream[I]
    val out = op(ms.toDS())
    val wired = if (inject) StreamingFailureInjection.injected(out) else out
    val q = wired.writeStream.outputMode(OutputMode.Append())
      .foreachBatch { (df: Dataset[O], _: Long) =>
        df.collect().foreach(o => got += o.toString)
      }.start()
    try chunks.foreach { c => ms.addData(c); q.processAllAvailable() }
    finally q.stop()
    got.sorted.toSeq
  }

  test("StatefulQuantile emissions are byte-identical under injected state-task failures") {
    val s = spark
    import s.implicits._
    val chunks = Seq(quantObs.take(24), quantObs.drop(24))
    val clean = prove(chunks, inject = false)(StatefulQuantile.quantiles)
    val before = StreamingFailureInjection.fired.get()
    val retried = prove(chunks, inject = true)(StatefulQuantile.quantiles)
    assert(StreamingFailureInjection.fired.get() > before,
      "injection never fired — stateful stage has too few partitions")
    assert(retried == clean,
      "state-store retry changed the emitted percentiles")
  }

  test("StatefulOhlc emits each closed bar exactly once under injected failures") {
    val s = spark
    import s.implicits._
    val chunks = Seq(ohlcTicks.take(32), ohlcTicks.drop(32))
    val clean = prove(chunks, inject = false)(
      (d: Dataset[StatefulOhlc.TickIn]) => StatefulOhlc.bars(d, 3600000000L))
    val before = StreamingFailureInjection.fired.get()
    val retried = prove(chunks, inject = true)(
      (d: Dataset[StatefulOhlc.TickIn]) => StatefulOhlc.bars(d, 3600000000L))
    assert(StreamingFailureInjection.fired.get() > before,
      "injection never fired — stateful stage has too few partitions")
    assert(retried == clean, "retry duplicated or changed a closed bar")
    // exactly-once: no bar appears twice even within the injected run
    assert(retried.distinct.size == retried.size,
      "a retried task double-emitted a closed bar")
  }
}

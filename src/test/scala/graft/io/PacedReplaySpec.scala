package graft.io

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable.ArrayBuffer

/** PacedReplay must honor the reference ReplayService's contract
  * (tests/test_replay_service.py + service.py:87-124): records past
  * end_timestamp_ms are never republished (records AT the bound are),
  * every surviving record publishes exactly once in event-time order,
  * and each slice waits max(0, event_delta/speedup − wall_elapsed).
  * A fake clock (advanced only by sleep) makes the bounds exact. */
class PacedReplaySpec extends AnyFunSuite {
  import TestSpark._

  /** seconds-spaced ticks: event i at +i s, price 100+i */
  private def feed(n: Int): DataFrame = series("BTC-USD", (0 until n).map(100.0 + _))

  private final class FakeClock {
    var nowMs: Long = 0L
    val sleeps = ArrayBuffer[Long]()
    def clock: () => Long = () => nowMs
    def sleep: Long => Unit = { ms => sleeps += ms; nowMs += ms }
  }

  private def runCapturing(df: DataFrame, cfg: PacedReplay.Config) = {
    val ck = new FakeClock
    val published = ArrayBuffer[Seq[Long]]()
    val stats = PacedReplay.run(df, "event_time",
      b => published += b.collect().map(_.getAs[Long]("sequence")).toSeq.sorted,
      cfg, ck.clock, ck.sleep)
    (stats, published.toSeq, ck)
  }

  test("end timestamp stops the replay; the record AT the bound still replays") {
    // events at ts(0), ts(1), ...; bound = exactly ts(2)
    val endMs = ts(2).getTime
    val (stats, published, _) = runCapturing(feed(10),
      PacedReplay.Config(speedupFactor = 1e9, endTimestampMs = Some(endMs)))
    assert(published.flatten == Seq(0L, 1L, 2L), "only events ≤ end replay")
    assert(stats.rows == 3L)
  }

  test("every record publishes exactly once, slices in event-time order") {
    val (stats, published, _) = runCapturing(feed(7),
      PacedReplay.Config(speedupFactor = 1e9))
    assert(published.flatten == (0L until 7L), "in order, no dups, no drops")
    assert(stats.slices == 7 && stats.rows == 7L)
  }

  test("pacing: slice k publishes no earlier than event_delta/speedup") {
    val ck = new FakeClock
    val publishWall = ArrayBuffer[Long]()
    PacedReplay.run(feed(5), "event_time",
      { b => b.count(); publishWall += ck.nowMs },
      PacedReplay.Config(speedupFactor = 2.0), ck.clock, ck.sleep)
    // events 1 s apart, speedup 2 → virtual schedule 0, 500, 1000, 1500, 2000 ms
    assert(publishWall.toSeq == Seq(0L, 500L, 1000L, 1500L, 2000L))
    assert(ck.sleeps.forall(_ > 0))
  }

  test("pacing catches up: wall time already elapsed is not slept again") {
    val ck = new FakeClock
    PacedReplay.run(feed(3), "event_time",
      _ => ck.nowMs += 700, // a slow sink: each publish costs 700 ms wall
      PacedReplay.Config(speedupFactor = 1.0), ck.clock, ck.sleep)
    // schedule 0/1000/2000 ms; publishes end at 700/1700/2700 → waits 300, 300
    assert(ck.sleeps.toSeq == Seq(300L, 300L))
  }

  test("huge speedup never sleeps; empty input is a no-op") {
    val (stats, _, ck) = runCapturing(feed(50), PacedReplay.Config(speedupFactor = 1e9))
    assert(ck.sleeps.isEmpty && stats.waitedMs == 0L)
    val empty = feed(5).filter("sequence < 0")
    val (s2, p2, _) = runCapturing(empty, PacedReplay.Config())
    assert(s2 == PacedReplay.Stats(0, 0L, 0L) && p2.isEmpty)
  }
}

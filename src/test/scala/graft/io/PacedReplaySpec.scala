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

  test("paced replay drives the streaming job to the exact batch bits") {
    import graft.config.StrategyConfig
    import graft.strategy.SmaCrossStrategy
    import graft.streaming.{Sinks, StreamingJob}
    import scala.collection.mutable
    val cfg = StrategyConfig(
      smaFastWindow = 3, smaSlowWindow = 6, smaConfirmationWindow = 1)
    val rows = (for {
      p <- Seq("A", "B"); i <- 0 until 120
    } yield (p, i * 10L, i.toLong, 100.0 + 3.0 * math.sin(i / 7.0) + (i % 5) * 0.2,
      Option(99.0), Option(101.0)))
    val src = ticks(rows)

    val sig = mutable.ArrayBuffer[org.apache.spark.sql.Row]()
    val job = new StreamingJob(SmaCrossStrategy, cfg,
      Sinks(signals = df => sig ++= df.collect()))
    val stats = PacedReplay.run(src, "event_time", job.feedBatch,
      PacedReplay.Config(speedupFactor = 1e9, sliceMs = 300000L))
    assert(stats.slices >= 3, "fixture must replay as several paced slices")

    val batch = SmaCrossStrategy(src, cfg).signals.collect().toSeq
    def canon(rs: Seq[org.apache.spark.sql.Row]): Seq[String] =
      rs.map(r => r.toSeq.map(String.valueOf).mkString("|")).sorted
    assert(canon(sig.toSeq) == canon(batch),
      "replayed-at-speed signals must equal the one-shot batch run")
  }

  test("huge speedup never sleeps; empty input is a no-op") {
    val (stats, _, ck) = runCapturing(feed(50), PacedReplay.Config(speedupFactor = 1e9))
    assert(ck.sleeps.isEmpty && stats.waitedMs == 0L)
    val empty = feed(5).filter("sequence < 0")
    val (s2, p2, _) = runCapturing(empty, PacedReplay.Config())
    assert(s2 == PacedReplay.Stats(0, 0L, 0L) && p2.isEmpty)
  }
}

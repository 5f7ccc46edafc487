package graft.ops

import graft.TestSpark
import graft.config.StrategyConfig
import org.scalatest.funsuite.AnyFunSuite

/** Reference semantics: sma_cross.py:186-395 (W6, W7, P5-P11). */
class PositionsSpec extends AnyFunSuite {
  import TestSpark._

  private val cfg = StrategyConfig(
    smaFastWindow = 2, smaSlowWindow = 4, smaConfirmationWindow = 1)

  private def pipeline(prices: Seq[Double]) =
    Positions.costs(Positions.stream(
      SmaCross.enrich(Normalize(series("A", prices)), cfg)), cfg)

  // flat → up → down: one LONG then one SHORT crossover
  private val zigzag =
    Seq.fill(6)(100.0) ++ Seq(101.0, 102.0, 103.0, 104.0) ++
      Seq(103.0, 101.0, 99.0, 97.0, 95.0)

  test("position forward-fills the last signal and position_change hits on transitions (W6, W7)") {
    val rows = pipeline(zigzag).orderBy("sequence").collect()
    val pos = rows.map(_.getAs[Double]("position"))
    assert(pos.head == 0.0)
    assert(pos.contains(1.0) && pos.contains(-1.0))
    // once long, stays long until the short signal; net change sums to final pos
    val changes = rows.map(_.getAs[Double]("position_change"))
    assert(math.abs(changes.sum - pos.last) < 1e-12)
  }

  test("slippage_rate clamped to [0, max] and latency to [base, base+jitter] (P6, P7)") {
    val rows = pipeline(zigzag).collect()
    rows.foreach { r =>
      val s = r.getAs[Double]("slippage_rate")
      assert(s >= 0.0 && s <= cfg.slippageMaxRate)
      val l = r.getAs[Long]("fill_latency_ms")
      assert(l >= cfg.fillLatencyMs && l <= cfg.fillLatencyMs + cfg.fillLatencyJitterMs)
    }
  }

  test("executions emitted only for position changes, price adjusted by direction (P8-P10)") {
    val ex = Positions.executions(pipeline(zigzag), cfg).orderBy("sequence").collect()
    assert(ex.length >= 2)
    ex.foreach { r =>
      val chg = r.getAs[Double]("position_change")
      assert(chg != 0.0)
      val base = r.getAs[Double]("base_price")
      val px = r.getAs[Double]("execution_price")
      if (chg > 0) assert(px >= base) else assert(px <= base)
      // execution_time = signal_time + fill latency (P9)
      assert(r.getAs[java.sql.Timestamp]("execution_time")
        .after(r.getAs[java.sql.Timestamp]("signal_time")))
    }
  }

  test("transitions emitted only when position changes or first row (P11)") {
    val all = pipeline(zigzag).orderBy("sequence").collect()
    val tr = Positions.transitions(pipeline(zigzag), cfg).orderBy("sequence").collect()
    // exactly the rows where prev_position is null or differs
    val expected = all.filter { r =>
      r.isNullAt(r.fieldIndex("prev_position")) ||
        r.getAs[Double]("position") != r.getAs[Double]("prev_position")
    }
    assert(tr.map(_.getAs[Long]("sequence")).toSeq ==
      expected.map(_.getAs[Long]("sequence")).toSeq)
    // consecutive emitted positions always differ (that's the point of P11)
    tr.map(_.getAs[Double]("position")).toSeq.sliding(2).foreach {
      case Seq(a, b) => assert(a != b)
      case _ =>
    }
  }
}

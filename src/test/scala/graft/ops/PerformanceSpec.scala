package graft.ops

import graft.TestSpark
import graft.config.StrategyConfig
import org.scalatest.funsuite.AnyFunSuite

/** Reference semantics: metrics/performance.py (A1-A6). */
class PerformanceSpec extends AnyFunSuite {
  import TestSpark._

  private val cfg = StrategyConfig(
    smaFastWindow = 2, smaSlowWindow = 4, smaConfirmationWindow = 1)

  private def metricsOf(prices: Seq[Double], stepSecs: Long = 30L) =
    Performance(Positions.costs(Positions.stream(
      SmaCross.enrich(Normalize(series("A", prices, stepSecs)), cfg)), cfg), cfg)

  test("flat series: zero pnl, zero volatility, NULL sharpe and sortino (A3, A4 guards)") {
    val m = metricsOf(Seq.fill(12)(100.0)).collect()
    assert(m.nonEmpty)
    m.foreach { r =>
      assert(r.getAs[Double]("volatility") == 0.0)
      assert(r.isNullAt(r.fieldIndex("sharpe_ratio")), "sharpe must be NULL when vol=0")
      assert(r.isNullAt(r.fieldIndex("sortino_ratio")), "sortino NULL when no negative samples")
      assert(r.getAs[Double]("cumulative_return") == 0.0)
    }
  }

  test("drawdown is the window MIN of realized pnl (A5) and trade costs accumulate (A6)") {
    val zigzag = Seq.fill(6)(100.0) ++ Seq(101.0, 102.0, 103.0, 104.0) ++
      Seq(103.0, 101.0, 99.0, 97.0, 95.0)
    val m = metricsOf(zigzag, 10L).collect()
    assert(m.nonEmpty)
    assert(m.map(_.getAs[Double]("drawdown")).min <= 0.0)
    assert(m.map(_.getAs[Double]("total_trade_cost")).sum > 0.0)
    m.foreach(r => assert(r.getAs[Double]("total_trade_cost") >=
      r.getAs[Double]("total_transaction_cost")))
    assert(m.map(_.getAs[Long]("trades_executed")).sum >= 2L) // LONG + SHORT (A2)
  }

  test("losses produce negative sharpe and sortino (A3, A4)") {
    // long position then steady decline → negative realized pnl ticks
    val prices = Seq.fill(6)(100.0) ++ Seq(101.0, 102.0, 103.0, 104.0) ++
      (1 to 20).map(i => 104.0 - i * 0.5)
    val m = metricsOf(prices, 10L).collect()
    assert(m.nonEmpty)
    assert(m.map(_.getAs[Double]("cumulative_return")).sum < 0.0)
    val sharpes = m.filterNot(_.isNullAt(m.head.fieldIndex("sharpe_ratio")))
      .map(_.getAs[Double]("sharpe_ratio"))
    assert(sharpes.nonEmpty && sharpes.forall(_ < 0.0))
  }

  test("hourly rollup aggregates metric windows (A7)") {
    val prices = (0 until 240).map(i => 100.0 + (i % 7))
    val metrics = metricsOf(prices, 60L) // 4 hours of minutely ticks
    val roll = Rollup.hourly(metrics).collect()
    assert(roll.length >= 4)
    val trades = metrics.collect().map(_.getAs[Long]("trades_executed")).sum
    assert(roll.map(_.getAs[Long]("total_trades")).sum == trades)
  }
}

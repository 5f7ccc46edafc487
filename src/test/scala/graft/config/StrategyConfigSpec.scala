package graft.config

import org.scalatest.funsuite.AnyFunSuite

/** Mirrors the reference's config tests (tests/test_config.py): env →
  * config with bps→rate conversions (config.py:60-73). */
class StrategyConfigSpec extends AnyFunSuite {

  test("defaults follow the paper profile with bps→rate conversion") {
    val c = StrategyConfig()
    assert(c.transactionCostRate == 0.0005)
    assert(c.slippageRate == 0.0012)
    assert(c.slippageMaxRate == 0.005)
    assert(c.totalTradeCostRate == 0.0017)
    assert(c.confirmation == 3)
  }

  test("fromEnv overrides and confirmation floor of 1") {
    val c = StrategyConfig.fromEnv(Map(
      "STRATEGY_RUN_ID" -> "run-x",
      "SMA_FAST_WINDOW" -> "5",
      "SMA_SLOW_WINDOW" -> "30",
      "SMA_CONFIRMATION_WINDOW" -> "0",
      "TRANSACTION_COST_BPS" -> "10"))
    assert(c.strategyRunId == "run-x")
    assert(c.smaFastWindow == 5 && c.smaSlowWindow == 30)
    assert(c.confirmation == 1)
    assert(c.transactionCostRate == 0.001)
  }

  test("fast window must be smaller than slow window") {
    assertThrows[IllegalArgumentException] {
      StrategyConfig(smaFastWindow = 60, smaSlowWindow = 20)
    }
  }
}

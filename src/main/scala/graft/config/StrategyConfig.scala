package graft.config

/** Runtime configuration for a strategy run.
  *
  * Mirrors the knob surface of the reference job config
  * (`flink_jobs/config.py:10-77`): SMA windows, bps-denominated cost model
  * (converted to rates by /10_000), simulated-fill latency model, and run
  * identity. Defaults follow the reference's "paper" profile
  * (`configs/strategies/sma_cross_paper.json`).
  *
  * All knobs are plain values injected as Catalyst literals — never spliced
  * into SQL strings (cf. the reference's quote-escaping at
  * `sma_cross.py:55`), so constant folding applies and injection is
  * impossible by construction.
  */
final case class StrategyConfig(
    strategyRunId: String = "sma-cross-paper",
    executionMode: String = "paper",
    smaFastWindow: Int = 20,
    smaSlowWindow: Int = 60,
    smaConfirmationWindow: Int = 3,
    transactionCostBps: Int = 5,
    slippageBps: Int = 12,
    slippageMaxBps: Int = 50,
    slippageVolatilityMultiplier: Double = 0.35,
    slippageSpreadMultiplier: Double = 0.5,
    fillLatencyMs: Long = 250L,
    fillLatencyJitterMs: Long = 500L,
    fillLatencyVolatilityMs: Long = 1200L,
    metricsWindow: String = "5 minutes",
    metricsWindowLabel: String = "5m"
) {
  require(
    smaFastWindow < smaSlowWindow,
    "smaFastWindow must be smaller than smaSlowWindow (sma_cross.py:39-40)"
  )
  /** bps → rate conversions (config.py:60-73). */
  val transactionCostRate: Double = transactionCostBps.toDouble / 10000.0
  val slippageRate: Double = slippageBps.toDouble / 10000.0
  val slippageMaxRate: Double = slippageMaxBps.toDouble / 10000.0
  val totalTradeCostRate: Double =
    (transactionCostBps.toDouble + slippageBps.toDouble) / 10000.0
  val confirmation: Int = math.max(1, smaConfirmationWindow)
}

object StrategyConfig {
  /** Environment-driven construction, mirroring `JobConfig.from_env`
    * (config.py:40-77). Unset vars fall back to the paper profile.
    */
  def fromEnv(env: Map[String, String] = sys.env): StrategyConfig = {
    def i(k: String, d: Int): Int = env.get(k).map(_.toInt).getOrElse(d)
    def l(k: String, d: Long): Long = env.get(k).map(_.toLong).getOrElse(d)
    def d(k: String, dd: Double): Double =
      env.get(k).map(_.toDouble).getOrElse(dd)
    def s(k: String, d: String): String = env.getOrElse(k, d)
    StrategyConfig(
      strategyRunId = s("STRATEGY_RUN_ID", "sma-cross-paper"),
      executionMode = s("EXECUTION_MODE", "paper"),
      smaFastWindow = i("SMA_FAST_WINDOW", 20),
      smaSlowWindow = i("SMA_SLOW_WINDOW", 60),
      smaConfirmationWindow = i("SMA_CONFIRMATION_WINDOW", 3),
      transactionCostBps = i("TRANSACTION_COST_BPS", 5),
      slippageBps = i("SLIPPAGE_BPS", 12),
      slippageMaxBps = i("SLIPPAGE_MAX_BPS", 50),
      slippageVolatilityMultiplier = d("SLIPPAGE_VOLATILITY_MULTIPLIER", 0.35),
      slippageSpreadMultiplier = d("SLIPPAGE_SPREAD_MULTIPLIER", 0.5),
      fillLatencyMs = l("FILL_LATENCY_MS", 250L),
      fillLatencyJitterMs = l("FILL_LATENCY_JITTER_MS", 500L),
      fillLatencyVolatilityMs = l("FILL_LATENCY_VOLATILITY_MS", 1200L)
    )
  }
}

package graft.ops

import graft.TestSpark
import graft.config.StrategyConfig
import org.scalatest.funsuite.AnyFunSuite

/** Reference semantics: sma_cross.py:127-184 (W3-W5, P3, P4). */
class SmaCrossSpec extends AnyFunSuite {
  import TestSpark._

  // Small windows so crossovers happen fast.
  private val cfg = StrategyConfig(
    smaFastWindow = 2, smaSlowWindow = 4, smaConfirmationWindow = 1)

  test("uptrend after flat produces a LONG crossover with position 1.0 (P3)") {
    val prices = Seq.fill(6)(100.0) ++ Seq(101.0, 102.0, 103.0, 104.0)
    val out = SmaCross(series("A", prices), cfg)
      .filter("signal_type <> 'HOLD'").collect()
    assert(out.nonEmpty)
    assert(out.head.getAs[String]("signal_type") == "LONG")
    assert(out.head.getAs[Double]("position") == 1.0)
    assert(out.head.getAs[Double]("confidence") > 0.0)
  }

  test("downtrend after flat produces a SHORT crossover with position -1.0 (P3)") {
    val prices = Seq.fill(6)(100.0) ++ Seq(99.0, 98.0, 97.0, 96.0)
    val out = SmaCross(series("A", prices), cfg)
      .filter("signal_type <> 'HOLD'").collect()
    assert(out.nonEmpty)
    assert(out.head.getAs[String]("signal_type") == "SHORT")
    assert(out.head.getAs[Double]("position") == -1.0)
  }

  test("flat series never signals; every row is HOLD with position 0.0") {
    val out = SmaCross(series("A", Seq.fill(20)(100.0)), cfg).collect()
    assert(out.length == 20)
    assert(out.forall(_.getAs[String]("signal_type") == "HOLD"))
    assert(out.forall(_.getAs[Double]("position") == 0.0))
  }

  test("confidence equals |fast_sma - slow_sma| and metadata carries the inputs (P4)") {
    val prices = Seq.fill(6)(100.0) ++ Seq(110.0, 120.0)
    val enriched = SmaCross.enrich(Normalize(series("A", prices)), cfg)
    val row = enriched.orderBy(org.apache.spark.sql.functions.desc("sequence")).head()
    val expected = math.abs(row.getAs[Double]("fast_sma") - row.getAs[Double]("slow_sma"))
    val sig = SmaCross.signals(enriched, cfg)
      .orderBy(org.apache.spark.sql.functions.desc("sequence")).head()
    assert(math.abs(sig.getAs[Double]("confidence") - expected) < 1e-12)
    assert(sig.getAs[String]("metadata").contains("\"execution_mode\":\"paper\""))
  }
}

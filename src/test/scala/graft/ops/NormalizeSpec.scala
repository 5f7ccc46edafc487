package graft.ops

import graft.TestSpark
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** Reference semantics: sma_cross.py:57-109 (P1, P2, W1, W2). */
class NormalizeSpec extends AnyFunSuite {
  import TestSpark._

  test("mid-price is (bid+ask)/2 when both present, else price (P1)") {
    val df = Normalize(ticks(Seq(
      ("A", 0, 0, 100.0, Some(99.0), Some(101.0)),
      ("A", 1, 1, 50.0, None, Some(101.0)),
      ("A", 2, 2, 42.0, Some(99.0), None))))
    val mids = df.orderBy("sequence").collect().map(_.getAs[Double]("mid_price"))
    assert(mids.toSeq == Seq(100.0, 50.0, 42.0))
  }

  test("returns: null on first tick and on zero prev mid, else relative diff (P2)") {
    val df = Normalize(ticks(Seq(
      ("A", 0, 0, 100.0, None, None),
      ("A", 1, 1, 110.0, None, None),
      ("A", 2, 2, 0.0, None, None), // mid 0 → next return must be null
      ("A", 3, 3, 50.0, None, None))))
    val rets = df.orderBy("sequence").collect()
      .map(r => Option(r.getAs[java.lang.Double]("returns")))
    assert(rets(0).isEmpty)
    assert(math.abs(rets(1).get - 0.1) < 1e-12)
    assert(math.abs(rets(2).get - (-1.0)) < 1e-12)
    assert(rets(3).isEmpty, "division by zero prev mid must yield NULL")
  }

  test("volatility: stddev_pop over trailing 60 rows; exactly 0 for constant prices (W2)") {
    val const = Normalize(series("A", Seq.fill(70)(123.456)))
    assert(const.collect().forall(_.getAs[Double]("volatility") == 0.0))

    // alternating 100/102 → population stddev 1.0 once both values are in frame
    val alt = Normalize(series("A", Seq.tabulate(10)(i => if (i % 2 == 0) 100.0 else 102.0)))
    val v = alt.orderBy("sequence").collect().map(_.getAs[Double]("volatility"))
    assert(v(0) == 0.0)
    assert(math.abs(v(1) - 1.0) < 1e-4)
  }

  test("per-instrument partitioning: keys never mix (W1)") {
    val df = Normalize(ticks(Seq(
      ("A", 0, 0, 100.0, None, None),
      ("B", 1, 1, 999.0, None, None),
      ("A", 2, 2, 101.0, None, None))))
    val byKey = df.collect().map(r => (r.getAs[String]("product_id"), r)).toMap
    // B's single tick has no prev → null return even though A ticked before
    assert(Option(byKey("B").getAs[java.lang.Double]("returns")).isEmpty)
  }
}

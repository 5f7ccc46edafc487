package graft.ops

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** kalmanPerKey vs a naive in-memory replay — bit-exact (identical IEEE
  * sequence in identical order, the same promise the DuckDB twin
  * relies on), plus the model-shape properties that make the filter
  * worth having: gain decays from the trusting start toward the
  * steady-state Riccati fixpoint, and the level tracks a constant
  * series exactly. */
class KalmanSpec extends AnyFunSuite {
  import TestSpark._

  private val (q, r, p0) = (0.01, 1.0, 1.0)

  private def fixture: Seq[(String, Long, Long, Double, Option[Double], Option[Double])] =
    for {
      p <- Seq("A", "B", "C")
      i <- 0 until 150
    } yield {
      val h = (p.hashCode.abs + i * 53) % 97
      (p, i.toLong * 7, i.toLong, 100.0 + (h % 19) * 0.31 - 3.0, None, None)
    }

  private def naive(xs: Seq[Double]): (Long, Double, Double, Double) = {
    var x = xs.head; var p = p0; var k = 0.0
    xs.tail.foreach { z =>
      val p1 = p + q
      k = p1 / (p1 + r)
      x = x + k * (z - x)
      p = (1.0 - k) * p1
    }
    (xs.size.toLong, x, k, p)
  }

  private def run(rows: Seq[(String, Long, Long, Double, Option[Double], Option[Double])]) =
    Indicators.kalmanPerKey(ticks(rows),
        "product_id", "event_time", "sequence", "price", q, r, p0)
      .collect().map(rr => rr.getString(0) ->
        ((rr.getLong(1), rr.getDouble(2), rr.getDouble(3), rr.getDouble(4)))).toMap

  test("terminal state equals the naive replay bit-for-bit") {
    val out = run(fixture)
    for (p <- Seq("A", "B", "C")) {
      val xs = fixture.filter(_._1 == p).sortBy(t => (t._2, t._3)).map(_._4)
      assert(out(p) == naive(xs), s"key $p")
    }
  }

  test("single-tick key reports the seed state") {
    val out = run(Seq(("S", 0L, 0L, 42.5, None, None)))
    assert(out("S") == ((1L, 42.5, 0.0, p0)))
  }

  test("gain converges to the Riccati fixpoint, p_var to (gain*r)") {
    // steady state: p* solves p = (1-k)(p+q), k = (p+q)/(p+q+r)
    // => k* = (q + sqrt(q^2 + 4qr)) / (2r + q + sqrt(q^2 + 4qr))
    val disc = math.sqrt(q * q + 4 * q * r)
    val kStar = (q + disc) / (2 * r + q + disc)
    val long = (0 until 5000).map(i =>
      ("L", i.toLong, i.toLong, 100.0 + (i % 7) * 0.1, None, None))
    val (_, _, k, p) = run(long)("L")
    assert(math.abs(k - kStar) < 1e-12)
    assert(math.abs(p - kStar * r) < 1e-12)
  }

  test("constant series: level locks to the constant, tracking error 0") {
    val const = (0 until 50).map(i => ("K", i.toLong, i.toLong, 77.25, None, None))
    val (_, level, _, _) = run(const)("K")
    assert(level == 77.25)
  }
}

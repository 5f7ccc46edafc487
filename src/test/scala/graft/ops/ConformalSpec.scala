package graft.ops

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** conformalPerKey vs a naive in-memory replay — bit-exact — plus the
  * statistical sanity the interval is for: the conformal rank is the
  * finite-sample one, short series are guarded out, and a
  * well-behaved stationary series is covered at ≥ the target rate. */
class ConformalSpec extends AnyFunSuite {
  import TestSpark._

  private val (alpha, beta) = (0.2, 0.1)

  private def fixture: Seq[(String, Long, Long, Double, Option[Double], Option[Double])] =
    for {
      p <- Seq("A", "B")
      i <- 0 until 200
    } yield {
      val h = (p.hashCode.abs + i * 61) % 103
      (p, i.toLong * 11, i.toLong, 100.0 + 0.05 * i + (h % 13) * 0.71 - 4.0, None, None)
    }

  private def naive(xs: Seq[Double]): Option[(Long, Long, Long, Double, Long, Double)] = {
    val n = xs.size.toLong
    val nTr = n * 3 / 5; val nCal = n * 4 / 5
    if (!(nTr >= 1 && nCal > nTr && n > nCal)) return None
    var lv = xs.head; var tr = 0.0
    val rs = Seq.newBuilder[Double]; val ts = Seq.newBuilder[Double]
    for (j <- 1 until xs.size) {
      val z = xs(j)
      val r = math.abs(z - (lv + tr))
      if (j >= nTr && j < nCal) rs += r else if (j >= nCal) ts += r
      val nl = z * alpha + (lv + tr) * (1.0 - alpha)
      tr = (nl - lv) * beta + tr * (1.0 - beta)
      lv = nl
    }
    val (r0, t0) = (rs.result(), ts.result())
    if (r0.size < 9 || t0.isEmpty) return None
    val k = ((r0.size + 1) * 9 + 9) / 10
    val qh = r0.sorted.apply(k - 1)
    val cov = t0.count(_ <= qh).toLong
    Some((n, r0.size.toLong, t0.size.toLong, qh, cov, cov.toDouble / t0.size))
  }

  private def run(rows: Seq[(String, Long, Long, Double, Option[Double], Option[Double])]) =
    Indicators.conformalPerKey(ticks(rows), "product_id", "event_time",
        "sequence", "price", alpha, beta)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4),
          r.getLong(5), r.getDouble(6)))).toMap

  test("terminal stats equal the naive replay bit-for-bit") {
    val out = run(fixture)
    for (p <- Seq("A", "B")) {
      val xs = fixture.filter(_._1 == p).sortBy(t => (t._2, t._3)).map(_._4)
      assert(out.get(p).map(t => (t._1, t._2, t._3, t._4, t._5, t._6)) ==
        naive(xs), s"key $p")
    }
  }

  test("short series (empty calibration rank) emit nothing") {
    // n = 20: n_cal = 16-12 = 4 < 9 -> guarded out
    val short = (0 until 20).map(i => ("S", i.toLong, i.toLong, 100.0 + i, None, None))
    assert(run(short).isEmpty)
  }

  test("stationary bounded series is covered at >= the 90% target") {
    val stat = (0 until 500).map(i =>
      ("T", i.toLong, i.toLong, 100.0 + (i % 10) * 0.2, None, None))
    val (_, nCal, nTest, qh, _, cov) = run(stat)("T")
    assert(nCal == 100 && nTest == 100)
    assert(qh > 0.0 && cov >= 0.9)
  }
}

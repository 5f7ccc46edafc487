package graft.ops

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Seasonal.hourOfDayProfile on a constructed series: a linear trend is
  * removed EXACTLY by the centered 2×24 MA (symmetric weights), and a
  * 24-periodic pattern averages to its own mean inside the window (each
  * residue carries total weight 2/48) — so the detrended value per slot
  * is the constant 48·S_h − 2·ΣS on the 48·10⁴ grid, the recovered
  * seasonal is its snapped mean, and sd_within is identically zero. */
class SeasonalSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  // pattern on the 1e-4 price grid (S_h in grid units)
  private val S: Array[Long] = Array.tabulate(24)(h => ((h * 37) % 11 - 5) * 250L)
  private val T: Long = S.sum
  private val A = 1000000L // base 100.0000
  private val B = 3L       // +0.0003/hour linear trend

  private def grid(nDays: Int): Seq[(String, java.sql.Timestamp, Double)] =
    (0 until nDays * 24).map { t =>
      val k = A + B * t + S(t % 24)
      ("P1", new java.sql.Timestamp(t * 3600L * 1000L), k.toDouble / 1e4)
    }

  test("linear trend removed exactly; injected 24h pattern recovered; zero residual") {
    val df = grid(20).toDF("product_id", "grid_ts", "price")
    val out = Seasonal.hourOfDayProfile(df).collect()
      .map(r => r.getLong(1) -> (r.getLong(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    assert(out.keySet == (0L until 24L).toSet)
    out.foreach { case (h, (n, seasonal, sd)) =>
      assert(n > 0)
      val y = 48L * S(h.toInt) - 2L * T
      val want = math.floor(
        ((n * y).toDouble / 48 / 10000 / n) * 1e6 + 0.5) / 1e6
      assert(java.lang.Double.doubleToLongBits(seasonal) ==
        java.lang.Double.doubleToLongBits(want), s"hour $h: $seasonal != $want")
      assert(sd == 0.0, s"hour $h residual sd $sd")
    }
  }

  test("boundary rows without a full +/-12 window are excluded") {
    val df = grid(2).toDF("product_id", "grid_ts", "price") // 48 rows
    val out = Seasonal.hourOfDayProfile(df).collect()
    // rows 12..35 survive (24 full-window centers) — one per hour slot
    assert(out.map(_.getLong(2)).sum == 24L)
  }

  test("series shorter than the window produces no rows") {
    val df = grid(1).take(20).toDF("product_id", "grid_ts", "price")
    assert(Seasonal.hourOfDayProfile(df).count() == 0L)
  }
}

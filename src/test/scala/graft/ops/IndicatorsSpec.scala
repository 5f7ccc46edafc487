package graft.ops

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** RSI / MACD folds vs naive in-memory replays — bit-exact, since the
  * operators promise an identical IEEE sequence in an identical order
  * (the oracle twins replay the same fold in DuckDB `list_reduce`). */
class IndicatorsSpec extends AnyFunSuite {
  import TestSpark._

  private def fixture: Seq[(String, Long, Long, Double, Option[Double], Option[Double])] =
    for {
      p <- Seq("A", "B", "C")
      i <- 0 until 120
    } yield {
      val h = (p.hashCode.abs + i * 37) % 101
      (p, i.toLong * 13, i.toLong, 100.0 + (h % 23) * 0.47 - 5.0, None, None)
    }

  private def series(p: String): Seq[Double] =
    fixture.filter(_._1 == p).sortBy(r => (r._2, r._3)).map(_._4)

  test("rsiPerKey equals the naive Wilder model bit-for-bit") {
    val out = Indicators.rsiPerKey(ticks(fixture),
        "product_id", "event_time", "sequence", "price", 14)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    val a = 1.0 / 14; val b = 1.0 - a
    for (p <- Seq("A", "B", "C")) {
      val xs = series(p)
      val ds = xs.sliding(2).map(w => w(1) - w(0)).toVector
      var g = 0.0; var l = 0.0
      ds.zipWithIndex.foreach { case (dd, i) =>
        val gn = if (dd > 0) dd else 0.0
        val ln = if (dd < 0) -dd else 0.0
        if (i == 0) { g = gn; l = ln } else { g = gn * a + g * b; l = ln * a + l * b }
      }
      val rsi = if (l == 0.0) 100.0 else 100.0 - 100.0 / (1.0 + g / l)
      assert(out(p) == ((ds.size.toLong, g, l, rsi)), s"key $p")
    }
  }

  test("rsi hits the boundary values on monotone series") {
    val up = (0 until 20).map(i => ("U", i.toLong, i.toLong, 100.0 + i, None, None))
    val dn = (0 until 20).map(i => ("D", i.toLong, i.toLong, 100.0 - i, None, None))
    val out = Indicators.rsiPerKey(ticks(up ++ dn),
        "product_id", "event_time", "sequence", "price", 14)
      .collect().map(r => r.getString(0) -> r.getDouble(4)).toMap
    assert(out("U") == 100.0) // no losses
    assert(out("D") == 0.0)   // no gains: 100 - 100/(1+0)
  }

  test("macdPerKey equals the naive lockstep EMA model bit-for-bit") {
    val out = Indicators.macdPerKey(ticks(fixture),
        "product_id", "event_time", "sequence", "price", 12, 26, 9)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5), r.getDouble(6)))).toMap
    val af = 2.0 / 13; val bf = 1.0 - af
    val as = 2.0 / 27; val bs = 1.0 - as
    val ag = 2.0 / 10; val bg = 1.0 - ag
    for (p <- Seq("A", "B", "C")) {
      val xs = series(p)
      var ef = xs.head; var es = xs.head; var sg = 0.0
      xs.tail.foreach { x =>
        val nf = x * af + ef * bf
        val ns = x * as + es * bs
        sg = (nf - ns) * ag + sg * bg
        ef = nf; es = ns
      }
      val macd = ef - es
      assert(out(p) == ((xs.size.toLong, ef, es, macd, sg, macd - sg)), s"key $p")
    }
  }

  test("holtPerKey equals the naive level/trend model bit-for-bit") {
    val out = Indicators.holtPerKey(ticks(fixture),
        "product_id", "event_time", "sequence", "price", 0.2, 0.1, 5)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    val a = 0.2; val na = 0.8; val b = 0.1; val nb = 0.9
    for (p <- Seq("A", "B", "C")) {
      val xs = series(p)
      var lv = xs.head; var tr = 0.0
      xs.tail.foreach { x =>
        val nl = x * a + (lv + tr) * na
        tr = (nl - lv) * b + tr * nb
        lv = nl
      }
      assert(out(p) == ((xs.size.toLong, lv, tr, lv + 5.0 * tr)), s"key $p")
    }
  }

  test("holt trend tracks a linear ramp") {
    // perfectly linear series: the trend must converge toward the slope
    val ramp = (0 until 200).map(i => ("R", i.toLong, i.toLong, 100.0 + 2.0 * i, None, None))
    val r = Indicators.holtPerKey(ticks(ramp),
      "product_id", "event_time", "sequence", "price").collect().head
    val trend = r.getAs[Double]("trend")
    assert(trend > 1.5 && trend < 2.5, s"trend $trend should approach slope 2")
    assert(r.getAs[Double]("forecast") > r.getAs[Double]("level"))
  }

  test("indicator folds are insensitive to input row order") {
    val r1 = Indicators.macdPerKey(ticks(fixture),
      "product_id", "event_time", "sequence", "price").collect().toSet
    val r2 = Indicators.macdPerKey(ticks(fixture.reverse),
      "product_id", "event_time", "sequence", "price").collect().toSet
    assert(r1 == r2)
  }
}

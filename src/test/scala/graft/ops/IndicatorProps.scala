package graft.ops

import graft.TestSpark
import org.scalacheck.{Gen, Prop, Properties, Test}

/** ScalaCheck properties for the indicator folds: on random series the
  * distributed secondary-sort folds equal the naive sequential models
  * bit-for-bit (the same claim the DuckDB oracle twins make), and RSI
  * stays inside [0, 100]. */
object IndicatorProps extends Properties("Indicators") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8) // each sample runs Spark jobs

  private lazy val spark = TestSpark.spark

  private val priceGen = Gen.chooseNum(90.0, 110.0)
  private val seriesGen = for {
    n <- Gen.chooseNum(2, 80)
    xs <- Gen.listOfN(n, priceGen)
  } yield xs

  private def df(xs: List[Double]) = {
    import spark.implicits._
    xs.zipWithIndex
      .map { case (v, i) => ("k", TestSpark.ts(i.toLong), i.toLong, v) }
      .toDF("key", "t", "seq", "x")
  }

  property("rsiPerKey = naive Wilder fold, rsi ∈ [0, 100]") =
    Prop.forAll(seriesGen) { xs =>
      val row = Indicators.rsiPerKey(df(xs), "key", "t", "seq", "x", 14)
        .collect().head
      val a = 1.0 / 14; val b = 1.0 - a
      var g = 0.0; var l = 0.0
      xs.sliding(2).map(w => w(1) - w(0)).zipWithIndex.foreach { case (d, i) =>
        val gn = if (d > 0) d else 0.0
        val ln = if (d < 0) -d else 0.0
        if (i == 0) { g = gn; l = ln } else { g = gn * a + g * b; l = ln * a + l * b }
      }
      val rsi = if (l == 0.0) 100.0 else 100.0 - 100.0 / (1.0 + g / l)
      val got = (row.getAs[Long]("n_deltas"), row.getAs[Double]("avg_gain"),
        row.getAs[Double]("avg_loss"), row.getAs[Double]("rsi"))
      val want = ((xs.size - 1).toLong, g, l, rsi)
      Prop(got == want) :| s"got $got, want $want" &&
        Prop(rsi >= 0.0 && rsi <= 100.0) :| s"rsi out of range: $rsi"
    }

  property("adaptiveEwmaPerKey = naive adaptive fold for any coefficient schedule") =
    Prop.forAll(seriesGen, Gen.listOfN(80, Gen.chooseNum(0.0, 1.0))) { (xs, scs) =>
      import spark.implicits._
      val rows = xs.zip(scs).zipWithIndex.map { case ((v, sc), i) =>
        ("k", TestSpark.ts(i.toLong), i.toLong, v, sc)
      }
      val df = rows.toDF("key", "t", "seq", "x", "sc")
      val row = Indicators.adaptiveEwmaPerKey(df, "key", "t", "seq", "x", "sc")
        .collect().head
      var s = xs.head
      xs.zip(scs).tail.foreach { case (x, sc) => s = s + sc * (x - s) }
      val got = (row.getAs[Long]("n_ticks"), row.getAs[Double]("adaptive"))
      Prop(got == ((xs.size.toLong, s))) :| s"got $got, want (${xs.size}, $s)"
    }

  property("macdPerKey = naive lockstep EMA fold") =
    Prop.forAll(seriesGen) { xs =>
      val row = Indicators.macdPerKey(df(xs), "key", "t", "seq", "x", 12, 26, 9)
        .collect().head
      val af = 2.0 / 13; val bf = 1.0 - af
      val as = 2.0 / 27; val bs = 1.0 - as
      val ag = 2.0 / 10; val bg = 1.0 - ag
      var ef = xs.head; var es = xs.head; var sg = 0.0
      xs.tail.foreach { x =>
        val nf = x * af + ef * bf
        val ns = x * as + es * bs
        sg = (nf - ns) * ag + sg * bg
        ef = nf; es = ns
      }
      val got = (row.getAs[Double]("ema_fast"), row.getAs[Double]("ema_slow"),
        row.getAs[Double]("macd"), row.getAs[Double]("signal"),
        row.getAs[Double]("histogram"))
      val want = (ef, es, ef - es, sg, (ef - es) - sg)
      Prop(got == want) :| s"got $got, want $want"
    }
}

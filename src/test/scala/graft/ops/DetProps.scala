package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}

/** ScalaCheck properties for Det's core promise: aggregation results are
  * a pure function of the multiset of inputs — independent of row order
  * and partitioning. */
object DetProps extends Properties("Det") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8) // each sample runs Spark jobs

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val xsGen: Gen[List[Double]] =
    Gen.nonEmptyListOf(Gen.chooseNum(-1000.0, 1000.0))

  private def agg(xs: List[Double], parts: Int): (Double, Double, Double) = {
    val r = xs.toDF("x").repartition(parts)
      .agg(Det.sumD(col("x"), 9).as("s"),
        Det.avgD(col("x"), 9).as("a"),
        Det.stddevPopD(col("x"), 4).as("sd"))
      .head()
    (r.getDouble(0), r.getDouble(1), r.getDouble(2))
  }

  property("permutation- and partitioning-invariant") = Prop.forAll(xsGen) { xs =>
    val a = agg(xs, 1)
    val b = agg(scala.util.Random.shuffle(xs), 7)
    a == b
  }

  property("constant inputs give exactly zero stddev") =
    Prop.forAll(Gen.chooseNum(-500.0, 500.0), Gen.chooseNum(1, 50)) { (x, n) =>
      agg(List.fill(n)(x), 3)._3 == 0.0
    }

  private val pairsGen: Gen[List[(Double, Double)]] =
    Gen.nonEmptyListOf(Gen.zip(
      Gen.chooseNum(-1000.0, 1000.0), Gen.chooseNum(-1000.0, 1000.0)))

  property("covD/betaD/corrD are permutation- and partitioning-invariant") =
    Prop.forAll(pairsGen) { ps =>
      def agg2(rows: List[(Double, Double)], parts: Int) = {
        val r = rows.toDF("x", "y").repartition(parts)
          .agg(Det.covD(col("x"), col("y"), 4).as("cov"),
            Det.betaD(col("x"), col("y"), 4).as("beta"),
            Det.corrD(col("x"), col("y"), 4).as("corr"))
          .head()
        (0 until 3).map(i => if (r.isNullAt(i)) None else Some(r.getDouble(i)))
      }
      agg2(ps, 1) == agg2(scala.util.Random.shuffle(ps), 7)
    }

  property("windowed betaD over an unbounded frame equals grouped betaD") =
    Prop.forAll(pairsGen) { ps =>
      import org.apache.spark.sql.expressions.Window
      val df = ps.zipWithIndex.map { case ((x, y), i) => (i, x, y) }
        .toDF("i", "x", "y").repartition(5)
      val grouped = df.agg(Det.betaD(col("x"), col("y"), 4).as("b")).head()
      val frame = Window.orderBy(col("i"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val windowed = df
        .select(Det.betaD(col("x"), col("y"), 4, frame).as("b"))
        .distinct().collect()
      def opt(r: org.apache.spark.sql.Row) =
        if (r.isNullAt(0)) None else Some(r.getDouble(0))
      windowed.length == 1 && opt(windowed.head) == opt(grouped)
    }

  // bounded operands keep the exact numerator below 2^53 (the decimal→
  // double cast boundary CLAUDE.md documents) so the BigInt replay and
  // the Spark cast are both correctly rounded conversions
  private val smallPairsGen: Gen[List[(Double, Double)]] =
    Gen.nonEmptyListOf(Gen.zip(
      Gen.chooseNum(-10.0, 10.0), Gen.chooseNum(-10.0, 10.0)))

  property("covD equals the exact integer-moment formula") =
    Prop.forAll(smallPairsGen) { ps =>
      val got = ps.toDF("x", "y")
        .agg(Det.covD(col("x"), col("y"), 4).as("cov")).head().getDouble(0)
      // the documented sequence, replayed in BigInt + IEEE
      def k(v: Double): Long = math.floor(v * 1e4 + 0.5).toLong
      val n = BigInt(ps.size)
      val num = n * ps.map(p => BigInt(k(p._1)) * BigInt(k(p._2))).sum -
        BigInt(ps.map(p => k(p._1)).sum) * BigInt(ps.map(p => k(p._2)).sum)
      val want = num.toDouble / (ps.size.toDouble * ps.size.toDouble) / 1e8
      got == want
    }

  // correlated large-magnitude operands push the exact numerator PAST
  // 2^53 (n²·cov·10^2e ≈ n²·3e15 for n ≥ 2), where the old direct
  // Decimal→double cast could mis-round — the string-routed finish must
  // equal the correctly rounded conversion of the exact BigInt. |x| ≤
  // 1e4 keeps k ≤ 1e8 and Σ|kx·ky| long-safe (the ADDITIVE envelope,
  // which the string routing does not widen).
  private val bigPairsGen: Gen[List[(Double, Double)]] = Gen
    .nonEmptyListOf(Gen.zip(
      Gen.chooseNum(-10000.0, 10000.0), Gen.chooseNum(-100.0, 100.0)))
    .map(_.map { case (x, d) => (x, x + d) })

  property("covD/betaD/corrD finishing is correctly rounded past 2^53") =
    Prop.forAll(bigPairsGen) { ps =>
      val r = ps.toDF("x", "y")
        .agg(Det.covD(col("x"), col("y"), 4).as("cov"),
          Det.betaD(col("x"), col("y"), 4).as("beta"),
          Det.corrD(col("x"), col("y"), 4).as("corr"))
        .head()
      // the documented sequence, replayed exactly: BigInt moments, then
      // parseDouble of the decimal digits (correctly rounded by JLS)
      def k(v: Double): Long = math.floor(v * 1e4 + 0.5).toLong
      def d(b: BigInt): Double = java.lang.Double.parseDouble(b.toString)
      val n = BigInt(ps.size)
      val kx = ps.map(p => BigInt(k(p._1))); val ky = ps.map(p => BigInt(k(p._2)))
      val num = n * kx.zip(ky).map { case (a, b) => a * b }.sum - kx.sum * ky.sum
      val dx = n * kx.map(a => a * a).sum - kx.sum * kx.sum
      val dy = n * ky.map(a => a * a).sum - ky.sum * ky.sum
      val wantCov = d(num) / (ps.size.toDouble * ps.size.toDouble) / 1e8
      val covOk = r.getDouble(0) == wantCov
      val betaOk =
        if (dy > 0) r.getDouble(1) == d(num) / d(dy) else r.isNullAt(1)
      val corrOk =
        if (dx > 0 && dy > 0)
          r.getDouble(2) == d(num) / math.sqrt(d(dx)) / math.sqrt(d(dy))
        else r.isNullAt(2)
      covOk && betaOk && corrOk
    }

  property("snap is idempotent on its own grid") =
    Prop.forAll(Gen.chooseNum(-100.0, 100.0)) { x =>
      val r = Seq(x).toDF("x")
        .select(Det.snap(col("x"), 6).as("once"))
        .select(col("once"), Det.snap(col("once"), 6).as("twice"))
        .head()
      r.getDouble(0) == r.getDouble(1)
    }
}

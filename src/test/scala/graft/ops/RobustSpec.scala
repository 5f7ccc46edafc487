package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RobustSpec extends AnyFunSuite {
  import TestSpark._

  private def df(vals: Seq[Double]) = {
    val s = spark
    import s.implicits._
    vals.zipWithIndex.map { case (v, i) => ("k", i.toLong, v) }
      .toDF("key", "seq", "x")
  }

  test("a single wild value is flagged by MAD but would shift a mean") {
    // Cluster spread ≈ MAD (all |z| ≤ 1), one value at 500 → z ≈ 4000.
    val out = Robust.madOutliers(
      df(Seq(99.9, 100.1, 99.9, 100.1, 99.9, 100.1, 99.95, 100.05, 100.0, 500.0)),
      "key", "x", Seq("seq"))
      .collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Double]("x") == 500.0)
    assert(math.abs(r.getAs[Double]("z_mad")) > 100)
  }

  test("constant values produce MAD 0 and no (null-z) outliers") {
    val out = Robust.madOutliers(df(Seq.fill(6)(42.0)), "key", "x", Seq("seq"))
    assert(out.count() == 0)
  }

  test("median picks the real value at ceil(n/2) of the tie-broken order") {
    // even n: disc median = value at rank n/2 (ceil(4/2)=2) → 2.0 here
    val out = Robust.madOutliers(df(Seq(1.0, 2.0, 3.0, 1000.0)), "key", "x", Seq("seq"))
      .select(col("med")).distinct().collect()
    assert(out.map(_.getDouble(0)).toSeq == Seq(2.0))
  }
}

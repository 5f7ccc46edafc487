package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Error-bound verification for the approximate scale-path aggregates. */
class ApproxSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("approx_count_distinct stays within 3x rsd of exact") {
    val df = (1 to 100000)
      .map(i => (i % 4, (i * 2654435761L) % 20011))
      .toDF("g", "v")
    val rows = Approx.distinct(df, col("g"), col("v"), rsd = 0.05).collect()
    assert(rows.length == 4)
    rows.foreach { r =>
      val exact = r.getAs[Long]("exact").toDouble
      val approx = r.getAs[Long]("approx").toDouble
      assert(math.abs(approx - exact) / exact <= 0.15,
        s"group ${r.get(0)}: approx $approx vs exact $exact")
    }
  }

  test("approx percentiles land within rank error of exact order statistics") {
    val n = 50000
    val xs = (1 to n).map(_.toDouble)
    val df = xs.map(("a", _)).toDF("g", "v")
    val r = Approx.percentiles(df, col("g"), col("v"), accuracy = 10000).head()
    val ps = r.getAs[scala.collection.Seq[Double]]("approx_p")
    // rank error <= n/accuracy = 5 ranks
    val tol = n / 10000.0 + 1
    assert(math.abs(ps(0) - 0.50 * n) <= tol)
    assert(math.abs(ps(1) - 0.90 * n) <= tol)
    assert(math.abs(ps(2) - 0.99 * n) <= tol)
  }
}

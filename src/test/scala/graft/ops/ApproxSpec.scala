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

  test("kmvDistinct: estimate within 2/sqrt(k) of exact; small groups exact") {
    val df = ((1 to 2000).map(i => ("big", s"v$i")) ++
      (1 to 5).map(i => ("small", s"w$i"))).toDF("g", "v")
    val rows = Approx.kmvDistinct(df, col("g"), col("v"), k = 64)
      .collect().map(r => r.getAs[String]("key") -> r).toMap
    val big = rows("big")
    assert(big.getAs[Long]("n_exact") == 2000L)
    val est = big.getAs[Double]("estimate")
    // KMV relative standard error is ~1/sqrt(k-2); allow 4 sigma
    assert(math.abs(est - 2000.0) / 2000.0 <= 4.0 / math.sqrt(62.0),
      s"estimate $est too far from 2000")
    assert(big.getAs[Double]("rel_err") == ((est - 2000.0) match {
      case d => math.floor(d / 2000.0 * 1e6 + 0.5) / 1e6
    }))
    // below-k group: sketch is exact, no k-th hash
    val small = rows("small")
    assert(small.getAs[Long]("n_exact") == 5L)
    assert(small.isNullAt(small.fieldIndex("kth_hv")))
    assert(small.getAs[Double]("estimate") == 5.0)
    assert(small.getAs[Double]("rel_err") == 0.0)
  }

  test("kmvDistinct is partition-invariant (bit-identical)") {
    val df = (1 to 500).map(i => (s"g${i % 3}", s"x$i")).toDF("g", "v")
    val a = Approx.kmvDistinct(df, col("g"), col("v")).collect().map(_.toSeq).toSet
    val b = Approx.kmvDistinct(df.repartition(7), col("g"), col("v"))
      .collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("countMin: one-sided error; wide sketch is exact, narrow overestimates") {
    val df = (1 to 3000).map(i => s"w${i % 100}").toDF("v")
    val wide = Approx.countMin(df, col("v"), width = 4096, depth = 3, topK = 10)
      .collect()
    assert(wide.length == 10)
    wide.foreach { r =>
      assert(r.getAs[Long]("est_c") >= r.getAs[Long]("true_c"))
      assert(r.getAs[Long]("true_c") == 30L)
    }
    // 100 distinct values into 8 counters per row: collisions guaranteed
    val narrow = Approx.countMin(df, col("v"), width = 8, depth = 2, topK = 10)
      .collect()
    assert(narrow.forall(r => r.getAs[Long]("overestimate") >= 0L))
    assert(narrow.exists(r => r.getAs[Long]("overestimate") > 0L))
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

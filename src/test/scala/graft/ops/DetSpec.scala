package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Det: order-independent deterministic aggregation. */
class DetSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("sumD/avgD are invariant under repartitioning (order independence)") {
    val xs = (1 to 5000).map(i => math.sin(i.toDouble) * 100.0)
    val results = Seq(1, 3, 16).map { parts =>
      xs.toDF("x").repartition(parts)
        .agg(Det.sumD(col("x"), 9).as("s"), Det.avgD(col("x"), 9).as("a"))
        .head()
    }
    assert(results.map(_.getDouble(0)).distinct.size == 1, "sum must not depend on partitioning")
    assert(results.map(_.getDouble(1)).distinct.size == 1, "avg must not depend on partitioning")
  }

  test("stddevPopD matches built-in stddev_pop within grid tolerance and is exact 0 on constants") {
    val xs = (1 to 1000).map(i => 100.0 + math.cos(i.toDouble))
    val r = xs.toDF("x")
      .agg(Det.stddevPopD(col("x"), 4).as("d"), stddev_pop(col("x")).as("ref"))
      .head()
    assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-3)

    val c = Seq.fill(100)(42.123456789).toDF("x")
      .agg(Det.stddevPopD(col("x"), 4).as("d")).head()
    assert(c.getDouble(0) == 0.0, "constant input must give exactly 0")
  }

  test("snap rounds to the 1e-6 grid (half away from zero via floor(x*1e6+0.5))") {
    val r = Seq(1.0000004, 1.0000005, 1.0000006, -1.0000004, 0.0)
      .toDF("x").select(Det.snap(col("x"), 6).as("y"))
      .collect().map(_.getDouble(0))
    assert(r(0) == 1.0)
    assert(r(1) == 1.000001)
    assert(r(2) == 1.000001)
    assert(r(3) == -1.0)
    assert(r(4) == 0.0)
  }

  test("trailing prefix-sum forms are bit-identical to direct frame forms") {
    import org.apache.spark.sql.expressions.Window
    val rng = new scala.util.Random(7)
    val rows = for (k <- Seq("a", "b"); i <- 0 until 300)
      yield (k, i.toLong, rng.nextDouble() * 500.0)
    val df = rows.toDF("k", "seq", "x")
    val base = Window.partitionBy(col("k")).orderBy(col("seq"))
    val w = 60
    val frame = base.rowsBetween(-(w - 1), Window.currentRow)
    val cmp = df.select(
      Det.avgD(col("x"), 9, frame).as("a1"),
      Det.avgDTrailing(col("x"), 9, w, base).as("a2"),
      Det.stddevPopD(col("x"), 4, frame).as("s1"),
      Det.stddevPopDTrailing(col("x"), 4, w, base).as("s2"))
      .collect()
    cmp.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1), "trailing avg must be bit-identical")
      assert(r.getDouble(2) == r.getDouble(3), "trailing stddev must be bit-identical")
    }
  }

  test("corrD matches built-in corr within grid tolerance; zero variance -> null") {
    val rng = new scala.util.Random(11)
    val xs = (1 to 2000).map(i => 100.0 + math.sin(i / 9.0) + rng.nextDouble())
    val ys = xs.map(x => 0.5 * x + 3.0 + rng.nextDouble() * 2.0)
    val r = xs.zip(ys).toSeq.toDF("x", "y")
      .agg(Det.corrD(col("x"), col("y"), 4).as("d"), corr(col("x"), col("y")).as("ref"))
      .head()
    assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-4)
    assert(r.getDouble(0) >= -1.0 && r.getDouble(0) <= 1.0)

    val flat = (1 to 100).map(i => (42.0, i.toDouble)).toDF("x", "y")
      .agg(Det.corrD(col("x"), col("y"), 4).as("d")).head()
    assert(flat.isNullAt(0), "zero variance must yield NULL, not NaN")

    val invariant = Seq(1, 4, 16).map { parts =>
      xs.zip(ys).toSeq.toDF("x", "y").repartition(parts)
        .agg(Det.corrD(col("x"), col("y"), 4)).head().getDouble(0)
    }
    assert(invariant.distinct.size == 1, "corr must not depend on partitioning")
  }

  test("property: avgD within grid distance of true mean; stddevPopD >= 0 (seeded trials)") {
    val rng = new scala.util.Random(42)
    for (_ <- 1 to 10) {
      val xs = List.fill(rng.nextInt(200) + 1)(rng.nextDouble() * 2000.0 - 1000.0)
      val r = xs.toDF("x").agg(
        Det.avgD(col("x"), 9).as("a"),
        Det.stddevPopD(col("x"), 4).as("s")).head()
      val trueMean = xs.sum / xs.size
      assert(math.abs(r.getDouble(0) - trueMean) < 1e-6 * (1 + math.abs(trueMean)))
      assert(r.getDouble(1) >= 0.0)
    }
  }
}

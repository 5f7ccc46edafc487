package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ZOrderSpec extends AnyFunSuite {
  import TestSpark._

  /** Reference Morton interleave, written independently of the op. */
  private def model(x: Long, y: Long): Long =
    (0 until 16).map { i =>
      (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }.sum

  test("zval matches the reference interleave across the 16-bit range") {
    val s = spark
    import s.implicits._
    val cases = Seq[(Long, Long)](
      (0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L), (43690L, 21845L),
      (255L, 256L), (1234L, 4321L), (32768L, 1L), (65535L, 0L))
    val out = cases.toDF("x", "y")
      .select(ZOrder.zval(col("x"), col("y")).as("z"), col("x"), col("y"))
      .collect()
    out.foreach { r =>
      assert(r.getAs[Long]("z") == model(r.getAs[Long]("x"), r.getAs[Long]("y")),
        s"x=${r.getAs[Long]("x")} y=${r.getAs[Long]("y")}")
    }
  }

  test("zval is monotone in each dimension's bit content: distinct inputs, distinct keys") {
    val s = spark
    import s.implicits._
    val pts = for (x <- 0L to 63L; y <- 0L to 63L) yield (x, y)
    val zs = pts.toDF("x", "y")
      .select(ZOrder.zval(col("x"), col("y")).as("z")).collect().map(_.getLong(0))
    assert(zs.distinct.length == pts.length) // interleave is a bijection
    assert(zs.max == model(63L, 63L))
  }

  test("coarse z-cells bound both dimensions: the data-skipping property") {
    val s = spark
    import s.implicits._
    // every key in one z>>16 cell shares x>>8 and y>>8 — so per-cell
    // min/max (the parquet footer stats) span at most 256 per dimension
    val pts = Seq((0L, 0L), (255L, 255L), (256L, 0L), (511L, 255L),
      (300L, 77L), (12345L, 999L))
    val rows = pts.toDF("x", "y")
      .select(ZOrder.zval(col("x"), col("y")).as("z"), col("x"), col("y"))
      .groupBy(shiftright(col("z"), 16).as("cell"))
      .agg(max(col("x")) - min(col("x")), max(col("y")) - min(col("y")))
      .collect()
    rows.foreach { r =>
      assert(r.getLong(1) <= 255L && r.getLong(2) <= 255L)
    }
  }
}

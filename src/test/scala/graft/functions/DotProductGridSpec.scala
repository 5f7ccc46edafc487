package graft.functions

import graft.TestSpark
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, FloatType}
import org.scalatest.funsuite.AnyFunSuite

class DotProductGridSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def reference(a: Seq[Float], b: Seq[Float]): Long =
    a.zip(b).map { case (x, y) =>
      math.floor(x.toDouble * y.toDouble * 1e12 + 0.5).toLong
    }.sum

  test("codegen path matches the reference IEEE sequence on random vectors") {
    GraftFunctions.register(spark)
    val rng = new scala.util.Random(3)
    val rows = (1 to 200).map { i =>
      (i.toLong,
        Seq.fill(64)(rng.nextFloat() * 2 - 1),
        Seq.fill(64)(rng.nextFloat() * 2 - 1))
    }
    val out = rows.toDF("id", "a", "b")
      .select(col("id"), call_function(GraftFunctions.DotName, col("a"), col("b")).as("d"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { case (id, a, b) => assert(out(id) == reference(a, b)) }
  }

  test("interpreted eval path matches too; mismatched lengths use the shorter") {
    def lit(xs: Seq[Float]) = Literal.create(xs, ArrayType(FloatType))
    val a = Seq(0.5f, -0.25f, 2f)
    val b = Seq(1f, 4f)
    val got = DotProductGrid(lit(a), lit(b)).eval(null).asInstanceOf[Long]
    assert(got == reference(a.take(2), b))
    assert(DotProductGrid(lit(Seq.empty[Float]), lit(b)).eval(null) == 0L)
  }

  test("null input yields null") {
    GraftFunctions.register(spark)
    val df = Seq((Seq(1f, 2f), null.asInstanceOf[Seq[Float]]))
      .toDF("a", "b")
      .select(call_function(GraftFunctions.DotName, col("a"), col("b")).as("d"))
    assert(df.head().isNullAt(0))
  }
}

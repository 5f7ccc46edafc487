package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.types._

/** Native Catalyst expression for the exact 1e-12 integer-grid inner
  * product over two float arrays: Σ round(a_i·b_i·1e12) as Long.
  *
  * This is the engine's one genuinely hot scalar kernel (every
  * similarity-search candidate evaluates it), and the reason it is a
  * custom `Expression` with `doGenCode` rather than a composed
  * `aggregate(zip_with(...))`: higher-order expressions evaluate their
  * lambdas interpreted per element, while this compiles into the
  * enclosing WholeStageCodegen as a tight primitive loop — no virtual
  * calls, no per-element boxing. A Scala UDF would at least force
  * serialization across the codegen boundary. (Custom-operator preference:
  * compose built-ins > native Expression > UDF.)
  *
  * The arithmetic is the same fixed IEEE sequence as
  * `Similarity`'s compiled loops and the DuckDB oracle comprehension
  * ((a·b)·1e12 + 0.5, floor, Long add) — Long sums are exact and
  * associative, so results are bit-identical across all three paths.
  * Null elements are not expected (embedding columns are dense).
  */
case class DotProductGrid(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = LongType
  override def prettyName: String = "dotl_grid"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      s += math.floor(x.getFloat(i).toDouble * y.getFloat(i).toDouble * 1e12 + 0.5).toLong
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("sum")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (long) java.lang.Math.floor(
         |      (double) $x.getFloat($i) * (double) $y.getFloat($i) * 1e12 + 0.5);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Registration for the engine's native functions. */
object GraftFunctions {
  val DotName = "dotl_grid"
  val SrpName = "srp_bucket"

  private[functions] val builder: Seq[Expression] => Expression = {
    case Seq(a, b) => DotProductGrid(a, b)
    case other => throw new IllegalArgumentException(
      s"$DotName expects 2 arguments, got ${other.size}")
  }

  private[functions] val srpBuilder: Seq[Expression] => Expression = {
    case Seq(v,
        org.apache.spark.sql.catalyst.expressions.Literal(p: Int, _),
        org.apache.spark.sql.catalyst.expressions.Literal(d: Int, _)) =>
      SrpBucketExpr(v, p, d)
    case Seq(v,
        org.apache.spark.sql.catalyst.expressions.Literal(p: Int, _),
        org.apache.spark.sql.catalyst.expressions.Literal(d: Int, _),
        org.apache.spark.sql.catalyst.expressions.Literal(
          s: org.apache.spark.unsafe.types.UTF8String, _)) =>
      SrpBucketExpr(v, p, d, s.toString)
    case other => throw new IllegalArgumentException(
      s"$SrpName expects (vector, planes literal, dim literal[, salt literal]), got $other")
  }

  /** Idempotent runtime registration on an existing session. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(DotName, builder, "built-in")
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(SrpName, srpBuilder, "built-in")
  }
}

/** `spark.sql.extensions=graft.functions.GraftExtensions` injection path
  * for sessions the engine doesn't construct itself. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectFunction((
      FunctionIdentifier(GraftFunctions.DotName),
      new ExpressionInfo(classOf[DotProductGrid].getName, GraftFunctions.DotName),
      GraftFunctions.builder))
}

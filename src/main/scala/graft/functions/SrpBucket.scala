package graft.functions

import graft.ops.Similarity
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native SRP bucket key: all `planes` hyperplane sign bits in ONE pass
  * over the embedding. The composed form (one `dotl_grid` call per
  * plane) traverses the array `planes` times and re-reads each float
  * from Tungsten memory per plane; this expression hoists the plane
  * loop inside, so a row is bucketed in a single traversal per plane
  * over a locally-referenced sign matrix — the difference is pure
  * constant-factor, but the kernel sits under every LSH candidate at
  * 100 TB.
  *
  * Bit-compat: per plane the arithmetic is EXACTLY DotProductGrid's
  * sequence — `(double)v[i] * (double)sign[i] * 1e12 + 0.5`, floor,
  * long add, `>= 0` — against [[Similarity.planeSigns]]' md5-seeded ±1
  * entries, so the key equals the composed form and the DuckDB twin bit
  * for bit (SrpSpec + the embed_lsh_topk/dedup_embed oracles pin it).
  */
case class SrpBucketExpr(child: Expression, planes: Int, dim: Int,
                         salt: String = "srp")
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = StringType
  override def prettyName: String = "srp_bucket"

  @transient private lazy val signs: Array[Array[Float]] =
    Similarity.planeSigns(planes, dim, salt)

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val bits = new Array[Char](planes)
    var p = 0
    while (p < planes) {
      val sp = signs(p)
      val n = math.min(v.numElements(), sp.length)
      var s = 0L
      var i = 0
      while (i < n) {
        s += math.floor(v.getFloat(i).toDouble * sp(i).toDouble * 1e12 + 0.5).toLong
        i += 1
      }
      bits(p) = if (s >= 0L) '1' else '0'
      p += 1
    }
    UTF8String.fromString(new String(bits))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val signsRef = ctx.addReferenceObj("srpSigns", signs, "float[][]")
      val bits = ctx.freshName("bits")
      val p = ctx.freshName("p")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val sp = ctx.freshName("sp")
      s"""
         |char[] $bits = new char[$planes];
         |for (int $p = 0; $p < $planes; $p++) {
         |  float[] $sp = $signsRef[$p];
         |  int $n = java.lang.Math.min($v.numElements(), $sp.length);
         |  long $s = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $s += (long) java.lang.Math.floor(
         |        (double) $v.getFloat($i) * (double) $sp[$i] * 1e12 + 0.5);
         |  }
         |  $bits[$p] = $s >= 0L ? '1' : '0';
         |}
         |${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(new String($bits));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

package graft.ops

import graft.TestSpark
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}

/** ScalaCheck properties: the range-partitioned two-pass rank primitives
  * equal their single-partition window forms on random data — arbitrary
  * sizes, bucket counts, tie densities, and partition counts (including
  * more partitions than rows). */
object RanksProps extends Properties("Ranks") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8) // each sample runs Spark jobs

  private lazy val spark = TestSpark.spark

  private val caseGen = for {
    n <- Gen.chooseNum(1, 120)
    k <- Gen.chooseNum(1, 12)
    nPart <- Gen.chooseNum(1, 10)
    tieMod <- Gen.chooseNum(1, 8) // 1 = all tied, 8 = mostly distinct
    vs <- Gen.listOfN(n, Gen.chooseNum(0L, 1000L))
  } yield (vs.map(_ % (tieMod * 13)), k, nPart)

  property("ntileByRange = window ntile") =
    Prop.forAll(caseGen) { case (vs, k, nPart) =>
      val s = spark
      import s.implicits._
      val df = vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
      // smallBytes = -1 forces the two-pass path: the window form IS the
      // model below, so only the distributed path needs property fuzzing
      val got = Ranks.ntileByRange(df, Seq(col("v"), col("id")), k, "t",
          partitions = Some(nPart), smallBytes = -1)
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      val want = df.withColumn("t",
          ntile(k).over(Window.orderBy(col("v"), col("id"))).cast("long"))
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      got == want
    }

  property("runningSumByRange = window prefix sum") =
    Prop.forAll(caseGen) { case (vs, _, nPart) =>
      val s = spark
      import s.implicits._
      val df = vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "n")
      val got = Ranks.runningSumByRange(df, Seq(col("id")), "n", "cum",
          partitions = Some(nPart), smallBytes = -1L) // force the two-pass
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      val want = df.withColumn("cum", sum(col("n")).over(
          Window.orderBy(col("id"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      got == want
    }
}

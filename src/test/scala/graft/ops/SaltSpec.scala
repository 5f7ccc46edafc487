package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SaltSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("salted two-phase sum is bit-identical to the direct Det sum") {
    val rng = new scala.util.Random(11)
    // one hot key with 50k rows, a few cold keys
    val rows = (1 to 50000).map(_ => ("hot", rng.nextDouble() * 200 - 100)) ++
      (1 to 500).map(i => (s"cold${i % 7}", rng.nextDouble() * 200 - 100))
    val df = rows.toDF("k", "x").repartition(8)

    val salted = Salt.saltedSumD(df, Seq("k"), col("x"), 9, salts = 32)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    val direct = df.groupBy(col("k"))
      .agg(Det.sumD(col("x"), 9).as("sum"), count(lit(1)).as("count"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap

    assert(salted.keySet == direct.keySet)
    salted.keySet.foreach { k =>
      assert(salted(k) == direct(k), s"key $k: salted must equal direct exactly")
    }
  }
}

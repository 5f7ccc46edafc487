package graft.io

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed layout removes the join/agg Exchange entirely. */
class BucketingSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("join of two co-bucketed tables plans without any Exchange") {
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    try {
      Bucketing.writeBucketed(
        (1 to 5000).map(i => (i.toLong % 512, i.toLong)).toDF("k", "a"),
        "graft_bkt_l", buckets = 8, key = "k")
      Bucketing.writeBucketed(
        (1 to 3000).map(i => (i.toLong % 512, i.toLong * 10)).toDF("k", "b"),
        "graft_bkt_r", buckets = 8, key = "k")

      val joined = spark.table("graft_bkt_l").join(spark.table("graft_bkt_r"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n$plan")
      // and the result is still the real join
      val naive = (1 to 5000).map(i => i.toLong % 512)
        .groupBy(identity).view.mapValues(_.size)
      val rCounts = (1 to 3000).map(i => i.toLong % 512)
        .groupBy(identity).view.mapValues(_.size)
      val expected = naive.map { case (k, n) => n.toLong * rCounts.getOrElse(k, 0).toLong }.sum
      assert(joined.count() == expected)

      // groupBy on the bucket key is exchange-free too
      val agg = spark.table("graft_bkt_l").groupBy($"k").count()
      assert(!agg.queryExecution.executedPlan.toString.contains("Exchange"),
        "bucketed groupBy must not shuffle")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_bkt_l")
      spark.sql("DROP TABLE IF EXISTS graft_bkt_r")
    }
  }
}

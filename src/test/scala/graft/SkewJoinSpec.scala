package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Evidence for the skew story in docs/SCALE.md: when a shuffle join's
  * key distribution is pathological, AQE's runtime re-plan splits the
  * oversized partitions (OptimizeSkewedJoin) — no manual salting needed
  * for JOINS, which is why graft.ops.Salt only exists for aggregations
  * (AQE cannot split a skewed aggregate). The thresholds here are
  * shrunk so local[4] data trips the same code path a 100 TB skewed
  * key would. */
class SkewJoinSpec extends AnyFunSuite {
  import TestSpark._

  test("AQE splits a skewed sort-merge join at runtime (skew=true in the final plan)") {
    val s = spark
    import s.implicits._
    val prev = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.autoBroadcastJoinThreshold"
    ).map(k => k -> s.conf.getOption(k)).toMap
    try {
      s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8KB")
      s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2KB")
      s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ

      // 90% of the fact lands on ONE key; the dimension is uniform.
      val fact = s.range(0, 60000).select(
        when($"id" % 10 =!= 0, lit(7L)).otherwise($"id").as("k"),
        concat(lit("payload-payload-payload-"), $"id").as("v"))
      val dim = s.range(0, 5000).select($"id".as("k"), concat(lit("d"), $"id").as("d"))
      val j = fact.join(dim, "k")
      // run THIS frame's own QueryExecution so AQE finalizes its plan
      // (count()/write() would wrap a fresh execution and leave it unrun)
      assert(j.collect().length > 0)

      val p = j.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"),
        s"AQE must mark and split the skewed join partitions:\n$p")
    } finally prev.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None) => s.conf.unset(k)
    }
  }
}

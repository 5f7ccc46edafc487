package graft.ops

import graft.TestSpark
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Regression pin for the round-7 forcing find: ntileByRange's two-pass
  * branch ran its counts job and its assignment job as SEPARATE
  * evaluations, and at sf0.1 the range boundaries re-sampled between
  * them (the input is a hash aggregate whose per-partition row order is
  * not stable across jobs) — offsets no longer matched populations, rn
  * overran the total, and an ntile(5) emitted tile 6 with ±185-row tile
  * skew. Toy fixtures never caught it (sf0.01 is boundary-stable); this
  * spec runs the REAL rfm_segments input at sf0.1 with the partition
  * count forced to 32 so the multi-partition boundary condition exists
  * regardless of the test session's defaults.
  */
class RanksForcedScaleSpec extends AnyFunSuite {
  import TestSpark._

  private val dir = "/root/testdata/sf0.1"

  test("two-pass ntileByRange matches the window form on sf0.1 rfm input") {
    val perCust = spark.read.parquet(s"$dir/orders.parquet")
      .groupBy(col("o_custkey"))
      .agg(max(col("o_orderdate")).as("last_order"),
        count(lit(1)).as("frequency"),
        Det.sumD(col("o_totalprice"), 2).as("monetary"))
    val order = Seq(col("last_order"), col("o_custkey"))
    val win = perCust.withColumn("t_win",
      ntile(5).over(Window.orderBy(order: _*)).cast("long"))
    val two = Ranks.ntileByRange(perCust, order, 5, "t_two",
      partitions = Some(32), smallBytes = -1L)
    val j = win.select(col("o_custkey"), col("t_win"))
      .join(two.select(col("o_custkey"), col("t_two")), "o_custkey")
    assert(j.filter(col("t_win") =!= col("t_two")).count() == 0L)
    // tile populations must be exactly ⌈n/k⌉ / ⌊n/k⌋ — the pre-fix bug
    // showed a phantom tile 6 and skewed populations
    val pops = two.groupBy(col("t_two")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pops.keySet == Set(1L, 2L, 3L, 4L, 5L))
    assert(pops.values.sum == 14999L)
    assert(pops.values.forall(c => c == 3000L || c == 2999L))
  }
}

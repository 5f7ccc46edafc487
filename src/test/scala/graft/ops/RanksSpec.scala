package graft.ops

import graft.TestSpark
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Ranks.ntileByRange must equal Spark's own global-window ntile bit for
  * bit (the rfm_segments oracle pins the DuckDB side) while never running
  * a single-partition window sort. */
class RanksSpec extends AnyFunSuite {
  import TestSpark._

  private def fixture(n: Int) = {
    val s = spark
    import s.implicits._
    // values with heavy ties → the id tie-break decides bucket membership
    (0 until n).map(i => (i.toLong, (i * 7919 % 13).toLong)).toDF("id", "v")
  }

  private def windowNtile(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.withColumn("t",
      ntile(k).over(Window.orderBy(col("v"), col("id"))).cast("long"))

  test("matches Window ntile for uneven buckets, n % k != 0 — both paths") {
    for ((n, k) <- Seq((97, 5), (100, 7), (12, 12), (5, 8), (1, 3));
         small <- Seq(Long.MaxValue, -1L)) {
      val df = fixture(n)
      val got = Ranks.ntileByRange(df, Seq(col("v"), col("id")), k, "t",
          partitions = Some(8), smallBytes = small)
        .select("id", "t").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = windowNtile(df, k)
        .select("id", "t").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == want, s"ntile mismatch at n=$n k=$k smallBytes=$small")
    }
  }

  test("descending order and multi-column order agree with the window form") {
    val df = fixture(64)
    val got = Ranks.ntileByRange(df, Seq(col("v").desc, col("id")), 5, "t",
        partitions = Some(4), smallBytes = -1)
      .select("id", "t").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = df.withColumn("t",
        ntile(5).over(Window.orderBy(col("v").desc, col("id"))).cast("long"))
      .select("id", "t").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("above the size cutoff the rank runs range-partitioned, not in one task") {
    val out = Ranks.ntileByRange(fixture(1000), Seq(col("v"), col("id")), 5, "t",
      partitions = Some(8), smallBytes = -1)
    assert(out.rdd.getNumPartitions == 8,
      "global ntile must keep the range partitioning (no single-partition sort)")
    // every partition of the range layout actually holds rows (parallel work)
    val perPart = out.rdd.mapPartitions(it => Iterator(it.size)).collect()
    assert(perPart.count(_ > 0) > 1, s"work concentrated in one task: ${perPart.toSeq}")
    // and the assignment pass is a whole-stage-codegen project over the
    // pinned (checkpointed) sorted frame — the `*(n)` prefix — never an
    // interpreted per-Row map (the pre-r6 Row.fromSeq shape). The
    // ExistingRDD scan IS expected now: it is the eager localCheckpoint
    // that pins one evaluation under the counts AND assignment jobs
    // (RanksForcedScaleSpec — boundary re-sampling bug).
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"),
      s"ntile assignment must be a codegen project, got:\n$plan")
    assert(!plan.contains("mapPartitions"),
      s"two-pass ntile must not fall back to a Row-level RDD map, got:\n$plan")
  }

  test("a dimension-sized input takes the one-task window form") {
    val out = Ranks.ntileByRange(fixture(200), Seq(col("v"), col("id")), 5, "t")
    assert(out.queryExecution.executedPlan.toString.contains("ntile"),
      "small input should plan the plain window ntile")
  }

  test("empty input yields empty output") {
    val empty = fixture(0)
    for (small <- Seq(Long.MaxValue, -1L))
      assert(Ranks.ntileByRange(empty, Seq(col("v"), col("id")), 5, "t",
        smallBytes = small).count() == 0)
  }

  test("rowNumberByRange equals the global window row_number — both paths") {
    for ((n, ties) <- Seq((97, true), (100, false), (1, false));
         small <- Seq(Long.MaxValue, -1L)) {
      val df = fixture(n)
      val got = Ranks.rowNumberByRange(df, Seq(col("v"), col("id")), "rn",
          partitions = Some(8), smallBytes = small)
        .select("id", "rn").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = df.withColumn("rn",
          row_number().over(Window.orderBy(col("v"), col("id"))).cast("long"))
        .select("id", "rn").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == want, s"row number mismatch at n=$n smallBytes=$small")
    }
  }

  test("runningSumByRange equals the global window prefix sum") {
    val s = spark
    import s.implicits._
    val df = (0 until 500).map(i => (i.toLong, ((i * 31) % 17 + 1).toLong))
      .toDF("id", "n")
    val want = df.withColumn("cum", sum(col("n")).over(
        Window.orderBy(col("id")).rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // both sides of the adaptive flip: forced two-pass AND window path
    for (small <- Seq(-1L, Long.MaxValue)) {
      val got = Ranks.runningSumByRange(df, Seq(col("id")), "n", "cum",
          partitions = Some(8), smallBytes = small)
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      assert(got == want, s"smallBytes=$small diverged")
    }
  }
}

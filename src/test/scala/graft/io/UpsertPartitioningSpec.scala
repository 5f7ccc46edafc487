package graft.io

import graft.TestSpark
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** [[JdbcSink.pkCoLocated]] — the r15-verdict fix for the upsert's
  * unconditional per-batch Exchange: a keyed-agg micro-batch is already
  * hash-partitioned by its group keys, so the enforcement repartition
  * must be SKIPPED exactly when the planned output partitioning
  * provably co-locates the PK, and KEPT everywhere else.
  *
  * Pins:
  *  1. groupBy output whose keys equal the PK → co-located (skip);
  *  2. key order does not matter (clustering is a set property);
  *  3. aliased group keys still co-locate (projection-preserving
  *     partitioning — the real metricsWriter frame renames its keys);
  *  4. PK ⊂ group keys → NOT co-located (same-PK rows can land in
  *     different hash partitions — must repartition);
  *  5. a raw parallelized frame → NOT co-located;
  *  6. end-to-end: upserting a keyed-agg frame (the skip branch) into
  *     Derby twice converges to one row per PK — the enforcement
  *     semantics survive the skipped Exchange.
  */
class UpsertPartitioningSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def base: DataFrame =
    Seq((1L, 10L, 1.0), (1L, 10L, 2.0), (2L, 10L, 3.0), (2L, 20L, 4.0))
      .toDF("user_id", "win_start", "v")

  test("keyed-agg output on the PK is co-located (repartition skipped)") {
    val agg = base.groupBy("user_id", "win_start")
      .agg(count(lit(1)).as("n"), sum("v").as("sum_v"))
    assert(JdbcSink.pkCoLocated(agg, Seq("user_id", "win_start")))
    // key ORDER is irrelevant — clustering is a set property
    assert(JdbcSink.pkCoLocated(agg, Seq("win_start", "user_id")))
  }

  test("aliased group keys co-locate through the projection") {
    val agg = base.groupBy("user_id", "win_start")
      .agg(sum("v").as("sum_v"))
      .select(col("user_id").as("uid"), col("win_start").as("ws"),
        col("sum_v"))
    assert(JdbcSink.pkCoLocated(agg, Seq("uid", "ws")))
  }

  test("PK strictly smaller than the group keys is NOT co-located") {
    // hash(user_id, win_start) can split one user_id across partitions
    val agg = base.groupBy("user_id", "win_start")
      .agg(sum("v").as("sum_v"))
    assert(!JdbcSink.pkCoLocated(agg, Seq("user_id")))
  }

  test("raw un-shuffled frames are NOT co-located") {
    assert(!JdbcSink.pkCoLocated(base, Seq("user_id", "win_start")))
    // missing PK column → false, never a throw
    assert(!JdbcSink.pkCoLocated(base, Seq("no_such_col")))
  }

  test("skip branch end-to-end: keyed-agg upsert into Derby converges") {
    val db = "upsert_part_spec"
    val url = s"jdbc:derby:memory:$db;create=true"
    val c = java.sql.DriverManager.getConnection(url)
    try {
      val st = c.createStatement()
      st.executeUpdate(
        """CREATE TABLE m (user_id BIGINT NOT NULL, win_start BIGINT NOT NULL,
          |  n BIGINT, sum_v DOUBLE, PRIMARY KEY (user_id, win_start))"""
          .stripMargin)
      st.close()
    } finally c.close()
    val agg = base.groupBy("user_id", "win_start")
      .agg(count(lit(1)).as("n"), sum("v").as("sum_v"))
    assert(JdbcSink.pkCoLocated(agg, Seq("user_id", "win_start")),
      "precondition: this IS the skip branch")
    val w = JdbcSink.upsert(url, "m", Seq("user_id", "win_start"))
    w(agg); w(agg) // replay must be a no-op
    val c2 = java.sql.DriverManager.getConnection(url)
    try {
      val rs = c2.createStatement().executeQuery(
        "SELECT user_id, win_start, n, sum_v FROM m ORDER BY 1, 2")
      val rows = Iterator.continually(rs)
        .takeWhile(_.next())
        .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
        .toList
      assert(rows === List((1L, 10L, 2L, 3.0), (2L, 10L, 1L, 3.0),
        (2L, 20L, 1L, 4.0)))
    } finally c2.close()
  }
}

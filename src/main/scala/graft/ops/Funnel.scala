package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Three-step funnel analysis — per key, the earliest ordered chain
  * `s1 → s2 → s3` with the final step inside `horizonSec` of the first:
  * `t1 = min t(s1)`, `t2 = min t(s2) ≥ t1`, `t3 = min t(s3) ≥ t2 ∧ ≤ t1 +
  * horizon` (the standard conversion-funnel semantics; a lightweight
  * MATCH_RECOGNIZE). One row per key that entered the funnel, with the
  * deepest step reached and the conversion duration.
  *
  * Shape: three chained min-over-partition windows on ONE hash
  * partitioning (no orderBy — whole-partition frames, so no per-key
  * sort), then a per-key aggregate. All comparisons run on epoch micros
  * (exact integer arithmetic; oracle-identical). At 100 TB this is one
  * Exchange of the events table + pipelined window passes — no self-joins
  * (the naive per-step join chain would shuffle the table once per step).
  */
object Funnel {

  def threeStep(events: DataFrame, key: String, time: String, typeCol: String,
                s1: String, s2: String, s3: String,
                horizonSec: Long): DataFrame = {
    val w = Window.partitionBy(col(key))
    val hUs = horizonSec * 1000000L
    events
      .withColumn("__us", unix_micros(col(time)))
      .withColumn("t1",
        min(when(col(typeCol) === s1, col("__us"))).over(w))
      .withColumn("t2",
        min(when(col(typeCol) === s2 && col("__us") >= col("t1"), col("__us"))).over(w))
      .withColumn("t3",
        min(when(col(typeCol) === s3 && col("__us") >= col("t2") &&
          col("__us") <= col("t1") + lit(hUs), col("__us"))).over(w))
      .groupBy(col(key))
      .agg(min(col("t1")).as("u1"), min(col("t2")).as("u2"), min(col("t3")).as("u3"))
      .filter(col("u1").isNotNull)
      .select(col(key),
        when(col("u3").isNotNull, lit(3))
          .when(col("u2").isNotNull, lit(2)).otherwise(lit(1)).as("reached"),
        timestamp_micros(col("u1")).as(s"t_$s1"),
        timestamp_micros(col("u2")).as(s"t_$s2"),
        timestamp_micros(col("u3")).as(s"t_$s3"),
        (col("u3") - col("u1")).as("conversion_us"))
  }

  /** DuckDB twin of [[threeStep]] (same chained windows, same micros). */
  def threeStepSql(table: String, key: String, time: String, typeCol: String,
                   s1: String, s2: String, s3: String,
                   horizonSec: Long): String = {
    val hUs = horizonSec * 1000000L
    s"""WITH e AS (
  SELECT $key, epoch_us($time) AS us, $typeCol AS typ FROM $table
), w1 AS (
  SELECT *, min(CASE WHEN typ = '$s1' THEN us END) OVER (PARTITION BY $key) AS t1 FROM e
), w2 AS (
  SELECT *, min(CASE WHEN typ = '$s2' AND us >= t1 THEN us END)
              OVER (PARTITION BY $key) AS t2 FROM w1
), w3 AS (
  SELECT *, min(CASE WHEN typ = '$s3' AND us >= t2 AND us <= t1 + $hUs THEN us END)
              OVER (PARTITION BY $key) AS t3 FROM w2
), agg AS (
  SELECT $key, min(t1) AS u1, min(t2) AS u2, min(t3) AS u3
  FROM w3 GROUP BY $key
)
SELECT $key,
       CASE WHEN u3 IS NOT NULL THEN 3
            WHEN u2 IS NOT NULL THEN 2 ELSE 1 END AS reached,
       make_timestamp(u1) AS "t_$s1",
       make_timestamp(u2) AS "t_$s2",
       make_timestamp(u3) AS "t_$s3",
       u3 - u1 AS conversion_us
FROM agg WHERE u1 IS NOT NULL"""
  }
}

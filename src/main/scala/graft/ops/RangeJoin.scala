package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bucketed range (interval) join — pair every probe row with the build
  * rows of the same key whose time falls in
  * `[probe.time + lowerSec, probe.time + upperSec)`.
  *
  * Spark's planner turns a raw `a.k = b.k AND b.t BETWEEN …` join into a
  * per-key nested-loop (every probe row scans every build row of its key)
  * — quadratic in the hot keys and hopeless at 100 TB. This operator makes
  * the time dimension join-able: build rows are assigned to fixed-width
  * time buckets (width = the interval span), probe rows are exploded to
  * the ≤ 2 buckets their interval can overlap, and the join becomes a
  * plain equi-join on (key, bucket) + a residual range filter — hash
  * join, partial aggregation, AQE skew handling all apply as usual. Each
  * build row lives in exactly ONE bucket, so no post-join dedup is needed;
  * the probe-side explosion is bounded by span/width + 1 = 2 rows.
  *
  * Comparisons run on the raw timestamps (microsecond-exact), buckets are
  * only a partitioning device — so the result is bit-identical to the
  * naive inequality join the DuckDB oracle runs.
  */
object RangeJoin {

  /** Inner pairs: probe.* ++ renamed build columns.
    *
    * @param buildCols build-side column → output name (must not collide
    *                  with probe columns). */
  def pairs(probe: DataFrame, build: DataFrame, keys: Seq[String],
            probeTime: String, buildTime: String,
            lowerSec: Long, upperSec: Long,
            buildCols: Seq[(String, String)]): DataFrame = {
    require(upperSec > lowerSec, "empty interval")
    val outNames = buildCols.map(_._2)
    require(outNames.intersect(probe.columns.toSeq).isEmpty,
      s"build output names ${outNames.intersect(probe.columns.toSeq)} collide with probe columns")
    val widthUs = (upperSec - lowerSec) * 1000000L

    // All bounds in epoch MICROSECONDS (long): timestamps are micros
    // underneath, so a whole-second shift and the [lo, hi) comparison are
    // exact integer arithmetic — bit-identical to the oracle's
    // `b.ts >= a.ts - INTERVAL ...` timestamp comparison.
    val keyCols: Seq[Column] = keys.map(col)
    val b = build.select(
      keyCols ++ Seq(unix_micros(col(buildTime)).as("__bt")) ++
        buildCols.map { case (c, o) => col(c).as(o) }: _*)
      .withColumn("__bucket", floor(col("__bt") / widthUs))
    val p = probe
      .withColumn("__lo", unix_micros(col(probeTime)) + lit(lowerSec * 1000000L))
      .withColumn("__hi", unix_micros(col(probeTime)) + lit(upperSec * 1000000L))
      .withColumn("__bucket", explode(sequence(
        floor(col("__lo") / widthUs),
        floor((col("__hi") - 1) / widthUs))))

    p.join(b, keys :+ "__bucket")
      .filter(col("__bt") >= col("__lo") && col("__bt") < col("__hi"))
      .drop("__lo", "__hi", "__bucket", "__bt")
  }
}

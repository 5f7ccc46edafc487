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

  /** Interval×interval OVERLAP join — pair every left interval with the
    * right intervals of the same key that overlap it (half-open
    * `[lo, hi)` semantics), emitting the exact overlap length in
    * microseconds as `overlap_us`.
    *
    * Scale shape: both sides explode to the fixed-width buckets their
    * interval covers (⌈span/width⌉+1 rows — pick `widthSec` near the
    * typical interval length) and the join is a plain equi-join on
    * (key, bucket). An overlapping pair shares EVERY bucket the overlap
    * covers, so without care the pair would duplicate; the
    * start-bucket trick — keep the pair only in the bucket containing
    * `max(l.lo, r.lo)`, the overlap's first instant — makes each
    * surviving pair unique with NO post-join distinct (a distinct would
    * be a second shuffle of the full pair stream). Residual overlap
    * test + start-bucket test are exact integer micros, so results are
    * bit-identical to the oracle's naive inequality join.
    *
    * Intervals must be non-empty (hi > lo) — callers clamp point
    * intervals with a +1 µs end. */
  def overlap(left: DataFrame, right: DataFrame, keys: Seq[String],
              leftLo: String, leftHi: String,
              rightLo: String, rightHi: String,
              widthSec: Long, rightCols: Seq[(String, String)]): DataFrame = {
    require(widthSec > 0, "widthSec must be positive")
    val outNames = rightCols.map(_._2)
    require(outNames.intersect(left.columns.toSeq).isEmpty,
      s"right output names ${outNames.intersect(left.columns.toSeq)} collide with left columns")
    val w = widthSec * 1000000L
    val keyCols: Seq[Column] = keys.map(col)
    val l = left
      .withColumn("__llo", unix_micros(col(leftLo)))
      .withColumn("__lhi", unix_micros(col(leftHi)))
      .withColumn("__bucket", explode(sequence(
        floor(col("__llo") / w), floor((col("__lhi") - 1) / w))))
    val r = right.select(
      keyCols ++ Seq(unix_micros(col(rightLo)).as("__rlo"),
        unix_micros(col(rightHi)).as("__rhi")) ++
        rightCols.map { case (c, o) => col(c).as(o) }: _*)
      .withColumn("__bucket", explode(sequence(
        floor(col("__rlo") / w), floor((col("__rhi") - 1) / w))))
    l.join(r, keys :+ "__bucket")
      .filter(col("__llo") < col("__rhi") && col("__rlo") < col("__lhi"))
      .filter(floor(greatest(col("__llo"), col("__rlo")) / w) === col("__bucket"))
      .withColumn("overlap_us",
        least(col("__lhi"), col("__rhi")) - greatest(col("__llo"), col("__rlo")))
      .drop("__llo", "__lhi", "__rlo", "__rhi", "__bucket")
  }
}

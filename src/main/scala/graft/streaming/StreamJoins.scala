package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Stream-stream interval join — the Structured Streaming twin of the
  * batch [[graft.ops.RangeJoin]]: pair every probe row with same-key
  * build rows whose time falls in `[probe.t + lowerSec, probe.t +
  * upperSec)`.
  *
  * Both inputs must carry watermarks; Spark derives each side's state
  * retention from the interval bounds + watermark, so join state is
  * bounded by (rate × (watermark + interval span)) per side — the
  * classic bounded stream-stream join, never an unbounded buffer. In
  * batch the same expression is a plain inner join (Catalyst picks the
  * strategy); for large batch inputs prefer RangeJoin.pairs, whose
  * bucketed form avoids the per-key nested loop — StreamJoinsSpec proves
  * the two produce identical rows.
  */
object StreamJoins {

  /** Inner interval join: probe.* ++ renamed build columns (same contract
    * as RangeJoin.pairs). */
  def intervalJoin(probe: DataFrame, build: DataFrame, keys: Seq[String],
                   probeTime: String, buildTime: String,
                   lowerSec: Long, upperSec: Long,
                   buildCols: Seq[(String, String)]): DataFrame = {
    require(upperSec > lowerSec, "empty interval")
    val b = build.select(
      keys.map(c => col(c).as(s"__bk_$c")) ++
        Seq(col(buildTime).as("__bt")) ++
        buildCols.map { case (c, o) => col(c).as(o) }: _*)
    val keyEq: Column = keys.map(c => col(c) === col(s"__bk_$c")).reduce(_ && _)
    val range: Column =
      col("__bt") >= col(probeTime) + expr(s"INTERVAL $lowerSec seconds") &&
        col("__bt") < col(probeTime) + expr(s"INTERVAL $upperSec seconds")
    probe.join(b, keyEq && range, "inner")
      .drop((keys.map(c => s"__bk_$c") :+ "__bt"): _*)
  }
}

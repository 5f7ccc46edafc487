package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic (hash-based) sampling — the reproducible alternative to
  * `DataFrame.sample` for training-data curation: a row's fate depends
  * only on its key, never on RNG state, partition layout, task retries, or
  * cluster size. Re-running the pipeline — or running it in another engine
  * — selects the SAME rows, which is what makes held-out splits and
  * decontamination auditable at 100 TB.
  *
  * Mechanism: md5 of the key, compare the first 8 hex chars against
  * `floor(rate · 2³²)` rendered as 8 lower-case hex digits. Same-length
  * lower-case hex compares lexicographically exactly like the number it
  * encodes, and md5 is identical everywhere — so the DuckDB twin is the
  * same two function calls. No UDF, fully codegen'd, trivially pushed
  * past column pruning.
  */
object Sample {

  /** 8-hex-digit threshold for a sampling rate in [0, 1]. */
  def thresholdHex(rate: Double): String = {
    require(rate >= 0.0 && rate <= 1.0, s"rate $rate outside [0,1]")
    // rate 1.0 would need 9 digits; "g" sorts above every hex digit.
    if (rate >= 1.0) "g" else f"${math.floor(rate * 4294967296.0).toLong}%08x"
  }

  /** Uniform Bernoulli keep-filter at `rate` keyed on `key`. */
  def hashFilter(key: Column, rate: Double): Column =
    substring(md5(key.cast("string").cast("binary")), 1, 8) < lit(thresholdHex(rate))

  /** Stratified sample: per-stratum rates, keyed deterministically. */
  def stratified(df: DataFrame, key: Column, stratum: Column,
                 rates: Map[String, Double], defaultRate: Double): DataFrame = {
    val threshold = rates.foldLeft(lit(thresholdHex(defaultRate))) {
      case (acc, (value, rate)) =>
        when(stratum === value, lit(thresholdHex(rate))).otherwise(acc)
    }
    df.filter(substring(md5(key.cast("string").cast("binary")), 1, 8) < threshold)
  }

  // -------------------------------------------------------------------
  // DuckDB twins (same md5 prefix, same thresholds).
  // -------------------------------------------------------------------

  def hashFilterSql(keyExpr: String, rate: Double): String =
    s"substr(md5(CAST($keyExpr AS VARCHAR)), 1, 8) < '${thresholdHex(rate)}'"

  def stratifiedSql(keyExpr: String, stratumExpr: String,
                    rates: Map[String, Double], defaultRate: Double): String = {
    val cases = rates.toSeq.sortBy(_._1)
      .map { case (v, r) => s"WHEN $stratumExpr = '$v' THEN '${thresholdHex(r)}'" }
      .mkString(" ")
    s"substr(md5(CAST($keyExpr AS VARCHAR)), 1, 8) < " +
      s"(CASE $cases ELSE '${thresholdHex(defaultRate)}' END)"
  }
}

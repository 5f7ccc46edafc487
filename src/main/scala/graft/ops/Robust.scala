package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Robust (median/MAD-based) outlier detection — the heavy-tailed-safe
  * sibling of the z-score `outliers` query (a single wild tick inflates
  * mean and stddev enough to mask itself; the median absolute deviation
  * does not break down until half the data is corrupt).
  *
  * Exactness: both medians are percentile_disc picks (row_number =
  * ceil(n/2) selects a REAL input value under a fully tie-broken order —
  * no interpolation arithmetic), deviations are single IEEE subtractions,
  * and the final z is one subtraction + one division — every step
  * correctly rounded, hence engine-identical.
  *
  * Scale shape: two ranked window passes over the same
  * (key)-partitioning (median, then median-of-deviations) + two broadcast
  * joins of per-key scalars. The sorts are the cost; at 100 TB swap the
  * disc-median picks for `approx_percentile` when ulp-exact cutoffs
  * aren't required — the shape stays identical.
  */
object Robust {

  /** Rows whose |x − median| / MAD exceeds `cutoff`, with the per-key
    * median/MAD attached. `idCols` provide the deterministic tie-break
    * for both ranked passes. */
  def madOutliers(df: DataFrame, keyCol: String, valCol: String,
                  idCols: Seq[String], cutoff: Double = 3.0): DataFrame = {
    val byKey = Window.partitionBy(col(keyCol))
    def discMedian(in: DataFrame, c: String, out: String): DataFrame = {
      val w = byKey.orderBy(col(c) +: idCols.map(col): _*)
      in.withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(byKey))
        .groupBy(col(keyCol))
        .agg(max(when(col("rn") === ceil(col("n") / 2), col(c))).as(out))
    }
    val med = discMedian(df, valCol, "med")
    val withDev = df.join(broadcast(med), Seq(keyCol))
      .withColumn("dev", abs(col(valCol) - col("med")))
    val mad = discMedian(withDev, "dev", "mad")
    withDev.join(broadcast(mad), Seq(keyCol))
      .withColumn("z_mad",
        when(col("mad") > 0d, (col(valCol) - col("med")) / col("mad")))
      .filter(abs(col("z_mad")) > cutoff)
  }

  /** DuckDB twin of [[madOutliers]] (same rank-at-ceil(n/2) picks, same
    * tie-break columns, same finishing sequence). */
  def madOutliersSql(table: String, keyCol: String, valCol: String,
                     idCols: Seq[String], cutoff: Double = 3.0): String = {
    val ids = idCols.mkString(", ")
    s"""WITH base AS (
  SELECT * FROM $table
), med AS (
  SELECT $keyCol, max(CASE WHEN rn = ceil(n / 2) THEN $valCol END) AS med
  FROM (SELECT $keyCol, $valCol,
          row_number() OVER (PARTITION BY $keyCol ORDER BY $valCol, $ids) AS rn,
          count(*) OVER (PARTITION BY $keyCol) AS n
        FROM base)
  GROUP BY $keyCol
), dev AS (
  SELECT b.*, m.med, abs(b.$valCol - m.med) AS dev
  FROM base b JOIN med m USING ($keyCol)
), mad AS (
  SELECT $keyCol, max(CASE WHEN rn = ceil(n / 2) THEN dev END) AS mad
  FROM (SELECT $keyCol, dev,
          row_number() OVER (PARTITION BY $keyCol ORDER BY dev, $ids) AS rn,
          count(*) OVER (PARTITION BY $keyCol) AS n
        FROM dev)
  GROUP BY $keyCol
)
SELECT d.*, a.mad,
       CASE WHEN a.mad > 0 THEN (d.$valCol - d.med) / a.mad END AS z_mad
FROM dev d JOIN mad a USING ($keyCol)
WHERE abs(CASE WHEN a.mad > 0 THEN (d.$valCol - d.med) / a.mad END) > $cutoff"""
  }
}

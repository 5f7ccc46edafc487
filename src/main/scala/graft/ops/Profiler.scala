package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Table profiling — the data-quality pass a training pipeline runs
  * before ingesting a new source: per column, row/null/distinct counts
  * and lexicographic min/max. Columns are unpivoted map-side (explode of
  * a literal struct array — no shuffle until the final per-column
  * aggregate, whose cardinality is #columns) so one scan profiles every
  * column; COUNT(DISTINCT) plans as partial dedup + final count per
  * column name. Values are profiled as strings: integer and string
  * columns render identically in every engine (doubles would not — keep
  * them out or pre-snap them).
  */
object Profiler {

  def stringProfile(df: DataFrame, cols: Seq[String]): DataFrame =
    df.select(explode(array(cols.map(c =>
        struct(lit(c).as("col_name"), col(c).cast("string").as("val"))): _*)).as("p"))
      .select(col("p.col_name").as("col_name"), col("p.val").as("val"))
      .groupBy(col("col_name"))
      .agg(count(lit(1)).as("n_rows"),
        count(when(col("val").isNull, 1)).as("n_nulls"),
        countDistinct(col("val")).as("n_distinct"),
        min(col("val")).as("min_val"),
        max(col("val")).as("max_val"))

  /** DuckDB twin of [[stringProfile]]. */
  def stringProfileSql(table: String, cols: Seq[String]): String = {
    val unpivot = cols.map(c =>
      s"SELECT '$c' AS col_name, CAST($c AS VARCHAR) AS val FROM $table")
      .mkString("\n  UNION ALL\n  ")
    s"""SELECT col_name, count(*) AS n_rows,
       count(CASE WHEN val IS NULL THEN 1 END) AS n_nulls,
       count(DISTINCT val) AS n_distinct,
       min(val) AS min_val, max(val) AS max_val
FROM (
  $unpivot)
GROUP BY col_name"""
  }
}

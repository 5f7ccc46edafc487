package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cohort retention — the activity matrix (cohort day × day offset →
  * distinct active users) behind every retention curve: a user's cohort
  * is the UTC day of their first event; each later event lands in the
  * (cohort, offset) cell of its own day.
  *
  * Shape: one min-over-partition window on the user hash partitioning
  * (no sort — whole-partition frame) to find first-event time, pure
  * integer day arithmetic on epoch micros (engine-exact), then one
  * aggregate with COUNT(DISTINCT user) per cell. Two exchanges total
  * (user partitioning, then cell aggregation) regardless of data size.
  */
object Retention {

  private val DayUs = 86400000000L

  def matrix(events: DataFrame, key: String, time: String): DataFrame = {
    val w = Window.partitionBy(col(key))
    events
      .withColumn("__us", unix_micros(col(time)))
      .withColumn("__first", min(col("__us")).over(w))
      .withColumn("__cohort_day", expr(s"__first div $DayUs"))
      .withColumn("day_offset", expr(s"__us div $DayUs") - col("__cohort_day"))
      .groupBy(timestamp_micros(col("__cohort_day") * lit(DayUs)).as("cohort_day"),
        col("day_offset"))
      .agg(countDistinct(col(key)).as("n_users"), count(lit(1)).as("n_events"))
  }

  /** DuckDB twin of [[matrix]] (same integer day arithmetic). */
  def matrixSql(table: String, key: String, time: String): String =
    s"""WITH e AS (
  SELECT $key AS k, epoch_us($time) AS us,
         min(epoch_us($time)) OVER (PARTITION BY $key) AS first_us
  FROM $table
)
SELECT make_timestamp((first_us // $DayUs) * $DayUs) AS cohort_day,
       (us // $DayUs) - (first_us // $DayUs) AS day_offset,
       count(DISTINCT k) AS n_users, count(*) AS n_events
FROM e GROUP BY 1, 2"""
}

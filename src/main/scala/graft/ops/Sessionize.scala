package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sessionization — event streams grouped into per-key activity sessions
  * split on inactivity gaps. The reference uses only tumbling windows
  * (SURVEY T9 notes sessions as an available-but-unused Spark
  * capability); training-data pipelines need this shape constantly
  * (user sessions, document bursts, crawl visits).
  *
  * Implementation: native `session_window` (Spark ≥3.2) — state-merged
  * sessions in one shuffle on (key, overlapping-window merge), identical
  * semantics batch and streaming (with a watermark upstream in
  * streaming). Session end = last event + gap, Spark's convention; a new
  * session starts when the gap to the previous event EXCEEDS `gap` — an
  * event exactly `gap` after the previous one still merges (Spark
  * session_window treats the per-event window [t, t+gap] as CLOSED when
  * merging: probed empirically, and caught at the zipf 100× tier, where
  * the replica shift of span+1day manufactures exact-gap successors that
  * a `>=` gaps-and-islands twin split 9 times out of 976k sessions —
  * round 13. The oracle twin below therefore splits on `diff > gap`.)
  */
object Sessionize {

  /** Det grid for session value sums. Scale 4 (not 9): Det.sumD's
    * long-grid envelope needs Σ|value|·10^s < 2^63 (Det rule 3; and with
    * the signedDblSql oracle cast the full range is bit-safe even for
    * negative-capable sums), and a long inactivity gap can merge an entire
    * key's history into ONE session — scale 4 holds to Σ|value| < 9e14
    * (~9e12 rows of price≈100), five orders more headroom than scale 9.
    * The query contract snaps outputs to 6 dp anyway, so a 1e-4 sum grid
    * loses nothing visible. */
  val SumScale: Int = 4

  /** Per-key sessions over an event-time column: (key, session_start,
    * session_end, n_events, value Det-sum). */
  def apply(events: DataFrame, keyCol: String, timeCol: String,
            valueCol: String, gap: String = "30 minutes"): DataFrame =
    events
      .groupBy(col(keyCol), session_window(col(timeCol), gap).as("w"))
      .agg(
        count(lit(1)).as("n_events"),
        Det.sumD(col(valueCol), SumScale).as("total_value"))
      .select(
        col(keyCol),
        col("w.start").as("session_start"),
        col("w.end").as("session_end"),
        col("n_events"), col("total_value"))

  /** DuckDB twin: gaps-and-islands with the same boundary rule
    * (split when diff > gap — Spark's closed-interval merge, see the
    * object scaladoc; end = last event + gap). */
  def sql(table: String, keyCol: String, timeCol: String,
          valueCol: String, gapSql: String = "INTERVAL '30 minutes'"): String =
    s"""WITH marked AS (
  SELECT $keyCol, $timeCol, $valueCol,
         CASE WHEN lag($timeCol) OVER (PARTITION BY $keyCol ORDER BY $timeCol) IS NULL
                OR $timeCol - lag($timeCol) OVER (PARTITION BY $keyCol ORDER BY $timeCol) > $gapSql
              THEN 1 ELSE 0 END AS new_s
  FROM $table
), sessions AS (
  SELECT *, sum(new_s) OVER (PARTITION BY $keyCol ORDER BY $timeCol
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM marked)
SELECT $keyCol,
       min($timeCol) AS session_start,
       max($timeCol) + $gapSql AS session_end,
       count(*) AS n_events,
       ${Det.sumDSql(valueCol, SumScale)} AS total_value
FROM sessions
GROUP BY $keyCol, sid"""
}

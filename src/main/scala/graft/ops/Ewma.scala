package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Per-key exponential moving average — the sequential fold
  * `s ← x·α + s·(1−α)` seeded with the first observation, in event-time
  * order. The one genuinely order-dependent recurrence in the toolkit, so
  * its distribution story is explicit:
  *
  *   - repartition by key, sortWithinPartitions by (key, time, seq),
  *     then ONE pass over each partition's sorted run — keys are
  *     contiguous, so per-key state is a single accumulator, never a
  *     buffered group. This is the secondary-sort pattern: at 100 TB a
  *     key's full history streams through the external sort, not through
  *     executor memory.
  *   - determinism: the fold applies the exact same IEEE expression
  *     (x·α + s·(1−α), α an exact binary fraction like 0.125) in the
  *     exact same total order (time, seq) — so any engine replaying the
  *     fold, including the DuckDB `list_reduce` oracle twin, produces
  *     identical bits. No Det grid needed: there is no reordering to
  *     defend against.
  *
  * Emits one row per key: (key, n_ticks, ewma).
  */
object Ewma {

  def finalPerKey(ticks: DataFrame, key: String, time: String, seq: String,
                  value: String, alpha: Double = 0.125): DataFrame = {
    val spark = ticks.sparkSession
    import spark.implicits._
    val a = alpha
    val b = 1.0 - alpha // 0.875 for the default: exact in binary
    ticks
      .select(col(key).cast("string"), col(time), col(seq).cast("long"),
        col(value).cast("double"))
      .as[(String, java.sql.Timestamp, Long, Double)]
      .repartition(col(key))
      .sortWithinPartitions(col(key), col(time), col(seq))
      .mapPartitions { it =>
        new Iterator[(String, Long, Double)] {
          private var cur: String = null
          private var n = 0L
          private var s = 0.0
          private var pending: Option[(String, Long, Double)] = None
          private var done = false
          private def roll(): Unit = {
            while (pending.isEmpty && it.hasNext) {
              val (k, _, _, x) = it.next()
              if (cur == null) { cur = k; n = 1L; s = x }
              else if (k == cur) { n += 1L; s = x * a + s * b }
              else { pending = Some((cur, n, s)); cur = k; n = 1L; s = x }
            }
            if (pending.isEmpty && !it.hasNext && cur != null && !done) {
              pending = Some((cur, n, s)); done = true
            }
          }
          def hasNext: Boolean = { roll(); pending.nonEmpty }
          def next(): (String, Long, Double) = {
            roll(); val r = pending.get; pending = None; r
          }
        }
      }
      .toDF(key, "n_ticks", "ewma")
  }

  /** DuckDB twin: ordered list + list_reduce replays the identical IEEE
    * fold (first element seeds the accumulator, like finalPerKey). */
  def finalPerKeySql(table: String, key: String, time: String, seq: String,
                     value: String, alpha: Double = 0.125): String =
    s"""SELECT $key, CAST(len(xs) AS BIGINT) AS n_ticks,
       list_reduce(xs, (s, x) -> x * CAST($alpha AS DOUBLE) + s * CAST(${1.0 - alpha} AS DOUBLE)) AS ewma
FROM (SELECT $key, list(CAST($value AS DOUBLE) ORDER BY $time, $seq) AS xs
      FROM $table GROUP BY $key)"""
}

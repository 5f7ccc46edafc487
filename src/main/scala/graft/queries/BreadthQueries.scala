package graft.queries

import graft.ops.Det
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational / windowing breadth beyond the reference's SQL surface:
  * CUBE grouping sets, multi-aggregate PIVOT, ranking window functions,
  * DISTINCT aggregates, semi/anti joins, RANGE-interval frames, JSON
  * extraction, and sliding (hopping) event-time windows. The reference
  * has none of these (SURVEY §2.4 "no grouping sets", §2.5 "no ranking
  * functions / no RANGE frames", §2.7 "only UNION ALL") — they are the
  * standard analytics toolkit a Spark user expects, so each lands here
  * as a contract query with a DuckDB oracle twin.
  *
  * Scale notes per query are on each builder; the common theme: every
  * query below is a single-shuffle plan (one Exchange for the agg or
  * window, plus AQE) over a pruned parquet scan.
  */
object BreadthQueries {

  import TickQueries.r6

  private def s6(x: String): String = Det.snapSql(x, 6)

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** events.parquet in its native shape (TIMESTAMP(NANOS) → micros). */
  private def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.conf.set("spark.sql.session.timeZone", "UTC") // NTZ cast is zone-sensitive
    val raw = s.read.parquet(s"$dir/events.parquet")
    val eventTime =
      if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
        expr("timestamp_micros(ts div 1000)")
      else col("ts").cast("timestamp")
    raw.select(col("event_id"), eventTime.as("ts"), col("user_id"),
      col("event_type"), col("value"), col("props"))
  }

  /** CUBE over (returnflag, linestatus): all 4 grouping sets in one pass
    * — Spark expands the sets map-side and aggregates once (one
    * Exchange). Envelope: Σ|extendedprice|·10² ≈ 6e13 at sf1, well under
    * 2^53. */
  private def cube2(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
        Det.sumD(col("l_quantity"), 2).as("sum_qty"),
        Det.sumD(col("l_extendedprice"), 2).as("sum_price"))

  /** Multi-aggregate PIVOT: order count + revenue per status, priorities
    * as columns. Explicit value list keeps the plan a single pass (no
    * distinct-values pre-query) — exactly what you want at 100 TB. */
  private val priorities =
    Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
  private def pivotOrders(s: SparkSession, d: String): DataFrame = {
    val p = t(s, d, "orders")
      .groupBy(col("o_orderstatus"))
      .pivot("o_orderpriority", priorities)
      .agg(count(lit(1)).as("n"), Det.sumD(col("o_totalprice"), 2).as("rev"))
    // An empty (status, priority) cell is NULL in pivot output but 0 under
    // the oracle's FILTERed aggregates — normalize to 0 / 0.0.
    p.select(col("o_orderstatus") +: priorities.flatMap { pr =>
      Seq(coalesce(col(s"`${pr}_n`"), lit(0L)).as(s"${pr}_n"),
        coalesce(col(s"`${pr}_rev`"), lit(0.0)).as(s"${pr}_rev"))
    }: _*)
  }

  /** Ranking window functions over customers per market segment: rank,
    * dense_rank, ntile, lead, percent_rank, cume_dist. Deterministic
    * total order (acctbal desc, custkey) so every engine agrees; the
    * ratio outputs are exact small-integer divisions, identical in IEEE
    * everywhere. One Exchange + Sort. */
  private def windowRank(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    t(s, d, "customer")
      .withColumn("rk", rank().over(w))
      .withColumn("drk", dense_rank().over(w))
      .withColumn("qtile", ntile(4).over(w))
      .withColumn("next_bal", lead(col("c_acctbal"), 1).over(w))
      .withColumn("prk", percent_rank().over(w))
      .withColumn("cd", cume_dist().over(w))
      .select(col("c_mktsegment"), col("c_custkey"), col("c_acctbal"),
        col("rk"), col("drk"), col("qtile"), col("next_bal"), col("prk"), col("cd"))
  }

  /** DISTINCT aggregates: distinct suppliers/parts per return flag.
    * Spark plans each COUNT(DISTINCT) as partial dedup + final count
    * (Expand + two-phase agg) — no driver-side distinct. */
  private def distinctAgg(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("l_suppkey")).as("n_supp"),
        countDistinct(col("l_partkey")).as("n_part"),
        min(col("l_shipdate")).as("first_ship"),
        max(col("l_shipdate")).as("last_ship"))

  /** LEFT SEMI + LEFT ANTI joins: customers with / without open orders.
    * Both sides shuffle on the key once; semi/anti never materialize the
    * payload of the right side (existence bit only) — the 100 TB-safe
    * way to express EXISTS/NOT IN. */
  private def semiAnti(s: SparkSession, d: String): DataFrame = {
    val cust = t(s, d, "customer")
    val open = t(s, d, "orders").filter(col("o_orderstatus") === "O")
      .select(col("o_custkey"))
    cust.join(open, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name")).withColumn("tag", lit("has_open"))
      .unionByName(
        cust.join(open, col("c_custkey") === col("o_custkey"), "left_anti")
          .select(col("c_custkey"), col("c_name")).withColumn("tag", lit("no_open")))
  }

  /** RANGE frame on event time: per user, count + sum of activity in the
    * trailing hour [t−1h, t] — a time-based frame (peers included), not
    * a row-count frame. Runs on epoch micros so the bounds are exact
    * integer arithmetic in both engines. One Exchange + Sort per key;
    * state is the frame, bounded by rate × 1 h regardless of total data
    * size. */
  private def rangeFrame(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("__us"))
      .rangeBetween(-3600000000L, 0L)
    events(s, d)
      .withColumn("__us", unix_micros(col("ts")))
      .withColumn("n_1h", count(lit(1)).over(w))
      .withColumn("sum_1h", Det.sumD(col("value"), 4, w))
      .select(col("event_id"), col("user_id"), col("ts"), col("n_1h"), col("sum_1h"))
  }

  /** JSON extraction from the raw `props` payload — get_json_object is
    * codegen'd string traversal, no UDF, fully distributed; the exact
    * integer SUM keeps the oracle comparison bit-free. */
  private def jsonExtract(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy(col("event_type"))
      .agg(count(col("k")).as("n"), sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"))

  /** Sliding (hopping) windows: 10-minute windows every 5 minutes over
    * the event stream — each row lands in exactly 2 windows. Spark's
    * `window(slide)` expands rows map-side then aggregates once; the
    * oracle mirrors the expansion with unnest over the 2 aligned window
    * starts. Same primitive drives streaming hopping aggregations. */
  private def slidingWindows(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(window(col("ts"), "10 minutes", "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), Det.sumD(col("value"), 4).as("sum_value"))
      .select(col("window.start").as("w_start"), col("window.end").as("w_end"),
        col("event_type"), col("n"), col("sum_value"))

  /** FULL OUTER join: per-user purchase totals vs error counts — users
    * exist on either side alone, so both null-extension directions are
    * exercised. Both inputs are pre-aggregated (one row per user) BEFORE
    * the join: at 100 TB you full-outer-join the small aggregated
    * keyspaces, never the raw fact streams. */
  private def fullOuter(s: SparkSession, d: String): DataFrame = {
    val ev = AnalyticsQueries.events(s, d)
    val buys = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"))
      .agg(Det.sumD(col("value"), 4).as("total_purchase"),
        count(lit(1)).as("n_purchases"))
    val errs = ev.filter(col("event_type") === "error")
      .groupBy(col("user_id")).agg(count(lit(1)).as("n_errors"))
    buys.join(errs, Seq("user_id"), "full_outer")
      .select(col("user_id"),
        coalesce(col("total_purchase"), lit(0.0)).as("total_purchase"),
        coalesce(col("n_purchases"), lit(0L)).as("n_purchases"),
        coalesce(col("n_errors"), lit(0L)).as("n_errors"),
        when(col("n_purchases").isNull, lit("errors_only"))
          .when(col("n_errors").isNull, lit("purchases_only"))
          .otherwise(lit("both")).as("tag"))
  }

  private val fullOuterSql =
    s"""WITH buys AS (
  SELECT user_id, ${Det.sumDSql("value", 4)} AS total_purchase,
         count(*) AS n_purchases
  FROM events WHERE event_type = 'purchase' GROUP BY user_id
), errs AS (
  SELECT user_id, count(*) AS n_errors
  FROM events WHERE event_type = 'error' GROUP BY user_id)
SELECT coalesce(b.user_id, e.user_id) AS user_id,
       ${s6("coalesce(b.total_purchase, 0.0)")} AS total_purchase,
       coalesce(b.n_purchases, 0) AS n_purchases,
       coalesce(e.n_errors, 0) AS n_errors,
       CASE WHEN b.n_purchases IS NULL THEN 'errors_only'
            WHEN e.n_errors IS NULL THEN 'purchases_only'
            ELSE 'both' END AS tag
FROM buys b FULL OUTER JOIN errs e ON b.user_id = e.user_id"""

  /** Sliding-window DISTINCT cardinality: unique active users per
    * 1-hour window hopping every 30 minutes. The map-side window
    * expansion (each row → its exactly-2 windows) happens BEFORE the
    * distinct aggregate, so Spark's two-phase distinct (partial dedup on
    * (window, user), then count) bounds the shuffle at unique pairs. At
    * 100 TB swap count_distinct for the HLL sketch in ops/Approx when
    * exactness isn't contractual. */
  private def slidingDistinct(s: SparkSession, d: String): DataFrame =
    AnalyticsQueries.events(s, d)
      .groupBy(window(col("ts"), "1 hour", "30 minutes"))
      .agg(countDistinct(col("user_id")).as("n_users"),
        count(lit(1)).as("n_events"))
      .select(col("window.start").as("w_start"), col("window.end").as("w_end"),
        col("n_users"), col("n_events"))

  private val slidingDistinctSql =
    s"""WITH expanded AS (
  SELECT make_timestamp(ws_us) AS w_start,
         make_timestamp(ws_us + 3600000000) AS w_end,
         user_id
  FROM (SELECT unnest([(epoch_us(ts) // 1800000000) * 1800000000,
                       (epoch_us(ts) // 1800000000) * 1800000000 - 1800000000]) AS ws_us,
               user_id
        FROM events))
SELECT w_start, w_end, count(DISTINCT user_id) AS n_users, count(*) AS n_events
FROM expanded GROUP BY 1, 2"""

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "rel_cube" -> ((s, d) => r6(cube2(s, d))),
    "rel_pivot" -> ((s, d) => r6(pivotOrders(s, d))),
    "rel_window_rank" -> ((s, d) => r6(windowRank(s, d))),
    "rel_distinct_agg" -> ((s, d) => distinctAgg(s, d)),
    "rel_semi_anti" -> ((s, d) => semiAnti(s, d)),
    "range_frame" -> ((s, d) => r6(rangeFrame(s, d))),
    "json_extract" -> ((s, d) => jsonExtract(s, d)),
    "sliding_windows" -> ((s, d) => r6(slidingWindows(s, d))),
    "rel_full_outer" -> ((s, d) => r6(fullOuter(s, d))),
    "sliding_distinct" -> ((s, d) => slidingDistinct(s, d))
  )

  private def pivotCols: String = priorities.map { p =>
    val filteredSum =
      s"(CAST(sum(${Det.klSql("o_totalprice", 2)}) FILTER (WHERE o_orderpriority = '$p') AS DOUBLE) / 1e2)"
    s"""count(*) FILTER (WHERE o_orderpriority = '$p') AS "${p}_n",
       ${s6(s"coalesce($filteredSum, 0.0)")} AS "${p}_rev""""
  }.mkString(",\n       ")

  def oracleSql: Map[String, String] = Map(
    "rel_cube" ->
      s"""SELECT l_returnflag, l_linestatus, count(*) AS n,
       ${s6(Det.sumDSql("l_quantity", 2))} AS sum_qty,
       ${s6(Det.sumDSql("l_extendedprice", 2))} AS sum_price
FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)""",
    "rel_pivot" ->
      s"""SELECT o_orderstatus,
       $pivotCols
FROM orders GROUP BY o_orderstatus""",
    "rel_window_rank" ->
      s"""SELECT c_mktsegment, c_custkey, ${s6("c_acctbal")} AS c_acctbal,
       rank() OVER w AS rk, dense_rank() OVER w AS drk,
       ntile(4) OVER w AS qtile,
       ${s6("lead(c_acctbal, 1) OVER w")} AS next_bal,
       ${s6("percent_rank() OVER w")} AS prk,
       ${s6("cume_dist() OVER w")} AS cd
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)""",
    "rel_distinct_agg" ->
      """SELECT l_returnflag, count(*) AS n_rows,
       count(DISTINCT l_suppkey) AS n_supp,
       count(DISTINCT l_partkey) AS n_part,
       min(l_shipdate) AS first_ship, max(l_shipdate) AS last_ship
FROM lineitem GROUP BY l_returnflag""",
    "rel_semi_anti" ->
      """SELECT c_custkey, c_name, 'has_open' AS tag FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
UNION ALL
SELECT c_custkey, c_name, 'no_open' AS tag FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderstatus = 'O')""",
    "range_frame" ->
      s"""SELECT event_id, user_id, ts,
       count(*) OVER w AS n_1h,
       ${s6(Det.sumDSql("value", 4, " OVER w"))} AS sum_1h
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL '1 hour' PRECEDING AND CURRENT ROW)""",
    "json_extract" ->
      """SELECT event_type,
       count(k) AS n, CAST(sum(k) AS BIGINT) AS sum_k,
       min(k) AS min_k, max(k) AS max_k
FROM (SELECT event_type,
        CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events)
GROUP BY event_type""",
    "sliding_windows" ->
      s"""WITH expanded AS (
  SELECT make_timestamp(ws_us) AS w_start,
         make_timestamp(ws_us + 600000000) AS w_end,
         event_type, value
  FROM (SELECT unnest([(epoch_us(ts) // 300000000) * 300000000,
                       (epoch_us(ts) // 300000000) * 300000000 - 300000000]) AS ws_us,
               event_type, value
        FROM events))
SELECT w_start, w_end, event_type, count(*) AS n,
       ${s6(Det.sumDSql("value", 4))} AS sum_value
FROM expanded GROUP BY 1, 2, 3""",
    "rel_full_outer" -> fullOuterSql,
    "sliding_distinct" -> slidingDistinctSql
  )
}

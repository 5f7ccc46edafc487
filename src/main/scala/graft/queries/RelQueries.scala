package graft.queries

import graft.ops.{Det, Hilbert, ZOrder}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational/serving queries over the TPC-H-ish tables, standing in for
  * the reference's control-plane SQL (SURVEY §2.3 J4 runs⨝strategies,
  * §2.4 A8 lifecycle summary, §2.6 top-k) plus a TPC-H-Q1-style pricing
  * aggregate that exercises the scan→filter→hash-agg path Bench cares
  * about.
  *
  * Scale notes: the dimension side of every join here (customer) is
  * explicitly broadcast — no shuffle of the fact table; aggregates are
  * partial/final hash aggregates with Det exact sums (prices live on the
  * cent grid, so scale-2 decimal sums are EXACT, not approximations).
  */
object RelQueries {

  import TickQueries.r6

  private def s6(x: String): String = Det.snapSql(x, 6)

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** J4-style run listing: fact ⨝ broadcast dimension. */
  private def runsJoin(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders")
      .join(broadcast(t(s, d, "customer")),
        col("o_custkey") === col("c_custkey"))
      .select(
        col("o_orderkey"), col("o_orderdate"), col("o_orderstatus"),
        col("o_totalprice"), col("c_custkey"), col("c_name"), col("c_mktsegment"))

  /** A8-style lifecycle summary: conditional count/min FILTER aggregates. */
  private def lifecycle(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_total"),
        count(when(col("o_orderstatus") === "O", lit(1))).as("n_open"),
        min(when(col("o_orderstatus") === "O", col("o_orderdate"))).as("first_open_date"),
        Det.sumD(col("o_totalprice"), 2).as("total_value"),
        Det.avgD(col("o_totalprice"), 2).as("avg_value"))

  /** TPC-H Q1-style pricing summary (filter → hash aggregate). */
  private def pricing(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .filter(expr("l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        Det.sumD(col("l_quantity"), 2).as("sum_qty"),
        Det.sumD(col("l_extendedprice"), 2).as("sum_base_price"),
        Det.sumD(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)
          .as("sum_disc_price"),
        Det.sumD(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
          * (lit(1.0) + col("l_tax")), 4).as("sum_charge"),
        Det.avgD(col("l_quantity"), 2).as("avg_qty"),
        Det.avgD(col("l_extendedprice"), 2).as("avg_price"),
        Det.avgD(col("l_discount"), 2).as("avg_disc"),
        count(lit(1)).as("count_order"))

  /** §2.6 serving top-k: revenue ranking with broadcast dim join. */
  private def topCustomers(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders")
      .groupBy(col("o_custkey"))
      .agg(Det.sumD(col("o_totalprice"), 2).as("revenue"),
        count(lit(1)).as("n_orders"))
      .join(broadcast(t(s, d, "customer")),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("revenue"), col("n_orders"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(10)

  /** 3-way join: fact⨝fact shuffle join on the key both sides can be
    * co-partitioned/bucketed on at scale, dimension broadcast on top. */
  private def revenueBySegment(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(t(s, d, "customer")), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"),
        date_trunc("month", col("o_orderdate")).as("order_month"))
      .agg(
        Det.sumD(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)
          .as("revenue"),
        count(lit(1)).as("n_items"))

  /** Star-schema join: fact (lineitem) ⨝ orders ⨝ customer with the two
    * snowflake dims (nation, region) BROADCAST — the canonical 100 TB
    * plan: the fact table shuffles only for the orderkey join, dims ride
    * along as broadcast hash joins, then one partial/final aggregate. */
  private def starJoin(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), year(col("o_orderdate")).as("order_year"))
      .agg(count(lit(1)).as("n_items"),
        Det.sumD(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4).as("revenue"))

  /** Correlated-scalar-subquery shape, decorrelated: orders strictly
    * above their OWN customer's Det-exact average price. The correlated
    * `o_totalprice > (SELECT avg(...) WHERE same customer)` becomes one
    * per-customer aggregate BROADCAST back onto the fact scan — the
    * fact table never shuffles, which is the only formulation that
    * survives 100 TB (Catalyst's subquery decorrelation produces the
    * same join; spelling it out keeps the broadcast explicit). The
    * comparison is raw-double vs Det-exact average — identical operand
    * bits in both engines, so the row set matches exactly. */
  private def aboveAvgOrders(s: SparkSession, d: String): DataFrame = {
    val perCust = t(s, d, "orders")
      .groupBy(col("o_custkey"))
      .agg(Det.avgD(col("o_totalprice"), 2).as("cust_avg"),
        count(lit(1)).as("n_orders"))
    t(s, d, "orders")
      .join(broadcast(perCust), "o_custkey")
      .filter(col("o_totalprice") > col("cust_avg"))
      .groupBy(col("o_custkey"), col("cust_avg"), col("n_orders"))
      .agg(count(lit(1)).as("n_above"),
        Det.sumD(col("o_totalprice"), 2).as("sum_above"))
      .select(col("o_custkey"), col("n_orders"), col("cust_avg"),
        col("n_above"), col("sum_above"))
  }

  private val aboveAvgOrdersSql =
    s"""WITH per AS (
  SELECT o_custkey, ${Det.avgDSql("o_totalprice", 2)} AS cust_avg,
         count(*) AS n_orders
  FROM orders GROUP BY o_custkey)
SELECT o.o_custkey, p.n_orders, ${s6("p.cust_avg")} AS cust_avg,
       count(*) AS n_above,
       ${s6(Det.sumDSql("o.o_totalprice", 2))} AS sum_above
FROM orders o JOIN per p ON o.o_custkey = p.o_custkey
WHERE o.o_totalprice > p.cust_avg
GROUP BY o.o_custkey, p.n_orders, p.cust_avg"""

  /** Z-order layout audit: Morton-interleave (custkey, order-day) and
    * group by coarse z-cell (high bits of the key). Each output row is
    * one 256×256 cell of the two-dimensional key space with its row
    * count and per-dimension min/max — exactly the file-level statistics
    * a z-ordered parquet layout would expose, demonstrating that BOTH
    * `o_custkey = ?` and order-date range predicates prune to a few
    * cells (ZOrder's scaladoc has the 100 TB layout argument). Pure
    * integer bit algebra end to end — no Det scaffolding needed. */
  private def zorderLayout(s: SparkSession, d: String): DataFrame = {
    val day = datediff(to_date(col("o_orderdate")), lit("1995-01-01")).cast("long")
    val z = ZOrder.zval(
      col("o_custkey").bitwiseAND(lit(65535L)),
      day.bitwiseAND(lit(65535L)))
    t(s, d, "orders")
      .select(z.as("z"), col("o_custkey"), day.as("day_idx"))
      .groupBy(shiftright(col("z"), 16).as("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("o_custkey")).as("min_cust"), max(col("o_custkey")).as("max_cust"),
        min(col("day_idx")).as("min_day"), max(col("day_idx")).as("max_day"),
        min(col("z")).as("z_min"), max(col("z")).as("z_max"))
  }

  /** Hilbert-curve layout audit — zorder_layout's stronger sibling on
    * the SAME (custkey, day) plane and the same bucket statistics, so
    * the two layouts read side by side (the Hilbert buckets' min/max
    * boxes are tighter — that is the whole point; see graft.ops.Hilbert
    * for why the walk can't be a sum of independent bit terms). Engine
    * side: compiled per-row bit kernel in a typed map (zero shuffle
    * before the bucket aggregate); oracle side: the same fold unrolled
    * into 16 chained CTE projections from the same constants. */
  private def hilbertLayout(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val day = datediff(to_date(col("o_orderdate")), lit("1995-01-01")).cast("long")
    val keyed = t(s, d, "orders")
      .select(col("o_custkey").bitwiseAND(lit(65535L)).as("x"),
        day.bitwiseAND(lit(65535L)).as("y"),
        col("o_custkey"), day.as("day_idx"))
      .as[(Long, Long, Long, Long)]
      .map { case (x, y, ck, di) => (Hilbert.d2(x, y, 16), ck, di) }
      .toDF("h", "o_custkey", "day_idx")
    keyed
      .groupBy(shiftright(col("h"), 16).as("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("o_custkey")).as("min_cust"), max(col("o_custkey")).as("max_cust"),
        min(col("day_idx")).as("min_day"), max(col("day_idx")).as("max_day"),
        min(col("h")).as("h_min"), max(col("h")).as("h_max"))
  }

  private val hilbertLayoutSql = {
    val day = "date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))"
    val bits = 16 // ONE constant drives the fold depth AND the final CTE
    s"""WITH d0 AS (
  SELECT o_custkey, CAST($day AS BIGINT) AS day_idx,
         (o_custkey & 65535) AS hx, (CAST($day AS BIGINT) & 65535) AS hy,
         CAST(0 AS BIGINT) AS hd
  FROM orders),
${Hilbert.dSqlCtes("d0", bits, Seq("o_custkey", "day_idx"))}
SELECT hd >> $bits AS bucket, count(*) AS n_rows,
       min(o_custkey) AS min_cust, max(o_custkey) AS max_cust,
       min(day_idx) AS min_day, max(day_idx) AS max_day,
       min(hd) AS h_min, max(hd) AS h_max
FROM h${bits - 1} GROUP BY 1"""
  }

  private val zorderLayoutSql = {
    val day = "date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))"
    s"""WITH d AS (
  SELECT o_custkey, CAST($day AS BIGINT) AS day_idx,
         (o_custkey & 65535) AS x, (CAST($day AS BIGINT) & 65535) AS y
  FROM orders),
z AS (
  SELECT CAST(${ZOrder.zvalSql("x", "y")} AS BIGINT) AS z, o_custkey, day_idx
  FROM d)
SELECT z >> 16 AS bucket, count(*) AS n_rows,
       min(o_custkey) AS min_cust, max(o_custkey) AS max_cust,
       min(day_idx) AS min_day, max(day_idx) AS max_day,
       min(z) AS z_min, max(z) AS z_max
FROM z GROUP BY 1"""
  }

  // bloom_prune profile (shared Spark/oracle constants): suppliers with
  // acctbal over the cut are the "small side", lineitem rows probe.
  private val BloomBalCut = 5000
  private val BloomBits = 4096
  private val BloomHashes = 3

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Bloom-filter semi-join prune with engine-portable md5 bits — the
    // runtime-filter pushdown audited end-to-end (BloomPrune scaladoc
    // has the one-scan/no-join shape and the no-false-negative proof).
    "bloom_prune" -> ((s, d) => graft.ops.BloomPrune.audit(
      t(s, d, "supplier").filter(col("s_acctbal") > BloomBalCut)
        .select(col("s_suppkey").as("k")),
      t(s, d, "lineitem").select(col("l_suppkey").as("k")),
      BloomBits, BloomHashes)),
    "zorder_layout" -> ((s, d) => zorderLayout(s, d)),
    "hilbert_layout" -> ((s, d) => hilbertLayout(s, d)),
    "scd2_intervals" -> ((s, d) => {
      // Slowly-changing-dimension (type 2) build from a change log:
      // per customer, collapse consecutive equal order statuses into
      // versioned validity intervals [valid_from, valid_to) — the
      // standard warehouse dimension-history transformation (the
      // relational cousin of signal_runs' gaps-and-islands). Both
      // windows and the island aggregate key on o_custkey, so the whole
      // build rides ONE keyed Exchange; all values are exact
      // (timestamps, ints, strings).
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val prev = lag(col("o_orderstatus"), 1).over(w)
      val marked = t(s, d, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          col("o_orderstatus"), col("o_orderdate"))
        .withColumn("chg",
          when(prev.isNull || prev =!= col("o_orderstatus"), 1).otherwise(0))
        .withColumn("ver", sum(col("chg")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val islands = marked
        .groupBy(col("o_custkey"), col("ver"), col("o_orderstatus"))
        .agg(min(col("o_orderdate")).as("valid_from"),
          count(lit(1)).as("n_orders"))
      islands
        .withColumn("valid_to", lead(col("valid_from"), 1).over(
          Window.partitionBy(col("o_custkey")).orderBy(col("ver"))))
        .select(col("o_custkey"), col("ver").cast("long").as("version"),
          col("o_orderstatus"), col("valid_from"), col("valid_to"),
          col("n_orders"))
    }),
    "rel_above_avg" -> ((s, d) => r6(aboveAvgOrders(s, d))),
    "rel_star_join" -> ((s, d) => r6(starJoin(s, d))),
    "rel_revenue_by_segment" -> ((s, d) => r6(revenueBySegment(s, d))),
    "rel_runs_join" -> ((s, d) => r6(runsJoin(s, d))),
    "rel_lifecycle" -> ((s, d) => r6(lifecycle(s, d))),
    "rel_pricing" -> ((s, d) => r6(pricing(s, d))),
    "rel_top_customers" -> ((s, d) => r6(topCustomers(s, d)))
  )

  def oracleSql: Map[String, String] = Map(
    "bloom_prune" -> graft.ops.BloomPrune.auditSql(
      s"SELECT DISTINCT s_suppkey AS k FROM supplier WHERE s_acctbal > $BloomBalCut",
      "SELECT l_suppkey AS k FROM lineitem",
      BloomBits, BloomHashes),
    "zorder_layout" -> zorderLayoutSql,
    "hilbert_layout" -> hilbertLayoutSql,
    "scd2_intervals" ->
      """WITH marked AS (
  SELECT o_custkey, o_orderkey, o_orderstatus, o_orderdate,
         CASE WHEN lag(o_orderstatus, 1) OVER w IS NULL
                OR lag(o_orderstatus, 1) OVER w <> o_orderstatus
              THEN 1 ELSE 0 END AS chg
  FROM orders
  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)),
vers AS (
  SELECT o_custkey, o_orderstatus, o_orderdate,
         sum(chg) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ver
  FROM marked),
islands AS (
  SELECT o_custkey, CAST(ver AS BIGINT) AS version, o_orderstatus,
         min(o_orderdate) AS valid_from, count(*) AS n_orders
  FROM vers GROUP BY 1, 2, 3)
SELECT o_custkey, version, o_orderstatus, valid_from,
       lead(valid_from, 1) OVER (PARTITION BY o_custkey ORDER BY version) AS valid_to,
       n_orders
FROM islands""",
    "rel_above_avg" -> aboveAvgOrdersSql,
    "rel_star_join" ->
      s"""SELECT r_name, CAST(year(o_orderdate) AS INT) AS order_year,
       count(*) AS n_items,
       ${s6(Det.sumDSql("l_extendedprice * (1.0 - l_discount)", 4))} AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY 1, 2""",
    "rel_revenue_by_segment" ->
      s"""SELECT c_mktsegment, date_trunc('month', o_orderdate) AS order_month,
       ${s6(Det.sumDSql("l_extendedprice * (1.0 - l_discount)", 4))} AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment, date_trunc('month', o_orderdate)""",
    "rel_runs_join" ->
      s"""SELECT o_orderkey, o_orderdate, o_orderstatus,
       ${s6("o_totalprice")} AS o_totalprice,
       c.c_custkey, c_name, c_mktsegment
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey""",
    "rel_lifecycle" ->
      s"""SELECT o_orderpriority,
       count(*) AS n_total,
       count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_open,
       min(CASE WHEN o_orderstatus = 'O' THEN o_orderdate END) AS first_open_date,
       ${s6(Det.sumDSql("o_totalprice", 2))} AS total_value,
       ${s6(Det.avgDSql("o_totalprice", 2))} AS avg_value
FROM orders GROUP BY o_orderpriority""",
    "rel_pricing" ->
      s"""SELECT l_returnflag, l_linestatus,
       ${s6(Det.sumDSql("l_quantity", 2))} AS sum_qty,
       ${s6(Det.sumDSql("l_extendedprice", 2))} AS sum_base_price,
       ${s6(Det.sumDSql("l_extendedprice * (1.0 - l_discount)", 4))} AS sum_disc_price,
       ${s6(Det.sumDSql("l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)", 4))} AS sum_charge,
       ${s6(Det.avgDSql("l_quantity", 2))} AS avg_qty,
       ${s6(Det.avgDSql("l_extendedprice", 2))} AS avg_price,
       ${s6(Det.avgDSql("l_discount", 2))} AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus""",
    "rel_top_customers" ->
      s"""SELECT c_custkey, c_name, ${s6("revenue")} AS revenue, n_orders
FROM (SELECT o_custkey, ${Det.sumDSql("o_totalprice", 2)} AS revenue,
             count(*) AS n_orders
      FROM orders GROUP BY o_custkey) r
JOIN customer c ON r.o_custkey = c.c_custkey
ORDER BY revenue DESC, c_custkey
LIMIT 10"""
  )
}

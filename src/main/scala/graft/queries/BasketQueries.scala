package graft.queries

import graft.ops.{Det, Ranks}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Retail-analytics operators: association-rule mining over order
  * baskets and RFM customer segmentation — standard product-analytics
  * families absent from the reference's SQL surface.
  *
  * - `market_basket`: frequent part PAIRS with support / confidence /
  *   lift. One grouped pass on the basket key (the CoOccur pattern)
  *   dedupes each basket and emits basket markers, distinct items, and
  *   ordered pairs in a single shuffle — no distinct, no self-join; the
  *   per-basket quadratic is bounded (≤13 items here, Σk² at scale).
  *   Pair support is one hash aggregate, and the item-frequency
  *   dictionary joins back by BROADCAST (it is item-dimension-sized,
  *   never fact-sized). Confidence and lift are single divisions of
  *   exact longs (< 2^53), bit-identical in every engine.
  * - `rfm_segments`: per-customer recency/frequency/monetary quintile
  *   scores. The aggregate is fact-side (one shuffle on customer); the
  *   three NTILE(5)s run through [[graft.ops.Ranks.ntileByRange]], which
  *   flips on plan stats: a dimension-sized customer frame takes the
  *   plain window form (one task, fastest for a frame that fits in one
  *   task), and past [[graft.ops.Ranks.DimensionBytes]] it switches to
  *   the range-partitioned two-pass global rank so a 100×-grown customer
  *   dimension never creates a straggler task — same bits either way.
  *   Monetary rides Det's exact grid; every rank order has a custkey
  *   tie-break so both engines bucket identically.
  */
object BasketQueries {

  import TickQueries.r6

  private def s6(x: String): String = Det.snapSql(x, 6)

  private val MinSupport = 2
  private val MonetaryScale = 2

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  // ------------------------------------------------------ market_basket

  /** Lazy basket-rules frame over the cached tagged-emission pass,
    * returned with the cache handle — the plan-inspection surface for
    * PlanShapeSpec (the contract query's eager checkpoint hides the
    * join shape behind an RDD scan, like GraphQueries.trianglesLazy). */
  private[graft] def marketBasketLazy(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    import s.implicits._
    // One pass over the fact table (the CoOccur.edges pattern): group by
    // basket, dedupe the part set in the group, and emit every datum the
    // query needs as tagged rows — kind 0 = one basket marker, kind 1 =
    // each distinct item, kind 2 = each ordered item pair. ONE Exchange
    // on l_orderkey replaces the previous distinct + co-partitioned
    // self-join (the distinct's fact-sized shuffle plus the join's two
    // repartitions); nOrders/itemCounts fold into the same pass instead
    // of re-aggregating the basket frame. Per-basket pair loop is a
    // per-record hot path → typed flatMapGroups (CLAUDE.md invariant 4),
    // quadratic only in basket size (≤13 items here; Σk² bounded at
    // scale, the CoOccur argument).
    val tagged = t(s, d, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (_, it) =>
        val items = it.map(_._2).toArray.distinct.sorted
        val out = new scala.collection.mutable.ArrayBuffer[(Int, Long, Long)](
          1 + items.length * (items.length + 1) / 2)
        out += ((0, 0L, 0L))
        var i = 0
        while (i < items.length) {
          out += ((1, items(i), 0L))
          var j = i + 1
          while (j < items.length) { out += ((2, items(i), items(j))); j += 1 }
          i += 1
        }
        out.iterator
      }
      .toDF("kind", "ka", "kb")
      .cache()
    val nOrders = tagged.filter(col("kind") === 0)
      .agg(count(lit(1)).as("n_orders"))
    val itemCounts = tagged.filter(col("kind") === 1)
      .groupBy(col("ka").as("l_partkey"))
      .agg(count(lit(1)).as("n_item"))
    val pairs = tagged.filter(col("kind") === 2)
      .groupBy(col("ka").as("part_a"), col("kb").as("part_b"))
      .agg(count(lit(1)).as("n_both"))
      .filter(col("n_both") >= MinSupport)
    val out = pairs
      .join(broadcast(itemCounts.select(col("l_partkey").as("part_a"),
        col("n_item").as("n_a"))), "part_a")
      .join(broadcast(itemCounts.select(col("l_partkey").as("part_b"),
        col("n_item").as("n_b"))), "part_b")
      .crossJoin(broadcast(nOrders))
      .select(col("part_a"), col("part_b"), col("n_both"), col("n_a"), col("n_b"),
        (col("n_both").cast("double") / col("n_a").cast("double")).as("confidence_ab"),
        ((col("n_orders") * col("n_both")).cast("double") /
          (col("n_a") * col("n_b")).cast("double")).as("lift"))
    (tagged, out)
  }

  private def marketBasket(s: SparkSession, d: String): DataFrame = {
    val (tagged, lazyOut) = marketBasketLazy(s, d)
    // Eager localCheckpoint (result is ≥MinSupport-thresholded pair-
    // dimension-sized) so the tagged cache can be released HERE instead
    // of leaking for the driver session's lifetime (CacheHygieneSpec).
    val out = lazyOut.localCheckpoint(true)
    tagged.unpersist(false)
    out
  }

  private val marketBasketSql =
    s"""WITH b AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
n AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM b),
ic AS (SELECT l_partkey, count(*) AS n_item FROM b GROUP BY 1),
p AS (
  SELECT a.l_partkey AS part_a, b2.l_partkey AS part_b, count(*) AS n_both
  FROM b a JOIN b b2 ON a.l_orderkey = b2.l_orderkey
                    AND a.l_partkey < b2.l_partkey
  GROUP BY 1, 2 HAVING count(*) >= $MinSupport)
SELECT part_a, part_b, n_both, ia.n_item AS n_a, ib.n_item AS n_b,
       ${s6("CAST(n_both AS DOUBLE) / CAST(ia.n_item AS DOUBLE)")} AS confidence_ab,
       ${s6("CAST(n.n_orders * n_both AS DOUBLE) / CAST(ia.n_item * ib.n_item AS DOUBLE)")} AS lift
FROM p JOIN ic ia ON p.part_a = ia.l_partkey
       JOIN ic ib ON p.part_b = ib.l_partkey
       CROSS JOIN n"""

  // ------------------------------------------------------- rfm_segments

  private def rfmSegments(s: SparkSession, d: String): DataFrame = {
    val orders = t(s, d, "orders")
    val anchor = orders.agg(max(col("o_orderdate")).as("anchor"))
    // The rank passes run on the bare per-customer aggregate, BEFORE the
    // anchor cross join: recency_days DESC is the same total order as
    // last_order ASC (datediff against a constant anchor is a monotone
    // bijection, ties included), so the ranks never need the anchor —
    // and the aggregate's plan stats stay honest for ntileByRange's
    // dimension-vs-fact flip (cross-join stats multiply, which would
    // force the two-pass path on a 15k-row frame).
    val perCust = orders
      .groupBy(col("o_custkey"))
      .agg(max(col("o_orderdate")).as("last_order"),
        count(lit(1)).as("frequency"),
        Det.sumD(col("o_totalprice"), MonetaryScale).as("monetary"))
    val s1 = Ranks.ntileByRange(perCust,
      Seq(col("last_order"), col("o_custkey")), 5, "r_score")
    val s2 = Ranks.ntileByRange(s1,
      Seq(col("frequency"), col("o_custkey")), 5, "f_score")
    val s3 = Ranks.ntileByRange(s2,
      Seq(col("monetary"), col("o_custkey")), 5, "m_score")
    s3.crossJoin(broadcast(anchor))
      .select(col("o_custkey"),
        datediff(col("anchor"), col("last_order")).cast("long").as("recency_days"),
        col("frequency"), col("monetary"),
        col("r_score"), col("f_score"), col("m_score"),
        concat(col("r_score").cast("string"), col("f_score").cast("string"),
          col("m_score").cast("string")).as("segment"))
  }

  private val rfmSegmentsSql =
    s"""WITH per AS (
  SELECT o_custkey,
         CAST(date_diff('day', max(o_orderdate),
              (SELECT max(o_orderdate) FROM orders)) AS BIGINT) AS recency_days,
         count(*) AS frequency,
         ${Det.sumDSql("o_totalprice", MonetaryScale)} AS monetary
  FROM orders GROUP BY o_custkey),
scored AS (
  SELECT o_custkey, recency_days, frequency, monetary,
         CAST(ntile(5) OVER (ORDER BY recency_days DESC, o_custkey) AS BIGINT) AS r_score,
         CAST(ntile(5) OVER (ORDER BY frequency, o_custkey) AS BIGINT) AS f_score,
         CAST(ntile(5) OVER (ORDER BY monetary, o_custkey) AS BIGINT) AS m_score
  FROM per)
SELECT o_custkey, recency_days, frequency, ${s6("monetary")} AS monetary,
       r_score, f_score, m_score,
       CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR) ||
         CAST(m_score AS VARCHAR) AS segment
FROM scored"""

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "market_basket" -> ((s, d) => r6(marketBasket(s, d))),
    "rfm_segments" -> ((s, d) => r6(rfmSegments(s, d)))
  )

  def oracleSql: Map[String, String] = Map(
    "market_basket" -> marketBasketSql,
    "rfm_segments" -> rfmSegmentsSql
  )
}

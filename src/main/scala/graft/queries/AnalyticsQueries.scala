package graft.queries

import graft.ops.{AsofJoin, Det, Funnel, RangeJoin, Ranks, Retention, Sample}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Analytics operators beyond the reference's own SQL surface, each with a
  * DuckDB oracle twin: as-of join (the general form of SURVEY J1), bucketed
  * range join, ROLLUP grouping sets, INTERSECT/EXCEPT set ops, deterministic
  * stratified sampling, per-group top-k, and exact distributed quantiles.
  * Everything is a single-shuffle plan (see each operator's scaladoc for
  * the 100 TB story); doubles in compared output go through the 6-dp snap
  * like every other contract query.
  */
object AnalyticsQueries {

  import TickQueries.r6

  private def s6(x: String): String = Det.snapSql(x, 6)

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** events.parquet in its native shape (same TIMESTAMP(NANOS) handling as
    * TickQueries.ticks). */
  private[queries] def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.conf.set("spark.sql.session.timeZone", "UTC") // NTZ cast is zone-sensitive
    val raw = s.read.parquet(s"$dir/events.parquet")
    val eventTime =
      if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
        expr("timestamp_micros(ts div 1000)")
      else col("ts").cast("timestamp")
    raw.select(col("event_id"), eventTime.as("ts"), col("user_id"),
      col("event_type"), col("value"))
  }

  /** As-of join: every purchase gets the user's most recent view at-or-
    * before it. The view side is pre-aggregated to one row per (user, ts)
    * — AsofJoin's uniqueness requirement (and ASOF's). */
  private def asofJoin(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
    val views = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("value")).as("view_value"))
    AsofJoin(purchases, views, Seq("user_id"), "ts", "ts",
      Seq("ts" -> "view_ts", "view_value" -> "view_value"))
  }

  /** Nearest-neighbor as-of: each purchase matched to the CLOSEST view
    * in either direction (tie → the earlier view), with the signed gap
    * in exact micros. Same single Exchange+Sort as the backward as-of —
    * the forward candidate is a second window function on the same
    * sort (see AsofJoin.nearest). */
  private def asofNearest(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
    val views = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("value")).as("view_value"))
    AsofJoin.nearest(purchases, views, Seq("user_id"), "ts", "ts",
      Seq("ts" -> "view_ts", "view_value" -> "view_value"), "view_ts")
      .withColumn("gap_us", unix_micros(col("ts")) - unix_micros(col("view_ts")))
  }

  /** Range join: per error event, activity of the same user in the
    * preceding minute — count + Det sum (scale 4: the summed envelope is
    * bounded by events-per-user-minute, see Det rule 3). */
  private def rangeJoin(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("event_id"), col("ts"))
    val pairs = RangeJoin.pairs(errors, ev, Seq("user_id"), "ts", "ts",
      lowerSec = -60L, upperSec = 0L, Seq("ts" -> "b_ts", "value" -> "b_value"))
    val agg = pairs.groupBy(col("user_id"), col("event_id"), col("ts"))
      .agg(count(col("b_ts")).as("n_prior"),
        Det.sumD(col("b_value"), 4).as("sum_value"))
    errors.join(agg, Seq("user_id", "event_id", "ts"), "left")
      .select(col("user_id"), col("event_id"), col("ts"),
        coalesce(col("n_prior"), lit(0L)).as("n_prior"),
        coalesce(col("sum_value"), lit(0.0)).as("sum_value"))
  }

  /** ROLLUP grouping sets: order revenue at (priority, status), (priority),
    * and grand-total levels in one pass. */
  private def rollupOrders(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders")
      .rollup(col("o_orderpriority"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        Det.sumD(col("o_totalprice"), 2).as("revenue"))

  /** INTERSECT / EXCEPT set ops over customer key sets. */
  private def setOps(s: SparkSession, d: String): DataFrame = {
    val orders = t(s, d, "orders")
    val open = orders.filter(col("o_orderstatus") === "O").select(col("o_custkey"))
    val closed = orders.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
    open.except(closed).withColumn("tag", lit("open_only"))
      .unionByName(open.intersect(closed).withColumn("tag", lit("both")))
  }

  /** Deterministic stratified document sample (en at 50%, rest at 12.5%). */
  private val sampleRates = Map("en" -> 0.5)
  private val sampleDefault = 0.125
  private def corpusSample(s: SparkSession, d: String): DataFrame =
    Sample.stratified(t(s, d, "documents"), col("doc_id"), col("lang"),
      sampleRates, sampleDefault)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))

  /** sample_estimate rate: 1/rate is an exact integer so the Horvitz-
    * Thompson scale-up stays in integer arithmetic. */
  private val EstRate = 0.1
  private val EstInv = 10L

  /** Estimate-from-sample audit: corpus totals estimated from the
    * deterministic 10% hash sample, scaled by 1/rate (Horvitz–Thompson
    * with uniform inclusion — exact integers since 1/rate is whole),
    * reported NEXT TO the exact totals with relative errors — the audit
    * that tells you whether sampled profiling is good enough before you
    * stop paying for exact scans at 100 TB. Two aggregates over one
    * table; the sample side's filter is the same codegen'd md5 prefix
    * compare every sampler here uses. */
  private def sampleEstimate(s: SparkSession, d: String): DataFrame = {
    val base = t(s, d, "documents")
    val exact = base.agg(count(lit(1)).as("n_docs_exact"),
      sum(col("n_chars")).as("n_chars_exact"))
    val samp = base.filter(Sample.hashFilter(col("doc_id"), EstRate))
      .agg(count(lit(1)).as("n_docs_sample"),
        sum(col("n_chars")).as("n_chars_sample"))
    exact.crossJoin(samp)
      .select(col("n_docs_exact"), col("n_chars_exact"),
        col("n_docs_sample"), col("n_chars_sample"),
        (col("n_docs_sample") * EstInv).as("est_docs"),
        (col("n_chars_sample") * EstInv).as("est_chars"),
        Det.snap((col("n_docs_sample") * EstInv - col("n_docs_exact")).cast("double") /
          col("n_docs_exact").cast("double"), 6).as("err_docs"),
        Det.snap((col("n_chars_sample") * EstInv - col("n_chars_exact")).cast("double") /
          col("n_chars_exact").cast("double"), 6).as("err_chars"))
  }

  private val sampleEstimateSql =
    s"""WITH ex AS (
  SELECT count(*) AS n_docs_exact, CAST(sum(n_chars) AS BIGINT) AS n_chars_exact
  FROM documents),
sa AS (
  SELECT count(*) AS n_docs_sample, CAST(sum(n_chars) AS BIGINT) AS n_chars_sample
  FROM documents WHERE ${Sample.hashFilterSql("doc_id", 0.1)})
SELECT ex.n_docs_exact, ex.n_chars_exact, sa.n_docs_sample, sa.n_chars_sample,
       sa.n_docs_sample * $EstInv AS est_docs,
       sa.n_chars_sample * $EstInv AS est_chars,
       ${Det.snapSql(s"${Det.signedDblSql(s"sa.n_docs_sample * $EstInv - ex.n_docs_exact")} / CAST(ex.n_docs_exact AS DOUBLE)", 6)} AS err_docs,
       ${Det.snapSql(s"${Det.signedDblSql(s"sa.n_chars_sample * $EstInv - ex.n_chars_exact")} / CAST(ex.n_chars_exact AS DOUBLE)", 6)} AS err_chars
FROM ex CROSS JOIN sa"""

  /** Deterministic exact-k reservoir sample per stratum: the first
    * ReservoirK documents of each lang in md5(doc_id) order. The hash
    * order is a fixed uniform permutation, so this IS reservoir sampling
    * with a deterministic coin — same guarantee (every k-subset equally
    * likely over the hash family), but engine-portable and re-runnable.
    * Complements [[Sample.stratified]]'s rate-based form when the
    * curation budget is an exact row count per stratum. Spark ≥3.5
    * rewrites the rk<=k filter into a WindowGroupLimit partial top-k
    * (map-side k-heap per stratum), so no stratum is ever fully sorted
    * at 100 TB. */
  private val ReservoirK = 16L
  private def sampleReservoir(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("lang"))
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    t(s, d, "documents")
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= ReservoirK)
      .select(col("lang"), col("rk"), col("doc_id"), col("source"),
        col("n_chars"))
  }

  private val sampleReservoirSql =
    s"""SELECT lang, rk, doc_id, source, n_chars FROM (
  SELECT lang, doc_id, source, n_chars,
         CAST(row_number() OVER (PARTITION BY lang
              ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS rk
  FROM documents)
WHERE rk <= $ReservoirK"""

  /** Per-group top-k: 3 largest orders per market segment (broadcast dim,
    * one window pass — rank pushes the limit inside each partition). */
  private def topkPerGroup(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    t(s, d, "orders")
      .join(broadcast(t(s, d, "customer")), col("o_custkey") === col("c_custkey"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("c_mktsegment"), col("rk"), col("o_orderkey"),
        col("o_totalprice"), col("c_name"))
  }

  /** Exact distributed quantiles: the value at row ceil(p·n) of each
    * group's total order — picks REAL input values (percentile_disc
    * semantics), so it is engine-exact with no interpolation arithmetic.
    * One Exchange + Sort; at 100 TB swap in approx_percentile when ulp
    * exactness isn't required. */
  private def quantiles(s: SparkSession, d: String): DataFrame = {
    val byFlag = Window.partitionBy(col("l_returnflag"))
    val w = byFlag.orderBy(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
    def pick(p: Double): org.apache.spark.sql.Column =
      max(when(col("rn") === ceil(lit(p) * col("n")), col("l_extendedprice")))
    t(s, d, "lineitem")
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(byFlag))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_rows"),
        pick(0.50).as("p50"), pick(0.90).as("p90"), pick(0.99).as("p99"))
  }

  /** Interpolated (percentile_cont) quartiles — the continuous sibling of
    * [[quantiles]]. Interpolation is normally float-hazardous across
    * engines, but the quartile fractions are exact binary fractions
    * (0.25/0.5/0.75), so pos = 1 + (n−1)·p, floor(pos) and
    * frac = pos − floor(pos) are all EXACT double arithmetic, and the
    * finish lo + (hi−lo)·frac is three correctly-rounded IEEE ops —
    * engine-identical with no Det grid. Same single Exchange+Sort shape
    * as the disc version. */
  private def quantilesCont(s: SparkSession, d: String): DataFrame = {
    val byFlag = Window.partitionBy(col("l_returnflag"))
    val w = byFlag.orderBy(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
    def pick(p: Double): org.apache.spark.sql.Column = {
      val pos = lit(1.0) + (col("n") - 1).cast("double") * lit(p)
      val lo = max(when(col("rn") === floor(pos).cast("long"), col("l_extendedprice")))
      val hi = max(when(col("rn") === floor(pos).cast("long") + 1, col("l_extendedprice")))
      val frac = max(pos - floor(pos)) // per-group constant
      when(frac === 0d, lo).otherwise(lo + (hi - lo) * frac)
    }
    t(s, d, "lineitem")
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(byFlag))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_rows"),
        pick(0.25).as("q1"), pick(0.50).as("q2"), pick(0.75).as("q3"))
  }

  private val quantilesContSql = {
    def pick(p: String): String = {
      val pos = s"(1.0 + CAST(n - 1 AS DOUBLE) * $p)"
      val lo = s"max(CASE WHEN rn = CAST(floor($pos) AS BIGINT) THEN l_extendedprice END)"
      val hi = s"max(CASE WHEN rn = CAST(floor($pos) AS BIGINT) + 1 THEN l_extendedprice END)"
      val frac = s"max($pos - floor($pos))"
      s"(CASE WHEN $frac = 0 THEN $lo ELSE $lo + ($hi - $lo) * $frac END)"
    }
    s"""SELECT l_returnflag, count(*) AS n_rows,
       ${s6(pick("0.25"))} AS q1, ${s6(pick("0.5"))} AS q2, ${s6(pick("0.75"))} AS q3
FROM (SELECT l_returnflag, l_extendedprice,
        row_number() OVER (PARTITION BY l_returnflag
                           ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS rn,
        count(*) OVER (PARTITION BY l_returnflag) AS n
      FROM lineitem)
GROUP BY l_returnflag"""
  }

  /** Conversion funnel view → click → purchase within 24 h. */
  private def funnel(s: SparkSession, d: String): DataFrame =
    Funnel.threeStep(events(s, d).drop("value"), "user_id", "ts", "event_type",
      "view", "click", "purchase", horizonSec = 86400L)

  // Ingest-lag threshold: 5 min between consecutive events of one type
  // flags a stalled feed (the engine-side twin of the reference's
  // healthcheck lag budget, scripts/healthcheck_kafka_lag.py:12).
  private val MaxLagUs = 300000000L

  /** Ingest-lag telemetry rollup — the reference runs this OUTSIDE the
    * engine (healthcheck_kafka_lag.py inspects per-partition consumer
    * lag against KAFKA_MAX_LAG and reports offenders); here the same
    * shape is a first-class query over the event stream: per
    * (event_type ≈ consumer group, hour), arrival count, max/avg
    * inter-arrival gap, gap breaches over budget, and the offending
    * flag. Gaps are exact micros (longs); avg is exactInt/exactInt —
    * one correctly-rounded division. One window pass (the sessionize
    * Exchange shape) + one hash aggregate — fact-scan sized, no joins. */
  private def latencyMetrics(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("event_type")).orderBy(col("ts"), col("event_id"))
    events(s, d)
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("gap_us", col("us") - lag(col("us"), 1).over(w))
      .filter(col("gap_us").isNotNull)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("bucket"))
      .agg(
        count(lit(1)).as("n_arrivals"),
        max(col("gap_us")).as("max_gap_us"),
        Det.snap(sum(col("gap_us")).cast("double") / count(lit(1)).cast("double"), 6)
          .as("avg_gap_us"),
        count(when(col("gap_us") > MaxLagUs, lit(1))).as("lag_breaches"))
      .withColumn("offending", col("max_gap_us") > MaxLagUs)
  }

  private val latencyMetricsSql =
    s"""WITH g AS (
  SELECT event_type, ts,
         epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY event_type
             ORDER BY ts, event_id) AS gap_us
  FROM events)
SELECT event_type, date_trunc('hour', ts) AS bucket,
       count(*) AS n_arrivals,
       CAST(max(gap_us) AS BIGINT) AS max_gap_us,
       ${s6("CAST(sum(gap_us) AS DOUBLE) / CAST(count(*) AS DOUBLE)")} AS avg_gap_us,
       count(CASE WHEN gap_us > $MaxLagUs THEN 1 END) AS lag_breaches,
       max(gap_us) > $MaxLagUs AS offending
FROM g WHERE gap_us IS NOT NULL
GROUP BY 1, 2"""

  /** fifo_pnl horizon: events per user entering the backtest (bounds the
    * oracle's list-accumulator fold — the Spark fold itself is O(n)). */
  private val FifoCap = 2000

  /** FIFO lot matching — the inventory-accounting recurrence behind
    * realized-P&L reporting: per user, buy one unit at each 'view'
    * price, sell FIFO at each 'purchase' price (skipped when flat — no
    * shorts), over the first [[FifoCap]] events. Realized P&L, matched/
    * skipped counts, and the open inventory (quantity + cost basis) are
    * ALL exact cent-grid integers — the queue holds lot prices as grid
    * longs, each match adds an exact difference, so the only floating
    * ops are the final /1e4 conversions of |values| < 2^53.
    *
    * Scale shape: one keyed Exchange + a typed per-key fold with an
    * O(open-lots) queue (the rsiPerKey secondary-sort pattern); the
    * oracle replays the identical trajectory as a BIGINT list_reduce
    * whose accumulator is [realized, n_buys, n_sells, n_skipped] ++
    * queue (seed prepended; DuckDB's per-step list copy is why the
    * horizon is capped — the Spark side has no such quadratic). */
  private def fifoPnl(s: SparkSession, d: String): DataFrame = {
    val spark = s
    import spark.implicits._
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val trades = events(s, d)
      .filter(col("event_type").isin("view", "purchase"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= FifoCap)
      .select(col("user_id").cast("long"), col("ts"), col("event_id"),
        when(col("event_type") === "view", 1).otherwise(2).as("kind"),
        Det.kl(col("value") + lit(100.0), 4).as("px"))
      .as[(Long, java.sql.Timestamp, Long, Int, Long)]
    trades
      .repartition(col("user_id"))
      .sortWithinPartitions(col("user_id"), col("ts"), col("event_id"))
      .mapPartitions { it =>
        val out = scala.collection.mutable.ArrayBuffer
          .empty[(Long, Long, Long, Long, Double, Long, Double)]
        var cur = Long.MinValue
        var realized = 0L; var nb = 0L; var ns = 0L; var nk = 0L
        val q = scala.collection.mutable.Queue.empty[Long]
        def flush(): Unit = if (cur != Long.MinValue) {
          out += ((cur, nb, ns, nk, realized.toDouble / 1e4,
            q.size.toLong, q.sum.toDouble / 1e4))
        }
        it.foreach { case (u, _, _, kind, px) =>
          if (u != cur) {
            flush(); cur = u
            realized = 0L; nb = 0L; ns = 0L; nk = 0L; q.clear()
          }
          if (kind == 1) { q.enqueue(px); nb += 1L }
          else if (q.nonEmpty) { realized += px - q.dequeue(); ns += 1L }
          else nk += 1L
        }
        flush()
        out.iterator
      }
      .toDF("user_id", "n_buys", "n_sells", "n_skipped",
        "realized_pnl", "open_qty", "open_cost")
  }

  private val fifoPnlSql =
    s"""WITH t AS (
  SELECT user_id, ts, event_id,
         CASE WHEN event_type = 'view' THEN 1 ELSE 2 END AS kind,
         ${Det.klSql("value + 100.0", 4)} AS px,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events WHERE event_type IN ('view', 'purchase')),
per AS (
  SELECT user_id, list([kind, px] ORDER BY ts, event_id) AS xs
  FROM t WHERE rn <= $FifoCap GROUP BY user_id),
m AS (
  SELECT user_id,
         list_reduce(
           list_concat([CAST([0, 0, 0, 0] AS BIGINT[])], [CAST(x AS BIGINT[]) for x in xs]),
           (acc, e) -> CASE
             WHEN e[1] = 1 THEN
               list_concat([acc[1], acc[2] + 1, acc[3], acc[4]],
                           list_append(acc[5:], e[2]))
             WHEN len(acc) >= 5 THEN
               list_concat([acc[1] + (e[2] - acc[5]), acc[2], acc[3] + 1, acc[4]],
                           acc[6:])
             ELSE [acc[1], acc[2], acc[3], acc[4] + 1]
           END) AS st
  FROM per)
SELECT user_id,
       st[2] AS n_buys, st[3] AS n_sells, st[4] AS n_skipped,
       CAST(st[1] AS DOUBLE) / 1e4 AS realized_pnl,
       CAST(len(st) - 4 AS BIGINT) AS open_qty,
       CAST(COALESCE(list_sum(st[5:]), 0) AS DOUBLE) / 1e4 AS open_cost
FROM m"""

  /** CDC MERGE-apply: the event log read as a change stream for entity
    * = user_id — event_type 'error' is the DELETE tombstone, everything
    * else an SCD1 upsert of (value, props) — collapsed to the current
    * snapshot in ONE pass: per key the (ts, event_id)-latest change
    * wins, keys whose latest change is a tombstone are absent, and the
    * audit columns count total changes, deletes, and RESURRECTIONS
    * (an upsert directly following a tombstone — the re-insert case
    * MERGE implementations get wrong most often). This is the
    * `MERGE INTO current USING log` warehouse kernel as a query: at
    * 100 TB the log collapses map-side per key before one Exchange
    * (max_by/count/sum are all combinable), so applying a day's CDC
    * is one aggregate, not row-at-a-time DML. All compared values are
    * exact picks/counts (value is a pick, never summed).
    */
  private def cdcUpsert(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.conf.set("spark.sql.session.timeZone", "UTC")
    val raw = t(s, d, "events")
    val eventTime =
      if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
        expr("timestamp_micros(ts div 1000)")
      else col("ts").cast("timestamp")
    val log = raw.select(col("event_id"), eventTime.as("ts"), col("user_id"),
        col("event_type"), col("value"), col("props"))
      .withColumn("is_del", (col("event_type") === "error").cast("long"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val ord = struct(col("ts"), col("event_id"))
    log
      .withColumn("prev_del", lag(col("is_del"), 1).over(w))
      .withColumn("resur",
        when(col("prev_del") === 1L && col("is_del") === 0L, 1L).otherwise(0L))
      .groupBy(col("user_id"))
      .agg(
        max_by(col("is_del"), ord).as("last_del"),
        max_by(col("value"), ord).as("value"),
        max_by(col("props"), ord).as("props"),
        max(col("ts")).as("updated_at"),
        count(lit(1)).as("n_changes"),
        sum(col("is_del")).as("n_deletes"),
        sum(col("resur")).as("n_resurrections"))
      .filter(col("last_del") === 0L)
      .select(col("user_id"), col("value"), col("props"), col("updated_at"),
        col("n_changes"), col("n_deletes"), col("n_resurrections"))
  }

  private val cdcUpsertSql =
    s"""WITH log AS (
  SELECT user_id, ts, event_id, value, props,
         CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS is_del,
         row_number() OVER (PARTITION BY user_id
             ORDER BY ts DESC, event_id DESC) AS rd,
         lag(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END, 1)
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_del
  FROM events),
snap AS (
  SELECT user_id,
         max(CASE WHEN rd = 1 THEN is_del END) AS last_del,
         max(CASE WHEN rd = 1 THEN value END) AS value,
         max(CASE WHEN rd = 1 THEN props END) AS props,
         max(ts) AS updated_at,
         CAST(count(*) AS BIGINT) AS n_changes,
         CAST(sum(is_del) AS BIGINT) AS n_deletes,
         CAST(sum(CASE WHEN prev_del = 1 AND is_del = 0 THEN 1 ELSE 0 END)
           AS BIGINT) AS n_resurrections
  FROM log GROUP BY 1)
SELECT user_id, value, props, updated_at, n_changes, n_deletes,
       n_resurrections
FROM snap WHERE last_del = 0"""

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "cdc_upsert" -> ((s, d) => cdcUpsert(s, d)),
    "fifo_pnl" -> ((s, d) => fifoPnl(s, d)),
    // Raw HLL audited against the exact count — the fixed-register
    // sketch beside kmv_distinct's order statistics, on a column whose
    // per-key cardinality (distinct event_ids per type, thousands+) is
    // in raw HLL's unbiased regime (Approx.hllDistinct scaladoc has
    // the all-integer register construction).
    "hll_distinct" -> ((s, d) => graft.ops.Approx.hllDistinct(
      events(s, d).select(col("event_type"), col("event_id")),
      col("event_type"), col("event_id"), CorpusQueries.HllM)),
    "retention" -> ((s, d) => Retention.matrix(events(s, d), "user_id", "ts")),
    "interval_overlap" -> ((s, d) => {
      // Incident correlation via the interval×interval OVERLAP join
      // (RangeJoin.overlap scaladoc: bucketed equi-join + start-bucket
      // dedup — no per-key nested loop, no post-join distinct): per-user
      // DAILY ACTIVITY intervals [first event, last event + 1µs)
      // against the same user's ±5-minute ERROR windows, with the exact
      // overlap length in micros. All bounds are exact integer micros.
      val ev = events(s, d)
      val a = ev.groupBy(col("user_id"), date_trunc("day", col("ts")).as("day"))
        .agg(min(col("ts")).as("a_start"),
          expr("timestampadd(MICROSECOND, 1, max(ts))").as("a_end"))
      val b = ev.filter(col("event_type") === "error")
        .select(col("user_id"), col("event_id"),
          expr("timestampadd(MINUTE, -5, ts)").as("b_start"),
          expr("timestampadd(MINUTE, 5, ts)").as("b_end"))
      RangeJoin.overlap(a, b, Seq("user_id"),
          "a_start", "a_end", "b_start", "b_end", 86400L,
          Seq("event_id" -> "err_event"))
        .select(col("user_id"), col("day"), col("err_event"),
          col("overlap_us"))
    }),
    "funnel" -> ((s, d) => funnel(s, d)),
    "asof_join" -> ((s, d) => r6(asofJoin(s, d))),
    "asof_nearest" -> ((s, d) => r6(asofNearest(s, d))),
    "range_join" -> ((s, d) => r6(rangeJoin(s, d))),
    "rel_rollup" -> ((s, d) => r6(rollupOrders(s, d))),
    "rel_set_ops" -> ((s, d) => setOps(s, d)),
    "corpus_sample" -> ((s, d) => corpusSample(s, d)),
    "sample_estimate" -> ((s, d) => sampleEstimate(s, d)),
    "rel_topk_per_group" -> ((s, d) => r6(topkPerGroup(s, d))),
    "rel_quantiles" -> ((s, d) => r6(quantiles(s, d))),
    // Semi-structured schema discovery over the JSON props column: per
    // event type, which keys exist and how their values distribute —
    // the profiling pass run before declaring a schema on ingested
    // JSON. Key discovery (json_object_keys) and extraction
    // (get_json_object) are codegen'd native expressions on the scan;
    // the aggregate is |types·keys·values|-sized; type totals via a
    // window over the tiny cell table.
    "props_profile" -> ((s, d) => {
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      // ONE JSON parse per row: from_json to map<string,string> then
      // explode — vs json_object_keys + per-key get_json_object, which
      // re-parses the document once per key (1+K parses). For scalar
      // values the map value text equals get_json_object's extraction
      // (raw literal for numbers/booleans, unquoted for strings, NULL
      // for JSON null), and non-scalars are filtered below either way.
      s.read.parquet(s"$d/events.parquet")
        .select(col("event_type"),
          explode(from_json(col("props"),
            org.apache.spark.sql.types.MapType(
              org.apache.spark.sql.types.StringType,
              org.apache.spark.sql.types.StringType)))
            .as(Seq("prop_key", "prop_value")))
        // Scalar-only guard: nested objects/arrays re-serialize
        // engine-specifically (whitespace, key order), so their text is
        // not twin-safe. Both engines serialize them with a '{'/'['
        // first char, so this prefix filter selects the SAME cell set on
        // both sides regardless of interior text (NULLs kept: JSON null
        // extracts to SQL NULL identically in both engines).
        .filter(col("prop_value").isNull ||
          (!col("prop_value").startsWith("{") &&
            !col("prop_value").startsWith("[")))
        .groupBy(col("event_type"), col("prop_key"), col("prop_value"))
        .agg(count(lit(1)).as("n_events"))
        .withColumn("type_total",
          sum(col("n_events")).over(Window.partitionBy(col("event_type"))))
        .withColumn("share", Det.snap(
          col("n_events").cast("double") / col("type_total").cast("double"), 6))
    }),
    // Exact GLOBAL order statistics without a single-partition sort:
    // the selection problem done TeraSort-style — Ranks.rowNumberByRange
    // assigns exact global ranks (range-partitioned parallel sorts; the
    // distributed branch is forced-run proven), the five target ranks
    // are EXACT integer ceils (n·k+99) div 100 computed from one scalar
    // count and interpolated as literals, and only those ≤5 rows reach
    // the final one-row aggregate. rel_quantiles' per-group window form
    // is the right shape when groups bound the sort; THIS is the shape
    // when the order is global and the table is 100 TB.
    "global_quantiles" -> ((s, d) => {
      val li = t(s, d, "lineitem")
        .select(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
      val n = li.count()
      def target(k: Int): Long = (n * k + 99L) / 100L
      val ranked = Ranks.rowNumberByRange(li,
        Seq(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber")), "rn")
      def pick(k: Int) =
        max(when(col("rn") === target(k), col("l_extendedprice"))).as(s"p$k")
      r6(ranked
        .filter(col("rn").isInCollection(Seq(25, 50, 75, 95, 99).map(target)))
        .agg(lit(n).as("n_rows"), pick(25), pick(50), pick(75), pick(95),
          pick(99)))
    }),
    // Join-key skew audit — the operational readout behind every
    // salting/AQE-skew decision: per-key counts ranked most-frequent-
    // first (two-pass range rank, no single-partition window), exact
    // count picks at the top/median/99% rank positions, and top-1 /
    // top-10 row shares as snapped exact ratios. One groupBy + one
    // rank pass + one 1-row aggregate at any scale; the key count
    // crosses as a driver literal (the global_quantiles pattern).
    "skew_profile" -> ((s, d) => {
      val counts = t(s, d, "lineitem")
        .groupBy(col("l_suppkey")).agg(count(lit(1)).as("c"))
      val k = counts.count()
      def target(p: Int): Long = (k * p + 99L) / 100L
      val ranked = Ranks.rowNumberByRange(counts,
        Seq(col("c").desc, col("l_suppkey")), "rn")
      ranked.agg(
        lit(k).as("n_keys"),
        sum(col("c")).as("n_rows"),
        max(when(col("rn") === 1L, col("c"))).as("max_count"),
        max(when(col("rn") === target(50), col("c"))).as("p50_count"),
        max(when(col("rn") === target(99), col("c"))).as("p99_count"),
        sum(when(col("rn") <= 10L, col("c")).otherwise(0L)).as("top10_rows"))
        .select(col("n_keys"), col("n_rows"), col("max_count"),
          col("p50_count"), col("p99_count"), col("top10_rows"),
          Det.snap(col("max_count").cast("double") /
            col("n_rows").cast("double"), 6).as("top1_share"),
          Det.snap(col("top10_rows").cast("double") /
            col("n_rows").cast("double"), 6).as("top10_share"))
    }),
    "rel_quantiles_cont" -> ((s, d) => r6(quantilesCont(s, d))),
    "latency_metrics" -> ((s, d) => latencyMetrics(s, d)),
    "sample_reservoir" -> ((s, d) => sampleReservoir(s, d))
  )

  def oracleSql: Map[String, String] = Map(
    "cdc_upsert" -> cdcUpsertSql,
    "skew_profile" ->
      """WITH c AS (
  SELECT l_suppkey, count(*) AS c FROM lineitem GROUP BY 1
), r AS (
  SELECT c, row_number() OVER (ORDER BY c DESC, l_suppkey) AS rn FROM c
), k AS (SELECT CAST(count(*) AS BIGINT) AS nk FROM c)
SELECT nk AS n_keys,
       CAST(sum(c) AS BIGINT) AS n_rows,
       CAST(max(CASE WHEN rn = 1 THEN c END) AS BIGINT) AS max_count,
       CAST(max(CASE WHEN rn = (nk*50+99)//100 THEN c END) AS BIGINT) AS p50_count,
       CAST(max(CASE WHEN rn = (nk*99+99)//100 THEN c END) AS BIGINT) AS p99_count,
       CAST(sum(CASE WHEN rn <= 10 THEN c ELSE 0 END) AS BIGINT) AS top10_rows,
       floor((CAST(max(CASE WHEN rn = 1 THEN c END) AS DOUBLE) / CAST(sum(c) AS DOUBLE))*1e6+0.5)/1e6 AS top1_share,
       floor((CAST(sum(CASE WHEN rn <= 10 THEN c ELSE 0 END) AS DOUBLE) / CAST(sum(c) AS DOUBLE))*1e6+0.5)/1e6 AS top10_share
FROM r CROSS JOIN k GROUP BY nk""",
    "fifo_pnl" -> fifoPnlSql,
    "hll_distinct" -> CorpusQueries.hllDistinctSql,
    "interval_overlap" ->
      """WITH a AS (
  SELECT user_id, date_trunc('day', ts) AS day,
         epoch_us(min(ts)) AS llo, epoch_us(max(ts)) + 1 AS lhi
  FROM events GROUP BY 1, 2),
b AS (
  SELECT user_id, event_id AS err_event,
         epoch_us(ts) - 300000000 AS rlo, epoch_us(ts) + 300000000 AS rhi
  FROM events WHERE event_type = 'error')
SELECT a.user_id, a.day, b.err_event,
       least(lhi, rhi) - greatest(llo, rlo) AS overlap_us
FROM a JOIN b ON a.user_id = b.user_id AND llo < rhi AND rlo < lhi""",
    "retention" -> Retention.matrixSql("events", "user_id", "ts"),
    "funnel" -> Funnel.threeStepSql("events", "user_id", "ts", "event_type",
      "view", "click", "purchase", horizonSec = 86400L),
    "asof_join" ->
      s"""WITH pur AS (
  SELECT user_id, event_id, ts, value FROM events WHERE event_type = 'purchase'
), vw AS (
  SELECT user_id, ts, max(value) AS view_value
  FROM events WHERE event_type = 'view' GROUP BY 1, 2
)
SELECT pur.user_id, pur.event_id, pur.ts, ${s6("pur.value")} AS value,
       vw.ts AS view_ts, ${s6("vw.view_value")} AS view_value
FROM pur ASOF LEFT JOIN vw
  ON pur.user_id = vw.user_id AND pur.ts >= vw.ts""",
    "asof_nearest" ->
      s"""WITH pur AS (
  SELECT user_id, event_id, ts, value FROM events WHERE event_type = 'purchase'
), vw AS (
  SELECT user_id, ts, max(value) AS view_value
  FROM events WHERE event_type = 'view' GROUP BY 1, 2
), b AS (
  SELECT pur.user_id, pur.event_id, pur.ts, pur.value,
         vw.ts AS bts, vw.view_value AS bval
  FROM pur ASOF LEFT JOIN vw
    ON pur.user_id = vw.user_id AND pur.ts >= vw.ts
), f AS (
  SELECT pur.user_id AS fuid, pur.event_id AS feid,
         vw.ts AS fts, vw.view_value AS fval
  FROM pur ASOF LEFT JOIN vw
    ON pur.user_id = vw.user_id AND pur.ts <= vw.ts
), picked AS (
  SELECT b.user_id, b.event_id, b.ts, b.value,
         CASE WHEN fts IS NULL THEN bts WHEN bts IS NULL THEN fts
              WHEN epoch_us(b.ts) - epoch_us(bts) <= epoch_us(fts) - epoch_us(b.ts)
              THEN bts ELSE fts END AS view_ts,
         CASE WHEN fts IS NULL THEN bval WHEN bts IS NULL THEN fval
              WHEN epoch_us(b.ts) - epoch_us(bts) <= epoch_us(fts) - epoch_us(b.ts)
              THEN bval ELSE fval END AS view_value
  FROM b JOIN f ON b.user_id = f.fuid AND b.event_id = f.feid)
SELECT user_id, event_id, ts, ${s6("value")} AS value, view_ts,
       ${s6("view_value")} AS view_value,
       CAST(epoch_us(ts) - epoch_us(view_ts) AS BIGINT) AS gap_us
FROM picked""",
    // Bucketed like the engine side (RangeJoin.pairs): a plain band
    // join here hash-joins on user_id alone and filters the band AFTER
    // — Θ(err_u · ev_u) per user, hot-key-quadratic at the zipf tier
    // (killed at 46 CPU-minutes). Candidates instead come from an
    // equi-join on (user, minute-bucket) with the probe reaching its ≤2
    // overlapping buckets; each build row lives in exactly ONE bucket,
    // so the two branches are disjoint and need no dedup, and the
    // EXACT residual band filter (microsecond timestamps) makes the
    // result independent of bucket rounding.
    "range_join" ->
      s"""WITH err AS (
  SELECT user_id, event_id, ts FROM events WHERE event_type = 'error'
),
ev AS (
  SELECT user_id, ts, value, CAST(epoch_us(ts) // 60000000 AS BIGINT) AS b
  FROM events),
probe AS (
  SELECT user_id, event_id, ts, CAST(epoch_us(ts) // 60000000 AS BIGINT) AS b
  FROM err),
cand AS (
  SELECT p.user_id, p.event_id, p.ts, e.value
  FROM probe p JOIN ev e
    ON e.user_id = p.user_id AND e.b = p.b
   AND e.ts >= p.ts - INTERVAL '60 seconds' AND e.ts < p.ts
  UNION ALL
  SELECT p.user_id, p.event_id, p.ts, e.value
  FROM probe p JOIN ev e
    ON e.user_id = p.user_id AND e.b = p.b - 1
   AND e.ts >= p.ts - INTERVAL '60 seconds' AND e.ts < p.ts
),
agg AS (
  SELECT user_id, event_id, ts, CAST(count(*) AS BIGINT) AS n_prior,
         ${Det.sumDSql("value", 4)} AS sum_value
  FROM cand GROUP BY 1, 2, 3)
SELECT err.user_id, err.event_id, err.ts,
       COALESCE(a.n_prior, CAST(0 AS BIGINT)) AS n_prior,
       ${s6("COALESCE(a.sum_value, 0.0)")} AS sum_value
FROM err LEFT JOIN agg a ON a.user_id = err.user_id
  AND a.event_id = err.event_id AND a.ts = err.ts""",
    "rel_rollup" ->
      s"""SELECT o_orderpriority, o_orderstatus,
       count(*) AS n_orders, ${s6(Det.sumDSql("o_totalprice", 2))} AS revenue
FROM orders
GROUP BY ROLLUP(o_orderpriority, o_orderstatus)""",
    "rel_set_ops" ->
      """SELECT o_custkey, 'open_only' AS tag FROM (
  SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
  EXCEPT
  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
UNION ALL
SELECT o_custkey, 'both' AS tag FROM (
  SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
  INTERSECT
  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')""",
    "corpus_sample" ->
      s"""SELECT doc_id, lang, source, n_chars FROM documents
WHERE ${Sample.stratifiedSql("doc_id", "lang", sampleRates, sampleDefault)}""",
    "sample_estimate" -> sampleEstimateSql,
    "rel_topk_per_group" ->
      s"""SELECT c_mktsegment, rk, o_orderkey, ${s6("o_totalprice")} AS o_totalprice, c_name
FROM (SELECT c_mktsegment, o_orderkey, o_totalprice, c_name,
        row_number() OVER (PARTITION BY c_mktsegment
                           ORDER BY o_totalprice DESC, o_orderkey) AS rk
      FROM orders JOIN customer ON o_custkey = c_custkey)
WHERE rk <= 3""",
    "props_profile" ->
      s"""WITH k AS (
  SELECT event_type, props, unnest(json_keys(props)) AS prop_key FROM events
), v0 AS (
  SELECT event_type, prop_key,
         json_extract_string(props, '$$.' || prop_key) AS prop_value
  FROM k
), v AS (
  SELECT * FROM v0
  WHERE prop_value IS NULL
     OR (prop_value NOT LIKE '{%' AND prop_value NOT LIKE '[%')
), c AS (
  SELECT event_type, prop_key, prop_value, count(*) AS n_events
  FROM v GROUP BY 1, 2, 3)
SELECT event_type, prop_key, prop_value, n_events, type_total,
       ${s6("CAST(n_events AS DOUBLE) / CAST(type_total AS DOUBLE)")} AS share
FROM (SELECT *, CAST(sum(n_events) OVER (PARTITION BY event_type) AS BIGINT) AS type_total
      FROM c)""",
    "global_quantiles" ->
      s"""WITH r AS (
  SELECT l_extendedprice,
         row_number() OVER (ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS rn
  FROM lineitem),
n AS (SELECT count(*) AS n FROM lineitem)
SELECT n.n AS n_rows,
       ${Seq(25, 50, 75, 95, 99).map(k =>
        s6(s"max(CASE WHEN rn = (n.n * $k + 99) // 100 THEN l_extendedprice END)") +
          s" AS p$k").mkString(",\n       ")}
FROM r, n
GROUP BY n.n""",
    "rel_quantiles" ->
      s"""SELECT l_returnflag, count(*) AS n_rows,
       ${s6("max(CASE WHEN rn = ceil(0.5*n) THEN l_extendedprice END)")} AS p50,
       ${s6("max(CASE WHEN rn = ceil(0.9*n) THEN l_extendedprice END)")} AS p90,
       ${s6("max(CASE WHEN rn = ceil(0.99*n) THEN l_extendedprice END)")} AS p99
FROM (SELECT l_returnflag, l_extendedprice,
        row_number() OVER (PARTITION BY l_returnflag
                           ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS rn,
        count(*) OVER (PARTITION BY l_returnflag) AS n
      FROM lineitem)
GROUP BY l_returnflag""",
    "rel_quantiles_cont" -> quantilesContSql,
    "latency_metrics" -> latencyMetricsSql,
    "sample_reservoir" -> sampleReservoirSql
  )
}

package graft.queries

import graft.ops.{Adaptive, Det}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence- and graph-shaped analytics, each with a DuckDB oracle twin:
  * Markov transition matrices over per-user event paths, exact
  * autocorrelation (ACF) at multiple lags, and triangle counting /
  * clustering over a co-occurrence graph. All counts are exact integers;
  * every compared double is a fixed IEEE sequence over exactly-converted
  * integers (Det rule 3) or goes through Det.corrD.
  */
object GraphQueries {

  private def s6(x: String): String = Det.snapSql(x, 6)

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  // Autocorrelation profile: lags over the per-user value sequence.
  private val AcfLags = Seq(1, 2, 3)
  // Det grid for ACF inputs: |value| ≤ ~1e3 → |k| ≤ 1e7 < 3e9 (corrD
  // envelope), n·Σ|kxky| ≪ 1e37 at any SF.
  private val AcfScale = 4

  // Co-occurrence graph: suppliers sharing an order, kept only when the
  // pair co-occurs in ≥ MinCo orders (noise floor for the random pairs).
  private val MinCo = 5
  /** link_prediction wedge-center degree cap (shared Spark/oracle) —
    * see the hub-guard note in [[linkPredictionLazyFrom]]. */
  private val WedgeCap = 4096

  /** First-order Markov transition matrix over per-user event paths:
    * c(from→to) and p(to | from) = c(from→to) / c(from→·). The path order
    * is (ts, event_id) — unique per user, so lead() is deterministic in
    * both engines. Probabilities are exact-integer ratios finished by one
    * correctly-rounded division (log-free, like tfidf_terms).
    *
    * Scale shape: one window pass keyed by user (same Exchange the
    * sessionize/funnel family uses) followed by a tiny |types|² aggregate
    * — the classic clickstream-transition job at any data size.
    */
  private def markov(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val pairs = AnalyticsQueries.events(s, d)
      .withColumn("to_type", lead(col("event_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
    val counts = pairs.groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("c"))
    val cFrom = sum(col("c")).over(Window.partitionBy(col("from_type")))
    counts
      .withColumn("c_from", cFrom)
      .withColumn("p_cond",
        Det.snap(col("c").cast("double") / col("c_from").cast("double"), 6))
  }

  private val markovSql =
    s"""WITH seq AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
  FROM events
), counts AS (
  SELECT event_type AS from_type, to_type, count(*) AS c
  FROM seq WHERE to_type IS NOT NULL GROUP BY 1, 2)
SELECT from_type, to_type, c,
       CAST(sum(c) OVER (PARTITION BY from_type) AS BIGINT) AS c_from,
       ${s6("CAST(c AS DOUBLE) / CAST(sum(c) OVER (PARTITION BY from_type) AS DOUBLE)")} AS p_cond
FROM counts"""

  /** Time-split next-event prediction eval — train a first-order Markov
    * argmax predictor on the first half of the time range (threshold =
    * exact integer midpoint of epoch-micros bounds), score it on the
    * second half: per from-state, the predicted next type, eval-pair
    * count, hits, and exact accuracy. The ML-eval companion to
    * [[markov]]'s transition matrix: counts and the time split are exact
    * integers, the predictor pick is an argmax window with a string
    * tie-break, accuracy is one division of exact counts. Transitions
    * whose from-state never appears in training drop out via the inner
    * join (coverage is visible as Σn_eval). Two passes over the pair
    * frame (train grouping vs eval join) — deliberately NOT checkpointed:
    * the pair frame is event-sized, and two scans beat materializing it
    * at 100 TB. */
  private def markovEval(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val pairs0 = AnalyticsQueries.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("us", expr("unix_micros(ts)"))
      .withColumn("nxt", lead(col("event_type"), 1).over(w))
      .withColumn("nxt_us", lead(expr("unix_micros(ts)"), 1).over(w))
      .filter(col("nxt").isNotNull)
    val bounds = pairs0.agg(min(col("us")).as("lo"), max(col("nxt_us")).as("hi"))
    val pairs = pairs0.crossJoin(broadcast(bounds))
      .withColumn("thr", expr("lo + (hi - lo) div 2"))
    val train = pairs.filter(col("nxt_us") <= col("thr"))
      .groupBy(col("event_type"), col("nxt")).agg(count(lit(1)).as("c"))
    val pred = train.withColumn("rk", row_number().over(
        Window.partitionBy(col("event_type")).orderBy(col("c").desc, col("nxt"))))
      .filter(col("rk") === 1)
      .select(col("event_type"), col("nxt").as("predicted"))
    pairs.filter(col("nxt_us") > col("thr"))
      .join(pred, Seq("event_type"))
      .groupBy(col("event_type"), col("predicted"))
      .agg(count(lit(1)).as("n_eval"),
        count(when(col("nxt") === col("predicted"), 1)).as("n_correct"))
      .select(col("event_type"), col("predicted"), col("n_eval"),
        col("n_correct"),
        Det.snap(col("n_correct").cast("double") /
          col("n_eval").cast("double"), 6).as("accuracy"))
  }

  private val markovEvalSql =
    s"""WITH ev AS (
  SELECT user_id, event_type, epoch_us(ts) AS us,
         lead(event_type, 1) OVER w AS nxt,
         lead(epoch_us(ts), 1) OVER w AS nxt_us
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
p AS (SELECT * FROM ev WHERE nxt IS NOT NULL),
b AS (SELECT min(us) AS lo, max(nxt_us) AS hi FROM p),
pairs AS (SELECT p.*, (b.lo + (b.hi - b.lo) // 2) AS thr FROM p, b),
train AS (
  SELECT event_type, nxt, count(*) AS c
  FROM pairs WHERE nxt_us <= thr GROUP BY 1, 2),
pred AS (
  SELECT event_type, nxt AS predicted FROM (
    SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY c DESC, nxt) AS rk
    FROM train) t
  WHERE rk = 1)
SELECT e.event_type, pr.predicted, count(*) AS n_eval,
       count(CASE WHEN e.nxt = pr.predicted THEN 1 END) AS n_correct,
       ${s6("CAST(count(CASE WHEN e.nxt = pr.predicted THEN 1 END) AS DOUBLE) / CAST(count(*) AS DOUBLE)")} AS accuracy
FROM (SELECT * FROM pairs WHERE nxt_us > thr) e
JOIN pred pr USING (event_type)
GROUP BY 1, 2"""

  /** Per-user autocorrelation of `value` at lags 1..3 — exact Pearson
    * (Det.corrD) over (value, lag_k(value)) pairs, the stationarity probe
    * behind seasonality/regime detection. One window pass computes all
    * three lag columns (single Exchange + Sort on user), a stack unpivot
    * turns them into (lag_k, pair) rows, and one aggregate finishes — the
    * shuffled volume is the pair table, never touched twice.
    */
  private def autocorr(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val lagCols = AcfLags.map(k => lag(col("value"), k).over(w).as(s"l$k"))
    val wide = AnalyticsQueries.events(s, d)
      .select(col("user_id") +: col("value") +: lagCols: _*)
    val stackArgs = AcfLags.map(k => s"$k, l$k").mkString(", ")
    wide
      .selectExpr("user_id", "value",
        s"stack(${AcfLags.size}, $stackArgs) AS (lag_k, vl)")
      .filter(col("vl").isNotNull)
      .groupBy(col("user_id"), col("lag_k"))
      .agg(count(lit(1)).as("n_pairs"),
        Det.snap(Det.corrD(col("value"), col("vl"), AcfScale), 6).as("acf"))
  }

  private val autocorrSql = {
    val lagSelects = AcfLags.map(k =>
      s"lag(value, $k) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS l$k")
      .mkString(",\n         ")
    val arms = AcfLags.map(k =>
      s"SELECT user_id, $k AS lag_k, value, l$k AS vl FROM seq WHERE l$k IS NOT NULL")
      .mkString("\n  UNION ALL\n  ")
    s"""WITH seq AS (
  SELECT user_id, value,
         $lagSelects
  FROM events
), un AS (
  $arms)
SELECT user_id, lag_k, count(*) AS n_pairs,
       ${s6(Det.corrDSql("value", "vl", AcfScale))} AS acf
FROM un GROUP BY user_id, lag_k"""
  }

  /** The shared thresholded supplier co-occurrence edge list (edge x<y
    * iff the two suppliers appear in ≥ MinCo common orders) — ONE
    * definition feeding triangles, PageRank and the degree
    * distribution. Callers cache: every consumer reads it more than
    * once. Composed as threshold-over-pair-counts so the SAME filter
    * body serves both the from-scratch contract path and the
    * [[graft.ops.GraphArtifact]] readers (r13 verdict #1). */
  private def suppEdges(s: SparkSession, d: String): DataFrame =
    suppEdgesFrom(suppPairCounts(s, d))

  /** Unthresholded supplier pair counts — the artifact's `supp_pairs`
    * table and the base under both edge rules (MinCo filter here,
    * link_prediction's decile rule). */
  private[graft] def suppPairCounts(s: SparkSession, d: String): DataFrame =
    graft.ops.CoOccur.pairCounts(t(s, d, "lineitem"), "l_orderkey", "l_suppkey")

  /** Part-dimension twin (k-core, communities). */
  private[graft] def partPairCounts(s: SparkSession, d: String): DataFrame =
    graft.ops.CoOccur.pairCounts(t(s, d, "lineitem"), "l_orderkey", "l_partkey")

  /** MinCo edge filter over a pair-counts frame — with
    * [[suppPairCounts]] this IS [[graft.ops.CoOccur.edges]], split so an
    * artifact-loaded pair table can enter the same body. */
  private[graft] def suppEdgesFrom(pc: DataFrame): DataFrame =
    pc.filter(col("c") >= MinCo).select(col("x"), col("y"))

  private[graft] def partEdgesFrom(pc: DataFrame): DataFrame =
    pc.filter(col("c") >= PartMinCo).select(col("x"), col("y"))

  /** Triangle counting / clustering over the supplier co-occurrence graph:
    * one summary row with edge / ordered-wedge / triangle counts and the
    * wedge-closure ratio — the standard cohesion probe on co-occurrence
    * graphs. All three counts are exact integers; the closure ratio is one
    * correctly-rounded division of exact ints.
    *
    * Scale shape: see [[graft.ops.CoOccur.triangleStats]] — the wedge
    * count is a joinless per-node aggregate, the closure count is
    * degree-oriented (Schank–Wagner, Σ outdeg² = O(m^1.5) candidates),
    * and the joins flip from broadcast to sort-merge off the measured
    * edge count. GraphScaleSpec pins the sort-merge shape and the
    * broadcast≡sort-merge result equality.
    */
  /** Lazy triangle-stats frame over a cached edge list, returned with the
    * cache handle — the plan-inspection surface for PlanShapeSpec (the
    * contract query's eager checkpoint hides the join shape behind an
    * RDD scan). */
  private[graft] def trianglesLazy(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    val edges = suppEdges(s, d).cache()
    (edges, graft.ops.CoOccur.triangleStats(edges))
  }

  private def triangles(s: SparkSession, d: String): DataFrame =
    trianglesFrom(suppEdges(s, d))

  /** Census body over ANY edge frame — the contract path passes freshly
    * derived edges, the artifact path passes filter-over-loaded-parquet;
    * one body keeps the two bit-identical (GraphArtifactSpec). */
  private[graft] def trianglesFrom(edgesIn: DataFrame): DataFrame = {
    val edges = edgesIn.cache()
    // one-row summary: materialize it eagerly (localCheckpoint truncates
    // the lineage into a single tiny block) so the edge cache can be
    // released HERE instead of leaking for the driver session's lifetime
    val out = graft.ops.CoOccur.triangleStats(edges).localCheckpoint(true)
    edges.unpersist(false)
    out
  }

  /** Common-neighbor link prediction on the supplier co-occurrence graph:
    * for NON-adjacent pairs, shared-neighbor count plus the exact Jaccard
    * of neighborhoods cn/(deg_a+deg_b−cn) — the classic "which edge forms
    * next" probe (and the quality eval for graph embeddings). Candidate
    * enumeration is the same Σdeg² wedge bound as [[triangles]]
    * (Schank–Wagner); everything but one final division is exact integer
    * arithmetic; the global top-20 goes through TakeOrdered (ORDER BY +
    * LIMIT — no single-partition window over the full candidate set),
    * with ranks replayed by a window over the 20 survivors. */
  /** Lazy scored/ranked frame over the two checkpointed inputs (pc,
    * edges) — the plan-inspection surface for the link_prediction pin
    * (the contract query's eager output checkpoint hides the wedge-join
    * shape). Returns the checkpoints for the caller to release. */
  private[graft] def linkPredictionLazy(s: SparkSession, d: String): (Seq[DataFrame], DataFrame) =
    linkPredictionLazyFrom(suppPairCounts(s, d))

  private[graft] def linkPredictionLazyFrom(pc0: DataFrame): (Seq[DataFrame], DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    // Decile edge rule: keep the strongest ~10% of co-occurring pairs —
    // T = max{v : |{c ≥ v}| ≥ ⌈N/10⌉}. A fixed absolute floor (MinCo)
    // saturates: at small SFs every supplier pair co-occurs and the
    // graph goes complete (no pair left to predict). The threshold is
    // histogram-sized integer algebra (|distinct c| rows) broadcast
    // back onto the pair table — no global sort of the pairs.
    val pc = pc0.localCheckpoint(true)
    val hist = pc.groupBy(col("c")).agg(count(lit(1)).as("m"))
    val tot = hist.agg(sum(col("m")).as("n"))
    val thr = hist.crossJoin(broadcast(tot))
      .withColumn("ge", sum(col("m")).over(
        Window.orderBy(col("c").desc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("ge") >= expr("(n + 9) div 10"))
      .agg(max(col("c")).as("t"))
    val edges = pc.join(broadcast(thr), col("c") >= col("t"))
      .select(col("x"), col("y"))
      .localCheckpoint(true)
    val adj = edges.union(edges.select(col("y").as("x"), col("x").as("y")))
    val deg = adj.groupBy(col("x")).agg(count(lit(1)).as("deg"))
    // Hub guard (round-14 hot-hub tier finding): wedge enumeration is
    // Θ(Σ deg(center)²), so ONE 100k-degree hub yields ~5·10⁹ wedge
    // pairs and the query never finishes — no salt or AQE split fixes
    // an output that large. The algorithmic answer (the Adamic–Adar
    // insight: a common neighbor of degree d carries ~1/log d signal,
    // so super-node co-membership is noise) is to exclude wedge
    // CENTERS above WedgeCap from common-neighbor counting; endpoint
    // degrees (the Jaccard denominator) stay TRUE degrees. Every
    // driver-fixture degree is far below the cap, so contract results
    // are unchanged (the Verify hash would catch otherwise); at the
    // hub tier this bounds candidates to Σ_{deg≤cap} deg² while the
    // hub still appears as an ENDPOINT through low-degree centers.
    val centers = deg.filter(col("deg") <= WedgeCap)
      .select(col("x").as("n"))
    val cn = adj.select(col("x").as("a"), col("y").as("n"))
      .join(centers, Seq("n"), "left_semi")
      .join(adj.select(col("x").as("n"), col("y").as("b")), "n")
      .filter(col("a") < col("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("cn"))
    val nonAdj = cn.join(
      edges.select(col("x").as("a"), col("y").as("b")), Seq("a", "b"), "left_anti")
    val scored = nonAdj
      .join(deg.select(col("x").as("a"), col("deg").as("dega")), "a")
      .join(deg.select(col("x").as("b"), col("deg").as("degb")), "b")
      .withColumn("jaccard", Det.snap(col("cn").cast("double") /
        (col("dega") + col("degb") - col("cn")).cast("double"), 6))
    val out = scored
      .orderBy(col("cn").desc, col("a"), col("b")).limit(20)
      .withColumn("rk", row_number().over(
        Window.orderBy(col("cn").desc, col("a"), col("b"))).cast("long"))
      .select(col("rk"), col("a"), col("b"), col("cn"), col("jaccard"))
    (Seq(pc, edges), out)
  }

  private def linkPrediction(s: SparkSession, d: String): DataFrame =
    linkPredictionFrom(suppPairCounts(s, d))

  /** Scoring body over ANY unthresholded pair-counts frame (contract:
    * fresh build; artifact: loaded `supp_pairs`). */
  private[graft] def linkPredictionFrom(pc: DataFrame): DataFrame = {
    val (cks, lazyOut) = linkPredictionLazyFrom(pc)
    // 20-row result: checkpoint eagerly, then release the pc/edges
    // checkpoints (Dataset.unpersist is a no-op on checkpoints — the
    // round-10 hygiene finding; Checkpoints.release drops the blocks).
    val out = lazyOut.localCheckpoint(true)
    graft.ops.Checkpoints.release(cks: _*)
    out
  }

  private val linkPredictionSql =
    s"""WITH os AS (
  SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
), p0 AS MATERIALIZED (
  SELECT a.l_suppkey AS x, b.l_suppkey AS y, count(*) AS c
  FROM os a JOIN os b
    ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
  GROUP BY 1, 2
), hist AS (
  SELECT c, count(*) AS m FROM p0 GROUP BY 1
), tot AS (
  SELECT sum(m) AS n FROM hist
), ge AS (
  SELECT c, sum(m) OVER (ORDER BY c DESC) AS ge FROM hist
), thr AS (
  SELECT max(c) AS t FROM ge, tot WHERE ge.ge >= (tot.n + 9) // 10
), edges AS MATERIALIZED (
  SELECT x, y FROM p0, thr WHERE c >= thr.t
), adj AS MATERIALIZED (
  SELECT x, y FROM edges UNION ALL SELECT y AS x, x AS y FROM edges
), deg AS MATERIALIZED (
  SELECT x, count(*) AS deg FROM adj GROUP BY 1
), centers AS (
  SELECT x AS node FROM deg WHERE deg <= $WedgeCap
), cn AS MATERIALIZED (
  SELECT l.x AS a, r.y AS b, count(*) AS cn
  FROM adj l JOIN centers ct ON l.y = ct.node
  JOIN adj r ON l.y = r.x AND l.x < r.y
  GROUP BY 1, 2
), nonadj AS (
  SELECT c2.a, c2.b, c2.cn FROM cn c2
  WHERE NOT EXISTS (SELECT 1 FROM edges e WHERE e.x = c2.a AND e.y = c2.b)
), scored AS (
  SELECT n.a, n.b, n.cn, da.deg AS dega, db.deg AS degb
  FROM nonadj n JOIN deg da ON da.x = n.a JOIN deg db ON db.x = n.b)
SELECT rk, CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,
       CAST(cn AS BIGINT) AS cn,
       ${s6("CAST(cn AS DOUBLE) / CAST(dega + degb - cn AS DOUBLE)")} AS jaccard
FROM (
  SELECT *, CAST(row_number() OVER (ORDER BY cn DESC, a, b) AS BIGINT) AS rk
  FROM scored) t
WHERE rk <= 20"""

  private val trianglesSql =
    s"""WITH os AS (
  SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
), pairs AS (
  SELECT a.l_suppkey AS x, b.l_suppkey AS y, count(*) AS c
  FROM os a JOIN os b
    ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
  GROUP BY 1, 2
), edges AS (
  SELECT x, y FROM pairs WHERE c >= $MinCo
), closed AS (
  SELECT count(*) AS n_wedges, count(e3.x) AS n_triangles
  FROM edges e1
  JOIN edges e2 ON e1.y = e2.x
  LEFT JOIN edges e3 ON e3.x = e1.x AND e3.y = e2.y)
SELECT (SELECT count(*) FROM edges) AS n_edges, n_wedges, n_triangles,
       CASE WHEN n_wedges > 0
            THEN ${s6("CAST(n_triangles AS DOUBLE) / CAST(n_wedges AS DOUBLE)")}
       END AS wedge_closure
FROM closed"""

  // PageRank damping 17/20 (= 0.85 exactly, as a rational) and rank
  // grid 10^12: every quantity in the iteration is an exact LONG —
  // contributions are floor divisions `k div deg`, the damped update is
  // `base + (17·Σ) div 20` — so the sums are associative integers and
  // the K-step result is bit-identical on any cluster, any engine.
  private val PrIters = 3
  private val PrGrid = 1000000000000L

  /** Fixed-iteration PageRank over the supplier co-occurrence graph
    * (same thresholded edge set as [[triangles]], symmetrized). The
    * float-free formulation above is the point: classic double-valued
    * PageRank drifts across partitionings because + isn't associative;
    * the long-grid walk cannot. Scale shape per iteration: one shuffle
    * (groupBy dst) against a degree-annotated edge list that itself
    * shuffles once at build; K is a constant. At 100 TB checkpoint the
    * rank frame every few iterations to truncate lineage (see
    * ConnectedComponents).
    *
    * Emits (v, degree, pr) — pr = k/10^12, two exact casts + one
    * correctly-rounded division.
    */
  /** Size-adaptive (the ConnectedComponents pattern): the rank walk is
    * EXACT LONG arithmetic throughout, so its sums are order-independent
    * and a driver replay of the same operations is bit-identical to the
    * distributed loop by construction (GraphAdaptiveSpec proves it). The
    * thresholded co-occurrence edge list is item-dimension-bounded, so
    * the common case collects (the pair scan stays distributed — only
    * the K tiny iteration joins move to the driver); past `smallEdges`
    * the distributed loop runs unchanged. */
  private[graft] def pagerank(s: SparkSession, d: String,
                              smallEdges: Long = Adaptive.threshold(1L << 20)): DataFrame =
    pagerankFrom(s, suppEdges(s, d), smallEdges)

  private[graft] def pagerankFrom(s: SparkSession, edgesIn: DataFrame,
                                  smallEdges: Long = Adaptive.threshold(1L << 20)): DataFrame = {
    // cache: the union below and the degree/init/final consumers would
    // otherwise re-run the whole pair-generation scan per branch
    val pairs = edgesIn.cache()
    if (pairs.count() <= smallEdges) {
      val pe = pairs.collect().map(r => (r.getLong(0), r.getLong(1)))
      pairs.unpersist(false)
      return pagerankDriver(s, pe)
    }
    val directed = pairs.unionByName(
      pairs.select(col("y").as("x"), col("x").as("y")))
    val degrees = directed.groupBy(col("x").as("v"))
      .agg(count(lit(1)).as("degree")).cache()
    // one driver count folds n_nodes into exact-long literals (the same
    // integer arithmetic as before — `a div b` on positive longs), which
    // drops the crossJoin + max(n_nodes) threading from every iteration
    val nNodes = degrees.count()
    if (nNodes == 0L) {
      val empty = degrees.select(col("v"), col("degree"), lit(0.0).as("pr"))
        .limit(0).localCheckpoint(true)
      pairs.unpersist(false); degrees.unpersist(false)
      return empty
    }
    val withDeg = directed.join(degrees, col("x") === col("v"))
      .select(col("x").as("src"), col("y").as("dst"), col("degree")).cache()
    val baseK = (3L * PrGrid / 20L) / nNodes
    var ranks = degrees.select(col("v"), lit(PrGrid / nNodes).as("k"))
    for (_ <- 1 to PrIters) {
      // shuffle join each iteration (ranks is node-sized but COMPUTED —
      // broadcasting it forces a per-iteration broadcast build, measured
      // slower at sf0.1; the cached edge list's exchange is the cost AQE
      // handles at scale)
      ranks = ranks
        .join(withDeg, col("v") === col("src"))
        .select(col("dst"), expr("k div degree").as("contrib"))
        .groupBy(col("dst")).agg(sum(col("contrib")).as("s"))
        .select(col("dst").as("v"),
          (lit(baseK) + expr("(17 * s) div 20")).as("k"))
    }
    // Node-sized result: eager localCheckpoint truncates the K-iteration
    // lineage into one small block set, after which the three edge-list
    // caches are released — previously they leaked for the rest of the
    // driver session (round-5 finding). The checkpoint blocks are the
    // same order as the emitted frame; the ContextCleaner reclaims them
    // when the frame is collected and dropped.
    val out = ranks.join(degrees, "v")
      .select(col("v"), col("degree"),
        (col("k").cast("double") / lit(PrGrid.toDouble)).as("pr"))
      .localCheckpoint(true)
    pairs.unpersist(false); degrees.unpersist(false); withDeg.unpersist(false)
    out
  }

  /** Driver replay of the long-grid walk over a collected x<y edge list:
    * identical operations — floor divisions on non-negative longs (Scala
    * `/` ≡ SQL `div` there), the damped update `base + (17·Σ) div 20`,
    * one final exact cast + correctly-rounded division — in a different
    * (irrelevant: exact) summation order. */
  private def pagerankDriver(s: SparkSession, pe: Array[(Long, Long)]): DataFrame = {
    import s.implicits._
    import scala.collection.mutable
    val deg = mutable.LongMap.empty[Long]
    pe.foreach { case (x, y) =>
      deg.update(x, deg.getOrElse(x, 0L) + 1L)
      deg.update(y, deg.getOrElse(y, 0L) + 1L)
    }
    val nNodes = deg.size.toLong
    if (nNodes == 0L)
      return s.createDataset(Seq.empty[(Long, Long, Double)]).toDF("v", "degree", "pr")
    val baseK = (3L * PrGrid / 20L) / nNodes
    var k = mutable.LongMap.empty[Long]
    deg.foreachKey(v => k.update(v, PrGrid / nNodes))
    for (_ <- 1 to PrIters) {
      val nk = mutable.LongMap.empty[Long]
      pe.foreach { case (x, y) => // symmetric edge = both directed arcs
        nk.update(y, nk.getOrElse(y, 0L) + k(x) / deg(x))
        nk.update(x, nk.getOrElse(x, 0L) + k(y) / deg(y))
      }
      val k2 = mutable.LongMap.empty[Long]
      nk.foreach { case (v, sum) => k2.update(v, baseK + (17L * sum) / 20L) }
      k = k2
    }
    val rows = deg.keys.toArray.sorted
      .map(v => (v, deg(v), k(v).toDouble / PrGrid.toDouble)).toIndexedSeq
    s.createDataset(rows).toDF("v", "degree", "pr")
  }

  private val pagerankSql = {
    val iterBody = (prev: String, out: String) =>
      s"""$out AS MATERIALIZED (
  SELECT w.dst AS v,
         ((3 * $PrGrid // 20) // nn.n_nodes) + ((17 * sum(p.k // w.degree)) // 20) AS k
  FROM $prev p JOIN withdeg w ON p.v = w.src CROSS JOIN nn
  GROUP BY w.dst, nn.n_nodes)"""
    s"""WITH os AS (
  SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
), pairs AS MATERIALIZED (
  SELECT a.l_suppkey AS x, b.l_suppkey AS y
  FROM os a JOIN os b
    ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
  GROUP BY 1, 2 HAVING count(*) >= $MinCo
), dir AS (
  SELECT x, y FROM pairs UNION ALL SELECT y AS x, x AS y FROM pairs
), deg AS MATERIALIZED (
  SELECT x AS v, count(*) AS degree FROM dir GROUP BY 1
), withdeg AS MATERIALIZED (
  SELECT d.x AS src, d.y AS dst, g.degree FROM dir d JOIN deg g ON d.x = g.v
), nn AS (SELECT count(*) AS n_nodes FROM deg),
r0 AS (
  SELECT v, $PrGrid // n_nodes AS k FROM deg CROSS JOIN nn),
${iterBody("r0", "r1")},
${iterBody("r1", "r2")},
${iterBody("r2", "r3")}
SELECT r3.v, g.degree, ${s6(s"CAST(r3.k AS DOUBLE) / CAST($PrGrid AS DOUBLE)")} AS pr
FROM r3 JOIN deg g ON r3.v = g.v"""
  }

  /** Degree distribution of the co-occurrence graph: per degree value,
    * node count and share — the first diagnostic on any graph (skew
    * here predicts hot keys in every downstream graph op). Exact
    * integers + one exact-long-ratio share; the distribution table is
    * degree-cardinality-sized (tiny), aggregated from the same
    * thresholded edge set as [[triangles]]/[[pagerank]]. */
  private def degreeDist(s: SparkSession, d: String): DataFrame =
    degreeDistFrom(suppEdges(s, d))

  private[graft] def degreeDistFrom(pairs: DataFrame): DataFrame = {
    val degrees = pairs.unionByName(
        pairs.select(col("y").as("x"), col("x").as("y")))
      .groupBy(col("x")).agg(count(lit(1)).as("degree"))
    val n = degrees.agg(count(lit(1)).as("n_nodes"))
    degrees.groupBy(col("degree")).agg(count(lit(1)).as("n_at_degree"))
      .crossJoin(broadcast(n))
      .select(col("degree"), col("n_at_degree"),
        (col("n_at_degree").cast("double") / col("n_nodes").cast("double")).as("share"))
  }

  private val degreeDistSql =
    s"""WITH os AS (
  SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
), pairs AS (
  SELECT a.l_suppkey AS x, b.l_suppkey AS y
  FROM os a JOIN os b
    ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
  GROUP BY 1, 2 HAVING count(*) >= $MinCo
), dir AS (
  SELECT x, y FROM pairs UNION ALL SELECT y AS x, x AS y FROM pairs
), deg AS (
  SELECT x, count(*) AS degree FROM dir GROUP BY 1
), n AS (SELECT count(*) AS n_nodes FROM deg)
SELECT degree, count(*) AS n_at_degree,
       ${s6("CAST(count(*) AS DOUBLE) / CAST(n.n_nodes AS DOUBLE)")} AS share
FROM deg CROSS JOIN n
GROUP BY degree, n.n_nodes"""

  // k-core profile over the PART co-purchase graph (parts sharing ≥
  // PartMinCo orders — denser and more degree-varied than the supplier
  // graph, so the peel actually cascades). KCoreRounds covers the
  // deepest measured cascade across the fixture scales (6 at sf0.1);
  // extra rounds are no-ops at fixpoint.
  private val PartMinCo = 2
  private val KCoreK = 2
  private val KCoreRounds = 6

  /** k-core peel — see [[graft.ops.KCore.peel]] for semantics and the
    * per-round aggregate + semi-join scale shape. */
  private def kcore(s: SparkSession, d: String): DataFrame =
    kcoreFrom(partEdgesFrom(partPairCounts(s, d)))

  private[graft] def kcoreFrom(edges: DataFrame): DataFrame =
    graft.ops.KCore.peel(edges, KCoreK, KCoreRounds)
      .select(col("node").as("part_id"), col("degree"))

  /** Twin of [[kcore]]: the peel trajectory UNROLLED into generated CTE
    * blocks from the same (k, rounds) constants — per round a degree
    * aggregate, the survivor filter, and the endpoint-restricted edge
    * set; the report joins last-round survivors to final residual
    * degrees. All exact integers. Every e/s CTE is MATERIALIZED:
    * DuckDB otherwise INLINES each reference, and e_r referencing
    * e_{r−1} three times makes the expansion (and its parquet file
    * handles) grow 3^rounds — the "too many open files" failure mode. */
  private val kcoreSql = {
    val e0 =
      s"""e0 AS MATERIALIZED (
  SELECT a.l_partkey AS x, b.l_partkey AS y
  FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) a
  JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING count(*) >= $PartMinCo)"""
    val blocks = (1 to KCoreRounds).map { r =>
      s"""d$r AS MATERIALIZED (
  SELECT node, count(*) AS deg
  FROM (SELECT x AS node FROM e${r - 1} UNION ALL SELECT y FROM e${r - 1})
  GROUP BY 1),
s$r AS MATERIALIZED (SELECT node FROM d$r WHERE deg >= $KCoreK),
e$r AS MATERIALIZED (
  SELECT e.x, e.y FROM e${r - 1} e
  JOIN s$r sx ON e.x = sx.node
  JOIN s$r sy ON e.y = sy.node)"""
    }.mkString(",\n")
    s"""WITH $e0,
$blocks,
fin AS (
  SELECT node, count(*) AS degree
  FROM (SELECT x AS node FROM e$KCoreRounds UNION ALL SELECT y FROM e$KCoreRounds)
  GROUP BY 1)
SELECT s.node AS part_id, coalesce(f.degree, 0) AS degree
FROM s$KCoreRounds s LEFT JOIN fin f USING (node)"""
  }

  /** Community structure report over the part co-purchase graph:
    * connected components as the (deterministic) community assignment,
    * then per community the node count, degree volume, internal edge
    * count, within-community density 2e_c/(n_c(n_c−1)), and the
    * Newman–Girvan modularity contribution e_c/m − (d_c/2m)² computed
    * as the single exact-integer division (4m·e_c − d_c²)/4m² — the
    * partition-quality readout clustering jobs publish. (Components
    * have zero cut by construction, so conductance is identically 0
    * and deliberately omitted.)
    *
    * Scale shape: the component step is the size-adaptive CC; the stats
    * are two community-keyed aggregates (degrees, internal edges) over
    * edge-list-sized frames; m is a scalar off the cached edge list.
    * Envelope: 4m·e_c ≤ 4m² and d_c² ≤ 4m² stay far under 2^53 for any
    * co-occurrence graph this side of 10^7 edges; the numerator is
    * signed → signedDblSql on the oracle side. */
  /** (The round-12 SPARK_GRAFT_SLICE_MOD md5-node-slice escape hatch is
    * GONE, round-13: the unrolled min-label oracle above grades the full
    * 100× problem in ~1.5 min, and an env-sensitive contract query was
    * an ambient-misconfiguration hazard — round-12 ADVICE.) */
  private def communities(s: SparkSession, d: String): DataFrame =
    communitiesFrom(partEdgesFrom(partPairCounts(s, d)))

  private[graft] def communitiesFrom(edgesIn: DataFrame): DataFrame = {
    val edges = edgesIn.cache()
    val m = edges.count()
    val cc = graft.ops.ConnectedComponents.clusters(edges, "x", "y")
      .select(col("id"), col("cluster_id").as("community"))
    val deg = edges.select(col("x").as("node"))
      .unionByName(edges.select(col("y").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    val dc = deg.join(cc, deg("node") === cc("id"))
      .groupBy(col("community"))
      .agg(count(lit(1)).as("n_nodes"), sum(col("deg")).as("degree_sum"))
    val ic = edges
      .join(cc.select(col("id").as("x"), col("community")), Seq("x"))
      .groupBy(col("community")).agg(count(lit(1)).as("internal_edges"))
    val out = dc.join(ic, Seq("community"))
      .select(col("community"), col("n_nodes"), col("degree_sum"),
        col("internal_edges"),
        when(col("n_nodes") >= 2, Det.snap(
          (col("internal_edges") * 2L).cast("double") /
            (col("n_nodes") * (col("n_nodes") - 1L)).cast("double"), 6))
          .as("density"),
        Det.snap(
          (col("internal_edges") * (4L * m) - col("degree_sum") * col("degree_sum"))
            .cast("double") / lit((4L * m * m).toDouble), 6)
          .as("modularity_term"))
      .localCheckpoint(true)
    edges.unpersist(false)
    out
  }

  /** Twin of [[communities]]: same edge list, UNROLLED min-label
    * components (clustersUnrolledSql — the reach-closure twin is
    * Θ(n·|component|) and blew the oracle budget on the count-densified
    * 100× part graph; the unrolled propagation grades it UNSLICED,
    * round-13), and exact-integer algebra (the scalar m crosses as a
    * CTE; the signed modularity numerator goes through signedDblSql). */
  private val communitiesSql =
    s"""WITH e0 AS MATERIALIZED (
  SELECT a.l_partkey AS x, b.l_partkey AS y
  FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) a
  JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING count(*) >= $PartMinCo),
cc AS MATERIALIZED (
  SELECT id, cluster_id AS community
  FROM (${graft.ops.ConnectedComponents.clustersUnrolledSql("SELECT * FROM e0", "x", "y")})),
mm AS (SELECT CAST(count(*) AS BIGINT) AS m FROM e0),
deg AS (
  SELECT node, count(*) AS deg
  FROM (SELECT x AS node FROM e0 UNION ALL SELECT y FROM e0) GROUP BY 1),
dc AS (
  SELECT cc.community, count(*) AS n_nodes, CAST(sum(deg.deg) AS BIGINT) AS degree_sum
  FROM deg JOIN cc ON cc.id = deg.node GROUP BY 1),
ic AS (
  SELECT cc.community, count(*) AS internal_edges
  FROM e0 JOIN cc ON cc.id = e0.x GROUP BY 1)
SELECT dc.community, dc.n_nodes, dc.degree_sum, ic.internal_edges,
       CASE WHEN dc.n_nodes >= 2 THEN
         ${s6("CAST(ic.internal_edges * 2 AS DOUBLE) / CAST(dc.n_nodes * (dc.n_nodes - 1) AS DOUBLE)")}
       END AS density,
       ${s6(s"${Det.signedDblSql("ic.internal_edges * 4 * mm.m - dc.degree_sum * dc.degree_sum")} / CAST(4 * mm.m * mm.m AS DOUBLE)")}
         AS modularity_term
FROM dc JOIN ic USING (community) CROSS JOIN mm"""

  // Multi-source bounded-hop BFS over the supplier co-occurrence graph:
  // seeds = the BfsSeeds highest-degree hubs (degree desc, id asc — a
  // total order), rounds cover the measured eccentricity at the fixture
  // scales (extra rounds are fixpoint no-ops).
  private val BfsSeeds = 3
  private val BfsRounds = 4
  private val BfsStep = 1L << 40

  /** Hub-distance map: hop distance to the nearest of the top-[[BfsSeeds]]
    * degree hubs plus the hub assignment (seed Voronoi) — see
    * [[graft.ops.Bfs.seededHops]] for the exact-integer label design and
    * the one-join-per-round relaxation shape. */
  private def graphBfs(s: SparkSession, d: String): DataFrame =
    bfsLabelsFrom(suppEdges(s, d))

  /** BFS hub-distance labels over ANY x<y edge frame — the artifact's
    * `bfs_labels` table is exactly this output persisted (exact longs,
    * parquet-lossless), so the loaded artifact ≡ this body bit for bit
    * while the edge frame is unchanged (GraphArtifactSpec proves both
    * the round-trip and the refresh-after-merge equivalence). */
  private[graft] def bfsLabelsFrom(edges: DataFrame): DataFrame = {
    val dir = edges.unionByName(
      edges.select(col("y").as("x"), col("x").as("y"))).cache()
    val deg = dir.groupBy(col("x")).agg(count(lit(1)).as("deg"))
      .select(col("x").as("node"), col("deg"))
    val seeds = deg.orderBy(col("deg").desc, col("node")).limit(BfsSeeds)
      .select(col("node"))
    val out = graft.ops.Bfs.seededHops(dir, seeds, BfsRounds, BfsStep)
      .select(col("node").as("supp_id"), col("hops"), col("nearest_seed"))
      .localCheckpoint(true)
    dir.unpersist(false)
    out
  }

  /** Twin of [[graphBfs]]: the relaxation UNROLLED into one MATERIALIZED
    * CTE per round (b_r references b_{r−1} twice — plain CTEs would
    * expand 2^rounds), same packed `hops·step + seed` longs, same
    * min-combine; seeds via the identical (deg DESC, node) total order. */
  private val graphBfsSql = {
    val blocks = (1 to BfsRounds).map { r =>
      s"""b$r AS MATERIALIZED (
  SELECT node, min(code) AS code FROM (
    SELECT node, code FROM b${r - 1}
    UNION ALL
    SELECT CAST(d.y AS BIGINT) AS node, b.code + $BfsStep AS code
    FROM b${r - 1} b JOIN dir d ON d.x = b.node
  ) GROUP BY 1)"""
    }.mkString(",\n")
    s"""WITH os AS (
  SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
), pairs AS (
  SELECT a.l_suppkey AS x, b.l_suppkey AS y
  FROM os a JOIN os b
    ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
  GROUP BY 1, 2 HAVING count(*) >= $MinCo
), dir AS MATERIALIZED (
  SELECT x, y FROM pairs UNION ALL SELECT y AS x, x AS y FROM pairs
), deg AS (
  SELECT x AS node, count(*) AS deg FROM dir GROUP BY 1
), seeds AS (
  SELECT node FROM deg ORDER BY deg DESC, node LIMIT $BfsSeeds
), b0 AS MATERIALIZED (
  SELECT CAST(node AS BIGINT) AS node, CAST(node AS BIGINT) AS code FROM seeds
),
$blocks
SELECT node AS supp_id, code // $BfsStep AS hops, code % $BfsStep AS nearest_seed
FROM b$BfsRounds"""
  }

  // DeepWalk corpus over the supplier co-occurrence graph: one
  // WalkSteps-length walk per node, md5-seeded uniform neighbor draws.
  private[graft] val WalkSteps = 4

  /** Random-walk sentence corpus — see [[graft.ops.RandomWalk.walks]]
    * for the seeded-draw determinism and the one-join-per-step shape.
    * Starts = every graph node (so the corpus covers the graph). */
  private def graphWalks(s: SparkSession, d: String): DataFrame = {
    val edges = suppEdges(s, d)
    val dir = edges.unionByName(
      edges.select(col("y").as("x"), col("x").as("y"))).cache()
    // walksAll derives the start set (= every node) from its own
    // checkpointed neighbor index — no separate distinct pass (r16);
    // returns an eager checkpoint with every intermediate released
    // (RandomWalk hygiene) — the ONE block set this query keeps.
    val out = graft.ops.RandomWalk.walksAll(dir, WalkSteps)
    dir.unpersist(false)
    out
  }

  /** Plan-pin seam: one LAZY uniform walk step over checkpointed
    * nbr/deg/frontier frames — the per-step join shape the eager
    * checkpoints hide from the full-query plan. Returns the step frame
    * and a cleanup that releases the input checkpoints. */
  private[graft] def walkStepLazy(s: SparkSession, d: String): (DataFrame, () => Unit) = {
    val edges = suppEdges(s, d)
    val dir = edges.unionByName(
      edges.select(col("y").as("x"), col("x").as("y"))).cache()
    val nbr = dir.select(col("x").cast("long").as("nx"),
        col("y").cast("long").as("ny"))
      .withColumn("idx", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("nx")).orderBy(col("ny"))).cast("long") - 1L)
      .localCheckpoint(true)
    val deg = dir.select(col("x").cast("long").as("dx"))
      .groupBy(col("dx")).agg(count(lit(1)).as("deg"))
      .localCheckpoint(true)
    val cur = dir.select(col("x").cast("long").as("walk_id")).distinct()
      .withColumn("node", col("walk_id"))
      .localCheckpoint(true)
    dir.unpersist(false)
    (graft.ops.RandomWalk.stepFrame(cur, nbr, deg, 1, "walk"),
      () => graft.ops.Checkpoints.release(nbr, deg, cur))
  }

  /** Plan-pin seam: one LAZY node2vec step (candidate expansion +
    * distance-1 probe + cumulative-weight pick) with the probe strategy
    * as decided by [[graft.ops.RandomWalk.biasedWalks]]'s row gate for
    * this fixture (broadcast under the gate, shuffled when forced). */
  private[graft] def biasedStepLazy(s: SparkSession, d: String): (DataFrame, () => Unit) = {
    val edges = suppEdges(s, d)
    val dir = edges.unionByName(
      edges.select(col("y").as("x"), col("x").as("y"))).cache()
    val nbr = dir.select(col("x").cast("long").as("nx"),
        col("y").cast("long").as("ny"))
      .withColumn("idx", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("nx")).orderBy(col("ny"))).cast("long") - 1L)
      .localCheckpoint(true)
    // A step ≥2 frontier with a REAL prev column (each node's first
    // neighbor as the previous hop): a NULL-literal prev lets Catalyst
    // constant-fold the distance-1 probe's join condition away and the
    // pin would miss the very join strategy it exists to pin.
    val cur = nbr.filter(col("idx") === 0L)
      .select(col("nx").as("walk_id"), col("ny").as("node"),
        col("nx").as("prev"))
      .localCheckpoint(true)
    dir.unpersist(false)
    // Same decision rule as biasedWalks (round-11 ADVICE): a COUNTED
    // row gate, not the force-flag alone — if the fixture's edge count
    // ever crosses the broadcast gate the pin flips with production
    // instead of silently diverging from it.
    val bc = nbr.count() <=
      graft.ops.Adaptive.threshold(graft.ops.RandomWalk.BroadcastEdgeRows)
    (graft.ops.RandomWalk.biasedStepFrame(cur, nbr, 2, N2vReturn,
      N2vCommon, N2vOut, "n2v", bc),
      () => graft.ops.Checkpoints.release(nbr, cur))
  }

  /** Twin of [[graphWalks]]: per-step MATERIALIZED CTEs (w_t references
    * w_{t−1} once but nbr/deg each step — materialized to keep the scan
    * count linear), the identical md5 draw via the shared 48-bit hex
    * parse, and the identical (ORDER BY ny) neighbor ranking. */
  private val graphWalksSql = {
    val blocks = (1 to WalkSteps).map { t =>
      val draw = graft.ops.CorpusHex.hv48Sql(
        s"md5('walk:' || CAST(w.walk_id AS VARCHAR) || ':$t')")
      s"""w$t AS MATERIALIZED (
  SELECT w.walk_id, n.ny AS node
  FROM w${t - 1} w
  JOIN deg d ON w.node = d.dx
  JOIN nbr n ON n.nx = w.node
   AND n.idx = CAST($draw AS BIGINT) % d.deg)"""
    }.mkString(",\n")
    val union = (0 to WalkSteps).map(t =>
      s"SELECT walk_id, CAST($t AS BIGINT) AS step, node FROM w$t")
      .mkString("\nUNION ALL\n")
    s"""WITH os AS (
  SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
), pairs AS (
  SELECT a.l_suppkey AS x, b.l_suppkey AS y
  FROM os a JOIN os b
    ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
  GROUP BY 1, 2 HAVING count(*) >= $MinCo
), dir AS MATERIALIZED (
  SELECT x, y FROM pairs UNION ALL SELECT y AS x, x AS y FROM pairs
), nbr AS MATERIALIZED (
  SELECT CAST(x AS BIGINT) AS nx, CAST(y AS BIGINT) AS ny,
         CAST(row_number() OVER (PARTITION BY x ORDER BY y) AS BIGINT) - 1 AS idx
  FROM dir
), deg AS MATERIALIZED (
  SELECT CAST(x AS BIGINT) AS dx, count(*) AS deg FROM dir GROUP BY 1
), w0 AS MATERIALIZED (
  SELECT CAST(x AS BIGINT) AS walk_id, CAST(x AS BIGINT) AS node
  FROM (SELECT DISTINCT x FROM dir)
),
$blocks
$union"""
  }

  // node2vec integer bias weights: p=1/2, q=2 scaled ×2 → return 4,
  // distance-1 2, in-out 1 (Grover–Leskovec KDD'16 α, exact integers).
  private val N2vReturn = 4L
  private val N2vCommon = 2L
  private val N2vOut = 1L

  /** node2vec biased walk corpus — see [[graft.ops.RandomWalk.biasedWalks]]
    * for the weighted seeded draw. Same co-occurrence graph, walk length
    * and start set as [[graphWalks]]; only the transition law differs.
    * Hub-scale note (r15): the exact cumulative-weight draw costs
    * Σ deg(visited) per step — 505 s at the 100×-hub tier; the
    * production alternative is [[graft.ops.RandomWalk.rejectionWalks]]
    * (Θ(rounds) per step, 23.5 s there, distribution-equivalent within
    * a spec-bounded tail — non-contract, see SCALE.md round-15). */
  private def graphWalksBiased(s: SparkSession, d: String): DataFrame = {
    val edges = suppEdges(s, d)
    val dir = edges.unionByName(
      edges.select(col("y").as("x"), col("x").as("y"))).cache()
    // biasedWalksAll derives starts from its neighbor index (r16) and
    // returns an eager checkpoint, intermediates released.
    val out = graft.ops.RandomWalk.biasedWalksAll(dir, WalkSteps,
      N2vReturn, N2vCommon, N2vOut)
    dir.unpersist(false)
    out
  }

  /** Twin of [[graphWalksBiased]]: per-step candidate expansion
    * (JOIN nbr), LEFT JOIN distance-1 probe, integer CASE weights, and
    * the cumulative-weight pick under the same 48-bit md5 draw — all
    * MATERIALIZED so scan count stays linear in steps. */
  private val graphWalksBiasedSql = {
    val blocks = (1 to WalkSteps).map { t =>
      val draw = graft.ops.CorpusHex.hv48Sql(
        s"md5('n2v:' || CAST(walk_id AS VARCHAR) || ':$t')")
      s"""wc$t AS MATERIALIZED (
  SELECT w.walk_id, w.node, w.prev, n.ny, n.idx,
         CASE WHEN n.ny = w.prev THEN $N2vReturn
              WHEN e.py IS NOT NULL THEN $N2vCommon
              ELSE $N2vOut END AS wt
  FROM wb${t - 1} w
  JOIN nbr n ON n.nx = w.node
  LEFT JOIN (SELECT nx AS px, ny AS py FROM nbr) e
    ON e.px = w.prev AND e.py = n.ny
), wb$t AS MATERIALIZED (
  SELECT walk_id, ny AS node, node AS prev FROM (
    SELECT walk_id, node, ny, wt,
           sum(wt) OVER (PARTITION BY walk_id ORDER BY idx
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
           sum(wt) OVER (PARTITION BY walk_id) AS tot
    FROM wc$t)
  WHERE ($draw % tot) >= cum - wt AND ($draw % tot) < cum)"""
    }.mkString(",\n")
    val union = (0 to WalkSteps).map(t =>
      s"SELECT walk_id, CAST($t AS BIGINT) AS step, node FROM wb$t")
      .mkString("\nUNION ALL\n")
    s"""WITH os AS (
  SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
), pairs AS (
  SELECT a.l_suppkey AS x, b.l_suppkey AS y
  FROM os a JOIN os b
    ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
  GROUP BY 1, 2 HAVING count(*) >= $MinCo
), dir AS MATERIALIZED (
  SELECT x, y FROM pairs UNION ALL SELECT y AS x, x AS y FROM pairs
), nbr AS MATERIALIZED (
  SELECT CAST(x AS BIGINT) AS nx, CAST(y AS BIGINT) AS ny,
         CAST(row_number() OVER (PARTITION BY x ORDER BY y) AS BIGINT) - 1 AS idx
  FROM dir
), wb0 AS MATERIALIZED (
  SELECT CAST(x AS BIGINT) AS walk_id, CAST(x AS BIGINT) AS node,
         CAST(NULL AS BIGINT) AS prev
  FROM (SELECT DISTINCT x FROM dir)
),
$blocks
$union"""
  }

  // Rejection-walker proposal rounds (r15 verdict #2: the hub-scale
  // walker is promoted to an oracle-exact contract query). 8 bounds the
  // uniform-fallback tail at ≤ 0.75⁸ ≈ 0.100 per step at the (4,2,1)
  // weights — see RandomWalk.rejectionWalks.
  private val N2vRounds = 8

  /** Rejection-sampled node2vec walk corpus — the PRODUCTION hub-scale
    * walker ([[graft.ops.RandomWalk.rejectionWalks]]: Θ(rounds) per
    * step independent of degree, 21.5× vs the exact cumulative-weight
    * draw at the 100×-hub tier) promoted from spec-bounded to
    * oracle-exact (r15 verdict #2). Same co-occurrence graph, walk
    * length, start set and integer weights as [[graphWalksBiased]];
    * the transition law is the md5-seeded propose/accept scheme, whose
    * draws are fully deterministic — so the DuckDB twin replays the
    * identical proposal/acceptance trajectory. */
  private def graphWalksRejection(s: SparkSession, d: String): DataFrame = {
    val edges = suppEdges(s, d)
    val dir = edges.unionByName(
      edges.select(col("y").as("x"), col("x").as("y"))).cache()
    val out = graft.ops.RandomWalk.rejectionWalksAll(dir, WalkSteps,
      N2vReturn, N2vCommon, N2vOut, rounds = N2vRounds)
    dir.unpersist(false)
    out
  }

  /** Twin of [[graphWalksRejection]]: per step, the rounds-fold
    * proposal expansion (CROSS JOIN rd — `rounds`·|walks| rows, never
    * Σ deg), the indexed uniform proposal draw, the distance-1 LEFT
    * probe for the integer weight, the per-round acceptance test
    * `draw % wMax < wt OR r = rounds−1` (last round unconditional —
    * the bounded-redraw fallback), and the first-accepted pick — all
    * replaying [[graft.ops.RandomWalk.rejectionStepFrame]]'s exact
    * md5 streams (`n2vr:<walk>:<t>:<r>:p` / `:a`). MATERIALIZED per
    * step so scan count stays linear in steps. */
  private val graphWalksRejectionSql = {
    val wMax = math.max(N2vReturn, math.max(N2vCommon, N2vOut))
    val blocks = (1 to WalkSteps).map { t =>
      def draw(tag: String) = graft.ops.CorpusHex.hv48Sql(
        s"md5('n2vr:' || CAST(w.walk_id AS VARCHAR) || ':$t:' || " +
          s"CAST(r.r AS VARCHAR) || ':$tag')")
      s"""pr$t AS MATERIALIZED (
  SELECT w.walk_id, r.r, n.nx, n.ny,
         CASE WHEN n.ny = w.prev THEN $N2vReturn
              WHEN e.py IS NOT NULL THEN $N2vCommon
              ELSE $N2vOut END AS wt,
         CAST(${draw("a")} AS BIGINT) % $wMax AS adraw
  FROM wr${t - 1} w
  JOIN deg d ON w.node = d.dx
  CROSS JOIN rd r
  JOIN nbr n ON n.nx = w.node
   AND n.idx = CAST(${draw("p")} AS BIGINT) % d.deg
  LEFT JOIN (SELECT nx AS px, ny AS py FROM nbr) e
    ON e.px = w.prev AND e.py = n.ny
), wr$t AS MATERIALIZED (
  SELECT walk_id, ny AS node, nx AS prev FROM (
    SELECT walk_id, ny, nx,
           row_number() OVER (PARTITION BY walk_id ORDER BY r) AS rn
    FROM pr$t
    WHERE adraw < wt OR r = ${N2vRounds - 1})
  WHERE rn = 1)"""
    }.mkString(",\n")
    val union = (0 to WalkSteps).map(t =>
      s"SELECT walk_id, CAST($t AS BIGINT) AS step, node FROM wr$t")
      .mkString("\nUNION ALL\n")
    val roundVals = (0 until N2vRounds).map(r => s"($r)").mkString(", ")
    s"""WITH os AS (
  SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
), pairs AS (
  SELECT a.l_suppkey AS x, b.l_suppkey AS y
  FROM os a JOIN os b
    ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
  GROUP BY 1, 2 HAVING count(*) >= $MinCo
), dir AS MATERIALIZED (
  SELECT x, y FROM pairs UNION ALL SELECT y AS x, x AS y FROM pairs
), nbr AS MATERIALIZED (
  SELECT CAST(x AS BIGINT) AS nx, CAST(y AS BIGINT) AS ny,
         CAST(row_number() OVER (PARTITION BY x ORDER BY y) AS BIGINT) - 1 AS idx
  FROM dir
), deg AS MATERIALIZED (
  SELECT CAST(x AS BIGINT) AS dx, count(*) AS deg FROM dir GROUP BY 1
), rd AS (
  SELECT * FROM (VALUES $roundVals) t(r)
), wr0 AS MATERIALIZED (
  SELECT CAST(x AS BIGINT) AS walk_id, CAST(x AS BIGINT) AS node,
         CAST(NULL AS BIGINT) AS prev
  FROM (SELECT DISTINCT x FROM dir)
),
$blocks
$union"""
  }

  // Skip-gram window over the walk corpus (contexts within ±SkipWindow
  // steps), the word2vec convention for short walks.
  private val SkipWindow = 2

  /** Skip-gram training pairs + shifted-PMI association from the
    * [[graphWalks]] corpus — (center, context) counts within
    * ±[[SkipWindow]] steps and the exact-integer PMI ratio
    * N·c(a,b) / (c(a)·c(b)) (PMI = log of it; the log is left to the
    * consumer so the compared column stays one correctly-rounded
    * division of exact longs — the Levy–Goldberg SGNS factorization
    * target). Symmetric by construction (the |Δstep| join emits both
    * orientations).
    *
    * Scale shape: the pair generator is a walk-keyed self-join where
    * each walk contributes ≤ 2·W·(steps+1) pairs — corpus-linear, never
    * node²; marginals and N are two re-aggregations of the pair-count
    * frame and a broadcast scalar. Envelope: N·c_ab and c_a·c_b are
    * products of pair counts, ≪ 2^53 for any corpus this side of ~10¹⁵
    * pairs (and provably non-negative, so the direct double cast is
    * portable — no signed-cast route needed). */
  /** Shared (center, context, n_pairs) skip-gram count matrix over the
    * [[graphWalks]] corpus — symmetric by construction (the |Δstep|
    * join emits both orientations). Consumed by [[walkSkipgrams]] (PMI)
    * and [[walkSpectral]] (power iteration). */
  private def skipgramCounts(walks: DataFrame): DataFrame = {
    val a = walks.select(col("walk_id").as("wid"), col("step").as("sa"),
      col("node").as("center"))
    val b = walks.select(col("walk_id").as("wid"), col("step").as("sb"),
      col("node").as("context"))
    a.join(b, Seq("wid"))
      .filter(abs(col("sa") - col("sb")).between(1, SkipWindow))
      .groupBy(col("center"), col("context"))
      .agg(count(lit(1)).as("n_pairs"))
  }

  /** Checkpointed (center, context, n_pairs) matrix with the corpus
    * checkpoint it consumed already released — the shared entry for the
    * skip-gram family. Materializing cab ONCE matters: the PMI query
    * reads it four times (pairs, both marginals, the N scalar), and a
    * lazy cab re-runs the corpus self-join per read (the round-11 pin
    * made the 4× subtree visible). Caller releases cab when done. */
  private def cabCheckpointed(s: SparkSession, d: String): DataFrame = {
    val corpus = graphWalks(s, d)
    val cab = skipgramCounts(corpus).localCheckpoint(true)
    graft.ops.Checkpoints.release(corpus)
    cab
  }

  /** PMI reader over an arbitrary corpus frame — the contract body AND
    * the [[graft.ops.WalkCorpus]]-artifact entry (a persisted corpus
    * loads and feeds this directly, skipping the ~3 s walk build; bits
    * identical, WalkCorpusSpec). Lazy over the checkpointed count
    * matrix: cab is the one surviving block set. */
  private[graft] def walkSkipgramsFrom(corpus: DataFrame): DataFrame = {
    val cab = skipgramCounts(corpus).localCheckpoint(true)
    val ca = cab.groupBy(col("center")).agg(sum(col("n_pairs")).as("c_a"))
    val cb = cab.groupBy(col("context")).agg(sum(col("n_pairs")).as("c_b"))
    val nn = cab.agg(sum(col("n_pairs")).as("n"))
    cab.join(ca, Seq("center")).join(cb, Seq("context"))
      .crossJoin(broadcast(nn))
      .select(col("center"), col("context"), col("n_pairs"),
        Det.snap((col("n") * col("n_pairs")).cast("double") /
          (col("c_a") * col("c_b")).cast("double"), 6).as("pmi_ratio"))
  }

  private def walkSkipgrams(s: SparkSession, d: String): DataFrame = {
    val corpus = graphWalks(s, d)
    val out = walkSkipgramsFrom(corpus) // eager cab checkpoint inside
    graft.ops.Checkpoints.release(corpus)
    out
  }

  /** Twin of [[walkSkipgrams]]: the walk corpus re-derived inline (the
    * [[graphWalksSql]] text as a subquery), then the same pair window,
    * marginals, and exact-long PMI-ratio division (HUGEINT sums cast
    * back to BIGINT before the products). */
  private val walkSkipgramsSql =
    s"""WITH walks AS MATERIALIZED (
  SELECT * FROM ($graphWalksSql)
), pr AS (
  SELECT a.node AS center, b.node AS context
  FROM walks a JOIN walks b
    ON a.walk_id = b.walk_id
   AND abs(a.step - b.step) BETWEEN 1 AND $SkipWindow
), cab AS MATERIALIZED (
  SELECT center, context, count(*) AS n_pairs FROM pr GROUP BY 1, 2
), ca AS (
  SELECT center, CAST(sum(n_pairs) AS BIGINT) AS c_a FROM cab GROUP BY 1
), cb AS (
  SELECT context, CAST(sum(n_pairs) AS BIGINT) AS c_b FROM cab GROUP BY 1
), nn AS (SELECT CAST(sum(n_pairs) AS BIGINT) AS n FROM cab)
SELECT cab.center, cab.context, cab.n_pairs,
       ${s6("CAST(nn.n * cab.n_pairs AS DOUBLE) / CAST(ca.c_a * cb.c_b AS DOUBLE)")}
         AS pmi_ratio
FROM cab JOIN ca USING (center) JOIN cb USING (context) CROSS JOIN nn"""

  // walk_spectral: fixed power-iteration rounds and the 1e-6 loading
  // grid (no convergence test — the oracle unrolls the trajectory).
  private val SpecIters = 3
  private val SpecGrid = 1000000L

  /** 1-D spectral embedding of the walk co-occurrence matrix: the
    * dominant eigendirection of the symmetric skip-gram count matrix C
    * via max-norm power iteration — the deterministic in-engine proxy
    * for the factorization DeepWalk/SGNS implicitly performs on the
    * co-occurrence statistics (Levy–Goldberg NIPS'14; power iteration
    * as in [[graft.ops.Similarity.pcaTopComponent]]). C is
    * entry-wise non-negative and v₀ = 1 > 0, so the iterate stays
    * non-negative (Perron–Frobenius) and every cast is in the
    * DuckDB-safe non-negative range.
    *
    * Determinism: v lives on an exact 1e-6 integer grid; w = C·v is
    * exact long arithmetic (order-free; ANSI throws on overflow rather
    * than wrapping — envelope Σ n_pairs·10⁶ ≪ 2⁶³ for any corpus this
    * side of ~10¹² pairs); the ONLY floating ops per round are one
    * correctly-rounded division by max(w) (both operands crossing
    * int→double via exact decimal STRINGS, the > 2⁵³ rule) and the
    * shared floor(·+0.5) snap back to the grid.
    *
    * Scale shape: per round ONE equi-join of the checkpointed sparse
    * count matrix against the |nodes|-row iterate plus a row-keyed
    * aggregate and one broadcast scalar — the standard distributed
    * SpMV; nothing is dense, nothing is collected. */
  /** One LAZY power-iteration round: the distributed SpMV (count matrix
    * ⨝ iterate + row-keyed exact-long aggregate). Plan-pin seam. */
  private[graft] def spectralRound(cab: DataFrame, v: DataFrame): DataFrame =
    cab.join(v, col("context") === col("node"))
      .groupBy(col("center"))
      .agg(sum(col("n_pairs") * col("k")).as("w"))

  /** Plan-pin seam: one LAZY SpMV round over the checkpointed count
    * matrix and the v₀ iterate. */
  private[graft] def spectralRoundLazy(s: SparkSession, d: String): (DataFrame, () => Unit) = {
    val cab = cabCheckpointed(s, d)
    val v0 = cab.select(col("center").as("node")).distinct()
      .withColumn("k", lit(SpecGrid))
      .localCheckpoint(true)
    (spectralRound(cab, v0),
      () => graft.ops.Checkpoints.release(cab, v0))
  }

  private def walkSpectral(s: SparkSession, d: String): DataFrame =
    walkSpectralOf(cabCheckpointed(s, d))

  /** [[walkSpectral]] over a pre-built checkpointed count matrix (takes
    * ownership: releases `cab`) — shared by the contract body and the
    * [[graft.ops.WalkCorpus]]-artifact reader. */
  private def walkSpectralOf(cab: DataFrame): DataFrame = {
    val v0 = cab.select(col("center").as("node")).distinct()
      .withColumn("k", lit(SpecGrid))
      .localCheckpoint(true)
    var v = v0
    val inter = scala.collection.mutable.ArrayBuffer(cab, v0)
    // Per-round localCheckpoint: w feeds BOTH the max(w) scalar and the
    // next iterate, so materializing it once per round keeps the
    // trajectory linear (a lineage-only variant re-executes the cab
    // join 2^rounds times — measured no faster at fixture scale and a
    // worse story at 1000 executors).
    for (_ <- 1 to SpecIters) {
      val w = spectralRound(cab, v).localCheckpoint(true)
      inter += w
      val mx = w.agg(max(col("w")).as("mx"))
      v = w.crossJoin(broadcast(mx))
        .select(col("center").as("node"),
          floor(col("w").cast("string").cast("double") /
            col("mx").cast("string").cast("double") *
            lit(1000000.0) + lit(0.5)).cast("long").as("k"))
    }
    // Node-sized result: checkpoint it, then drop cab + every round's w
    // (≤1-survivor hygiene, CacheHygieneSpec).
    val res = v.select(col("node"),
      Det.snap(col("k").cast("double") / lit(1000000.0), 6).as("loading"))
      .localCheckpoint(true)
    graft.ops.Checkpoints.release(inter.toSeq: _*)
    res
  }

  /** Twin of [[walkSpectral]]: the same corpus + cab CTEs as the
    * skip-gram twin, then the power-iteration trajectory unrolled as
    * MATERIALIZED CTEs — exact-long SpMV, string-routed int→double
    * casts, and the identical `floor(w/mx·10⁶ + 0.5)` grid snap. */
  private val walkSpectralSql = {
    val iterBlocks = (1 to SpecIters).map { t =>
      s"""sw$t AS MATERIALIZED (
  SELECT cab.center AS node, CAST(sum(cab.n_pairs * sv${t - 1}.k) AS BIGINT) AS w
  FROM cab JOIN sv${t - 1} ON cab.context = sv${t - 1}.node GROUP BY 1
), sm$t AS (SELECT max(w) AS mx FROM sw$t),
sv$t AS MATERIALIZED (
  SELECT node,
         CAST(floor(CAST(CAST(w AS VARCHAR) AS DOUBLE) /
              CAST(CAST(mx AS VARCHAR) AS DOUBLE) * 1000000.0 + 0.5)
           AS BIGINT) AS k
  FROM sw$t CROSS JOIN sm$t)"""
    }.mkString(",\n")
    s"""WITH walks AS MATERIALIZED (
  SELECT * FROM ($graphWalksSql)
), pr AS (
  SELECT a.node AS center, b.node AS context
  FROM walks a JOIN walks b
    ON a.walk_id = b.walk_id
   AND abs(a.step - b.step) BETWEEN 1 AND $SkipWindow
), cab AS MATERIALIZED (
  SELECT center, context, count(*) AS n_pairs FROM pr GROUP BY 1, 2
), sv0 AS MATERIALIZED (
  SELECT DISTINCT center AS node, CAST($SpecGrid AS BIGINT) AS k FROM cab
),
$iterBlocks
SELECT node, ${s6("CAST(k AS DOUBLE) / 1000000.0")} AS loading
FROM sv$SpecIters"""
  }

  // walk_embed_k: rounds of the 2-dim deflated power iteration (fixed —
  // the oracle unrolls the trajectory) on the same 1e-6 loading grid.
  private val EmbedIters = 3

  /** k-dim spectral embedding of the walk co-occurrence matrix — the
    * DeepWalk-factorization closure of [[walkSpectral]]: ORTHOGONAL
    * (deflated) max-norm power iteration recovering the top-2
    * eigendirections of the symmetric skip-gram count matrix C (the
    * Levy–Goldberg NIPS'14 target; dimension 2 is hard-wired — each
    * extra dimension repeats the same deflation block).
    *
    * Determinism (every step engine-portable):
    *  - both iterate columns live on the exact 1e-6 integer grid; each
    *    round's SpMV W = C·V is exact long arithmetic (order-free sums;
    *    envelope max_center Σ n_pairs·10⁶ < 2⁵³ so the per-row w value
    *    also crosses to double exactly — string-routed regardless);
    *  - dim 1 normalizes by max|w₁| exactly like walkSpectral;
    *  - dim 2 deflates: the Gram–Schmidt coefficient c = ⟨w₂,u₁⟩/⟨u₁,u₁⟩
    *    is a ratio of EXACT integer dot products (decimal(38,0) sums in
    *    Spark ≡ HUGEINT sums in DuckDB — products reach |w₂|·10⁶, past
    *    int64), both crossing to double via exact decimal STRINGS, so
    *    the one division is correctly rounded in both engines;
    *  - the residual d = w₂ − c·u₁ is the same fixed IEEE sequence per
    *    row (long→double casts exact at these magnitudes), normalized
    *    by max|d| and snapped with the shared floor(·+0.5) grid snap;
    *  - v₀ = (all-ones, node-parity ±1) — deterministic and not in the
    *    span of dim 1, re-orthogonalized every round anyway.
    *
    * Scale shape: per round ONE SpMV join carrying both columns (the
    * spectral shape, k× the payload), two 1-row aggregates and two
    * broadcast scalars per dimension — nothing dense, nothing collected;
    * sign structure of dim 2 splits the graph's dominant bipartition
    * (the spectral-partitioning readout an embedding consumer gets
    * before any trainer runs). */
  private def walkEmbedK(s: SparkSession, d: String): DataFrame =
    walkEmbedKOf(cabCheckpointed(s, d))

  /** [[walkEmbedK]] over a pre-built checkpointed count matrix (takes
    * ownership: releases `cab`) — shared by the contract body and the
    * [[graft.ops.WalkCorpus]]-artifact reader. */
  private def walkEmbedKOf(cab: DataFrame): DataFrame = {
    def sdbl(c: org.apache.spark.sql.Column) = c.cast("string").cast("double")
    val v0 = cab.select(col("center").as("node")).distinct()
      .withColumn("k1", lit(SpecGrid))
      .withColumn("k2", when(col("node") % 2 === 0, lit(SpecGrid))
        .otherwise(lit(-SpecGrid)))
      .localCheckpoint(true)
    var v = v0
    val inter = scala.collection.mutable.ArrayBuffer(cab, v0)
    for (_ <- 1 to EmbedIters) {
      val w = cab.join(v, col("context") === col("node"))
        .groupBy(col("center"))
        .agg(sum(col("n_pairs") * col("k1")).as("w1"),
          sum(col("n_pairs") * col("k2")).as("w2"))
        .localCheckpoint(true)
      inter += w
      val m1 = w.agg(max(abs(col("w1"))).as("m1"))
      val u1 = w.crossJoin(broadcast(m1))
        .select(col("center"), col("w2"),
          floor(sdbl(col("w1")) / sdbl(col("m1")) * lit(1000000.0) + lit(0.5))
            .cast("long").as("u1"))
      // Deflation scalars off the SNAPPED u1 (exact longs again): both
      // dot products in decimal(38,0) ≡ the oracle's HUGEINT.
      val cN = u1.agg(
        sum(col("w2").cast("decimal(38,0)") * col("u1").cast("decimal(38,0)"))
          .as("cn"),
        sum(col("u1").cast("decimal(38,0)") * col("u1").cast("decimal(38,0)"))
          .as("cd"))
      val d2 = u1.crossJoin(broadcast(cN))
        .select(col("center"), col("u1"),
          (sdbl(col("w2")) - sdbl(col("cn")) / sdbl(col("cd")) *
            col("u1").cast("double")).as("d"))
        .localCheckpoint(true)
      inter += d2
      val m2 = d2.agg(max(abs(col("d"))).as("m2"))
      v = d2.crossJoin(broadcast(m2))
        .select(col("center").as("node"), col("u1").as("k1"),
          floor(col("d") / col("m2") * lit(1000000.0) + lit(0.5))
            .cast("long").as("k2"))
    }
    val res = v.select(col("node"),
      Det.snap(col("k1").cast("double") / lit(1000000.0), 6).as("loading_1"),
      Det.snap(col("k2").cast("double") / lit(1000000.0), 6).as("loading_2"))
      .localCheckpoint(true)
    graft.ops.Checkpoints.release(inter.toSeq: _*)
    res
  }

  /** Twin of [[walkEmbedK]]: the shared corpus/cab CTEs, then per round
    * the SpMV, the dim-1 max-norm snap, the HUGEINT Gram–Schmidt
    * scalars, the residual, and the dim-2 snap — every long→double cast
    * string-routed, every chained CTE MATERIALIZED. */
  private val walkEmbedKSql = {
    def sd(x: String) = s"CAST(CAST($x AS VARCHAR) AS DOUBLE)"
    val iterBlocks = (1 to EmbedIters).map { t =>
      s"""ew$t AS MATERIALIZED (
  SELECT cab.center AS node,
         CAST(sum(cab.n_pairs * v.k1) AS BIGINT) AS w1,
         CAST(sum(cab.n_pairs * v.k2) AS BIGINT) AS w2
  FROM cab JOIN ev${t - 1} v ON cab.context = v.node GROUP BY 1
), ema$t AS (SELECT max(abs(w1)) AS m FROM ew$t),
eu$t AS MATERIALIZED (
  SELECT node, w2,
         CAST(floor(${sd("w1")} / ${sd("m")} * 1000000.0 + 0.5) AS BIGINT) AS u1
  FROM ew$t CROSS JOIN ema$t),
ec$t AS (
  SELECT ${sd("sum(CAST(w2 AS HUGEINT) * u1)")} /
         ${sd("sum(CAST(u1 AS HUGEINT) * u1)")} AS c
  FROM eu$t),
ed$t AS MATERIALIZED (
  SELECT node, u1, ${sd("w2")} - c * CAST(u1 AS DOUBLE) AS d
  FROM eu$t CROSS JOIN ec$t),
emb$t AS (SELECT max(abs(d)) AS m FROM ed$t),
ev$t AS MATERIALIZED (
  SELECT node, u1 AS k1,
         CAST(floor(d / m * 1000000.0 + 0.5) AS BIGINT) AS k2
  FROM ed$t CROSS JOIN emb$t)"""
    }.mkString(",\n")
    s"""WITH walks AS MATERIALIZED (
  SELECT * FROM ($graphWalksSql)
), pr AS (
  SELECT a.node AS center, b.node AS context
  FROM walks a JOIN walks b
    ON a.walk_id = b.walk_id
   AND abs(a.step - b.step) BETWEEN 1 AND $SkipWindow
), cab AS MATERIALIZED (
  SELECT center, context, count(*) AS n_pairs FROM pr GROUP BY 1, 2
), ev0 AS MATERIALIZED (
  SELECT DISTINCT center AS node, CAST($SpecGrid AS BIGINT) AS k1,
         CASE WHEN center % 2 = 0 THEN CAST($SpecGrid AS BIGINT)
              ELSE CAST(-$SpecGrid AS BIGINT) END AS k2
  FROM cab
),
$iterBlocks
SELECT node, ${s6("CAST(k1 AS DOUBLE) / 1000000.0")} AS loading_1,
       ${s6("CAST(k2 AS DOUBLE) / 1000000.0")} AS loading_2
FROM ev$EmbedIters"""
  }

  /** Degree assortativity of the supplier co-occurrence graph: Pearson
    * correlation of endpoint degrees over the symmetrized edge list
    * (Newman's r — each undirected edge contributes both orientations,
    * the standard convention, which also makes the statistic direction-
    * free). Positive r = hubs attach to hubs; the one-number mixing
    * readout consumed next to [[triangles]]' closure ratio.
    *
    * Scale shape: one degree aggregate + two node-keyed joins annotating
    * each edge end (dimension-vs-edge joins — broadcast at fixture,
    * keyed shuffle at scale), then ONE 1-row exact-moment aggregate
    * (Det.corrD at grid 0: degrees are already integers). Envelope:
    * Σ deg_a·deg_b ≤ m·maxdeg² — decimal(38) moments inside corrD. */
  private def graphAssortativity(s: SparkSession, d: String): DataFrame = {
    // suppEdges' contract is "callers cache": the plan below references
    // the edge frame three times (the degree aggregate + both join
    // annotations), so without the cache the expensive flatMapGroups
    // pair generation over lineitem would re-execute up to 3× per run
    // (round-11 ADVICE). The 1-row result is materialized eagerly so
    // both block sets can be released before returning — the query
    // leaves nothing persisted (CacheHygieneSpec).
    // EXPLAIN CAVEAT (round-12 ADVICE): because of that eager collect,
    // constructing this entry RUNS the job, and plan tools
    // (graft.tools.Explain, pins) see only the 1-row LocalRelation — the
    // real shape is pinned via the lazy seams instead (suppEdges' pair
    // generation is covered by the shared edge-frame pins). The eager
    // trade is deliberate: a lazy variant either re-runs the pair
    // generation 3× per action (no cache) or leaks persisted blocks to
    // the caller (cache with no release point); the result is 1 row, so
    // eager costs what the first action would anyway.
    assortativityFrom(s, suppEdges(s, d))
  }

  private[graft] def assortativityFrom(s: SparkSession, edges: DataFrame): DataFrame = {
    val dir = edges.unionByName(
      edges.select(col("y").as("x"), col("x").as("y"))).cache()
    val deg = dir.groupBy(col("x")).agg(count(lit(1)).as("deg"))
      .localCheckpoint(true)
    val res = dir
      .join(deg.select(col("x"), col("deg").as("da")), Seq("x"))
      .join(deg.select(col("x").as("y"), col("deg").as("db")), Seq("y"))
      .agg(count(lit(1)).as("n_dir_edges"),
        Det.snap(Det.corrD(col("da"), col("db"), 0), 6).as("assortativity"))
    val out = s.createDataFrame(res.collectAsList(), res.schema)
    dir.unpersist(false)
    graft.ops.Checkpoints.release(deg)
    out
  }

  private val graphAssortativitySql =
    s"""WITH os AS (
  SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
), pairs AS (
  SELECT a.l_suppkey AS x, b.l_suppkey AS y
  FROM os a JOIN os b
    ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
  GROUP BY 1, 2 HAVING count(*) >= $MinCo
), dir AS MATERIALIZED (
  SELECT x, y FROM pairs UNION ALL SELECT y AS x, x AS y FROM pairs
), deg AS (
  SELECT x AS node, count(*) AS deg FROM dir GROUP BY 1
)
SELECT CAST(count(*) AS BIGINT) AS n_dir_edges,
       ${s6(Det.corrDSql("a.deg", "b.deg", 0))} AS assortativity
FROM dir JOIN deg a ON dir.x = a.node JOIN deg b ON dir.y = b.node"""

  /** Walk-corpus visit diagnostics: per node the visit count in the
    * [[graphWalks]] corpus, the node's degree, and the ratio of its
    * visit share to its degree share — the stationary-distribution
    * check (uniform random walks on an undirected graph visit ∝ degree
    * in the limit; the ratio flags under/over-mixed regions of a short-
    * walk corpus before a trainer consumes it).
    *
    * Scale shape: one corpus-keyed count, one degree aggregate, one
    * node-keyed join, two broadcast scalar totals. The ratio
    * (visits·Σdeg)/(deg·Σvisits) is a product of exact non-negative
    * longs — string-routed to double anyway, so the statistic stays
    * bit-exact at ANY corpus magnitude. */
  /** Visit-stats reader over an arbitrary corpus + symmetrized edge
    * frame — the contract body AND the [[graft.ops.WalkCorpus]]-artifact
    * entry (bits identical off a persisted corpus, WalkCorpusSpec). */
  private[graft] def walkVisitStatsFrom(corpus: DataFrame,
                                        dir: DataFrame): DataFrame = {
    def sdbl(c: org.apache.spark.sql.Column) = c.cast("string").cast("double")
    val visits = corpus.groupBy(col("node")).agg(count(lit(1)).as("visits"))
    // r16 guide §2.4: deg is referenced twice (the join side AND the Σdeg
    // scalar) and `dir` arrives as an UNCACHED union of the pair-count
    // subtree — lazily that re-ran the whole lineitem pair expansion per
    // reference. One node-sized eager checkpoint computes it once; the
    // result is checkpointed too so deg can be released (≤1-survivor
    // hygiene, CacheHygieneSpec).
    val deg = dir.groupBy(col("x")).agg(count(lit(1)).as("deg"))
      .select(col("x").as("node"), col("deg"))
      .localCheckpoint(true)
    val tot = visits.agg(sum(col("visits")).as("tv"))
      .crossJoin(deg.agg(sum(col("deg")).as("td")))
    val res = visits.join(deg, Seq("node"))
      .crossJoin(broadcast(tot))
      .select(col("node"), col("visits"), col("deg"),
        Det.snap(sdbl(col("visits") * col("td")) /
          sdbl(col("deg") * col("tv")), 6).as("visit_rate_ratio"))
      .localCheckpoint(true)
    graft.ops.Checkpoints.release(deg)
    res
  }

  /** Symmetrized supplier co-occurrence edge frame — the walk family's
    * graph (both orientations of [[suppEdges]]). Uncached seam: callers
    * that reference it more than once cache it themselves. */
  private[graft] def suppDir(s: SparkSession, d: String): DataFrame = {
    val edges = suppEdges(s, d)
    edges.unionByName(edges.select(col("y").as("x"), col("x").as("y")))
  }

  private def walkVisitStats(s: SparkSession, d: String): DataFrame = {
    // r16: ONE cached symmetrized edge frame serves both the walk build
    // and the degree frame — the prior shape paid the lineitem
    // pair-count build once inside graphWalks and again (uncached) via
    // suppDir. The result is eager inside walkVisitStatsFrom, so the
    // corpus checkpoint can be released here (≤1 survivor).
    val edges = suppEdges(s, d)
    val dir = edges.unionByName(
      edges.select(col("y").as("x"), col("x").as("y"))).cache()
    val corpus = graft.ops.RandomWalk.walksAll(dir, WalkSteps)
    val out = walkVisitStatsFrom(corpus, dir)
    dir.unpersist(false)
    graft.ops.Checkpoints.release(corpus)
    out
  }

  /** Build + persist the shared walk corpus as the
    * [[graft.ops.WalkCorpus]] parquet artifact (round-12 verdict #6 —
    * the amortization seam Bench's SPARK_GRAFT_BENCH_AMORTIZE mode
    * measures). */
  private[graft] def buildWalkCorpusArtifact(s: SparkSession, d: String,
                                             path: String): Unit = {
    val corpus = graphWalks(s, d)
    graft.ops.WalkCorpus.store(corpus, path)
    graft.ops.Checkpoints.release(corpus)
  }

  /** Amortized bodies for the uniform-walk-corpus family: identical
    * bits to the contract queries (WalkCorpusSpec proves the readers;
    * the corpus itself round-trips exact long rows through parquet),
    * but the ~3 s corpus build is replaced by an artifact load. The
    * CONTRACT queries deliberately keep rebuilding — the bench's
    * standard mode measures each query standalone; this map is what the
    * amortize mode times against it. */
  /** Seed catchment profile over a BFS label frame (graph_closeness's
    * body): per seed the reach count, hop mass, eccentricity bound, and
    * mean hop distance (bounded-hop closeness) — one |seeds|-sized
    * aggregate over the already-computed labels; exact-integer ratio. */
  private[graft] def closenessOf(labels: DataFrame): DataFrame =
    labels
      .groupBy(col("nearest_seed"))
      .agg(count(lit(1)).as("n_reached"),
        sum(col("hops")).as("sum_hops"),
        max(col("hops")).as("ecc_bound"))
      .select(col("nearest_seed"), col("n_reached"), col("sum_hops"),
        col("ecc_bound"),
        Det.snap(col("sum_hops").cast("double") /
          col("n_reached").cast("double"), 6).as("mean_hops"))

  /** Harmonic centrality over a BFS label frame (graph_harmonic's
    * body): Σ 1/hops of reached nodes — the centrality that stays
    * finite under disconnection (Boldi–Vigna's axiom-clean pick, where
    * closeness degenerates). 1/hops rides the exact 1e12 integer grid
    * (10^12 div hops — Spark `div` ≡ DuckDB `//` on positives), so the
    * mass is a BIGINT sum; the double form is one exact non-negative
    * cast + one division (both correctly rounded). */
  private[graft] def harmonicOf(labels: DataFrame): DataFrame =
    labels.filter(col("hops") > 0)
      .groupBy(col("nearest_seed"))
      .agg(count(lit(1)).as("n_reached"),
        sum(expr("CAST(1000000000000 AS BIGINT) div hops")).as("h_grid"))
      .select(col("nearest_seed"), col("n_reached"), col("h_grid"),
        Det.snap(col("h_grid").cast("double") / lit(1e12), 6).as("harmonic"))

  /** Build + persist the graph family's shared frames as the
    * [[graft.ops.GraphArtifact]] (r13 verdict #1 — the seam Bench's
    * SPARK_GRAFT_BENCH_AMORTIZE mode measures for this family). */
  private[graft] def buildGraphArtifact(s: SparkSession, d: String,
                                        path: String): Unit = {
    val supp = suppPairCounts(s, d).localCheckpoint(true)
    val labels = bfsLabelsFrom(suppEdgesFrom(supp))
    graft.ops.GraphArtifact.store(supp, partPairCounts(s, d), labels, path)
    graft.ops.Checkpoints.release(supp, labels)
  }

  /** Amortized bodies for the static-graph family: identical bits to
    * the contract queries (GraphArtifactSpec proves every reader; the
    * artifact's exact long rows round-trip parquet losslessly), but the
    * shared pair-count/BFS derivation is replaced by an artifact load.
    * The CONTRACT queries deliberately keep rebuilding — standard bench
    * mode measures each standalone; this map is what amortize mode
    * times against it. */
  private[graft] def amortizedGraphQueries(path: String): Map[String, (SparkSession, String) => DataFrame] = {
    import graft.ops.GraphArtifact._
    import TickQueries.r6
    Map(
      "triangle_count" -> ((s, _) => trianglesFrom(suppEdgesFrom(loadSuppPairs(s, path)))),
      "link_prediction" -> ((s, _) => linkPredictionFrom(loadSuppPairs(s, path))),
      "kcore" -> ((s, _) => kcoreFrom(partEdgesFrom(loadPartPairs(s, path)))),
      "graph_communities" -> ((s, _) => communitiesFrom(partEdgesFrom(loadPartPairs(s, path)))),
      "graph_assortativity" -> ((s, _) => assortativityFrom(s, suppEdgesFrom(loadSuppPairs(s, path)))),
      "graph_bfs" -> ((s, _) => loadBfsLabels(s, path)),
      "graph_closeness" -> ((s, _) => closenessOf(loadBfsLabels(s, path))),
      "graph_harmonic" -> ((s, _) => harmonicOf(loadBfsLabels(s, path))),
      "pagerank" -> ((s, _) => r6(pagerankFrom(s, suppEdgesFrom(loadSuppPairs(s, path))))),
      "degree_dist" -> ((s, _) => r6(degreeDistFrom(suppEdgesFrom(loadSuppPairs(s, path)))))
    )
  }

  private[graft] def amortizedWalkQueries(path: String): Map[String, (SparkSession, String) => DataFrame] = Map(
    "graph_walks" -> ((s, _) => graft.ops.WalkCorpus.load(s, path)),
    "walk_skipgrams" -> ((s, _) =>
      walkSkipgramsFrom(graft.ops.WalkCorpus.load(s, path))),
    "walk_spectral" -> ((s, _) => walkSpectralOf(
      skipgramCounts(graft.ops.WalkCorpus.load(s, path)).localCheckpoint(true))),
    "walk_embed_k" -> ((s, _) => walkEmbedKOf(
      skipgramCounts(graft.ops.WalkCorpus.load(s, path)).localCheckpoint(true))),
    "walk_visit_stats" -> ((s, d) =>
      walkVisitStatsFrom(graft.ops.WalkCorpus.load(s, path), suppDir(s, d)))
  )

  private val walkVisitStatsSql =
    s"""WITH walks AS MATERIALIZED (
  SELECT * FROM ($graphWalksSql)
), visits AS MATERIALIZED (
  SELECT node, count(*) AS visits FROM walks GROUP BY 1
), vpairs AS MATERIALIZED (
  SELECT a.l_suppkey AS x, b.l_suppkey AS y
  FROM (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem) a
  JOIN (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem) b
    ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
  GROUP BY 1, 2 HAVING count(*) >= $MinCo
), degf AS MATERIALIZED (
  SELECT CAST(node AS BIGINT) AS node, count(*) AS deg FROM (
    SELECT x AS node FROM vpairs UNION ALL SELECT y FROM vpairs)
  GROUP BY 1
), tot AS (
  SELECT (SELECT CAST(sum(visits) AS BIGINT) FROM visits) AS tv,
         (SELECT CAST(sum(deg) AS BIGINT) FROM degf) AS td
)
SELECT v.node, v.visits, g.deg,
       ${s6("CAST(CAST(v.visits * tot.td AS VARCHAR) AS DOUBLE) / CAST(CAST(g.deg * tot.tv AS VARCHAR) AS DOUBLE)")}
         AS visit_rate_ratio
FROM visits v JOIN degf g USING (node) CROSS JOIN tot"""

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "walk_skipgrams" -> ((s, d) => walkSkipgrams(s, d)),
    "walk_spectral" -> ((s, d) => walkSpectral(s, d)),
    "walk_embed_k" -> ((s, d) => walkEmbedK(s, d)),
    "walk_visit_stats" -> ((s, d) => walkVisitStats(s, d)),
    "graph_assortativity" -> ((s, d) => graphAssortativity(s, d)),
    "graph_walks" -> ((s, d) => graphWalks(s, d)),
    "graph_walks_biased" -> ((s, d) => graphWalksBiased(s, d)),
    "graph_walks_rejection" -> ((s, d) => graphWalksRejection(s, d)),
    "graph_bfs" -> ((s, d) => graphBfs(s, d)),
    // Seed catchment profile on the BFS hub-Voronoi labels: per seed
    // the reach count, hop mass, eccentricity bound, and mean hop
    // distance (bounded-hop closeness) — one |seeds|-sized aggregate
    // over the already-computed label frame; exact-integer ratio.
    "graph_closeness" -> ((s, d) => closenessOf(graphBfs(s, d))),
    // Harmonic centrality over the same BFS catchments: Σ 1/hops of
    // reached nodes — the centrality that stays finite under
    // disconnection (Boldi–Vigna's axiom-clean pick, where closeness
    // degenerates). 1/hops rides the exact 1e12 integer grid
    // (10^12 div hops — Spark `div` ≡ DuckDB `//` on positives), so
    // the mass is a BIGINT sum; the double form is one exact
    // non-negative cast + one division (both correctly rounded).
    "graph_harmonic" -> ((s, d) => harmonicOf(graphBfs(s, d))),
    "graph_communities" -> ((s, d) => communities(s, d)),
    "kcore" -> ((s, d) => kcore(s, d)),
    "degree_dist" -> ((s, d) => {
      import TickQueries.r6
      r6(degreeDist(s, d))
    }),
    "markov_transitions" -> ((s, d) => markov(s, d)),
    "markov_eval" -> ((s, d) => markovEval(s, d)),
    "autocorr" -> ((s, d) => autocorr(s, d)),
    "triangle_count" -> ((s, d) => triangles(s, d)),
    "link_prediction" -> ((s, d) => linkPrediction(s, d)),
    "pagerank" -> ((s, d) => {
      import TickQueries.r6
      r6(pagerank(s, d))
    })
  )

  def oracleSql: Map[String, String] = Map(
    "walk_skipgrams" -> walkSkipgramsSql,
    "walk_spectral" -> walkSpectralSql,
    "walk_embed_k" -> walkEmbedKSql,
    "walk_visit_stats" -> walkVisitStatsSql,
    "graph_assortativity" -> graphAssortativitySql,
    "graph_walks" -> graphWalksSql,
    "graph_walks_biased" -> graphWalksBiasedSql,
    "graph_walks_rejection" -> graphWalksRejectionSql,
    "graph_bfs" -> graphBfsSql,
    "graph_closeness" ->
      s"""WITH bfs AS (SELECT * FROM ($graphBfsSql))
SELECT nearest_seed, CAST(count(*) AS BIGINT) AS n_reached,
       CAST(sum(hops) AS BIGINT) AS sum_hops,
       CAST(max(hops) AS BIGINT) AS ecc_bound,
       ${s6("CAST(sum(hops) AS DOUBLE) / CAST(count(*) AS DOUBLE)")} AS mean_hops
FROM bfs GROUP BY 1""",
    "graph_harmonic" ->
      s"""WITH bfs AS (SELECT * FROM ($graphBfsSql))
SELECT nearest_seed, CAST(count(*) AS BIGINT) AS n_reached,
       CAST(sum(1000000000000 // hops) AS BIGINT) AS h_grid,
       ${s6("CAST(CAST(sum(1000000000000 // hops) AS BIGINT) AS DOUBLE) / 1e12")} AS harmonic
FROM bfs WHERE hops > 0 GROUP BY 1""",
    "graph_communities" -> communitiesSql,
    "kcore" -> kcoreSql,
    "degree_dist" -> degreeDistSql,
    "markov_transitions" -> markovSql,
    "markov_eval" -> markovEvalSql,
    "autocorr" -> autocorrSql,
    "triangle_count" -> trianglesSql,
    "link_prediction" -> linkPredictionSql,
    "pagerank" -> pagerankSql
  )
}

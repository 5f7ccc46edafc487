package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Record linkage + marketing attribution — two classic
  * entity/event-matching operators the reference platform lacks, both
  * float-free (exact integers, strings, timestamps only — no Det grids
  * needed, the outputs hash bit-exact by construction).
  *
  * - `fuzzy_match`: blocked fuzzy self-join of the part-name dictionary
  *   (edit distance over a shared-token block). The scale story is the
  *   standard linkage shape: dedupe the fact table to a DISTINCT-entity
  *   dictionary first (tiny relative to facts — 64 names for 2 000 parts
  *   here, same ratio at 100 TB), block on a discriminative token, and
  *   run the quadratic comparator only INSIDE blocks. One shuffle on the
  *   block key (or none — the dictionary broadcasts); skewed blocks cap
  *   at block-size², never table².
  * - `attribution`: last-touch attribution — every purchase credits the
  *   most recent click/view of the same user within a 1 h horizon. One
  *   keyed window pass (Exchange + Sort on user), running IGNORE-NULLS
  *   last over the touch columns; the horizon filter is exact integer
  *   micros. The as-of-join shape without a join.
  */
object MatchQueries {

  /** Levenshtein acceptance band: 0 is excluded (distinct names only),
    * >3 is noise for two-token names. */
  private val MaxDist = 3
  /** Attribution horizon: 1 hour in microseconds. */
  private val HorizonUs = 3600000000L

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  // -------------------------------------------------------- fuzzy_match

  private def fuzzyMatch(s: SparkSession, d: String): DataFrame = {
    val names = t(s, d, "part")
      .groupBy(col("p_name")).agg(count(lit(1)).as("n_parts"))
      .withColumn("blk", element_at(split(col("p_name"), " "), 2))
    val a = names.select(col("blk"), col("p_name").as("name_a"),
      col("n_parts").as("n_a"))
    val b = names.select(col("blk"), col("p_name").as("name_b"),
      col("n_parts").as("n_b"))
    a.join(b, "blk")
      .filter(col("name_a") < col("name_b"))
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")).cast("long"))
      .filter(col("dist").between(1, MaxDist))
      .select(col("blk"), col("name_a"), col("name_b"), col("n_a"),
        col("n_b"), col("dist"))
  }

  private val fuzzyMatchSql =
    s"""WITH n AS (
  SELECT p_name, string_split(p_name, ' ')[2] AS blk, count(*) AS n_parts
  FROM part GROUP BY 1, 2)
SELECT a.blk AS blk, a.p_name AS name_a, b.p_name AS name_b,
       a.n_parts AS n_a, b.n_parts AS n_b,
       CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
FROM n a JOIN n b USING (blk)
WHERE a.p_name < b.p_name
  AND levenshtein(a.p_name, b.p_name) BETWEEN 1 AND $MaxDist"""

  // ---------------------------------------------------- entity_clusters

  /** Entity resolution end-to-end: the fuzzy-match pair stream promoted
    * to canonical entities — fuzzy pairs become edges between name ids
    * (min p_partkey per distinct name), connected components assign each
    * name its min-id entity, unmatched names stay their own entity. The
    * full record-linkage loop (block → compare → cluster → canonicalize)
    * composed from the existing operators; output is the resolved
    * dictionary a 100 TB fact table would then broadcast-join on.
    *
    * Scale shape: everything after the blocked comparator is
    * dictionary-sized (distinct names), and the component step inherits
    * ConnectedComponents' size-adaptive driver/distributed split. */
  private def entityClusters(s: SparkSession, d: String): DataFrame = {
    val dict = t(s, d, "part").groupBy(col("p_name"))
      .agg(min(col("p_partkey")).cast("long").as("nid"),
        count(lit(1)).as("n_parts"))
    val pairs = fuzzyMatch(s, d)
      .join(dict.select(col("p_name").as("name_a"), col("nid").as("id_a")), Seq("name_a"))
      .join(dict.select(col("p_name").as("name_b"), col("nid").as("id_b")), Seq("name_b"))
      .select(col("id_a"), col("id_b"))
    val cc = graft.ops.ConnectedComponents.clusters(pairs, "id_a", "id_b")
    dict
      .join(cc.select(col("id").as("nid"), col("cluster_id")), Seq("nid"), "left")
      .select(col("p_name"), col("nid"),
        coalesce(col("cluster_id"), col("nid")).as("entity_id"), col("n_parts"))
      .withColumn("n_names",
        count(lit(1)).over(Window.partitionBy(col("entity_id"))))
  }

  /** Twin of [[entityClusters]]: the same dictionary/edge mapping with
    * the recursive-CTE component oracle (ConnectedComponents.clustersSql)
    * over the fuzzy pair twin. */
  private val entityClustersSql =
    s"""WITH dict AS (
  SELECT p_name, CAST(min(p_partkey) AS BIGINT) AS nid, count(*) AS n_parts
  FROM part GROUP BY 1),
edges AS (
  SELECT da.nid AS id_a, db.nid AS id_b
  FROM ($fuzzyMatchSql) f
  JOIN dict da ON da.p_name = f.name_a
  JOIN dict db ON db.p_name = f.name_b)
SELECT p_name, nid, entity_id, n_parts,
       count(*) OVER (PARTITION BY entity_id) AS n_names
FROM (
  SELECT d.p_name, d.nid, coalesce(cc.cluster_id, d.nid) AS entity_id, d.n_parts
  FROM dict d
  LEFT JOIN (${graft.ops.ConnectedComponents.clustersSql(
      "SELECT * FROM edges", "id_a", "id_b")}) cc
    ON cc.id = d.nid)"""

  // -------------------------------------------------------- attribution

  private def attribution(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val isTouch = col("event_type").isin("click", "view")
    AnalyticsQueries.events(s, d)
      .withColumn("touch_id",
        last(when(isTouch, col("event_id")), ignoreNulls = true).over(w))
      .withColumn("touch_type",
        last(when(isTouch, col("event_type")), ignoreNulls = true).over(w))
      .withColumn("touch_us",
        last(when(isTouch, unix_micros(col("ts"))), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .withColumn("gap_us", unix_micros(col("ts")) - col("touch_us"))
      .filter(col("touch_id").isNotNull && col("gap_us") <= lit(HorizonUs))
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"), col("touch_id"), col("touch_type"),
        col("gap_us"))
  }

  private val attributionSql =
    s"""WITH t AS (
  SELECT event_id, ts, user_id, event_type,
         last_value(CASE WHEN event_type IN ('click','view') THEN event_id END IGNORE NULLS)
           OVER w AS touch_id,
         last_value(CASE WHEN event_type IN ('click','view') THEN event_type END IGNORE NULLS)
           OVER w AS touch_type,
         last_value(CASE WHEN event_type IN ('click','view') THEN epoch_us(ts) END IGNORE NULLS)
           OVER w AS touch_us
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
SELECT user_id, event_id AS purchase_id, ts AS purchase_ts,
       touch_id, touch_type, epoch_us(ts) - touch_us AS gap_us
FROM t
WHERE event_type = 'purchase' AND touch_id IS NOT NULL
  AND epoch_us(ts) - touch_us <= $HorizonUs"""

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "fuzzy_match" -> ((s, d) => fuzzyMatch(s, d)),
    "entity_clusters" -> ((s, d) => entityClusters(s, d)),
    "attribution" -> ((s, d) => attribution(s, d))
  )

  def oracleSql: Map[String, String] = Map(
    "fuzzy_match" -> fuzzyMatchSql,
    "entity_clusters" -> entityClustersSql,
    "attribution" -> attributionSql
  )
}

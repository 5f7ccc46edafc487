package graft.queries

import graft.ops._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver-verifiable similarity-search queries (Similarity ops) over
  * `embeddings.parquet` (vec_id, embedding: array<float> of 64, label).
  * Query set = vec_id < 5. Inner products run on the exact 1e-12 integer
  * grid (associative Long sums → bit-identical in any engine).
  */
object VecQueries {

  import TickQueries.r6

  private def s6(x: String): String = Det.snapSql(x, 6)

  def vecs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/embeddings.parquet")

  private def q5(v: DataFrame): DataFrame = v.filter(col("vec_id") < 5)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "embed_topk" -> ((s, d) => {
      val v = vecs(s, d); Similarity.bruteForceTopK(q5(v), v)
    }),
    "embed_lsh_topk" -> ((s, d) => {
      val v = vecs(s, d); Similarity.lshTopK(q5(v), v)
    }),
    "embed_centroids" -> ((s, d) => r6(Similarity.centroids(vecs(s, d)))),
    "embed_ivf" -> ((s, d) => {
      val v = vecs(s, d)
      Similarity.ivfAssign(v, Similarity.centroidArrays(Similarity.centroids(v)))
    }),
    "dedup_embed" -> ((s, d) => Similarity.cosineNearDupPairs(vecs(s, d)))
  )

  // ---------------------------------------------------------------------
  // DuckDB oracle SQL twins
  // ---------------------------------------------------------------------

  /** Twin of Similarity.dotL: Σ round(a_i·b_i·1e12) as exact integer. */
  private def dotSql(a: String, b: String): String =
    s"""list_sum([CAST(floor(CAST(($a)[i] AS DOUBLE)*CAST(($b)[i] AS DOUBLE)*1e12+0.5) AS BIGINT)
        for i in range(1, len($a)+1)])"""

  /** Twin of Similarity.dist2L (b is already a DOUBLE list). */
  private def dist2Sql(a: String, b: String): String =
    s"""list_sum([CAST(floor((CAST(($a)[i] AS DOUBLE)-($b)[i])*(CAST(($a)[i] AS DOUBLE)-($b)[i])*1e12+0.5) AS BIGINT)
        for i in range(1, len($a)+1)])"""

  /** Twin of Similarity.cosine finishing arithmetic. The dot product is
    * sign-capable, so its exact-integer→DOUBLE cast goes through
    * [[Det.signedDblSql]] (norms are non-negative by construction). */
  private def cosSql(dot: String, nq: String, nv: String): String =
    s6(s"(${Det.signedDblSql(dot)}/1e12) / sqrt((CAST($nq AS DOUBLE)/1e12)*(CAST($nv AS DOUBLE)/1e12))")

  /** Twin of Similarity.srpBucket: per plane, the sign of the SAME exact
    * grid dot product against the SAME md5-seeded ±1 hyperplane constants
    * (interpolated from Similarity.planeSigns — one source of truth).
    * v[i]·(±1) is an exact IEEE sign flip, so floor(v·s·1e12+0.5) matches
    * the dotl_grid kernel bit for bit. */
  private def bucketSql(v: String, planes: Int = 8): String =
    Similarity.planeSigns(planes, 64).map { s =>
      val signs = s.map(_.toInt).mkString("[", ",", "]")
      val dot =
        s"""list_sum([CAST(floor(CAST(($v)[i] AS DOUBLE)*(($signs)[i])*1e12+0.5) AS BIGINT)
        for i in range(1, len($v)+1)])"""
      s"(CASE WHEN $dot >= 0 THEN '1' ELSE '0' END)"
    }.mkString(" || ")

  private val topkSql =
    s"""WITH base AS (
  SELECT vec_id, embedding, ${dotSql("embedding", "embedding")} AS nv FROM embeddings
), q AS (
  SELECT vec_id AS qid, embedding AS qv, nv AS nq FROM base WHERE vec_id < 5
), scored AS (
  SELECT q.qid, e.vec_id,
         ${cosSql(dotSql("q.qv", "e.embedding"), "q.nq", "e.nv")} AS cosine
  FROM q, base e
  WHERE e.vec_id <> q.qid AND e.nv > 0 AND q.nq > 0)
SELECT qid, vec_id, cosine, rnk FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, vec_id) AS BIGINT) AS rnk
  FROM scored)
WHERE rnk <= 10"""

  private val lshTopkSql =
    s"""WITH base AS (
  SELECT vec_id, embedding, ${dotSql("embedding", "embedding")} AS nv,
         ${bucketSql("embedding")} AS bucket
  FROM embeddings
), q AS (
  SELECT vec_id AS qid, embedding AS qv, nv AS nq, bucket FROM base WHERE vec_id < 5
), scored AS (
  SELECT q.qid, e.vec_id,
         ${cosSql(dotSql("q.qv", "e.embedding"), "q.nq", "e.nv")} AS cosine
  FROM q JOIN base e ON q.bucket = e.bucket
  WHERE e.vec_id <> q.qid AND e.nv > 0 AND q.nq > 0)
SELECT qid, vec_id, cosine, rnk FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, vec_id) AS BIGINT) AS rnk
  FROM scored)
WHERE rnk <= 10"""

  private val centSql =
    s"""WITH ex AS (
  SELECT label, unnest(range(1, len(embedding)+1)) AS pos,
         unnest([CAST(x AS DOUBLE) for x in embedding]) AS val
  FROM embeddings
), cent AS (
  SELECT label, pos, ${Det.avgDSql("val", 12)} AS c FROM ex GROUP BY label, pos)"""

  private val centroidsSql =
    s"""$centSql
SELECT label, pos, ${s6("c")} AS c FROM cent"""

  private val ivfSql =
    s"""$centSql, centarr AS (
  SELECT label AS cand_label, list(c ORDER BY pos) AS cv FROM cent GROUP BY label
), assign AS (
  SELECT e.vec_id, e.label, c.cand_label,
         ${dist2Sql("e.embedding", "c.cv")} AS d2l
  FROM embeddings e, centarr c)
SELECT vec_id, label, cand_label AS assigned_label,
       ${s6("CAST(d2l AS DOUBLE)/1e12")} AS d2,
       cand_label = label AS correct
FROM (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d2l, cand_label) AS rnk
      FROM assign)
WHERE rnk = 1"""

  private val dedupEmbedSql =
    s"""WITH e AS (
  SELECT vec_id, embedding, ${dotSql("embedding", "embedding")} AS n,
         ${bucketSql("embedding", 6)} AS bucket
  FROM embeddings
), p AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         ${cosSql(dotSql("a.embedding", "b.embedding"), "a.n", "b.n")} AS cosine
  FROM e a JOIN e b
    ON a.bucket = b.bucket AND a.vec_id < b.vec_id
  WHERE a.n > 0 AND b.n > 0)
SELECT vec_a, vec_b, cosine FROM p WHERE cosine >= 0.2"""

  def oracleSql: Map[String, String] = Map(
    "dedup_embed" -> dedupEmbedSql,
    "embed_topk" -> topkSql,
    "embed_lsh_topk" -> lshTopkSql,
    "embed_centroids" -> centroidsSql,
    "embed_ivf" -> ivfSql
  )
}

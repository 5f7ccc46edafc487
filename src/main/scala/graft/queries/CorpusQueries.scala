package graft.queries

import graft.ops.{Chunker, Det, Robust, Sessionize}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-3 corpus/analytics additions, each with a DuckDB oracle twin:
  * token-window chunking, TF-IDF-style term ranking, winsorized robust
  * stats, interval-concurrency analysis, and inverted-index keyword
  * search. All arithmetic is exact integers or fixed IEEE sequences over
  * exactly-converted integers (see Det rule 3), so every query
  * hash-matches bit-exactly.
  */
object CorpusQueries {

  import TickQueries.r6

  private def s6(x: String): String = Det.snapSql(x, 6)

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  /** Spread corpus scan — opt-in for kernel-heavy bodies only (see
    * DocQueries.docsW: a blanket spread regressed light multi-pass
    * queries). */
  private def docsW(s: SparkSession, dir: String): DataFrame =
    graft.ops.Par.spread(docs(s, dir))

  // Chunking profile: 80-token windows, stride 60 (20-token overlap).
  private val ChunkWindow = 80
  private val ChunkStride = 60

  // Keyword-search profile (terms exist across the synthetic corpus).
  private val SearchTerms = Seq("spark", "vector", "stream")
  private val SearchTopK = 20

  // bow_cosine profile: query docs and result depth (shared constants).
  private val BowQueryMax = 5
  private val BowTopK = 10

  // kmv_distinct sketch size (shared Spark/oracle constant).
  private val KmvK = 16
  /** hll_distinct register count (shared Spark/oracle constant). */
  private[queries] val HllM = 64

  // countmin_words sketch geometry (shared Spark/oracle constants).
  private val CmWidth = 256
  private val CmDepth = 3
  private val CmTopK = 20

  /** Twin of Approx.countMin over the corpus word stream: the same
    * exact counter table (md5 positions, order-free sums), the same
    * (true_c DESC, v) top-k probe set, min-over-depth estimates. */
  private val countMinSql =
    s"""WITH vals AS (
  SELECT unnest(string_split(text, ' ')) AS v FROM documents
), hh AS (SELECT unnest(range(0, $CmDepth)) AS h),
cm AS MATERIALIZED (
  SELECT h, CAST(${hv48Sql("md5(CAST(h AS VARCHAR) || ':' || v)")} % $CmWidth AS BIGINT) AS pos,
         count(*) AS c
  FROM vals CROSS JOIN hh GROUP BY 1, 2),
top AS (
  SELECT v, true_c, rk FROM (
    SELECT v, count(*) AS true_c,
           CAST(row_number() OVER (ORDER BY count(*) DESC, v) AS BIGINT) AS rk
    FROM vals GROUP BY v)
  WHERE rk <= $CmTopK),
pr AS (
  SELECT t.v, t.true_c, t.rk, hh.h,
         CAST(${hv48Sql("md5(CAST(hh.h AS VARCHAR) || ':' || t.v)")} % $CmWidth AS BIGINT) AS pos
  FROM top t CROSS JOIN hh)
SELECT pr.v AS value, pr.rk, pr.true_c,
       CAST(min(cm.c) AS BIGINT) AS est_c,
       CAST(min(cm.c) - pr.true_c AS BIGINT) AS overestimate
FROM pr JOIN cm ON cm.h = pr.h AND cm.pos = pr.pos
GROUP BY 1, 2, 3"""

  /** 48-bit hash of `$h` (an md5 hex string) as an exact integer — the
    * oracle twin of Spark's `conv(substring(md5(v),1,12),16,10)`: the
    * first 12 nibbles re-parsed positionally (shared with the ops-level
    * twins via graft.ops.CorpusHex). */
  private[queries] def hv48Sql(h: String): String =
    graft.ops.CorpusHex.hv48Sql(h)

  /** Twin of Approx.kmvDistinct over the per-source vocabulary: same
    * distinct → 48-bit hash → (hv, v)-ordered k-th pick → estimator
    * sequence; the (k−1)·2^48 numerator crosses as a [[Det.dblLit]]
    * (exactly representable: 4 significant bits · a power of two). */
  private val kmvDistinctSql = {
    val num = Det.dblLit((KmvK - 1).toDouble * graft.ops.Approx.KmvScale)
    s"""WITH d AS (
  SELECT DISTINCT source AS key, word AS v
  FROM (SELECT source, unnest(string_split(text, ' ')) AS word FROM documents)
), h AS (
  SELECT key, v, CAST(${hv48Sql("md5(v)")} AS BIGINT) AS hv FROM d
), r AS (
  SELECT key, hv, row_number() OVER (PARTITION BY key ORDER BY hv, v) AS rn FROM h
), ex AS (
  SELECT key, count(*) AS n_exact FROM h GROUP BY 1
), kth AS (
  SELECT key, hv AS kth_hv FROM r WHERE rn = $KmvK
), est AS (
  SELECT ex.key, ex.n_exact, CAST($KmvK AS BIGINT) AS k, kth.kth_hv,
         CASE WHEN kth.kth_hv IS NULL THEN CAST(ex.n_exact AS DOUBLE)
              ELSE ${s6(s"$num / CAST(kth.kth_hv AS DOUBLE)")} END AS estimate
  FROM ex LEFT JOIN kth USING (key))
SELECT key, n_exact, k, kth_hv, estimate,
       ${s6("(estimate - CAST(n_exact AS DOUBLE)) / CAST(n_exact AS DOUBLE)")} AS rel_err
FROM est"""
  }

  /** Twin of Approx.hllDistinct over events (placed here for
    * [[hv48Sql]]; the query registers in AnalyticsQueries): distinct
    * event_ids per event_type — cardinalities ≫ 2.5·m, the regime where
    * raw HLL (no linear-counting correction — ln is not portable) is
    * actually unbiased. */
  private[queries] val hllDistinctSql = {
    val m = HllM; val z = 1L << 43
    val alphaNum = Det.dblLit(graft.ops.Approx.hllAlphaNum(m))
    s"""WITH d AS (
  SELECT DISTINCT event_type AS key, CAST(event_id AS VARCHAR) AS v
  FROM events
), h AS (
  SELECT key, CAST(${hv48Sql("md5(v)")} AS BIGINT) AS hv FROM d
), b AS (
  SELECT key, hv % $m AS bucket, (hv // $m) + ${1L << 42} AS x FROM h
), regs AS (
  SELECT key, bucket, max(x & -x) AS gmax FROM b GROUP BY 1, 2
), ex AS (
  SELECT key, count(*) AS n_exact FROM h GROUP BY 1
), s AS (
  SELECT key, CAST($m - count(*) AS BIGINT) AS n_empty,
         CAST(sum($z // (2 * gmax)) + ($m - count(*)) * $z AS BIGINT) AS sden
  FROM regs GROUP BY key
), est AS (
  SELECT ex.key, ex.n_exact, CAST($m AS BIGINT) AS m, s.n_empty,
         ${s6(s"$alphaNum / CAST(sden AS DOUBLE)")} AS estimate
  FROM ex JOIN s USING (key))
SELECT key, n_exact, m, n_empty, estimate,
       ${s6("(estimate - CAST(n_exact AS DOUBLE)) / CAST(n_exact AS DOUBLE)")} AS rel_err
FROM est"""
  }

  /** Sparse bag-of-words cosine top-k — the term-vector complement of the
    * dense-embedding ANN family: cosine over per-doc term-frequency
    * vectors, scored through the inverted index (a query only ever meets
    * documents SHARING a term — never a dense cross join). dot products
    * and squared norms are exact Long sums of tf products; the cosine is
    * the fixed sequence (double)dot / (√(double)qn² · √(double)n²) —
    * sqrt is correctly rounded in both engines — snapped at 6 dp before
    * the deterministic (cosine DESC, doc_id) rank.
    *
    * Scale shape: the tf build is one explode + partial/final aggregate;
    * the query side ([[BowQueryMax]] docs) broadcasts; the dot-product
    * aggregate is keyed by (qid, doc_id) — candidate count bounded by
    * Σ_w df(w)·qtf-presence, i.e. postings the query actually touches,
    * exactly how a sparse IR scorer runs at corpus scale. The corpus
    * norm join is doc-dimension (one row per doc).
    */
  private def bowCosine(s: SparkSession, d: String): DataFrame = {
    val base = docs(s, d)
    val tf = base.select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .groupBy(col("doc_id"), col("word")).agg(count(lit(1)).as("tf"))
    val norms = tf.groupBy(col("doc_id")).agg(sum(col("tf") * col("tf")).as("n2"))
    val qtf = tf.filter(col("doc_id") < BowQueryMax)
      .select(col("doc_id").as("qid"), col("word"), col("tf").as("qtf"))
    val dots = tf.join(broadcast(qtf), Seq("word"))
      .filter(col("doc_id") =!= col("qid"))
      .groupBy(col("qid"), col("doc_id"))
      .agg(sum(col("qtf") * col("tf")).as("dot"))
    val qn2 = norms.filter(col("doc_id") < BowQueryMax)
      .select(col("doc_id").as("qid"), col("n2").as("qn2"))
    val scored = dots.join(broadcast(qn2), Seq("qid")).join(norms, Seq("doc_id"))
      .select(col("qid"), col("doc_id"), col("dot"),
        Det.snap(col("dot").cast("double") /
          (sqrt(col("qn2").cast("double")) * sqrt(col("n2").cast("double"))), 6)
          .as("cosine"))
    scored
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("doc_id")))
        .cast("long"))
      .filter(col("rnk") <= BowTopK)
  }

  private val bowCosineSql =
    s"""WITH tf AS (
  SELECT doc_id, word, count(*) AS tf
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
  GROUP BY 1, 2
), norms AS (
  SELECT doc_id, CAST(sum(tf*tf) AS BIGINT) AS n2 FROM tf GROUP BY 1
), q AS (
  SELECT doc_id AS qid, word, tf AS qtf FROM tf WHERE doc_id < $BowQueryMax
), dots AS (
  SELECT q.qid, t.doc_id, CAST(sum(q.qtf * t.tf) AS BIGINT) AS dot
  FROM tf t JOIN q USING (word)
  WHERE t.doc_id <> q.qid
  GROUP BY 1, 2
), scored AS (
  SELECT d.qid, d.doc_id, d.dot,
         ${s6("CAST(d.dot AS DOUBLE) / (sqrt(CAST(qn.n2 AS DOUBLE)) * sqrt(CAST(dn.n2 AS DOUBLE)))")} AS cosine
  FROM dots d
  JOIN norms qn ON qn.doc_id = d.qid
  JOIN norms dn ON dn.doc_id = d.doc_id)
SELECT qid, doc_id, dot, cosine, rnk FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, doc_id) AS BIGINT) AS rnk
  FROM scored)
WHERE rnk <= $BowTopK"""

  // bpe_merges training depth (shared Spark/oracle constant).
  private val BpeRounds = 8

  // vocab_coverage vocabulary budgets (shared Spark/oracle constants).
  private val CoverNs = Seq(10, 100, 1000)

  /** Token coverage of top-N word vocabularies — the OOV-rate audit run
    * before fixing a tokenizer/vocab budget: what fraction of token
    * OCCURRENCES the N most frequent words cover (rank ties broken by
    * word, so the cut is deterministic). One inverted-index aggregate;
    * only ranks ≤ max(CoverNs) matter for the covered sums, so the
    * head is a TakeOrdered top-max(N) frame (no full-vocab sort or
    * global window — the vocabulary is dictionary-scale but this makes
    * the rank cost CoverN-bounded regardless); totals come from a
    * separate whole-vocab aggregate, joined as two 1-row frames. */
  private def vocabCoverage(s: SparkSession, d: String): DataFrame = {
    val wc = docs(s, d)
      .select(explode(split(col("text"), " ")).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
    val ranked = wc.orderBy(col("c").desc, col("word")).limit(CoverNs.max)
      .withColumn("rn",
        row_number().over(Window.orderBy(col("c").desc, col("word"))).cast("long"))
    val covAggs = CoverNs.map(n =>
      sum(when(col("rn") <= n, col("c")).otherwise(0L)).as(s"covered_$n"))
    val covered = ranked.agg(covAggs.head, covAggs.tail: _*)
    val totals = wc.agg(count(lit(1)).as("vocab_size"), sum(col("c")).as("n_tokens"))
    val row = totals.crossJoin(broadcast(covered)).localCheckpoint(true)
    wc.unpersist()
    CoverNs.foldLeft(row) { (acc, n) =>
      acc.withColumn(s"coverage_$n", Det.snap(
        col(s"covered_$n").cast("double") / col("n_tokens").cast("double"), 6))
    }
  }

  /** Twin of [[vocabCoverage]] — the single-partition rank is fine in
    * the oracle; the Spark side's rank is dictionary-scale. */
  private val vocabCoverageSql = {
    val covered = CoverNs.map(n =>
      s"CAST(sum(CASE WHEN rn <= $n THEN c ELSE 0 END) AS BIGINT) AS covered_$n")
      .mkString(",\n       ")
    val cov = CoverNs.map(n =>
      s"${s6(s"CAST(covered_$n AS DOUBLE) / CAST(n_tokens AS DOUBLE)")} AS coverage_$n")
      .mkString(",\n       ")
    s"""WITH wc AS (
  SELECT word, count(*) AS c
  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
  GROUP BY 1),
ranked AS (
  SELECT word, c, CAST(row_number() OVER (ORDER BY c DESC, word) AS BIGINT) AS rn
  FROM wc),
agg AS (
  SELECT count(*) AS vocab_size, CAST(sum(c) AS BIGINT) AS n_tokens,
       $covered
  FROM ranked)
SELECT vocab_size, n_tokens, ${CoverNs.map(n => s"covered_$n").mkString(", ")},
       $cov
FROM agg"""
  }

  /** Temperature-flattened source-mixture weights (the multilingual-
    * sampling recipe: p_i ∝ share_i^(1/T); T = 2, so the reweight is
    * √share — `sqrt` is correctly rounded in both engines). The
    * normalizing sum over sources is made order-free by snapping each
    * √share to an exact 1e-9 grid long FIRST (Det.kl) and summing
    * integers; the final weight is one division of exactly-converted
    * longs. Upweights the tail, downweights the head — the standard
    * fix for head-domination in a multi-source corpus. */
  private def mixtureTemperature(s: SparkSession, d: String): DataFrame = {
    val counts = docs(s, d).groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"))
    val total = counts.agg(sum(col("n_docs")).as("n_total"))
    val withShare = counts.crossJoin(broadcast(total))
      .withColumn("share",
        col("n_docs").cast("double") / col("n_total").cast("double"))
      .withColumn("kw", Det.kl(sqrt(col("share")), 9))
    val ksum = withShare.agg(sum(col("kw")).as("ktot"))
    withShare.crossJoin(broadcast(ksum))
      .select(col("source"), col("n_docs"), Det.snap(col("share"), 6).as("share"),
        Det.snap(col("kw").cast("double") / col("ktot").cast("double"), 6)
          .as("temp_weight"))
  }

  private val mixtureTemperatureSql =
    s"""WITH c AS (
  SELECT source, count(*) AS n_docs FROM documents GROUP BY 1),
t AS (SELECT CAST(sum(n_docs) AS BIGINT) AS n_total FROM c),
k AS (
  SELECT source, n_docs,
         CAST(n_docs AS DOUBLE) / CAST(t.n_total AS DOUBLE) AS share,
         ${Det.klSql("sqrt(CAST(n_docs AS DOUBLE) / CAST(t.n_total AS DOUBLE))", 9)} AS kw
  FROM c CROSS JOIN t),
ks AS (SELECT CAST(sum(kw) AS BIGINT) AS ktot FROM k)
SELECT source, n_docs, ${s6("share")} AS share,
       ${s6("CAST(kw AS DOUBLE) / CAST(ks.ktot AS DOUBLE)")} AS temp_weight
FROM k CROSS JOIN ks"""

  /** Twin of graft.ops.BpeTrain.merges: the merge loop UNROLLED into
    * generated CTE blocks (all MATERIALIZED — the seq chain would
    * otherwise inline exponentially, the kcore lesson). Per round:
    * weighted adjacent-pair counts, the (c DESC, a, b) argmax, candidate
    * match positions, the GREEDY subset via run-parity (row_number
    * twice: consecutive match positions share pos − rn; odd rank within
    * a run merges — exactly the left-to-right scan of the Spark loop),
    * then the rebuilt re-indexed sequence (merged symbol at the match,
    * the consumed right neighbor dropped). */
  /** The shared unrolled training chain (seq0 → seq$BpeRounds with a
    * best$r per round), used by both the merge-table and tokenize twins. */
  private val bpeChainSql = {
    val head =
      s"""w0 AS MATERIALIZED (
  SELECT word, CAST(count(*) AS BIGINT) AS f
  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
  GROUP BY 1),
c0 AS MATERIALIZED (
  SELECT word, f, CAST(unnest(range(1, len(word)+1)) AS BIGINT) AS pos FROM w0),
seq0 AS MATERIALIZED (
  SELECT word, f, pos, substring(word, CAST(pos AS INTEGER), 1) AS sym FROM c0)"""
    val blocks = (1 to BpeRounds).map { r =>
      val p = r - 1
      s"""pc$r AS MATERIALIZED (
  SELECT s.sym AS a, t.sym AS b, CAST(sum(s.f) AS BIGINT) AS c
  FROM seq$p s JOIN seq$p t ON s.word = t.word AND t.pos = s.pos + 1
  GROUP BY 1, 2),
best$r AS MATERIALIZED (
  SELECT a, b, c FROM pc$r ORDER BY c DESC, a, b LIMIT 1),
m$r AS MATERIALIZED (
  SELECT s.word, s.pos
  FROM seq$p s JOIN seq$p t ON s.word = t.word AND t.pos = s.pos + 1
  JOIN best$r x ON s.sym = x.a AND t.sym = x.b),
mr$r AS MATERIALIZED (
  SELECT word, pos FROM (
    SELECT word, pos,
           row_number() OVER (PARTITION BY word, pos - rn ORDER BY pos) AS rr
    FROM (SELECT word, pos,
                 row_number() OVER (PARTITION BY word ORDER BY pos) AS rn
          FROM m$r))
  WHERE rr % 2 = 1),
seq$r AS MATERIALIZED (
  SELECT s.word, s.f,
         CAST(row_number() OVER (PARTITION BY s.word ORDER BY s.pos) AS BIGINT) AS pos,
         CASE WHEN mm.pos IS NOT NULL THEN s.sym || (SELECT b FROM best$r)
              ELSE s.sym END AS sym
  FROM seq$p s
  LEFT JOIN mr$r mm ON mm.word = s.word AND mm.pos = s.pos
  LEFT JOIN mr$r cons ON cons.word = s.word AND cons.pos = s.pos - 1
  WHERE cons.pos IS NULL)"""
    }.mkString(",\n")
    s"$head,\n$blocks"
  }

  private val bpeMergesSql = {
    val rows = (1 to BpeRounds).map(r =>
      s"SELECT CAST($r AS BIGINT) AS merge_rank, a AS left_sym, b AS right_sym, c AS pair_count FROM best$r")
      .mkString("\nUNION ALL\n")
    s"WITH $bpeChainSql\n$rows"
  }

  /** Twin of BpeTrain.tokenCounts: the same unrolled training chain, then
    * per-word final symbol counts joined onto the doc→word stream. */
  /** Twin of bpe_eval: TWO unrolled chains — the training chain over
    * the train split (tseq/tbest, same blocks as bpeChainSql with the
    * split predicate pushed into w0), then an APPLY chain over the
    * held-out split whose per-round match joins the TRAIN chain's
    * tbest$r instead of computing its own argmax (that is exactly
    * "apply learned merges in rank order"). Per-source exact count
    * aggregate at the end. Every CTE MATERIALIZED (the working rule:
    * DuckDB inlines plain CTEs and a chained reference explodes
    * 3^rounds). */
  private val bpeEvalSql = {
    val trainHead =
      s"""tw0 AS MATERIALIZED (
  SELECT word, CAST(count(*) AS BIGINT) AS f
  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents
        WHERE doc_id % 5 <> 0)
  GROUP BY 1),
tc0 AS MATERIALIZED (
  SELECT word, f, CAST(unnest(range(1, len(word)+1)) AS BIGINT) AS pos FROM tw0),
tseq0 AS MATERIALIZED (
  SELECT word, f, pos, substring(word, CAST(pos AS INTEGER), 1) AS sym FROM tc0)"""
    val trainBlocks = (1 to BpeRounds).map { r =>
      val p = r - 1
      s"""tpc$r AS MATERIALIZED (
  SELECT s.sym AS a, t.sym AS b, CAST(sum(s.f) AS BIGINT) AS c
  FROM tseq$p s JOIN tseq$p t ON s.word = t.word AND t.pos = s.pos + 1
  GROUP BY 1, 2),
tbest$r AS MATERIALIZED (
  SELECT a, b, c FROM tpc$r ORDER BY c DESC, a, b LIMIT 1),
tm$r AS MATERIALIZED (
  SELECT s.word, s.pos
  FROM tseq$p s JOIN tseq$p t ON s.word = t.word AND t.pos = s.pos + 1
  JOIN tbest$r x ON s.sym = x.a AND t.sym = x.b),
tmr$r AS MATERIALIZED (
  SELECT word, pos FROM (
    SELECT word, pos,
           row_number() OVER (PARTITION BY word, pos - rn ORDER BY pos) AS rr
    FROM (SELECT word, pos,
                 row_number() OVER (PARTITION BY word ORDER BY pos) AS rn
          FROM tm$r))
  WHERE rr % 2 = 1),
tseq$r AS MATERIALIZED (
  SELECT s.word, s.f,
         CAST(row_number() OVER (PARTITION BY s.word ORDER BY s.pos) AS BIGINT) AS pos,
         CASE WHEN mm.pos IS NOT NULL THEN s.sym || (SELECT b FROM tbest$r)
              ELSE s.sym END AS sym
  FROM tseq$p s
  LEFT JOIN tmr$r mm ON mm.word = s.word AND mm.pos = s.pos
  LEFT JOIN tmr$r cons ON cons.word = s.word AND cons.pos = s.pos - 1
  WHERE cons.pos IS NULL)"""
    }.mkString(",\n")
    val evalHead =
      s"""ew0 AS MATERIALIZED (
  SELECT word, CAST(count(*) AS BIGINT) AS f
  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents
        WHERE doc_id % 5 = 0)
  GROUP BY 1),
ec0 AS MATERIALIZED (
  SELECT word, f, CAST(unnest(range(1, len(word)+1)) AS BIGINT) AS pos FROM ew0),
eseq0 AS MATERIALIZED (
  SELECT word, f, pos, substring(word, CAST(pos AS INTEGER), 1) AS sym FROM ec0)"""
    val evalBlocks = (1 to BpeRounds).map { r =>
      val p = r - 1
      s"""em$r AS MATERIALIZED (
  SELECT s.word, s.pos
  FROM eseq$p s JOIN eseq$p t ON s.word = t.word AND t.pos = s.pos + 1
  JOIN tbest$r x ON s.sym = x.a AND t.sym = x.b),
emr$r AS MATERIALIZED (
  SELECT word, pos FROM (
    SELECT word, pos,
           row_number() OVER (PARTITION BY word, pos - rn ORDER BY pos) AS rr
    FROM (SELECT word, pos,
                 row_number() OVER (PARTITION BY word ORDER BY pos) AS rn
          FROM em$r))
  WHERE rr % 2 = 1),
eseq$r AS MATERIALIZED (
  SELECT s.word, s.f,
         CAST(row_number() OVER (PARTITION BY s.word ORDER BY s.pos) AS BIGINT) AS pos,
         CASE WHEN mm.pos IS NOT NULL THEN s.sym || (SELECT b FROM tbest$r)
              ELSE s.sym END AS sym
  FROM eseq$p s
  LEFT JOIN emr$r mm ON mm.word = s.word AND mm.pos = s.pos
  LEFT JOIN emr$r cons ON cons.word = s.word AND cons.pos = s.pos - 1
  WHERE cons.pos IS NULL)"""
    }.mkString(",\n")
    s"""WITH $trainHead,
$trainBlocks,
$evalHead,
$evalBlocks,
wl AS MATERIALIZED (
  SELECT word, CAST(count(*) AS BIGINT) AS n_sym, CAST(len(word) AS BIGINT) AS n_char
  FROM eseq$BpeRounds GROUP BY word),
dw AS (
  SELECT doc_id, source, unnest(string_split(text, ' ')) AS word
  FROM documents WHERE doc_id % 5 = 0)
SELECT dw.source,
       CAST(count(DISTINCT dw.doc_id) AS BIGINT) AS n_docs,
       count(*) AS n_words,
       CAST(sum(wl.n_char) AS BIGINT) AS n_chars,
       CAST(sum(wl.n_sym) AS BIGINT) AS n_bpe,
       ${s6("CAST(sum(wl.n_sym) AS DOUBLE) / CAST(sum(wl.n_char) AS DOUBLE)")} AS compression
FROM dw JOIN wl USING (word)
GROUP BY dw.source"""
  }

  private val bpeTokenizeSql =
    s"""WITH $bpeChainSql,
wl AS MATERIALIZED (
  SELECT word, CAST(count(*) AS BIGINT) AS n_sym, CAST(len(word) AS BIGINT) AS n_char
  FROM seq$BpeRounds GROUP BY word),
dw AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
SELECT dw.doc_id, count(*) AS n_words,
       CAST(sum(wl.n_char) AS BIGINT) AS n_chars,
       CAST(sum(wl.n_sym) AS BIGINT) AS n_bpe,
       ${s6("CAST(sum(wl.n_sym) AS DOUBLE) / CAST(sum(wl.n_char) AS DOUBLE)")} AS compression
FROM dw JOIN wl USING (word)
GROUP BY dw.doc_id"""

  /** TF-IDF-style score without logarithms: tf · n_docs / df as the fixed
    * IEEE sequence (double)tf · (double)n / (double)df — log() is NOT
    * correctly rounded across engines, plain ratios are. Rank is over the
    * 6-dp-snapped score so ties resolve identically everywhere.
    *
    * Scale shape: two-level aggregate (doc-level then term-level) instead
    * of count(DISTINCT) — the same partial/final combine as a 100 TB
    * inverted-index build; the per-language doc-count side is a broadcast.
    */
  private def tfidfTerms(s: SparkSession, d: String): DataFrame = {
    val base = docs(s, d)
    val words = base.select(col("lang"), col("doc_id"),
      explode(split(col("text"), " ")).as("word"))
    val perDoc = words.groupBy(col("lang"), col("word"), col("doc_id"))
      .agg(count(lit(1)).as("c"))
    val stats = perDoc.groupBy(col("lang"), col("word"))
      .agg(sum(col("c")).as("tf"), count(lit(1)).as("df"))
    val nDocs = base.groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("score").desc, col("word"))
    stats.join(broadcast(nDocs), Seq("lang"))
      .withColumn("score",
        Det.snap(col("tf").cast("double") * col("n_docs").cast("double") /
          col("df").cast("double"), 6))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 8)
      .select(col("lang"), col("word"), col("tf"), col("df"),
        col("n_docs"), col("score"), col("rk"))
  }

  private val tfidfTermsSql =
    s"""WITH words AS (
  SELECT lang, doc_id, unnest(string_split(text, ' ')) AS word FROM documents
), per_doc AS (
  SELECT lang, word, doc_id, count(*) AS c FROM words GROUP BY 1, 2, 3
), stats AS (
  SELECT lang, word, CAST(sum(c) AS BIGINT) AS tf, count(*) AS df
  FROM per_doc GROUP BY 1, 2
), n AS (
  SELECT lang, count(*) AS n_docs FROM documents GROUP BY 1
), scored AS (
  SELECT s.lang, s.word, s.tf, s.df, n.n_docs,
         ${s6("CAST(s.tf AS DOUBLE) * CAST(n.n_docs AS DOUBLE) / CAST(s.df AS DOUBLE)")} AS score
  FROM stats s JOIN n USING (lang))
SELECT lang, word, tf, df, n_docs, score, rk
FROM (SELECT *, CAST(row_number() OVER (PARTITION BY lang ORDER BY score DESC, word) AS BIGINT) AS rk
      FROM scored)
WHERE rk <= 8"""

  /** Winsorized per-language length stats: clamp n_chars at the exact
    * p05/p95 values (percentile_disc semantics — real input values picked
    * by rank, no interpolation), then compare raw vs clamped means. The
    * quantile pass reuses the row_number-at-ceil(p·n) trick from
    * rel_quantiles; the quantile table is tiny → broadcast back. */
  private def winsorize(s: SparkSession, d: String): DataFrame = {
    val v = docs(s, d).select(col("lang"), col("doc_id"),
      col("n_chars").cast("long").as("v"))
    val byLang = Window.partitionBy(col("lang"))
    val w = byLang.orderBy(col("v"), col("doc_id"))
    val qs = v
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(byLang))
      .groupBy(col("lang"))
      .agg(
        max(when(col("rn") === ceil(lit(0.05) * col("n")), col("v"))).as("p05"),
        max(when(col("rn") === ceil(lit(0.95) * col("n")), col("v"))).as("p95"))
    v.join(broadcast(qs), Seq("lang"))
      .withColumn("wv", least(greatest(col("v"), col("p05")), col("p95")))
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        min(col("p05")).as("p05"),
        min(col("p95")).as("p95"),
        Det.snap(sum(col("v")).cast("double") / count(lit(1)), 6).as("avg_raw"),
        Det.snap(sum(col("wv")).cast("double") / count(lit(1)), 6).as("avg_winsorized"))
  }

  private val winsorizeSql =
    s"""WITH v AS (
  SELECT lang, doc_id, CAST(n_chars AS BIGINT) AS v FROM documents
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY lang ORDER BY v, doc_id) AS rn,
         count(*) OVER (PARTITION BY lang) AS n
  FROM v
), qs AS (
  SELECT lang,
         max(CASE WHEN rn = ceil(0.05 * n) THEN v END) AS p05,
         max(CASE WHEN rn = ceil(0.95 * n) THEN v END) AS p95
  FROM ranked GROUP BY lang)
SELECT v.lang, count(*) AS n_docs, min(p05) AS p05, min(p95) AS p95,
       ${s6("CAST(sum(v.v) AS DOUBLE) / count(*)")} AS avg_raw,
       ${s6("CAST(sum(least(greatest(v.v, qs.p05), qs.p95)) AS DOUBLE) / count(*)")} AS avg_winsorized
FROM v JOIN qs USING (lang)
GROUP BY v.lang"""

  /** Peak concurrent user sessions per hour — interval overlap analysis
    * over Sessionize output ([start, end) half-open). Deltas are
    * pre-aggregated per distinct instant BEFORE the running sum, so the
    * prefix scan runs over unique ordered keys (no window tie-break
    * freedom — bit-deterministic), and the prefix sum itself is
    * [[graft.ops.Ranks.runningSumByRange]] — stats-adaptive: the
    * two-pass range form once the boundary table outgrows the dimension
    * threshold, the one-task window under it. Long addition is
    * associative: identical bits to the oracle's global window sum at
    * any partitioning, either path. */
  private def sessionConcurrency(s: SparkSession, d: String): DataFrame = {
    val sess = Sessionize(
      AnalyticsQueries.events(s, d).select(col("user_id"), col("ts"), col("value")),
      "user_id", "ts", "value", "30 minutes")
    val deltas = sess.select(col("session_start").as("t"), lit(1L).as("delta"))
      .unionByName(sess.select(col("session_end").as("t"), lit(-1L).as("delta")))
    val perInstant = deltas.groupBy(col("t")).agg(sum(col("delta")).as("net"))
    graft.ops.Ranks.runningSumByRange(perInstant, Seq(col("t")), "net", "conc")
      .groupBy(date_trunc("hour", col("t")).as("bucket"))
      .agg(max(col("conc")).as("max_concurrent"), count(lit(1)).as("n_changes"))
  }

  private val sessionConcurrencySql = {
    val sessions = Sessionize.sql("events", "user_id", "ts", "value",
      "INTERVAL '30 minutes'")
    s"""WITH sess AS ($sessions),
deltas AS (
  SELECT session_start AS t, 1 AS delta FROM sess
  UNION ALL
  SELECT session_end AS t, -1 AS delta FROM sess
), per_instant AS (
  SELECT t, CAST(sum(delta) AS BIGINT) AS net FROM deltas GROUP BY t)
SELECT date_trunc('hour', t) AS bucket,
       CAST(max(conc) AS BIGINT) AS max_concurrent,
       count(*) AS n_changes
FROM (SELECT t, CAST(sum(net) OVER (ORDER BY t
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS conc
      FROM per_instant)
GROUP BY date_trunc('hour', t)"""
  }

  /** Inverted-index keyword search: documents ranked by how many query
    * terms they contain, then total term frequency (all integers, ids as
    * final tie-break). The word explode → filter(term set) is the
    * map-side index probe; everything after operates on the tiny matched
    * subset. */
  private def keywordSearch(s: SparkSession, d: String): DataFrame = {
    val words = docs(s, d).select(col("doc_id"), col("lang"),
      explode(split(col("text"), " ")).as("word"))
      .filter(col("word").isin(SearchTerms: _*))
    val scored = words.groupBy(col("doc_id"), col("lang"))
      .agg(count_distinct(col("word")).as("n_terms"),
        count(lit(1)).as("total_tf"))
    scored
      .orderBy(col("n_terms").desc, col("total_tf").desc, col("doc_id"))
      .limit(SearchTopK)
  }

  private val keywordSearchSql = {
    val terms = SearchTerms.map(t => s"'$t'").mkString("(", ", ", ")")
    s"""SELECT doc_id, lang,
       count(DISTINCT word) AS n_terms, count(*) AS total_tf
FROM (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS word FROM documents)
WHERE word IN $terms
GROUP BY doc_id, lang
ORDER BY n_terms DESC, total_tf DESC, doc_id
LIMIT $SearchTopK"""
  }

  /** Bigram language-model counts: per language, the top bigrams with
    * their conditional probability p(w2 | w1) = c(w1,w2) / c(w1,·) — the
    * count table behind n-gram LMs and collocation mining. Probabilities
    * are exact-integer ratios (one correctly-rounded division — log-free
    * for the same reason as tfidf_terms). Bigram generation is a typed
    * flatMap (per-record hot loop, CLAUDE.md invariant 4); c(w1,·) is a
    * window sum over the already-aggregated count table, not the raw
    * pairs. */
  private def bigramLm(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val pairs = docs(s, d).select(col("lang"), col("text"))
      .as[(String, String)]
      .flatMap { case (lang, text) =>
        val ws = text.split(" ", -1) // keep trailing empties (Catalyst/DuckDB rule)
        Iterator.range(0, ws.length - 1).map(i => (lang, ws(i), ws(i + 1)))
      }
      .toDF("lang", "w1", "w2")
    val counts = pairs.groupBy(col("lang"), col("w1"), col("w2"))
      .agg(count(lit(1)).as("c12"))
    val c1 = sum(col("c12")).over(Window.partitionBy(col("lang"), col("w1")))
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("c12").desc, col("w1"), col("w2"))
    counts
      .withColumn("c1", c1)
      .withColumn("p_cond",
        Det.snap(col("c12").cast("double") / col("c1").cast("double"), 6))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 10)
      .select(col("lang"), col("w1"), col("w2"), col("c12"), col("c1"),
        col("p_cond"), col("rk"))
  }

  /** collocations profile: minimum pair count and result depth. */
  private val CollocMinC = 5
  private val CollocTopK = 20

  /** Collocation mining by PMI lift: the top word pairs whose observed
    * co-occurrence beats the independence expectation — lift =
    * c12·N / (c1·c2), the exp(PMI) every collocation extractor ranks by
    * (Church & Hanks 1990), kept LOG-FREE so it stays engine-exact:
    * both numerator and denominator are exact integer products
    * (c12·N ≲ 1e11, c1·c2 ≲ 1e12 ≪ 2^53), the lift is ONE correctly-
    * rounded division snapped at 6 dp, and the rank orders by the
    * snapped value (ties → words). Same inverted bigram aggregate as
    * bigram_lm — one explode-count pass, marginals via a broadcast-size
    * word-count table, the min-count filter prunes the pair table
    * before the marginal joins. */
  private def collocations(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val words = docs(s, d).select(col("text")).as[String]
      .flatMap(_.split(" ", -1).iterator)
      .toDF("w")
    val n = words.count()
    val wc = words.groupBy(col("w")).agg(count(lit(1)).as("c"))
    val pairs = docs(s, d).select(col("text")).as[String]
      .flatMap { text =>
        val ws = text.split(" ", -1)
        Iterator.range(0, ws.length - 1).map(i => (ws(i), ws(i + 1)))
      }
      .toDF("w1", "w2")
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
      .filter(col("c12") >= CollocMinC)
    graft.ops.Ranks.rowNumberByRange(pairs
      .join(wc.select(col("w").as("w1"), col("c").as("c1")), Seq("w1"))
      .join(wc.select(col("w").as("w2"), col("c").as("c2")), Seq("w2"))
      .select(col("w1"), col("w2"), col("c12"), col("c1"), col("c2"),
        Det.snap((col("c12") * lit(n)).cast("double") /
          (col("c1") * col("c2")).cast("double"), 6).as("lift")),
      Seq(col("lift").desc, col("w1"), col("w2")), "rk")
      .filter(col("rk") <= CollocTopK)
  }

  private val collocationsSql =
    s"""WITH wc AS MATERIALIZED (
  SELECT w, CAST(count(*) AS BIGINT) AS c
  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
  GROUP BY 1
), n AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM wc),
t AS (
  SELECT string_split(text, ' ') AS ws FROM documents
), pairs AS (
  SELECT ws[i] AS w1, ws[i + 1] AS w2, CAST(count(*) AS BIGINT) AS c12
  FROM (SELECT ws, unnest(range(1, len(ws))) AS i FROM t)
  GROUP BY 1, 2 HAVING count(*) >= $CollocMinC
), lifted AS (
  SELECT p.w1, p.w2, p.c12, a.c AS c1, b.c AS c2,
         ${s6("CAST(p.c12 * n.n AS DOUBLE) / CAST(a.c * b.c AS DOUBLE)")} AS lift
  FROM pairs p
  JOIN wc a ON a.w = p.w1
  JOIN wc b ON b.w = p.w2
  CROSS JOIN n)
SELECT w1, w2, c12, c1, c2, lift, rk FROM (
  SELECT *, CAST(row_number() OVER (ORDER BY lift DESC, w1, w2) AS BIGINT) AS rk
  FROM lifted)
WHERE rk <= $CollocTopK"""

  private val bigramLmSql =
    s"""WITH t AS (
  SELECT lang, string_split(text, ' ') AS ws FROM documents
), big AS (
  SELECT lang, ws[i] AS w1, ws[i + 1] AS w2
  FROM (SELECT lang, ws, unnest(range(1, len(ws))) AS i FROM t)
), counts AS (
  SELECT lang, w1, w2, count(*) AS c12 FROM big GROUP BY 1, 2, 3
), with_c1 AS (
  SELECT *, CAST(sum(c12) OVER (PARTITION BY lang, w1) AS BIGINT) AS c1
  FROM counts)
SELECT lang, w1, w2, c12, c1,
       ${s6("CAST(c12 AS DOUBLE) / CAST(c1 AS DOUBLE)")} AS p_cond, rk
FROM (SELECT *, CAST(row_number() OVER (PARTITION BY lang
        ORDER BY c12 DESC, w1, w2) AS BIGINT) AS rk
      FROM with_c1)
WHERE rk <= 10"""

  /** Per-document LM fluency score against the corpus bigram model — a
    * perplexity proxy with NO logarithm: surprise of a bigram is the
    * inverse conditional probability c(w1,·)/c(w1,w2) (an exact-long
    * ratio, one correctly-rounded division — libm `log` bits differ
    * across engines, exact ratios never do), and the doc score is the
    * Det-exact grid mean of its bigram surprises. Low = typical
    * phrasing, high = rare continuations — the ranking a true
    * perplexity would give, deterministically.
    *
    * Scale: bigram generation is the typed flatMap (invariant 4),
    * cached once for its two consumers (model + per-doc join); the
    * model is vocabulary²-bounded — dictionary-sized, so the join back
    * onto per-doc bigrams broadcasts. One fact shuffle (per-doc agg). */
  private def lmFluency(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val bigrams = docs(s, d).select(col("doc_id"), col("lang"), col("text"))
      .as[(Long, String, String)]
      .flatMap { case (id, lang, text) =>
        val ws = text.split(" ", -1) // keep trailing empties (Catalyst/DuckDB rule)
        Iterator.range(0, ws.length - 1).map(i => (id, lang, ws(i), ws(i + 1)))
      }
      .toDF("doc_id", "lang", "w1", "w2").cache()
    val model = bigrams.groupBy(col("lang"), col("w1"), col("w2"))
      .agg(count(lit(1)).as("c12"))
      .withColumn("c1", sum(col("c12")).over(
        Window.partitionBy(col("lang"), col("w1"))))
    val surprise = col("c1").cast("double") / col("c12").cast("double")
    // Eager localCheckpoint (doc-dimension-sized result) so the bigram
    // cache releases here instead of leaking (CacheHygieneSpec).
    val out = bigrams
      .join(broadcast(model), Seq("lang", "w1", "w2"))
      .groupBy(col("doc_id"), col("lang"))
      .agg(count(lit(1)).as("n_bigrams"),
        Det.avgD(surprise, 4).as("fluency"),
        max(surprise).as("max_surprise"))
      .localCheckpoint(true)
    bigrams.unpersist(false)
    out
  }

  private val lmFluencySql =
    s"""WITH t AS (
  SELECT doc_id, lang, string_split(text, ' ') AS ws FROM documents
), big AS (
  SELECT doc_id, lang, ws[i] AS w1, ws[i + 1] AS w2
  FROM (SELECT doc_id, lang, ws, unnest(range(1, len(ws))) AS i FROM t)
), model AS (
  SELECT lang, w1, w2, count(*) AS c12,
         CAST(sum(count(*)) OVER (PARTITION BY lang, w1) AS BIGINT) AS c1
  FROM big GROUP BY 1, 2, 3)
SELECT b.doc_id, b.lang, count(*) AS n_bigrams,
       ${s6(Det.avgDSql("(CAST(m.c1 AS DOUBLE) / CAST(m.c12 AS DOUBLE))", 4))} AS fluency,
       ${s6("max(CAST(m.c1 AS DOUBLE) / CAST(m.c12 AS DOUBLE))")} AS max_surprise
FROM big b JOIN model m ON b.lang = m.lang AND b.w1 = m.w1 AND b.w2 = m.w2
GROUP BY b.doc_id, b.lang"""

  /** Median/MAD robust outliers over tick prices (see [[Robust]]); output
    * doubles go through the 6-dp contract snap on both sides. */
  private def madOutliers(s: SparkSession, d: String): DataFrame =
    r6(Robust.madOutliers(
      TickQueries.ticks(s, d)
        .select(col("product_id"), col("event_time"), col("sequence"), col("price")),
      "product_id", "price", Seq("sequence")))

  private val madOutliersSql = {
    val base = Robust.madOutliersSql(
      "(SELECT product_id, event_time, sequence, price FROM " +
        s"(${TickQueries.liveTicksSql}) lt) tt",
      "product_id", "price", Seq("sequence"))
    s"""SELECT product_id, event_time, sequence, ${s6("price")} AS price,
       ${s6("med")} AS med, ${s6("dev")} AS dev, ${s6("mad")} AS mad,
       ${s6("z_mad")} AS z_mad
FROM ($base) mo"""
  }

  // ---------------------------------------------------- source_mixture

  /** Dataset-card mixture table — the per-SOURCE summary a training run
    * reads to set mixture weights: document and token counts, the share
    * of tokens each source contributes, exact-duplicate rate, and the
    * quality-rule keep rate. Every rate is exactInt/exactInt (one
    * correctly-rounded division, snapped); the global token total is a
    * one-row broadcast (degree_dist pattern). Composes quality_rules +
    * exact dedup + the source dimension — one doc-sized join chain, one
    * source-cardinality output. */
  private def sourceMixture(s: SparkSession, d: String): DataFrame = {
    val base = docs(s, d).select(col("doc_id"), col("source"))
    val per = base
      .join(qualityRules(s, d).select(col("doc_id"), col("n_tokens"), col("keep")),
        Seq("doc_id"))
      .join(graft.ops.Dedup.exact(docs(s, d))
        .select(col("doc_id"), col("is_duplicate")), Seq("doc_id"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        count(when(col("keep"), 1)).as("n_keep"),
        count(when(col("is_duplicate"), 1)).as("n_dups"))
    val total = per.agg(sum(col("n_tokens")).as("total_tokens"))
    per.crossJoin(broadcast(total))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        Det.snap(col("n_tokens").cast("double") / col("total_tokens").cast("double"), 6)
          .as("token_share"),
        Det.snap(col("n_keep").cast("double") / col("n_docs").cast("double"), 6)
          .as("keep_rate"),
        Det.snap(col("n_dups").cast("double") / col("n_docs").cast("double"), 6)
          .as("dup_rate"))
  }

  // lazy: references DocQueries, which references this object back
  // (curation_report ← qualityRulesSql) — eager init would deadlock into
  // nulls during cross-object construction
  private lazy val sourceMixtureSql =
    s"""WITH q AS (${qualityRulesSql}),
dx AS (${DocQueries.dedupExactSql}),
per AS (
  SELECT d.source, count(*) AS n_docs,
         CAST(sum(q.n_tokens) AS BIGINT) AS n_tokens,
         count(CASE WHEN q.keep THEN 1 END) AS n_keep,
         count(CASE WHEN dx.is_duplicate THEN 1 END) AS n_dups
  FROM documents d
  JOIN q ON q.doc_id = d.doc_id
  JOIN dx ON dx.doc_id = d.doc_id
  GROUP BY 1),
tot AS (SELECT sum(n_tokens) AS total_tokens FROM per)
SELECT source, n_docs, n_tokens,
       ${s6("CAST(n_tokens AS DOUBLE) / CAST(tot.total_tokens AS DOUBLE)")} AS token_share,
       ${s6("CAST(n_keep AS DOUBLE) / CAST(n_docs AS DOUBLE)")} AS keep_rate,
       ${s6("CAST(n_dups AS DOUBLE) / CAST(n_docs AS DOUBLE)")} AS dup_rate
FROM per CROSS JOIN tot"""

  // -------------------------------------------------------- span_dedup

  // Span profile: 16-token windows, stride 8; stubs under 8 tokens skipped.
  private val SpanWindow = 16
  private val SpanStride = 8
  private val SpanMinTokens = 8

  /** Span-level copy detection — verbatim token spans repeated ACROSS
    * documents (the chunk-granularity complement to doc-level dedup:
    * boilerplate, licenses, and templated passages survive document
    * near-dup filters but still leak memorizable strings into training
    * data). Chunker's shuffle-free flatMap emits (span hash, doc) pairs;
    * one hash aggregate keeps spans seen in ≥ 2 distinct docs. Exact
    * counts only. */
  private def spanDedup(s: SparkSession, d: String): DataFrame =
    Chunker.chunks(docs(s, d), SpanWindow, SpanStride)
      .filter(col("n_chunk_tokens") >= SpanMinTokens)
      .groupBy(col("chunk_md5"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_occurrences"),
        min(col("doc_id")).as("first_doc"))
      .filter(col("n_docs") >= 2)

  private val spanDedupSql =
    s"""SELECT chunk_md5, count(DISTINCT doc_id) AS n_docs,
       count(*) AS n_occurrences, min(doc_id) AS first_doc
FROM (${Chunker.chunksSql("documents", SpanWindow, SpanStride)}) c
WHERE n_chunk_tokens >= $SpanMinTokens
GROUP BY chunk_md5
HAVING count(DISTINCT doc_id) >= 2"""

  // ---------------------------------------------------- dedup_substring

  // Exact-substring duplication threshold (chars). Lee et al. 2022
  // ("Deduplicating Training Data Makes Language Models Better",
  // ExactSubstr) removes any substring of at least this length that
  // occurs verbatim ≥ 2 times anywhere in the corpus.
  // (private[graft]: graft.streaming.StatefulSubstring's spec proves the
  // ingest-time twin against the same L.)
  private[graft] val SubstrL = 40

  /** Exact-substring duplication (Lee et al. 2022's ExactSubstr — the
    * suffix-array dedup criterion, reformulated window-wise): a char
    * position is duplicated iff some length-[[SubstrL]] window through
    * it occurs verbatim ≥ 2 times in the corpus, and a maximal
    * duplicated substring of ANY length ≥ L is exactly a maximal run of
    * duplicated window starts (every L-window of a longer duplicate is itself
    * duplicated; every duplicated L-window IS a length-L duplicate) —
    * so merging consecutive duplicated starts with gap ≤ L reproduces
    * the paper's merged removal spans without a suffix array. Unlike
    * [[spanDedup]]'s fixed 16-token chunks this yields char-exact span
    * boundaries and catches duplicates at any alignment.
    *
    * Scale shape: Σchars window rows (the inherent ExactSubstr cost in
    * the MapReduce formulation), shuffled ONCE on the 16-byte md5 of
    * the window (never the window text itself) for the global
    * occurrence count, then ONE doc-keyed exchange whose per-partition
    * work is doc-local (run merging is a per-doc window over ≤ n_chars
    * rows). Output: one row per maximal duplicated span — exact
    * integers end to end, no floats to snap. */
  private def dedupSubstring(s: SparkSession, d: String): DataFrame =
    dedupSubstringOf(docsW(s, d))

  /** [[dedupSubstring]] over an arbitrary (doc_id, text) frame — the
    * contract body AND the batch side of the
    * [[graft.streaming.StatefulSubstring]] twin's spec. */
  private[graft] def dedupSubstringOf(docFrame: DataFrame): DataFrame =
    substrSpansFromStarts(
      docFrame
        .filter(length(col("text")) >= SubstrL)
        .select(col("doc_id"), col("text"))
        .withColumn("pos",
          explode(sequence(lit(1), length(col("text")) - lit(SubstrL - 1))))
        .select(col("doc_id"), col("pos"),
          md5(expr(s"substr(text, pos, $SubstrL)")).as("g"))
        .withColumn("n_occ", count(lit(1)).over(Window.partitionBy(col("g"))))
        .filter(col("n_occ") >= 2)
        .select(col("doc_id"), col("pos")))

  /** The gap-≤-L island merge: duplicated window STARTS (doc_id, pos) →
    * maximal merged spans. Shared tail of the batch query and the
    * streaming twin (the stream emits starts at ingest; this exact
    * finishing merge makes its accumulated output the batch spans —
    * StatefulSubstringSpec). */
  private[graft] def substrSpansFromStarts(starts: DataFrame): DataFrame = {
    val wd = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    starts
      .withColumn("new_isl",
        when(col("pos") > lag(col("pos"), 1).over(wd) + lit(SubstrL), 1L)
          .otherwise(0L))
      .withColumn("isl", sum(col("new_isl")).over(
        wd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("doc_id"), col("isl"))
      .agg(min(col("pos")).cast("long").as("span_start"),
        (max(col("pos")) + lit(SubstrL - 1)).cast("long").as("span_end"),
        (max(col("pos")) - min(col("pos")) + lit(SubstrL)).cast("long")
          .as("span_len"),
        count(lit(1)).as("n_dup_windows"))
      .drop("isl")
  }

  /** Twin of [[dedupSubstring]]: same md5'd windows via unnest(range),
    * same global occurrence count, same gap-≤-L island merge. lag() at
    * a partition head yields NULL, the CASE's WHEN is not-true, and
    * both engines fall to the 0 branch — island numbering starts at 0
    * identically. */
  private val dedupSubstringSql =
    s"""WITH p AS (
  SELECT doc_id, text,
         unnest(range(1, length(text) - (${SubstrL - 1}) + 1)) AS pos
  FROM documents WHERE length(text) >= $SubstrL
), g AS (
  SELECT doc_id, pos, md5(substr(text, CAST(pos AS INTEGER), $SubstrL)) AS g
  FROM p
), dup AS (
  SELECT doc_id, pos FROM (
    SELECT doc_id, pos, count(*) OVER (PARTITION BY g) AS n_occ FROM g)
  WHERE n_occ >= 2
), isl AS (
  SELECT doc_id, pos,
         CASE WHEN pos > lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                        + $SubstrL
              THEN 1 ELSE 0 END AS new_isl
  FROM dup
), grp AS (
  SELECT doc_id, pos,
         sum(new_isl) OVER (PARTITION BY doc_id ORDER BY pos
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl
  FROM isl
)
SELECT doc_id,
       CAST(min(pos) AS BIGINT) AS span_start,
       CAST(max(pos) + ${SubstrL - 1} AS BIGINT) AS span_end,
       CAST(max(pos) - min(pos) + $SubstrL AS BIGINT) AS span_len,
       CAST(count(*) AS BIGINT) AS n_dup_windows
FROM grp GROUP BY doc_id, isl"""

  // ------------------------------------------------------- seq_packing

  // Training-sequence capacity (tokens per packed sequence).
  private val PackCap = 2048L

  /** Sequence packing — concat-and-chunk documents (in deterministic
    * doc_id order) into fixed-capacity training sequences: each doc's
    * token span [cum − n, cum) maps to packed sequences
    * first = (cum−n) div cap … last = (cum−1) div cap. The global
    * running token sum is [[graft.ops.Ranks.runningSumByRange]] —
    * stats-adaptive: the two-pass range prefix sum past the dimension
    * threshold, the one-task window under it — and long addition is
    * associative, so the result is bit-identical to the oracle's window
    * sum at any partitioning, either path. All outputs exact longs.
    */
  private def seqPacking(s: SparkSession, d: String): DataFrame = {
    val toks = docs(s, d).select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"))
    graft.ops.Ranks
      .runningSumByRange(toks, Seq(col("doc_id")), "n_tokens", "cum_tokens")
      .select(col("doc_id"), col("n_tokens"), col("cum_tokens"),
        expr(s"(cum_tokens - n_tokens) div $PackCap").as("pack_first"),
        expr(s"(cum_tokens - 1) div $PackCap").as("pack_last"))
      .withColumn("n_seqs", col("pack_last") - col("pack_first") + lit(1L))
  }

  private val seqPackingSql =
    s"""WITH t AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents),
c AS (
  SELECT doc_id, n_tokens,
         CAST(sum(n_tokens) OVER (ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum_tokens
  FROM t)
SELECT doc_id, n_tokens, cum_tokens,
       (cum_tokens - n_tokens) // $PackCap AS pack_first,
       (cum_tokens - 1) // $PackCap AS pack_last,
       ((cum_tokens - 1) // $PackCap) - ((cum_tokens - n_tokens) // $PackCap) + 1
         AS n_seqs
FROM c"""

  // ----------------------------------------------------- quality_rules

  // Gopher-style corpus filter thresholds (Rae et al. 2021-family rules).
  private val QrMinTokens = 50L
  private val QrMaxTokens = 100000L
  private val QrMinWordLen = 3L   // mean word length lower bound
  private val QrMaxWordLen = 10L  // upper bound
  private val QrSymbolDen = 10L   // symbol_ratio ≤ 1/10
  private val QrRepDen = 5L       // top_token_ratio ≤ 1/5

  /** Gopher-style quality-rule filtering: per doc, token count, mean
    * word length, symbol ratio and max-token-repetition ratio, each with
    * its rule flag and the combined keep decision. Every FLAG compares
    * EXACT INTEGERS (`word_chars ≥ 3·n_tokens`, `10·n_symbols ≤
    * n_chars`, …) — never thresholded doubles — so the booleans cannot
    * drift between engines; the double ratios are informational, snapped
    * exactInt/exactInt divisions. Scale shape: one exploded-token
    * aggregate (two-level, map-side combined) joined back to a
    * single-scan projection — both sides one row per doc.
    */
  private[queries] def qualityRules(s: SparkSession, d: String): DataFrame = {
    val base = docs(s, d)
    val per = base
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .groupBy(col("doc_id"), col("word")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_tokens"), max(col("c")).as("top_c"))
    base.select(col("doc_id"),
        length(col("text")).cast("long").as("n_chars"),
        length(expr("replace(text, ' ', '')")).cast("long").as("word_chars"),
        length(regexp_replace(col("text"), "[A-Za-z0-9 ]", "")).cast("long")
          .as("n_symbols"))
      .join(per, Seq("doc_id"))
      .select(col("doc_id"), col("n_tokens"),
        Det.snap(col("word_chars").cast("double") / col("n_tokens").cast("double"), 6)
          .as("mean_word_len"),
        Det.snap(col("n_symbols").cast("double") / col("n_chars").cast("double"), 6)
          .as("symbol_ratio"),
        Det.snap(col("top_c").cast("double") / col("n_tokens").cast("double"), 6)
          .as("top_token_ratio"),
        (col("n_tokens") >= QrMinTokens && col("n_tokens") <= QrMaxTokens)
          .as("flag_len"),
        (col("word_chars") >= col("n_tokens") * QrMinWordLen &&
          col("word_chars") <= col("n_tokens") * QrMaxWordLen).as("flag_word_len"),
        (col("n_symbols") * QrSymbolDen <= col("n_chars")).as("flag_symbols"),
        (col("top_c") * QrRepDen <= col("n_tokens")).as("flag_repetition"))
      .withColumn("keep", col("flag_len") && col("flag_word_len") &&
        col("flag_symbols") && col("flag_repetition"))
  }

  private[queries] val qualityRulesSql =
    s"""WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
per AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
         CAST(max(c) AS BIGINT) AS top_c
  FROM (SELECT doc_id, word, count(*) AS c FROM tok GROUP BY 1, 2)
  GROUP BY 1),
base AS (
  SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
         CAST(length(replace(text, ' ', '')) AS BIGINT) AS word_chars,
         CAST(length(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g')) AS BIGINT)
           AS n_symbols
  FROM documents),
j AS (SELECT * FROM base JOIN per USING (doc_id))
SELECT doc_id, n_tokens,
       ${s6("CAST(word_chars AS DOUBLE) / CAST(n_tokens AS DOUBLE)")} AS mean_word_len,
       ${s6("CAST(n_symbols AS DOUBLE) / CAST(n_chars AS DOUBLE)")} AS symbol_ratio,
       ${s6("CAST(top_c AS DOUBLE) / CAST(n_tokens AS DOUBLE)")} AS top_token_ratio,
       n_tokens >= $QrMinTokens AND n_tokens <= $QrMaxTokens AS flag_len,
       word_chars >= n_tokens * $QrMinWordLen
         AND word_chars <= n_tokens * $QrMaxWordLen AS flag_word_len,
       n_symbols * $QrSymbolDen <= n_chars AS flag_symbols,
       top_c * $QrRepDen <= n_tokens AS flag_repetition,
       (n_tokens >= $QrMinTokens AND n_tokens <= $QrMaxTokens)
         AND (word_chars >= n_tokens * $QrMinWordLen
              AND word_chars <= n_tokens * $QrMaxWordLen)
         AND (n_symbols * $QrSymbolDen <= n_chars)
         AND (top_c * $QrRepDen <= n_tokens) AS keep
FROM j"""

  /** Cross-source vocabulary overlap: for every source pair (src_a <
    * src_b, pairs sharing no word drop out in both engines), the distinct
    * vocabulary sizes, the shared-word count, and the Jaccard similarity
    * — the dataset-curation diagnostic for "which sources duplicate each
    * other's content". Counts are exact integers; the ratio is one IEEE
    * division of exactly-converted longs, 6-dp snapped (Det rule 3).
    *
    * Scale shape: the fan-out collapses FIRST to distinct (source, word)
    * — map-side combinable, vocabulary-sized — and the pair join is
    * word-keyed (the inverted-index shuffle) with at most S² rows per
    * word for S sources; the per-source size table is broadcast.
    */
  private def sourceOverlap(s: SparkSession, d: String): DataFrame = {
    val sw = docs(s, d)
      .select(col("source"), explode(split(col("text"), " ")).as("word"))
      .distinct()
    val sizes = sw.groupBy(col("source")).agg(count(lit(1)).as("v"))
    val inter = sw.toDF("src_a", "word")
      .join(sw.toDF("src_b", "word"), Seq("word"))
      .filter(col("src_a") < col("src_b"))
      .groupBy(col("src_a"), col("src_b")).agg(count(lit(1)).as("n_common"))
    inter
      .join(broadcast(sizes.toDF("src_a", "v_a")), Seq("src_a"))
      .join(broadcast(sizes.toDF("src_b", "v_b")), Seq("src_b"))
      .withColumn("n_union", col("v_a") + col("v_b") - col("n_common"))
      .withColumn("jaccard", Det.snap(
        col("n_common").cast("double") / col("n_union").cast("double"), 6))
      .select(col("src_a"), col("src_b"), col("v_a"), col("v_b"),
        col("n_common"), col("n_union"), col("jaccard"))
  }

  private val sourceOverlapSql =
    s"""WITH words AS (
  SELECT source, unnest(string_split(text, ' ')) AS word FROM documents
), sw AS (
  SELECT DISTINCT source, word FROM words
), sizes AS (
  SELECT source, count(*) AS v FROM sw GROUP BY 1
), inter AS (
  SELECT a.source AS src_a, b.source AS src_b, count(*) AS n_common
  FROM sw a JOIN sw b USING (word)
  WHERE a.source < b.source
  GROUP BY 1, 2
)
SELECT i.src_a, i.src_b, sa.v AS v_a, sb.v AS v_b, i.n_common,
       sa.v + sb.v - i.n_common AS n_union,
       ${s6("CAST(i.n_common AS DOUBLE) / CAST(sa.v + sb.v - i.n_common AS DOUBLE)")} AS jaccard
FROM inter i
JOIN sizes sa ON sa.source = i.src_a
JOIN sizes sb ON sb.source = i.src_b"""

  /** DuckDB twin of [[graft.ops.TextOps.vocabGrowth]]. Exact integers
    * end-to-end: counts are BIGINT in both engines (DuckDB's HUGEINT
    * window sums cast back down), doc_id is unique in `tok` so the
    * default RANGE window frame equals Spark's ROWS frame, and the
    * LEFT JOIN + COALESCE mirrors docs whose words were all seen before.
    */
  private val vocabGrowthSql =
    """WITH words AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
), first_seen AS (
  SELECT word, min(doc_id) AS doc_id FROM words GROUP BY 1
), neww AS (
  SELECT doc_id, count(*) AS new_words FROM first_seen GROUP BY 1
), tok AS (
  SELECT doc_id, count(*) AS n_tokens FROM words GROUP BY 1
)
SELECT t.doc_id, t.n_tokens,
       COALESCE(n.new_words, CAST(0 AS BIGINT)) AS new_words,
       CAST(sum(COALESCE(n.new_words, 0)) OVER (ORDER BY t.doc_id) AS BIGINT) AS vocab_size,
       CAST(sum(t.n_tokens) OVER (ORDER BY t.doc_id) AS BIGINT) AS cum_tokens
FROM tok t LEFT JOIN neww n USING (doc_id)"""

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "doc_chunks" -> ((s, d) =>
      Chunker.chunks(docs(s, d), ChunkWindow, ChunkStride)),
    "tfidf_terms" -> ((s, d) => tfidfTerms(s, d)),
    "bow_cosine" -> ((s, d) => bowCosine(s, d)),
    // KMV cardinality sketch with engine-portable bits — estimator and
    // its own error report per source (Approx.kmvDistinct scaladoc).
    // BPE merge training over the word dictionary — the tokenizer-
    // vocabulary learner (BpeTrain.merges scaladoc has the distributed
    // shape and the greedy-merge/run-parity equivalence argument).
    "vocab_coverage" -> ((s, d) => vocabCoverage(s, d)),
    "mixture_temperature" -> ((s, d) => mixtureTemperature(s, d)),
    "bpe_merges" -> ((s, d) =>
      graft.ops.BpeTrain.merges(docs(s, d), BpeRounds)),
    // The learned vocabulary APPLIED: per-doc BPE symbol totals and the
    // symbols-per-char compression readout (vocab-sized length table
    // broadcast onto the doc→word stream).
    "bpe_tokenize" -> ((s, d) =>
      graft.ops.BpeTrain.tokenCounts(docs(s, d), BpeRounds)),
    // Held-out tokenizer eval: merges trained on doc_id % 5 <> 0,
    // compression measured per source on the held-out fifth — the
    // generalization readout (does the vocab compress UNSEEN text) a
    // tokenizer run ships next to bpe_tokenize's in-corpus number.
    "bpe_eval" -> ((s, d) => {
      val base = docs(s, d)
      val ev = base.filter(col("doc_id") % 5 === 0)
      graft.ops.BpeTrain.tokenCountsHeldOut(
          base.filter(col("doc_id") % 5 =!= 0), ev, BpeRounds)
        .join(ev.select(col("doc_id"), col("source")), "doc_id")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_words")).as("n_words"),
          sum(col("n_chars")).as("n_chars"),
          sum(col("n_bpe")).as("n_bpe"))
        .select(col("source"), col("n_docs"), col("n_words"),
          col("n_chars"), col("n_bpe"),
          Det.snap(col("n_bpe").cast("double") /
            col("n_chars").cast("double"), 6).as("compression"))
    }),
    // Count-Min frequency sketch audited against exact top-k counts —
    // the order-free portable-bits companion to kmv_distinct
    // (Approx.countMin scaladoc has the fixed-size-counter argument).
    "countmin_words" -> ((s, d) => graft.ops.Approx.countMin(
      docsW(s, d).select(explode(split(col("text"), " ")).as("word")),
      col("word"), CmWidth, CmDepth, CmTopK)),
    "kmv_distinct" -> ((s, d) => graft.ops.Approx.kmvDistinct(
      docs(s, d).select(col("source"), explode(split(col("text"), " ")).as("word")),
      col("source"), col("word"), KmvK)),
    "winsorize_chars" -> ((s, d) => winsorize(s, d)),
    "session_concurrency" -> ((s, d) => sessionConcurrency(s, d)),
    "keyword_search" -> ((s, d) => keywordSearch(s, d)),
    "bigram_lm" -> ((s, d) => bigramLm(s, d)),
    "collocations" -> ((s, d) => collocations(s, d)),
    "lm_fluency" -> ((s, d) => r6(lmFluency(s, d))),
    "mad_outliers" -> ((s, d) => madOutliers(s, d)),
    "seq_packing" -> ((s, d) => seqPacking(s, d)),
    "span_dedup" -> ((s, d) => spanDedup(s, d)),
    "dedup_substring" -> ((s, d) => dedupSubstring(s, d)),
    "source_mixture" -> ((s, d) => sourceMixture(s, d)),
    "quality_rules" -> ((s, d) => qualityRules(s, d)),
    "vocab_growth" -> ((s, d) => graft.ops.TextOps.vocabGrowth(docs(s, d))),
    "source_overlap" -> ((s, d) => sourceOverlap(s, d))
  )

  def oracleSql: Map[String, String] = Map(
    "doc_chunks" -> Chunker.chunksSql("documents", ChunkWindow, ChunkStride),
    "tfidf_terms" -> tfidfTermsSql,
    "bow_cosine" -> bowCosineSql,
    "kmv_distinct" -> kmvDistinctSql,
    "countmin_words" -> countMinSql,
    "bpe_merges" -> bpeMergesSql,
    "vocab_coverage" -> vocabCoverageSql,
    "mixture_temperature" -> mixtureTemperatureSql,
    "bpe_tokenize" -> bpeTokenizeSql,
    "bpe_eval" -> bpeEvalSql,
    "winsorize_chars" -> winsorizeSql,
    "session_concurrency" -> sessionConcurrencySql,
    "keyword_search" -> keywordSearchSql,
    "bigram_lm" -> bigramLmSql,
    "collocations" -> collocationsSql,
    "lm_fluency" -> lmFluencySql,
    "mad_outliers" -> madOutliersSql,
    "seq_packing" -> seqPackingSql,
    "span_dedup" -> spanDedupSql,
    "dedup_substring" -> dedupSubstringSql,
    "source_mixture" -> sourceMixtureSql,
    "quality_rules" -> qualityRulesSql,
    "vocab_growth" -> vocabGrowthSql,
    "source_overlap" -> sourceOverlapSql
  )
}

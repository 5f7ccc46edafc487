package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Approximate-nearest-neighbor / similarity search over an embedding
  * column (`Array[Float]`), three ways:
  *
  *  - [[bruteForceTopK]]: exact cosine top-k — the baseline. The query
  *    set is broadcast, so the big side streams through one codegen'd
  *    stage with no shuffle of the corpus; per-query top-k is a
  *    window-ranked selection.
  *  - [[lshTopK]]: sign-random-projection LSH — queries only touch their
  *    hash bucket. At 100 TB the bucket column becomes the partition
  *    key, so a query reads one partition instead of the corpus.
  *  - [[ivfAssign]] (with [[centroids]]): IVF-style coarse quantization —
  *    per-label centroids (exact deterministic means via Det) and
  *    nearest-centroid assignment with the centroid table broadcast.
  *
  * Numeric determinism: dot products / distances are computed on the
  * 1e-12 integer grid with Long accumulation (associative and exact, so
  * any evaluation order gives the same bits; see Det's scaladoc), then
  * finished in IEEE doubles.
  */
object Similarity {

  /** Exact integer-grid inner product Σ round(a_i·b_i·1e12) as Long,
    * via the codegen'd native expression (graft.functions.DotProductGrid;
    * call [[graft.functions.GraftFunctions.register]] on the session
    * first — every operator here does). Bit-identical to the interpreted
    * composition `aggregate(zip_with(a, b, round·), 0L, +)`. */
  def dotL(a: Column, b: Column): Column =
    call_function(graft.functions.GraftFunctions.DotName, a, b)

  /** Squared L2 distance on the same grid: Σ round((a_i−b_i)²·1e12). */
  def dist2L(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) =>
        floor((x.cast("double") - y) * (x.cast("double") - y) * lit(1e12) + lit(0.5))),
      lit(0L), (acc, v) => acc + v)

  /** cosine(q, v) from grid inner products, snapped to 1e-6. */
  private def cosine(dot: Column, n1: Column, n2: Column): Column =
    Det.snap(
      (dot.cast("double") / 1e12) /
        sqrt((n1.cast("double") / 1e12) * (n2.cast("double") / 1e12)), 6)

  private def ranked(scored: DataFrame, k: Int): DataFrame =
    scored
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("vec_id")))
        .cast("long"))
      .filter(col("rnk") <= k)

  /** Maximal-Marginal-Relevance diversification of the brute-force
    * top-`n` candidate set: per query, greedily pick `k` results
    * maximizing `lam·sim(q,c) − oml·max_{s∈picked} sim(c,s)` — the
    * classic redundancy-aware re-ranking a retrieval layer applies
    * before surfacing results (or a curation pipeline before sampling
    * exemplars). Round 1 is the plain cosine argmax; later rounds
    * penalize similarity to the already-picked set.
    *
    * Scale + determinism shape: the candidate frame is structurally
    * bounded (|queries|·n rows) and the pair frame |queries|·n². When
    * the pool fits the driver gate (the Adaptive pattern —
    * [[Adaptive.threshold]]), the greedy loop runs ON THE DRIVER over
    * the collected pool + pair sims (one Spark job for candidates, one
    * for pairs, zero for the k−1 rounds — vs 24 sequential argmax jobs
    * for a 25-row pool); the distributed branch keeps the per-round
    * anti-join + max-aggregate + argmax-window form, localCheckpoint'ed
    * every round so the union lineage never re-evaluates earlier rounds
    * (and stays live under SPARK_GRAFT_FORCE_DISTRIBUTED — proven
    * bit-identical in ThresholdForcingSpec). Both branches run the SAME
    * IEEE sequence: candidate and pair cosines are snapped to the 1e-6
    * grid BEFORE the greedy arithmetic, `lam·simq − oml·ms` is the fixed
    * mul/mul/sub order, ranking uses the raw score with a vec_id
    * tie-break (primitive `>`/`==`, so −0.0 ties like Spark's
    * comparator), and the emitted score is the same floor-snap. The
    * oracle twin unrolls the same k rounds as MATERIALIZED CTEs
    * (VecQueries.mmrSql).
    */
  def mmrDiversify(queries: DataFrame, corpus: DataFrame,
                   n: Int, k: Int, lam: Double, oml: Double): DataFrame = {
    import org.apache.spark.sql.types.LongType
    val cand = bruteForceTopK(queries, corpus, n)
      .select(col("qid"), col("vec_id"), col("cosine").as("simq"), col("rnk"))
      .localCheckpoint(true)
    val emb = corpus.select(col("vec_id"), col("embedding"),
      dotL(col("embedding"), col("embedding")).as("nrm"))
    val ce = cand.select(col("qid"), col("vec_id")).join(emb, "vec_id")
    val pairsDf = ce.select(col("qid"), col("vec_id").as("a"),
        col("embedding").as("ea"), col("nrm").as("na"))
      .join(ce.select(col("qid"), col("vec_id").as("b"),
        col("embedding").as("eb"), col("nrm").as("nb")), Seq("qid"))
      .filter(col("a") =!= col("b"))
      .select(col("qid"), col("a"), col("b"),
        cosine(dotL(col("ea"), col("eb")), col("na"), col("nb")).as("psim"))
    val idsAreLong = cand.schema("qid").dataType == LongType &&
      cand.schema("vec_id").dataType == LongType
    if (idsAreLong && cand.count() <= Adaptive.threshold(20000L)) {
      // Driver greedy: pool ≤ 20k rows ⇒ pairs ≤ 20k·(n−1) rows — both
      // qid-bounded by construction, never corpus-sized.
      val out = mmrGreedyDriver(corpus.sparkSession,
        cand.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))),
        pairsDf.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))),
        k, lam, oml)
      cand.unpersist()
      out
    } else {
      val pairs = pairsDf.localCheckpoint(true)
      val first = cand.filter(col("rnk") === 1)
        .select(col("qid"), lit(1).as("pick"), col("vec_id"),
          Det.snap(lit(lam) * col("simq"), 6).as("mmr_score"))
        .localCheckpoint(true)
      var inter = List(first)
      val sel = (2 to k).foldLeft(first) { (sel, r) =>
        val remaining = cand.join(
          sel.select(col("qid"), col("vec_id")), Seq("qid", "vec_id"), "left_anti")
        val ms = pairs
          .join(sel.select(col("qid"), col("vec_id").as("b")), Seq("qid", "b"))
          .groupBy(col("qid"), col("a")).agg(max(col("psim")).as("ms"))
          .withColumnRenamed("a", "vec_id")
        val pickR = remaining.join(ms, Seq("qid", "vec_id"))
          .withColumn("score", lit(lam) * col("simq") - lit(oml) * col("ms"))
          .withColumn("rn", row_number().over(
            Window.partitionBy(col("qid")).orderBy(col("score").desc, col("vec_id"))))
          .filter(col("rn") === 1)
          .select(col("qid"), lit(r).as("pick"), col("vec_id"),
            Det.snap(col("score"), 6).as("mmr_score"))
        val next = sel.union(pickR).localCheckpoint(true)
        inter ::= next
        next
      }
      cand.unpersist(); pairs.unpersist(); inter.tail.foreach(_.unpersist())
      sel
    }
  }

  /** Driver-side greedy loop of [[mmrDiversify]] — the SAME IEEE op
    * sequence as the distributed branch, on the collected pool. */
  private def mmrGreedyDriver(spark: org.apache.spark.sql.SparkSession,
      cand: Array[(Long, Long, Double, Long)],
      pairs: Array[(Long, Long, Long, Double)],
      k: Int, lam: Double, oml: Double): DataFrame = {
    // Det.snap(c, 6) twin: floor → exact long → correctly-rounded double
    // (Spark's floor(double) yields BIGINT, then the long/1e6 divide).
    def snap6(x: Double): Double = math.floor(x * 1e6 + 0.5).toLong.toDouble / 1e6
    val psim = new scala.collection.mutable.HashMap[(Long, Long, Long), Double]
    pairs.foreach { case (q, a, b, s) => psim((q, a, b)) = s }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Int, Long, Double)]
    cand.groupBy(_._1).foreach { case (qid, pool0) =>
      val pool = pool0.sortBy(_._4) // by rnk: head is the round-1 argmax
      out += ((qid, 1, pool.head._2, snap6(lam * pool.head._3)))
      var picked = List(pool.head._2)
      var remaining = pool.tail.map(c => (c._2, c._3)) // (vec_id, simq)
      var r = 2
      while (r <= k && remaining.nonEmpty) {
        var bestV = Long.MaxValue; var bestScore = Double.NegativeInfinity
        remaining.foreach { case (vid, simq) =>
          var ms = Double.NegativeInfinity
          picked.foreach { p =>
            val s = psim((qid, vid, p)); if (s > ms) ms = s
          }
          val score = lam * simq - oml * ms
          // row_number orderBy(score desc, vec_id asc): primitive >/==
          // treats −0.0 == 0.0 exactly like Spark's double ordering
          if (score > bestScore || (score == bestScore && vid < bestV)) {
            bestScore = score; bestV = vid
          }
        }
        out += ((qid, r, bestV, snap6(bestScore)))
        picked ::= bestV
        remaining = remaining.filter(_._1 != bestV)
        r += 1
      }
    }
    spark.createDataFrame(out.toSeq)
      .toDF("qid", "pick", "vec_id", "mmr_score")
  }

  /** Exact cosine top-k of `corpus` rows for each row of `queries`
    * (both need vec_id + embedding). Self-matches excluded. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int = 10): DataFrame = {
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    val q = broadcast(queries.select(
      col("vec_id").as("qid"), col("embedding").as("qv"),
      dotL(col("embedding"), col("embedding")).as("nq")))
    val scored = corpus
      .select(col("vec_id"), col("embedding"),
        dotL(col("embedding"), col("embedding")).as("nv"))
      .join(q, col("vec_id") =!= col("qid"))
      .filter(col("nv") > 0 && col("nq") > 0)
      .select(col("qid"), col("vec_id"),
        cosine(dotL(col("qv"), col("embedding")), col("nq"), col("nv")).as("cosine"))
    ranked(scored, k).select(col("qid"), col("vec_id"), col("cosine"), col("rnk"))
  }

  /** Deterministic Rademacher hyperplanes for SRP: sign(p, i) ∈ {±1}
    * from the low bit of md5("srp:p:i") — engine-independent pseudo-
    * randomness, computed ONCE at plan-build time on the driver and
    * shipped as array literals (the oracle twin interpolates the same
    * constants). ±1 entries keep the grid arithmetic exact: a_i·(±1.0)
    * is an exact IEEE sign flip, so the plane dot product reuses the
    * same floor(a·b·1e12+0.5) sequence as every similarity kernel. */
  def planeSigns(planes: Int, dim: Int, salt: String = "srp"): Array[Array[Float]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(planes, dim) { (p, i) =>
      md.reset()
      val h = md.digest(s"$salt:$p:$i".getBytes("UTF-8"))
      if ((h(0) & 1) == 0) 1f else -1f
    }
  }

  /** Planes needed so the EXPECTED bucket population stays near
    * `targetBucketRows` for a `corpusRows`-row corpus: ⌈log2⌈n/target⌉⌉,
    * clamped to [1, 30]. SRP bucket counts must scale with the corpus —
    * a fixed 2^6 keying that is fine at sf0.1 turns every bucket into
    * millions of rows at 100 TB. Computed in EXACT integer arithmetic
    * (smallest k with 2^k ≥ ⌈n/target⌉ via the bit length of ⌈n/target⌉−1)
    * — the FP form ceil(log(r)/log(2)) overshoots by one plane at exact
    * powers of two — so the SQL twin's integer CASE chain
    * (VecQueries.planesForSql) matches for every (n, target). */
  def planesFor(corpusRows: Long, targetBucketRows: Long): Int = {
    require(corpusRows > 0 && targetBucketRows > 0)
    val ceilRatio = (corpusRows + targetBucketRows - 1) / targetBucketRows
    if (ceilRatio <= 1) 1
    else math.min(30, 64 - java.lang.Long.numberOfLeadingZeros(ceilRatio - 1))
  }

  /** Sign-random-projection bucket key: bit p = sign of the exact grid
    * dot product ⟨v, plane_p⟩ against md5-seeded random ±1 hyperplanes.
    * Random hyperplanes mix EVERY coordinate, so correlated real
    * embeddings (where the leading coordinates move together and
    * axis-aligned sign bits would collapse into a handful of buckets)
    * still spread across 2^planes buckets with cosine-proportional
    * collision odds (Goemans–Williamson: P[bit match] = 1 − θ/π).
    * All plane bits come from ONE codegen'd array pass
    * ([[graft.functions.SrpBucketExpr]] — the composed per-plane
    * dotl_grid form re-traversed the vector `planes` times); the
    * arithmetic per plane is DotProductGrid's exact sequence, so the key
    * is bit-identical to that composition AND the DuckDB twin. `dim`
    * must cover the embedding length (extra plane entries are ignored by
    * the min-length kernel; testdata embeddings are 64-wide). */
  def srpBucket(v: Column, planes: Int = 8, dim: Int = 64,
                salt: String = "srp"): Column =
    call_function(graft.functions.GraftFunctions.SrpName,
      v, lit(planes), lit(dim), lit(salt))

  /** Per-table SRP salt: table 0 is the base salt "srp" (so one table is
    * bit-identical to [[lshTopK]]); table t ≥ 1 seeds independent planes. */
  def tableSalt(t: Int): String = if (t == 0) "srp" else s"srp$t"

  /** LSH-bucketed ANN top-k: candidates limited to the query's SRP
    * bucket (recall trades for a corpus-partition-sized read). */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int = 10,
              planes: Int = 8): DataFrame = {
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    val q = broadcast(queries.select(
      col("vec_id").as("qid"), col("embedding").as("qv"),
      dotL(col("embedding"), col("embedding")).as("nq"),
      srpBucket(col("embedding"), planes).as("bucket")))
    val scored = corpus
      .select(col("vec_id"), col("embedding"),
        dotL(col("embedding"), col("embedding")).as("nv"),
        srpBucket(col("embedding"), planes).as("bucket"))
      .join(q, Seq("bucket"))
      .filter(col("vec_id") =!= col("qid") && col("nv") > 0 && col("nq") > 0)
      .select(col("qid"), col("vec_id"),
        cosine(dotL(col("qv"), col("embedding")), col("nq"), col("nv")).as("cosine"))
    ranked(scored, k).select(col("qid"), col("vec_id"), col("cosine"), col("rnk"))
  }

  /** Multi-table SRP ANN top-k: `tables` INDEPENDENT plane sets
    * (OR-amplification) — a candidate qualifies if it collides with the
    * query in ANY table, so recall at fixed per-table planes rises from
    * p^planes to 1−(1−p^planes)^tables (p = 1−θ/π per Goemans–
    * Williamson), while each table's bucket population keeps shrinking
    * as `planes` grows. This is the standard fix for the single-table
    * recall/bucket-size trade AND for join skew: the bucket join now has
    * tables·2^planes distinct keys instead of 2^planes.
    *
    * Shape: each side is exploded to (table, bucket) keys — the L×
    * indexing cost inherent to OR-amplification — the query side is
    * broadcast, candidates are de-duplicated on (qid, vec_id) BEFORE the
    * cosine kernel so a pair colliding in several tables is scored once.
    */
  def lshTopKMulti(queries: DataFrame, corpus: DataFrame, k: Int = 10,
                   planes: Int = 8, tables: Int = 4, dim: Int = 64): DataFrame = {
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    // table 0 uses the base salt so tables=1 degenerates EXACTLY to lshTopK
    def tb(v: Column): Column = explode(array((0 until tables).map(t =>
      struct(lit(t).as("t"),
        srpBucket(v, planes, dim, tableSalt(t)).as("b"))): _*))
    val q = broadcast(queries.select(
      col("vec_id").as("qid"), col("embedding").as("qv"),
      dotL(col("embedding"), col("embedding")).as("nq"),
      tb(col("embedding")).as("tb")))
    val cand = corpus
      .select(col("vec_id"), col("embedding"),
        dotL(col("embedding"), col("embedding")).as("nv"),
        tb(col("embedding")).as("tb"))
      .join(q, Seq("tb"))
      .filter(col("vec_id") =!= col("qid") && col("nv") > 0 && col("nq") > 0)
      .dropDuplicates("qid", "vec_id")
    val scored = cand.select(col("qid"), col("vec_id"),
      cosine(dotL(col("qv"), col("embedding")), col("nq"), col("nv")).as("cosine"))
    ranked(scored, k).select(col("qid"), col("vec_id"), col("cosine"), col("rnk"))
  }

  /** Multi-PROBE SRP ANN top-k (Lv et al., VLDB 2007): each query
    * searches its own bucket AND every 1-bit-flipped neighbor bucket —
    * the third recall dial next to more planes (smaller buckets, lower
    * recall) and more tables ([[lshTopKMulti]], extra indexing cost):
    * multi-probe raises recall with NO extra index, paying only
    * planes+1 probe joins per query. A flipped plane bit is exactly the
    * "query near the hyperplane" failure mode of SRP, so the 1-bit
    * neighborhood recovers most of the lost candidates.
    *
    * Shape: the query side explodes to planes+1 bucket keys (original +
    * each single-bit surgery on the bit string); the probe keys are
    * pairwise distinct and a corpus vector has ONE bucket, so a (query,
    * vector) pair arises at most once — no dedup pass needed before the
    * cosine kernel. The corpus side is untouched: same single bucket
    * column as [[lshTopK]], no second index. */
  def lshTopKProbe(queries: DataFrame, corpus: DataFrame, k: Int = 10,
                   planes: Int = 8): DataFrame = {
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    val base = corpus.select(col("vec_id"), col("embedding"),
      dotL(col("embedding"), col("embedding")).as("nv"),
      srpBucket(col("embedding"), planes).as("bucket"))
    val qb = col("qb")
    def flip(i: Int) = concat(
      substring(qb, 1, i - 1),
      when(substring(qb, i, 1) === "1", "0").otherwise("1"),
      substring(qb, i + 1, planes - i))
    val probeKeys = array((col("qb") +: (1 to planes).map(flip)): _*)
    val q = broadcast(queries.select(
      col("vec_id").as("qid"), col("embedding").as("qv"),
      dotL(col("embedding"), col("embedding")).as("nq"),
      srpBucket(col("embedding"), planes).as("qb"))
      .select(col("qid"), col("qv"), col("nq"),
        explode(probeKeys).as("bucket")))
    val scored = base.join(q, Seq("bucket"))
      .filter(col("vec_id") =!= col("qid") && col("nv") > 0 && col("nq") > 0)
      .select(col("qid"), col("vec_id"),
        cosine(dotL(col("qv"), col("embedding")), col("nq"), col("nv")).as("cosine"))
    ranked(scored, k).select(col("qid"), col("vec_id"), col("cosine"), col("rnk"))
  }

  /** All-vectors kNN graph — every vector's top-k neighbors among its
    * SRP-bucket mates: the backbone structure of graph-based ANN and of
    * SemDeDup-style semantic curation (each doc's nearest semantic
    * neighbors, corpus-wide — not just a sampled query set). Planes are
    * sized from the ACTUAL corpus count ([[planesFor]]) so bucket
    * populations track `targetBucketRows` at any scale.
    *
    * Scale shape: a bucket EQUI-SELF-JOIN — no broadcast side at all
    * (the query set IS the corpus), so Catalyst shuffles both sides on
    * the bucket key once and the pair space is Σ|bucket|², bounded by
    * the auto-sized planes; per-vector top-k goes through the
    * WindowGroupLimit partial rank. Recall is bucket-limited by
    * construction, exactly like [[lshTopK]] — the eval for that trade
    * is `ann_recall`.
    */
  def knnGraph(vectors: DataFrame, k: Int = 5,
               targetBucketRows: Long = 32L): DataFrame = {
    graft.functions.GraftFunctions.register(vectors.sparkSession)
    val planes = planesFor(math.max(vectors.count(), 1L), targetBucketRows)
    val base = vectors.select(col("vec_id"), col("embedding"),
      dotL(col("embedding"), col("embedding")).as("nv"),
      srpBucket(col("embedding"), planes).as("bucket"))
    val nbrs = base.select(col("bucket"), col("vec_id").as("nbr_id"),
      col("embedding").as("nbr_v"), col("nv").as("nn"))
    base.join(nbrs, Seq("bucket"))
      .filter(col("vec_id") =!= col("nbr_id") && col("nv") > 0 && col("nn") > 0)
      .select(col("vec_id"), col("nbr_id"),
        cosine(dotL(col("embedding"), col("nbr_v")), col("nv"), col("nn"))
          .as("cosine"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("vec_id")).orderBy(col("cosine").desc, col("nbr_id")))
        .cast("long"))
      .filter(col("rnk") <= k)
  }

  /** Typed LSH-bucket entry for near-dup pair generation. */
  final case class VecNorm(vec_id: Long, embedding: Seq[Float], n: Long)

  /** Typed bucketed row for the streaming pair generator. */
  final case class BucketVec(bucket: String, vec_id: Long,
                             embedding: Seq[Float], n: Long)

  /** Embedding-cosine near-duplicate pairs: SRP-bucketed candidates,
    * compiled pairwise cosine on the 1e-12 integer grid, threshold τ.
    * Recall is bucket-limited by construction (a 100 TB corpus only ever
    * compares within a bucket); raise `planes` as the corpus grows
    * ([[planesFor]]) to keep bucket populations bounded.
    *
    * Scale shape (no whole-bucket rows): the corpus is hash-partitioned
    * by bucket and sorted (bucket, vec_id) WITHIN partitions — one
    * Exchange, no `collect_list`, so a bucket is never materialized as a
    * single 2 GB-capped row. A mapPartitions pass then streams each
    * bucket group, buffering at most `maxBucket` vectors; rows past the
    * cap are dropped deterministically (highest vec_id first — the sort
    * makes the survivor set order-independent), counted in the
    * `graft.dedup_embed.dropped` accumulator (ADVISORY: updated inside a
    * transformation, so retries/speculation can double-count — see
    * [[lastDropped]]), and logged per partition — no silent truncation.
    * The cap is mirrored in the oracle twin (per-bucket row_number ≤
    * maxBucket on vec_id), so the bit-exact gate holds even when it
    * fires. Pair cost is Σ min(|bucket|, maxBucket)², mirroring
    * Jaccard's `maxDf` stop-shingle bound (Dedup.scala).
    */
  /** [[cosineNearDupPairs]] with `planes` sized from the ACTUAL corpus
    * row count via [[planesFor]] (one cheap count job at plan-build
    * time — a count(*) over a parquet scan is metadata-only), so bucket
    * populations stay near `targetBucketRows` at ANY corpus size and the
    * `maxBucket` cap is never the operative bound in healthy runs. This
    * is the contract path: the DuckDB twin mirrors the plane count with
    * the same exact integer arithmetic from its own count(*). */
  def cosineNearDupPairsAuto(vectors: DataFrame, tau: Double = 0.2,
                             targetBucketRows: Long = 8,
                             maxBucket: Int = 1 << 20): DataFrame = {
    val n = math.max(1L, vectors.count())
    cosineNearDupPairs(vectors, tau, planesFor(n, targetBucketRows), maxBucket)
  }

  /** Rows dropped by the `maxBucket` cap in the most recent
    * [[cosineNearDupPairs]] materialization on this JVM — a TEST/
    * telemetry hook over the `graft.dedup_embed.dropped` accumulator.
    * Approximate under task retries/speculation (accumulator updates in
    * a transformation can double-count); never gates behavior. */
  def lastDropped: Long = {
    val acc = lastDroppedAcc
    if (acc == null) 0L else acc.value
  }
  @volatile private var lastDroppedAcc: org.apache.spark.util.LongAccumulator = _

  def cosineNearDupPairs(vectors: DataFrame, tau: Double = 0.2,
                         planes: Int = 6,
                         maxBucket: Int = 1 << 20): DataFrame = {
    val spark = vectors.sparkSession
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val dropped = spark.sparkContext.longAccumulator("graft.dedup_embed.dropped")
    lastDroppedAcc = dropped
    val entries = vectors
      .select(srpBucket(col("embedding"), planes).as("bucket"),
        col("vec_id").cast("long").as("vec_id"), col("embedding"),
        dotL(col("embedding"), col("embedding")).as("n"))
      .as[BucketVec]
      .repartition(col("bucket"))
      .sortWithinPartitions(col("bucket"), col("vec_id"))
    entries
      .mapPartitions { rows0 =>
        val rows = rows0.buffered
        // group-by-consecutive-bucket, then all pairs within the capped group
        new Iterator[IndexedSeq[(Long, Array[Float], Long)]] {
          override def hasNext: Boolean = rows.hasNext
          override def next(): IndexedSeq[(Long, Array[Float], Long)] = {
            val b = rows.head.bucket
            val buf = scala.collection.mutable.ArrayBuffer
              .empty[(Long, Array[Float], Long)]
            var over = 0L
            while (rows.hasNext && rows.head.bucket == b) {
              val r = rows.next()
              if (buf.size < maxBucket) buf += ((r.vec_id, r.embedding.toArray, r.n))
              else over += 1
            }
            if (over > 0) {
              dropped.add(over)
              org.slf4j.LoggerFactory.getLogger("graft.ops.Similarity").warn(
                s"dedup_embed: bucket $b exceeded maxBucket=$maxBucket; dropped $over rows")
            }
            buf.toIndexedSeq
          }
        }.flatMap { ds =>
          for {
            i <- ds.indices.iterator
            j <- (i + 1) until ds.size
            (ida, ea, na) = ds(i); (idb, eb, nb) = ds(j)
            if na > 0 && nb > 0
            // identical IEEE sequence to dotL/cosine/snap (bit-exact twin)
            dot = {
              var s = 0L; var k = 0
              while (k < ea.length) {
                s += math.floor(ea(k).toDouble * eb(k).toDouble * 1e12 + 0.5).toLong
                k += 1
              }
              s
            }
            c = (dot.toDouble / 1e12) / math.sqrt((na.toDouble / 1e12) * (nb.toDouble / 1e12))
            c6 = math.floor(c * 1e6 + 0.5) / 1e6
            if c6 >= tau
          } yield (ida, idb, c6)
        }
      }
      .toDF("vec_a", "vec_b", "cosine")
  }

  /** Per-dimension scalar quantization report: for each embedding
    * coordinate `pos`, the corpus min/max, the uniform `levels`-step
    * quantization scale, and the reconstruction error it would incur
    * (max |err| and MSE) — the compression diagnostic run before storing
    * a 100 TB embedding corpus as int8 (4× smaller, cache-resident ANN).
    *
    * Determinism: min/max are exact comparisons (order-independent);
    * quantize→reconstruct→error is a fixed per-row IEEE sequence
    * (sub, div, mul, floor — each correctly rounded, identical in any
    * engine); max|err| is again an exact comparison aggregate; MSE goes
    * through [[Det.avgD]]'s exact long-grid sum (s=12: err² stays under
    * the Σ·10^s < 2^63 envelope up to ~10^9 rows per dimension even for
    * err up to 0.5 — far above any sane quantization error).
    *
    * Scale shape: two corpus scans. Pass 1 explodes to (pos, val) and
    * collapses map-side to `dim` rows (min/max partials — the shuffle
    * moves ≤ dim·partitions rows). Pass 2 re-explodes, joins the
    * broadcast dim-row stats table, and collapses map-side again to one
    * row per dimension. No wide shuffle at any corpus size.
    */
  /** 1-bit sign quantization of an embedding column, packed into two
    * 32-bit halves (sig_lo = dims 0–31, sig_hi = 32–63) — the binary-
    * embedding compression a retrieval tier stores when even PQ codes
    * are too large (64 dims → 8 bytes/vector). Halves stay in the
    * non-negative 32-bit range, so every engine's BIGINT arithmetic —
    * and DuckDB's shift-overflow check — is safe. Typed map, not a
    * higher-order lambda (CLAUDE.md rule 4: per-record hot loop).
    * Dims ≥ 64 are ignored by construction; bit j is `e(j) > 0`
    * (floats compare identically from the same parquet bits). */
  def signBits(vectors: DataFrame): DataFrame = {
    val spark = vectors.sparkSession
    import spark.implicits._
    vectors.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Seq[Float])]
      .map { case (id, e) =>
        var lo = 0L; var hi = 0L
        var j = 0
        val n = math.min(e.length, 64)
        while (j < n) {
          if (e(j) > 0f) {
            if (j < 32) lo |= 1L << j else hi |= 1L << (j - 32)
          }
          j += 1
        }
        (id, lo, hi)
      }.toDF("vec_id", "sig_lo", "sig_hi")
  }

  /** Hamming top-k over [[signBits]] signatures: per query the k
    * corpus vectors with the fewest differing sign bits
    * (d = popcount(lo⊕lo′) + popcount(hi⊕hi′)), ties broken by vec_id
    * — exact integers end to end. Scale shape: the query signatures
    * broadcast (queries ≪ corpus), the corpus side is ONE narrow
    * pass over 8-byte signatures with a per-query partial top-k
    * (WindowGroupLimit under the rnk filter) — the binary-retrieval
    * read path whose scan is dim/1-bit cheaper than the float corpus. */
  def hammingTopK(queries: DataFrame, corpus: DataFrame,
                  k: Int = 10, maxQueries: Long = 1L << 14): DataFrame = {
    // Precondition (not a silent fallback): the =!= join below compiles
    // to a BroadcastNestedLoopJoin, i.e. corpus × queries signature
    // comparisons. That is the intended shape for a SMALL query set
    // (serving-tier batch, ≤ ~16k: 8-byte signatures keep even the full
    // scan cheap), but it degrades quadratically if someone feeds a
    // corpus-sized query frame — fail loudly instead. For bulk all-pairs
    // use the SRP-bucketed kNN-graph path (see knnGraph). The guard is a
    // LIMIT probe, not a full count (round-11 ADVICE): it stops scanning
    // after maxQueries+1 rows, so a healthy call pays O(maxQueries) on
    // the raw query frame instead of a second full evaluation of the
    // queries subtree.
    val probeCap = math.min(maxQueries, Int.MaxValue.toLong - 1L).toInt
    val nq = queries.limit(probeCap + 1).count()
    require(nq <= maxQueries,
      s"hammingTopK is a broadcast-nested-loop scan: > $maxQueries query " +
        s"vectors supplied; use knnGraph/srp buckets for bulk sets")
    val qs = broadcast(signBits(queries).select(col("vec_id").as("qid"),
      col("sig_lo").as("qlo"), col("sig_hi").as("qhi")))
    signBits(corpus)
      .join(qs, col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        (bit_count(col("sig_lo").bitwiseXOR(col("qlo"))) +
          bit_count(col("sig_hi").bitwiseXOR(col("qhi"))))
          .cast("long").as("hamming"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("qid"))
          .orderBy(col("hamming"), col("vec_id"))).cast("long"))
      .filter(col("rnk") <= k)
  }

  def scalarQuantize(vectors: DataFrame, levels: Int = 255): DataFrame = {
    val ex = vectors
      .select(posexplode(col("embedding")).as(Seq("pos0", "f")))
      .select((col("pos0") + 1).cast("long").as("pos"),
        col("f").cast("double").as("val"))
    val stats = ex.groupBy(col("pos"))
      .agg(min(col("val")).as("mn"), max(col("val")).as("mx"))
    val L = lit(levels.toDouble)
    // q = round((val-mn)/(mx-mn)·L); val∈[mn,mx] so q∈[0,L] — no clamp
    val q = when(col("mx") > col("mn"),
      floor((col("val") - col("mn")) / (col("mx") - col("mn")) * L + lit(0.5)))
      .otherwise(lit(0.0))
    val recon = col("mn") + q * ((col("mx") - col("mn")) / L)
    ex.join(broadcast(stats), Seq("pos"))
      .select(col("pos"), col("mn"), col("mx"),
        (col("val") - recon).as("err"))
      .groupBy(col("pos"), col("mn"), col("mx"))
      .agg(Det.snap(max(abs(col("err"))), 9).as("max_abs_err"),
        Det.snap(Det.avgD(col("err") * col("err"), 12), 12).as("mse"))
      .select(col("pos"), col("mn"), col("mx"),
        Det.snap((col("mx") - col("mn")) / L, 9).as("scale"),
        col("max_abs_err"), col("mse"))
  }

  /** Top principal component of the embedding covariance via max-norm
    * power iteration on EXACT integer grids — the missing member of the
    * dimensionality family ([[centroids]]/k-means pick cluster structure,
    * embed_jl projects randomly; PCA finds the axis of maximum
    * variance for whitening / dominant-direction audits).
    *
    * Determinism design (every step engine-portable):
    *  - coordinates snap to the 1e-6 grid (k = floor(x·1e6+0.5), Long);
    *  - the covariance NUMERATOR M = n·Σkkᵀ − (Σk)(Σk)ᵀ is exact integer
    *    algebra (the covD formula per cell), accumulated as upper-
    *    triangle per-partition Long partials (|k|≤6e5 ⇒ products ≤3.6e11,
    *    no per-partition overflow) and combined in BigInt on the driver —
    *    the collected state is dim²-bounded like the IVF codebook, never
    *    data-sized;
    *  - each power iteration is w = M·v with v an integer 1e-6-grid
    *    vector ⇒ w is an exact integer (order-free sums); the ONLY
    *    floating ops per round are one correctly-rounded division by
    *    max|w| (both operands cross int→double via exact decimal
    *    strings) and the IEEE snap back to the 1e-6 grid;
    *  - the oracle (VecQueries.pcaSql) unrolls the same rounds as
    *    MATERIALIZED CTEs over a (j,k,m) HUGEINT cell table.
    * v₀ = all-ones grid; `iters` fixed (no convergence test — unrollable
    * trajectories, CLAUDE.md iterative-twin rule). Output: (dim [1-based],
    * loading = v_final/1e6) — max-norm scaled, sign-stable for v₀ > 0.
    */
  def pcaTopComponent(vectors: DataFrame, dim: Int, iters: Int): DataFrame = {
    val spark = vectors.sparkSession
    val (v, _) = pcaState(vectors, dim, iters)
    spark.createDataFrame(
      (0 until dim).map(j => (j + 1, v(j).toDouble / 1e6)))
      .toDF("dim", "loading")
  }

  /** PC1 transform + explained-variance share: per-vector principal
    * score sc = kᵀv (exact integer — k on the 1e-6 coordinate grid, v
    * the 1e-6 loading grid, so pc1 = sc/1e12), and the fraction of
    * total variance the component explains. The share rides the
    * identity n·Σsc² − (Σsc)² = vᵀMv: numerator aggregated in-engine
    * as DECIMAL(38) (sc² ≈ 1e27 outgrows Long), denominator
    * vᵀv·trace(M) is driver-exact BigInt crossing as a correctly-
    * rounded double literal; both are non-negative so every cast is
    * correctly rounded without the signed detour. One extra scan over
    * the vectors beyond [[pcaTopComponent]]'s moment pass; the scalar
    * share broadcast-joins onto the scores. */
  def pcaScores(vectors: DataFrame, dim: Int, iters: Int): DataFrame = {
    val spark = vectors.sparkSession
    import spark.implicits._
    val (v, trace) = pcaState(vectors, dim, iters)
    val scores = vectors.select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])]
      .map { case (id, emb) =>
        var acc = 0L; var j = 0
        while (j < dim) {
          acc += math.floor(emb(j).toDouble * 1e6 + 0.5).toLong * v(j); j += 1
        }
        (id, acc)
      }.toDF("vec_id", "sc")
    val den = v.map(x => BigInt(x) * BigInt(x)).sum * trace
    val denD = java.lang.Double.parseDouble(den.toString)
    val scd = col("sc").cast(DecimalType(38, 0))
    val expl = scores.agg(
        count(lit(1)).cast(DecimalType(38, 0)).as("n"),
        sum(scd).as("s1"), sum(scd * scd).as("s2"))
      .select(when(lit(den.signum > 0), Det.snap(
        (col("n") * col("s2") - col("s1") * col("s1"))
          .cast(DecimalType(38, 0)).cast("string").cast("double") / lit(denD), 6))
        .as("explained"))
    scores.crossJoin(broadcast(expl))
      .select(col("vec_id"),
        Det.snap(col("sc").cast("double") / lit(1e12), 6).as("pc1"),
        col("explained"))
  }

  /** Shared driver state for the PCA family: the max-norm-iterated
    * loading grid v (Longs on the 1e-6 grid) and trace(M) of the exact
    * covariance numerator. See [[pcaTopComponent]] for the design. */
  private def pcaState(vectors: DataFrame, dim: Int,
                       iters: Int): (Array[Long], BigInt) = {
    val spark = vectors.sparkSession
    import spark.implicits._
    val nTri = dim * (dim + 1) / 2
    val partials = vectors.select(col("embedding")).as[Seq[Float]]
      .mapPartitions { it =>
        val sp = new Array[Long](nTri); val s1 = new Array[Long](dim); var n = 0L
        it.foreach { v =>
          val k = new Array[Long](dim)
          var j = 0
          while (j < dim) { k(j) = math.floor(v(j).toDouble * 1e6 + 0.5).toLong; j += 1 }
          var idx = 0; j = 0
          while (j < dim) {
            s1(j) += k(j)
            var l = j
            while (l < dim) { sp(idx) += k(j) * k(l); idx += 1; l += 1 }
            j += 1
          }
          n += 1
        }
        Iterator.single((n, s1.toSeq, sp.toSeq))
      }.collect()
    val n = BigInt(partials.map(_._1).sum)
    val s1 = Array.tabulate(dim)(j => partials.map(p => BigInt(p._2(j))).sum)
    val sp = Array.tabulate(nTri)(i => partials.map(p => BigInt(p._3(i))).sum)
    // symmetric covariance-numerator lookup from the upper triangle
    val triIdx = Array.ofDim[Int](dim, dim)
    var triI = 0
    for (j <- 0 until dim; l <- j until dim) {
      triIdx(j)(l) = triI; triIdx(l)(j) = triI; triI += 1
    }
    def m(j: Int, l: Int): BigInt = n * sp(triIdx(j)(l)) - s1(j) * s1(l)
    // exact decimal-string route: correctly rounded at ANY magnitude
    // (JVM BigDecimal.doubleValue / BigInt.toDouble are not)
    def dbl(b: BigInt): Double = java.lang.Double.parseDouble(b.toString)
    var v = Array.fill(dim)(1000000L)
    for (_ <- 1 to iters) {
      val w = Array.tabulate(dim) { j =>
        var acc = BigInt(0)
        for (l <- 0 until dim) acc += m(j, l) * BigInt(v(l))
        acc
      }
      val mx = w.map(_.abs).max
      v = if (mx == 0) Array.fill(dim)(0L)
      else w.map(wj => math.floor(dbl(wj) / dbl(mx) * 1e6 + 0.5).toLong)
    }
    (v, (0 until dim).map(j => m(j, j)).sum)
  }

  /** Per-label centroids as (label, pos [1-based], c) rows — exact
    * deterministic means per coordinate. */
  def centroids(vectors: DataFrame): DataFrame =
    vectors
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos0", "val")))
      .select(col("label"), (col("pos0") + 1).cast("long").as("pos"),
        col("val").cast("double").as("val"))
      .groupBy(col("label"), col("pos"))
      .agg(Det.avgD(col("val"), 12).as("c"))

  /** Centroid rows → (label, cv: Array[Double] ordered by pos). */
  def centroidArrays(cent: DataFrame): DataFrame =
    cent
      .groupBy(col("label"))
      .agg(transform(
        sort_array(collect_list(struct(col("pos"), col("c")))),
        s => s.getField("c")).as("cv"))

  /** One IVF assignment row (d2 snapped to the 1e-6 grid). */
  final case class IvfRow(vec_id: Long, label: Int, assigned_label: Int,
                          d2: Double, correct: Boolean)

  /** IVF coarse assignment: nearest centroid per vector, ties broken by
    * smaller label. The codebook is tiny by construction, so it is
    * collected and shipped in the task closure; each vector then gets a
    * compiled argmin over the codebook — one output row per input row,
    * no join blowup, no shuffle, no window rank. Distances use the same
    * exact 1e-12 integer grid as [[dist2L]] (Long sums are associative,
    * so this is bit-identical to the declarative form).
    */
  def ivfAssign(vectors: DataFrame, centArrays: DataFrame): DataFrame = {
    val spark = vectors.sparkSession
    import spark.implicits._
    val codebook: Array[(Int, Array[Double])] = centArrays
      .select(col("label").cast("int"), col("cv"))
      .as[(Int, Seq[Double])]
      .collect()
      .map { case (l, cv) => (l, cv.toArray) }
      .sortBy(_._1)
    vectors.select(col("vec_id").cast("long"), col("embedding"), col("label").cast("int"))
      .as[(Long, Seq[Float], Int)]
      .map { case (id, emb, label) =>
        val e = emb.toArray
        var bestLabel = -1; var bestD = Long.MaxValue
        var ci = 0
        while (ci < codebook.length) {
          val (cl, cv) = codebook(ci)
          var s = 0L; var k = 0
          while (k < e.length) {
            val d = e(k).toDouble - cv(k)
            s += math.floor(d * d * 1e12 + 0.5).toLong
            k += 1
          }
          if (s < bestD) { bestD = s; bestLabel = cl } // sorted → tie keeps smaller
          ci += 1
        }
        IvfRow(id, label, bestLabel,
          math.floor((bestD.toDouble / 1e12) * 1e6 + 0.5) / 1e6,
          bestLabel == label)
      }
      .toDF()
  }

  /** One product-quantization code row (d2 snapped to the 1e-6 grid). */
  final case class PqRow(vec_id: Long, subspace: Long, code: Int, d2: Double)

  /** Product-quantization encoding: the embedding is split into
    * `dim / subDims` contiguous subspaces and each subvector is assigned
    * to its nearest sub-codeword — the codebook being the per-label
    * centroid slices (so `centArrays` is the same exact-deterministic
    * codebook [[ivfAssign]] uses, read piecewise). Output is one row per
    * (vector, subspace): the chosen code and the squared quantization
    * error `d2` of that subspace — i.e. the PQ code sequence a 100 TB
    * corpus would store instead of raw floats (dim·4 bytes → M codes),
    * plus the reconstruction-error diagnostic.
    *
    * Scale shape: identical to [[ivfAssign]] — the codebook is
    * label-sized by construction (collected and shipped in the task
    * closure), each vector emits M rows from one compiled argmin pass,
    * no join or shuffle at any corpus size. Distances accumulate on the
    * exact 1e-12 Long grid (associative → engine-bit-identical); each
    * subspace term is ≤ subDims·4e12 ≪ 2^53, so the finishing
    * int64→double cast is exact.
    *
    * Ties break toward the smaller code, matching the oracle's
    * `ORDER BY d2l, code` row_number. */
  def pqAssign(vectors: DataFrame, centArrays: DataFrame,
               subDims: Int = 16): DataFrame = {
    val spark = vectors.sparkSession
    import spark.implicits._
    val codebook: Array[(Int, Array[Double])] = centArrays
      .select(col("label").cast("int"), col("cv"))
      .as[(Int, Seq[Double])]
      .collect()
      .map { case (l, cv) => (l, cv.toArray) }
      .sortBy(_._1)
    vectors.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Seq[Float])]
      .flatMap { case (id, emb) =>
        val e = emb.toArray
        val m = e.length / subDims
        (0 until m).iterator.map { sub =>
          var bestCode = -1; var bestD = Long.MaxValue
          var ci = 0
          while (ci < codebook.length) {
            val (cl, cv) = codebook(ci)
            var s = 0L; var k = sub * subDims
            val end = (sub + 1) * subDims
            while (k < end) {
              val d = e(k).toDouble - cv(k)
              s += math.floor(d * d * 1e12 + 0.5).toLong
              k += 1
            }
            if (s < bestD) { bestD = s; bestCode = cl } // sorted → tie keeps smaller
            ci += 1
          }
          PqRow(id, (sub + 1).toLong, bestCode,
            math.floor((bestD.toDouble / 1e12) * 1e6 + 0.5) / 1e6)
        }
      }
      .toDF()
  }

  /** One ADC search hit (adc_d2 snapped to the 1e-6 grid). */
  final case class AdcRow(qid: Long, vec_id: Long, adc_d2: Double, rnk: Long)

  /** PQ asymmetric-distance (ADC) top-k search — the query path over
    * [[pqAssign]]'s codes: each corpus vector is represented ONLY by its
    * M sub-codes, and query→vector distance is the sum of precomputed
    * query→codeword distances, looked up from a per-query LUT of
    * `M · |codebook|` entries built once on the driver. This is the
    * IVFADC search kernel (Jégou et al., "Product Quantization for
    * Nearest Neighbor Search", TPAMI 2011): at 100 TB the scan touches
    * dim/subDims bytes per vector instead of dim·4, the LUT lives in
    * L1, and the whole pass is one shuffle-free map over the corpus
    * followed by a per-query top-k (WindowGroupLimit keeps that a
    * partial k-heap, never a full sort).
    *
    * Encode and search fuse into a single pass here (codes are
    * recomputed map-side rather than re-read) so the operator stays
    * self-contained; a stored-codes deployment would `map` over the
    * codes table instead — the LUT arithmetic is identical.
    *
    * Determinism: LUT entries and code assignment both accumulate on
    * the exact 1e-12 Long grid; the ADC sum is a Long sum of M entries
    * (≤ dim·4e12 ≪ 2^53), so the finishing cast and 1e-6 snap are
    * engine-bit-identical. Ties rank by (distance, vec_id) like every
    * top-k here. Self-matches are excluded.
    */
  /** Collect + label-sort a codebook frame — the driver-side prep every
    * PQ/IVF read path (and the [[VecIndex]] builder) shares. */
  private[graft] def sortedCodebook(centArrays: DataFrame): Array[(Int, Array[Double])] = {
    val spark = centArrays.sparkSession
    import spark.implicits._
    centArrays.select(col("label").cast("int"), col("cv"))
      .as[(Int, Seq[Double])]
      .collect()
      .map { case (l, cv) => (l, cv.toArray) }
      .sortBy(_._1)
  }

  /** Collect + id-sort the (small, broadcastable) query side. */
  private def collectQueries(queries: DataFrame): Array[(Long, Array[Float])] = {
    val spark = queries.sparkSession
    import spark.implicits._
    queries.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Seq[Float])]
      .collect()
      .map { case (id, e) => (id, e.toArray) }
      .sortBy(_._1)
  }

  private def gridD2Full(q: Array[Float], cv: Array[Double]): Long = {
    var s = 0L; var i = 0
    while (i < q.length) {
      val d = q(i).toDouble - cv(i)
      s += math.floor(d * d * 1e12 + 0.5).toLong
      i += 1
    }
    s
  }

  /** Per-cell probing-query sets: each query's nprobe nearest cells
    * (ties toward smaller label — the exact ivfProbeTopK ranking),
    * inverted to label → query indices. */
  private def probeSets(codebook: Array[(Int, Array[Double])],
                        qs: Array[(Long, Array[Float])],
                        nprobe: Int): Map[Int, Array[Int]] = {
    val perQ = qs.zipWithIndex.map { case ((_, q), qi) =>
      qi -> codebook.map { case (l, cv) => (gridD2Full(q, cv), l) }
        .sorted.take(nprobe).map(_._2)
    }
    perQ.flatMap { case (qi, ls) => ls.map(l => (l, qi)) }
      .groupBy(_._1).map { case (l, xs) => l -> xs.map(_._2) }
      .withDefaultValue(Array.empty[Int])
  }

  /** Union of the per-query probe sets — the cell list a PARTITIONED
    * [[VecIndex]] shard read prunes to ([[VecIndex.loadShardPruned]]).
    * Uses the same probe ranking as [[ivfProbeTopK]]/[[ivfPqTopK]]
    * (nprobe nearest cells per query, ties toward smaller label), so
    * pruning can never drop a cell a probing query would read; vectors
    * in the dropped cells contribute nothing anyway (the readers'
    * probes(cell) lookup is empty for them), which is why the pruned
    * read is bit-identical, not approximate (VecIndexSpec). */
  private[graft] def probedCellUnion(queries: DataFrame, centArrays: DataFrame,
                                     nprobe: Int): Seq[Int] = {
    val codebook = sortedCodebook(centArrays)
    probeSets(codebook, collectQueries(queries), nprobe).keys.toSeq.sorted
  }

  /** Per-query ADC LUTs (LUT(q)(sub)(code) = grid d2 of q's subvector
    * vs that codeword slice), built ONCE on the driver — the whole
    * point of ADC is that per-vector work is M lookups, not M·subDims
    * multiplies per query. */
  private def adcLuts(codebook: Array[(Int, Array[Double])],
                      qs: Array[(Long, Array[Float])],
                      subDims: Int): Array[Array[Array[Long]]] =
    qs.map { case (_, q) =>
      Array.tabulate(q.length / subDims) { sub =>
        codebook.map { case (_, cv) =>
          var s = 0L; var i = sub * subDims
          val end = (sub + 1) * subDims
          while (i < end) {
            val d = q(i).toDouble - cv(i)
            s += math.floor(d * d * 1e12 + 0.5).toLong
            i += 1
          }
          s
        }
      }
    }

  /** Shared ADC tail: (distance, vec_id) partial top-k + the exact-grid
    * distance finish. */
  private def adcRanked(scored: DataFrame, k: Int): DataFrame =
    scored
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("adcl"), col("vec_id")))
        .cast("long"))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("vec_id"),
        Det.snap(col("adcl").cast("double") / 1e12, 6).as("adc_d2"),
        col("rnk"))

  def pqAdcTopK(queries: DataFrame, corpus: DataFrame, centArrays: DataFrame,
                subDims: Int = 16, k: Int = 10): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val codebook = sortedCodebook(centArrays)
    val qs = collectQueries(queries)
    val luts = adcLuts(codebook, qs, subDims)
    val scored = corpus.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Seq[Float])]
      .flatMap { case (id, emb) =>
        val e = emb.toArray
        val m = e.length / subDims
        // encode: the shared kernel (tie → smaller code position)
        val codeIdx = VecKernels.pqCodes(codebook, e, subDims)
        qs.indices.iterator
          .filter(qi => qs(qi)._1 != id)
          .map { qi =>
            var adc = 0L; var sub = 0
            while (sub < m) { adc += luts(qi)(sub)(codeIdx(sub)); sub += 1 }
            (qs(qi)._1, id, adc)
          }
      }
      .toDF("qid", "vec_id", "adcl")
    adcRanked(scored, k)
  }

  /** ADC top-k over a PERSISTED [[VecIndex]] shard: identical LUT
    * arithmetic over the STORED codes (the deployment note in
    * [[pqAdcTopK]]'s scaladoc made real) — bit-identical output because
    * the stored code is the same [[VecKernels.pqCodes]] result the
    * fused path recomputes (VecIndexSpec). */
  def pqAdcTopKFromCodes(queries: DataFrame, shard: DataFrame,
                         centArrays: DataFrame, subDims: Int = 16,
                         k: Int = 10): DataFrame = {
    val spark = shard.sparkSession
    import spark.implicits._
    val codebook = sortedCodebook(centArrays)
    val qs = collectQueries(queries)
    val luts = adcLuts(codebook, qs, subDims)
    val scored = shard.select(col("vec_id").cast("long"), col("codes"))
      .as[(Long, Seq[Int])]
      .flatMap { case (id, codes) =>
        val codeIdx = codes.toArray
        val m = codeIdx.length
        qs.indices.iterator
          .filter(qi => qs(qi)._1 != id)
          .map { qi =>
            var adc = 0L; var sub = 0
            while (sub < m) { adc += luts(qi)(sub)(codeIdx(sub)); sub += 1 }
            (qs(qi)._1, id, adc)
          }
      }
      .toDF("qid", "vec_id", "adcl")
    adcRanked(scored, k)
  }

  /** IVF probe search — the read path over [[ivfAssign]]'s coarse
    * quantization: each query probes its `nprobe` nearest centroids and
    * reranks ONLY the vectors assigned to those cells with the exact
    * grid cosine. The recall/cost dial of inverted-file ANN: nprobe=1
    * touches ~1/|codebook| of the corpus, nprobe=|codebook| degenerates
    * to [[bruteForceTopK]] bit-for-bit (spec-pinned).
    *
    * Scale shape: the codebook and the query probe sets are driver-side
    * (label-sized / Q·nprobe); the corpus pass recomputes each vector's
    * cell map-side with the compiled argmin (a stored-assignments
    * deployment would filter the codes table instead — cell membership
    * is the partition key at 100 TB, so probing reads nprobe partitions
    * per query, not the corpus) and scores survivors against the
    * broadcast queries in the same pass: one shuffle-free scan, then
    * the per-query partial top-k.
    *
    * Determinism: centroid distances, cell argmin, and cosines all run
    * on the exact 1e-12 Long grid; ties break (distance, label) for
    * probes and (cosine desc, vec_id) for ranks — both mirrored in the
    * oracle's row_number orderings. */
  def ivfProbeTopK(queries: DataFrame, corpus: DataFrame, centArrays: DataFrame,
                   nprobe: Int = 3, k: Int = 10): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val codebook: Array[(Int, Array[Double])] = centArrays
      .select(col("label").cast("int"), col("cv"))
      .as[(Int, Seq[Double])]
      .collect()
      .map { case (l, cv) => (l, cv.toArray) }
      .sortBy(_._1)
    val qs: Array[(Long, Array[Float], Long)] = queries
      .select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Seq[Float])]
      .collect()
      .map { case (id, e) =>
        val a = e.toArray
        var nq = 0L; var i = 0
        while (i < a.length) {
          nq += math.floor(a(i).toDouble * a(i).toDouble * 1e12 + 0.5).toLong
          i += 1
        }
        (id, a, nq)
      }
      .filter(_._3 > 0L)
      .sortBy(_._1)
    def gridD2(q: Array[Float], cv: Array[Double]): Long = {
      var s = 0L; var i = 0
      while (i < q.length) {
        val d = q(i).toDouble - cv(i)
        s += math.floor(d * d * 1e12 + 0.5).toLong
        i += 1
      }
      s
    }
    // per-query probe set: nprobe nearest cells, ties toward smaller label
    val probes: Map[Int, Array[Int]] = {
      val perQ = qs.zipWithIndex.map { case ((_, q, _), qi) =>
        qi -> codebook.map { case (l, cv) => (gridD2(q, cv), l) }
          .sorted.take(nprobe).map(_._2)
      }
      val byLabel = perQ.flatMap { case (qi, ls) => ls.map(l => (l, qi)) }
        .groupBy(_._1).map { case (l, xs) => l -> xs.map(_._2) }
      byLabel.withDefaultValue(Array.empty[Int])
    }
    val scored = corpus.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Seq[Float])]
      .flatMap { case (id, emb) =>
        val e = emb.toArray
        // cell assignment: same compiled argmin as ivfAssign; norm on
        // the same grid — both shared with the VecIndex builder
        val cell = VecKernels.argminCell(codebook, e)._1
        val nv = VecKernels.normGrid(e)
        if (nv <= 0L) Iterator.empty
        else probes(cell).iterator
          .filter(qi => qs(qi)._1 != id)
          .map { qi =>
            val (qid, q, nq) = qs(qi)
            var dot = 0L; var j = 0
            while (j < e.length) {
              dot += math.floor(q(j).toDouble * e(j).toDouble * 1e12 + 0.5).toLong
              j += 1
            }
            val c = math.floor(((dot.toDouble / 1e12) /
              math.sqrt((nq.toDouble / 1e12) * (nv.toDouble / 1e12))) * 1e6 + 0.5) / 1e6
            (qid, id, c)
          }
      }
      .toDF("qid", "vec_id", "cosine")
    ranked(scored, k)
  }

  /** IVFADC — the full composition of [[ivfAssign]] (coarse quantizer)
    * and [[pqAdcTopK]] (PQ asymmetric distance), i.e. the actual index
    * layout of Jégou et al., "Product Quantization for Nearest Neighbor
    * Search" (TPAMI 2011) §IV and of FAISS `IndexIVFPQ`: each query
    * probes its `nprobe` nearest coarse cells, and ONLY the vectors
    * assigned to those cells are scored — by the ADC lookup sum over
    * their PQ codes, never the raw vectors.
    *
    * Why this is THE 100 TB serving shape: the coarse quantizer bounds
    * the fraction of the corpus touched per query (nprobe/|codebook| of
    * the partitions — cell is the partition key at scale, so probing is
    * partition pruning, not a scan), and PQ bounds the bytes touched
    * per surviving vector (M one-byte codes + an L1-resident LUT
    * instead of dim·4 bytes). [[ivfProbeTopK]] prunes cells but reads
    * full vectors; [[pqAdcTopK]] compresses vectors but scans every
    * cell; this does both — the two dials multiply.
    *
    * Kept self-contained like its two halves: cell assignment and PQ
    * codes are recomputed map-side in the one corpus pass (a deployed
    * index would read the stored codes table partitioned by cell; the
    * LUT arithmetic and candidate set are identical).
    *
    * Determinism: probe sets, cell argmin ([[VecKernels.argminCell]] —
    * the shared kernel), per-subspace code argmin, and LUT entries all
    * live on the exact 1e-12 Long grid; the ADC sum is a Long sum of M
    * entries ≪ 2^53, ties rank (distance, vec_id). With
    * nprobe ≥ |codebook| the probe filter admits every cell, so the
    * output degenerates bit-for-bit to [[pqAdcTopK]] (spec-pinned) —
    * the same way [[ivfProbeTopK]] degenerates to [[bruteForceTopK]].
    */
  def ivfPqTopK(queries: DataFrame, corpus: DataFrame, centArrays: DataFrame,
                nprobe: Int = 3, subDims: Int = 16, k: Int = 10): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val codebook = sortedCodebook(centArrays)
    val qs = collectQueries(queries)
    // per-query probe set: nprobe nearest cells, ties toward smaller
    // label — the exact probe ranking ivfProbeTopK uses
    val probes = probeSets(codebook, qs, nprobe)
    // per-query ADC LUTs, built once on the driver (Q·M·|codebook| longs)
    val luts = adcLuts(codebook, qs, subDims)
    val scored = corpus.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Seq[Float])]
      .flatMap { case (id, emb) =>
        val e = emb.toArray
        // coarse cell: the shared compiled argmin
        val cell = VecKernels.argminCell(codebook, e)._1
        val probing = probes(cell)
        if (probing.isEmpty) Iterator.empty
        else {
          // PQ encode once per vector (the shared kernel, reused by the
          // probing queries and identical to the stored VecIndex codes)
          val m = e.length / subDims
          val codeIdx = VecKernels.pqCodes(codebook, e, subDims)
          probing.iterator
            .filter(qi => qs(qi)._1 != id)
            .map { qi =>
              var adc = 0L; var sub = 0
              while (sub < m) { adc += luts(qi)(sub)(codeIdx(sub)); sub += 1 }
              (qs(qi)._1, id, adc)
            }
        }
      }
      .toDF("qid", "vec_id", "adcl")
    adcRanked(scored, k)
  }

  /** IVFADC over a PERSISTED [[VecIndex]] shard — the deployed form of
    * [[ivfPqTopK]]'s scaladoc note: the scan reads the stored
    * (cell, codes) columns instead of re-quantizing, so per vector it
    * touches M bytes + one cell int (never the embedding), and at 100 TB
    * a cell-partitioned shard turns the probe filter into partition
    * pruning. Bit-identical to the fused path (VecIndexSpec): stored
    * cell/codes are the same [[VecKernels]] results, and the candidate
    * set, LUT arithmetic, and rank tail are shared. */
  def ivfPqTopKFromIndex(queries: DataFrame, shard: DataFrame,
                         centArrays: DataFrame, nprobe: Int = 3,
                         subDims: Int = 16, k: Int = 10): DataFrame = {
    val spark = shard.sparkSession
    import spark.implicits._
    val codebook = sortedCodebook(centArrays)
    val qs = collectQueries(queries)
    val probes = probeSets(codebook, qs, nprobe)
    val luts = adcLuts(codebook, qs, subDims)
    val scored = shard
      .select(col("vec_id").cast("long"), col("cell").cast("int"), col("codes"))
      .as[(Long, Int, Seq[Int])]
      .flatMap { case (id, cell, codes) =>
        val probing = probes(cell)
        if (probing.isEmpty) Iterator.empty
        else {
          val codeIdx = codes.toArray
          val m = codeIdx.length
          probing.iterator
            .filter(qi => qs(qi)._1 != id)
            .map { qi =>
              var adc = 0L; var sub = 0
              while (sub < m) { adc += luts(qi)(sub)(codeIdx(sub)); sub += 1 }
              (qs(qi)._1, id, adc)
            }
        }
      }
      .toDF("qid", "vec_id", "adcl")
    adcRanked(scored, k)
  }

  /** IVF probe over a PERSISTED [[VecIndex]] shard: the stored cell
    * replaces the per-vector argmin and the stored norm grid replaces
    * the per-vector norm pass; the exact-cosine rerank over probed
    * cells is the same loop. Bit-identical to [[ivfProbeTopK]]
    * (VecIndexSpec). */
  def ivfProbeTopKFromIndex(queries: DataFrame, shard: DataFrame,
                            centArrays: DataFrame, nprobe: Int = 3,
                            k: Int = 10): DataFrame = {
    val spark = shard.sparkSession
    import spark.implicits._
    val codebook = sortedCodebook(centArrays)
    val qs: Array[(Long, Array[Float], Long)] = collectQueries(queries)
      .map { case (id, a) => (id, a, VecKernels.normGrid(a)) }
      .filter(_._3 > 0L)
    val probes = probeSets(codebook, qs.map { case (id, a, _) => (id, a) },
      nprobe)
    val scored = shard
      .select(col("vec_id").cast("long"), col("cell").cast("int"),
        col("embedding"), col("nvl").cast("long"))
      .as[(Long, Int, Seq[Float], Long)]
      .flatMap { case (id, cell, emb, nv) =>
        if (nv <= 0L) Iterator.empty
        else {
          val e = emb.toArray
          probes(cell).iterator
            .filter(qi => qs(qi)._1 != id)
            .map { qi =>
              val (qid, q, nq) = qs(qi)
              var dot = 0L; var j = 0
              while (j < e.length) {
                dot += math.floor(q(j).toDouble * e(j).toDouble * 1e12 + 0.5).toLong
                j += 1
              }
              val c = math.floor(((dot.toDouble / 1e12) /
                math.sqrt((nq.toDouble / 1e12) * (nv.toDouble / 1e12))) * 1e6 + 0.5) / 1e6
              (qid, id, c)
            }
        }
      }
      .toDF("qid", "vec_id", "cosine")
    ranked(scored, k)
  }

  /** Compiled nearest-centroid argmin on the exact 1e-12 grid distance
    * (ties keep the first = smallest cluster id in a sorted codebook) —
    * THE cell-assignment kernel, shared by the batch k-means loop, the
    * IVF read path, and [[graft.streaming.StatefulKmeans]] so the
    * streaming refresh can never assign a vector differently than the
    * batch recomputation. Forwards to [[VecKernels]], a Serializable
    * holder, so task closures capture only the tiny kernel object. */
  private[graft] def argminCell(cb: Array[(Int, Array[Double])],
                                e: Array[Float]): (Int, Long) =
    VecKernels.argminCell(cb, e)

  /** One k-means assignment row (d2 snapped to the 1e-6 grid). */
  final case class KmeansRow(vec_id: Long, cluster: Long, d2: Double)

  /** Lloyd's k-means refinement with a fixed iteration count — the
    * clustering loop behind IVF codebook TRAINING (the [[centroids]]
    * codebook uses the given labels; this learns one from geometry
    * alone). Seeds are the embeddings of the `k` smallest vec_ids
    * (deterministic, no RNG); each iteration assigns every vector to its
    * nearest centroid (exact 1e-12 grid distance, ties to the smaller
    * cluster id) and recomputes centroids as exact deterministic means
    * (Det.avgD — identical bits to the oracle's avgDSql). Output: the
    * final assignment with its snapped squared distance and the cluster
    * population.
    *
    * Scale shape — this is exactly how distributed k-means runs on a
    * cluster: per iteration ONE map-side-combinable aggregate collapses
    * the corpus to k·dim grid-sum rows (the only shuffle), the k·dim
    * codebook is collected and re-broadcast in the next task closure,
    * and assignment is a compiled argmin with no join or window. The
    * driver never holds more than the codebook. Iterations are FIXED
    * (not convergence-tested) so the plan is static and the oracle can
    * unroll the same count; empty clusters simply drop out of the next
    * codebook (mirrored by the twin's GROUP BY).
    *
    * Determinism: assignment distances are associative Long grid sums;
    * centroid means are Det grid-long sums finished `(double)Σk/1e12/n`
    * — so every iteration's codebook is bit-identical in both engines
    * and the fixpoint trajectory cannot diverge.
    */
  def kmeansRefine(vectors: DataFrame, k: Int = 8, iters: Int = 2): DataFrame = {
    val spark = vectors.sparkSession
    import spark.implicits._
    val base = vectors.select(col("vec_id").cast("long"), col("embedding"))
    val cbF = kmeansCodebook(vectors, k, iters)
    val fin = base.as[(Long, Seq[Float])]
      .map { case (id, emb) =>
        val (cid, d2l) = VecKernels.argminCell(cbF, emb.toArray)
        KmeansRow(id, cid.toLong,
          math.floor((d2l.toDouble / 1e12) * 1e6 + 0.5) / 1e6)
      }
      .toDF()
    val sizes = fin.groupBy(col("cluster")).agg(count(lit(1)).as("n_members"))
    fin.join(broadcast(sizes), Seq("cluster"))
      .select(col("vec_id"), col("cluster"), col("d2"), col("n_members"))
  }

  /** The Lloyd training loop of [[kmeansRefine]], returning the FINAL
    * codebook (for held-out evaluation / index serving) instead of the
    * in-train assignment. Same seeds, same iteration bits. */
  def kmeansCodebook(vectors: DataFrame, k: Int = 8,
                     iters: Int = 2): Array[(Int, Array[Double])] = {
    val spark = vectors.sparkSession
    import spark.implicits._
    val base = vectors.select(col("vec_id").cast("long"), col("embedding"))
    var codebook: Array[(Int, Array[Double])] = base
      .orderBy(col("vec_id")).limit(k)
      .as[(Long, Seq[Float])].collect()
      .sortBy(_._1).zipWithIndex
      .map { case ((_, emb), i) => (i, emb.toArray.map(_.toDouble)) }

    // compiled argmin over the closure codebook (sorted → tie keeps
    // the smaller cluster id, matching the oracle's ORDER BY d2l, cid);
    // VecKernels directly — the Serializable holder — so the task
    // closure never drags the Similarity object in.
    def argmin(cb: Array[(Int, Array[Double])], e: Array[Float]): (Int, Long) =
      VecKernels.argminCell(cb, e)

    var it = 0
    while (it < iters) {
      val cb = codebook
      val cent = base.as[(Long, Seq[Float])]
        .flatMap { case (_, emb) =>
          val e = emb.toArray
          val cid = argmin(cb, e)._1
          e.iterator.zipWithIndex.map { case (v, p) =>
            (cid, (p + 1).toLong, v.toDouble)
          }
        }
        .toDF("cid", "pos", "val")
        .groupBy(col("cid"), col("pos"))
        .agg(Det.avgD(col("val"), 12).as("c"))
        .select(col("cid").cast("int"), col("pos"), col("c"))
        .as[(Int, Long, Double)]
        .collect()
      codebook = cent.groupBy(_._1).toArray.sortBy(_._1).map { case (cid, rows) =>
        (cid, rows.sortBy(_._2).map(_._3))
      }
      it += 1
    }
    codebook
  }

  /** Declarative variant kept for reference/testing of [[dist2L]]. */
  def ivfAssignDeclarative(vectors: DataFrame, centArrays: DataFrame): DataFrame = {
    val scored = vectors
      .join(broadcast(centArrays.select(col("label").as("cand_label"), col("cv"))))
      .select(col("vec_id"), col("label"), col("cand_label"),
        dist2L(col("embedding"), col("cv")).as("d2l"))
    scored
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("vec_id")).orderBy(col("d2l"), col("cand_label"))))
      .filter(col("rnk") === 1)
      .select(
        col("vec_id"), col("label"),
        col("cand_label").as("assigned_label"),
        Det.snap(col("d2l").cast("double") / 1e12, 6).as("d2"),
        (col("cand_label") === col("label")).as("correct"))
  }
}

package graft.queries

import graft.ops._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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

  /** Shared constants — interpolated into BOTH the Spark calls and the
    * oracle SQL (CLAUDE.md invariant 2: one source of truth). */
  private val MultiTables = 4
  private val MultiPlanes = 8
  private val TargetBucket = 8L
  // def, not val: under Adaptive.forceDistributed the cap drops to 4 —
  // below the ~TargetBucket mean bucket population, so the cap branch
  // (sorted-buffer drop + its row_number oracle mirror) actually FIRES
  // at contract scale. queries and oracleSql are both defs, so the two
  // sides always interpolate the same value within a process.
  private def MaxBucket: Int = if (Adaptive.forceDistributed) 4 else 1 << 20
  private val QuantLevels = 255
  private val PqSubDims = 16
  private val ClusterK = 8L
  private val IvfNprobe = 3

  // ivf_sweep probe budgets (shared Spark/oracle constants): walks the
  // recall-vs-cells-scanned dial up to all-cells (= brute-force parity).
  private val SweepNprobes = Seq(1, 2, 4, 8)
  private val KmK = 8
  private val KmIters = 2
  private val KnnK = 5
  private val KnnTarget = 32L
  /** embed_jl target dimension + plane salt (independent of the "srp"
    * LSH planes — the projection must not correlate with the index). */
  private val JlK = 16
  private val JlSalt = "jl"
  /** semantic_prune cosine threshold (crosses via Det.dblLit). */
  private val SemTau = 0.2
  /** pca_power: embedding dimension and fixed power-iteration rounds
    * (no convergence test — the oracle unrolls the trajectory). */
  private val PcaDim = 64
  private val PcaIters = 3
  /** rrf_fusion: hybrid-retrieval profile — RRF constant (the k=60 of
    * Cormack–Clarke–Büttcher, SIGIR 2009), per-arm candidate depth, and
    * fused result depth. RRF scores live on an exact integer grid:
    * contribution = 10^12 div (k + rank) — integer division of positive
    * BIGINTs truncates identically in Spark (`div`) and DuckDB (`//`),
    * so the fused score never touches a float. */
  // private[queries] (r14 ADVICE): RrfFusionSpec reads these instead of
  // re-deriving literals — a constant change here now fails the spec's
  // recomputation loudly rather than silently recomputing both sides.
  private[queries] val RrfK = 60
  private[queries] val RrfDepth = 20
  private[queries] val RrfTopK = 10

  /** ndcg_eval DCG position weights on the 1e12 integer grid:
    * w_r = round(10^12 / log2(1+r)) for ranks 1..10, plus their running
    * sums (the ideal-DCG lookup). Computed ONCE here in Scala and
    * interpolated into BOTH sides as Long literals — neither engine
    * ever evaluates a logarithm, so the position discounting cannot
    * introduce a float divergence. */
  // private[queries] (r14 ADVICE): NdcgEvalSpec reads NdcgW/NdcgCw
  // directly instead of duplicating the grid-weight formula.
  private[queries] val NdcgK = 10
  private[queries] val NdcgW: Seq[(Long, Long)] =
    (1 to NdcgK).map(r => r.toLong ->
      math.floor(1e12 / (math.log1p(r.toDouble) / math.log(2.0)) + 0.5).toLong)
  private[queries] val NdcgCw: Seq[(Long, Long)] =
    NdcgW.scanLeft(0L -> 0L) { case ((_, acc), (r, w)) => r -> (acc + w) }.tail
  private val NdcgRankers = Seq("single", "multi", "ivf", "adc", "hamming")

  /** mmr_diversify: candidate pool, picks, relevance/diversity weights
    * (weights cross engines via Det.dblLit — never derive one from the
    * other with engine arithmetic: 1.0−0.7 ≠ the parsed literal 0.3). */
  private val MmrN = 20
  private val MmrK = 5
  private val MmrLam = 0.7
  private val MmrOml = 0.3

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "embed_topk" -> ((s, d) => {
      val v = vecs(s, d); Similarity.bruteForceTopK(q5(v), v)
    }),
    "embed_lsh_topk" -> ((s, d) => {
      val v = vecs(s, d); Similarity.lshTopK(q5(v), v)
    }),
    // Multi-probe SRP ANN: home bucket + every 1-bit-flip neighbor —
    // recall without a second index (Similarity.lshTopKProbe scaladoc
    // has the three-dial recall/cost comparison).
    "embed_lsh_probe" -> ((s, d) => {
      val v = vecs(s, d); Similarity.lshTopKProbe(q5(v), v)
    }),
    "embed_lsh_multi" -> ((s, d) => {
      val v = vecs(s, d)
      Similarity.lshTopKMulti(q5(v), v, k = 10,
        planes = MultiPlanes, tables = MultiTables)
    }),
    // Per-dimension z-score standardization — the feature-scaling pass
    // before PQ/JL/clustering. Exact to the bit: values snap to the
    // 1e-6 grid (|x| < 0.5 → |k| ≤ 5·10⁵), the per-dim moments are
    // whole-partition WINDOW aggregates (one Exchange on pos, no
    // groupBy+join-back — the seasonal-fusion shape), and the n's
    // cancel so z = (k·n − Σk)/√(n·Σk² − (Σk)²): a signed exact
    // integer over a DECIMAL38 variance numerator, both crossing to
    // double via exact decimal STRINGS (the >2⁵³ + signed-cast rule),
    // finished by one correctly-rounded sqrt and division.
    "embed_standardize" -> ((s, d) => {
      import org.apache.spark.sql.types.DecimalType
      def dec(c: org.apache.spark.sql.Column) = c.cast(DecimalType(19, 0))
      def exact(c: org.apache.spark.sql.Column) =
        c.cast("string").cast("double")
      val ex = vecs(s, d)
        .select(col("vec_id"),
          posexplode(col("embedding")).as(Seq("pos", "val")))
        .select(col("vec_id"), col("pos").cast("long").as("pos"),
          Det.kl(col("val").cast("double"), 6).as("k"))
      val wp = Window.partitionBy(col("pos"))
      ex.withColumn("n", count(lit(1)).over(wp))
        .withColumn("sk", sum(col("k")).over(wp))
        .withColumn("sk2", sum(dec(col("k")) * dec(col("k"))).over(wp))
        .withColumn("vnum",
          dec(col("n")) * col("sk2") - dec(col("sk")) * dec(col("sk")))
        .filter(col("vnum") > 0)
        .select(col("vec_id"), col("pos"),
          Det.snap(exact(col("k") * col("n") - col("sk")) /
            sqrt(exact(col("vnum"))), 6).as("z"))
    }),
    // Robust per-dimension scaling: median + MAD instead of mean/sd —
    // the outlier-immune scaler. Both statistics are order-statistic
    // PICKS (lower median at rank ⌊(n+1)/2⌋, a pick not an
    // interpolation) on the 1e-6 grid, so everything is exact
    // integers: rank within each dimension, window-pick the median
    // (no join-back — the seasonal-fusion shape), rank |k − med|,
    // pick again. Two sorts on ONE pos Exchange; |dims| rows out.
    "embed_robust_scale" -> ((s, d) => {
      val ex = vecs(s, d)
        .select(col("vec_id"),
          posexplode(col("embedding")).as(Seq("pos", "val")))
        .select(col("vec_id"), col("pos").cast("long").as("pos"),
          Det.kl(col("val").cast("double"), 6).as("k"))
      val wp = Window.partitionBy(col("pos"))
      val byK = Window.partitionBy(col("pos")).orderBy(col("k"), col("vec_id"))
      val withMed = ex
        .withColumn("n", count(lit(1)).over(wp))
        .withColumn("rn", row_number().over(byK).cast("long"))
        .withColumn("med",
          max(when(col("rn") === expr("(n + 1) div 2"), col("k"))).over(wp))
      val byAd = Window.partitionBy(col("pos"))
        .orderBy(abs(col("k") - col("med")), col("vec_id"))
      withMed
        .withColumn("rn2", row_number().over(byAd).cast("long"))
        .groupBy(col("pos"))
        .agg(max(col("n")).as("n_obs"),
          max(when(col("rn") === expr("(n + 1) div 2"), col("k"))).as("medk"),
          max(when(col("rn2") === expr("(n + 1) div 2"),
            abs(col("k") - col("med")))).as("madk"))
        .select(col("pos"), col("n_obs"),
          Det.snap(col("medk").cast("double") / lit(1000000.0), 6)
            .as("median_val"),
          Det.snap(col("madk").cast("double") / lit(1000000.0), 6).as("mad"))
    }),
    // Binary-embedding retrieval: 1-bit sign quantization packed into
    // two 32-bit halves + exact Hamming top-k (Similarity.signBits /
    // hammingTopK scaladocs — 8 bytes/vector corpus scan).
    "embed_hamming_topk" -> ((s, d) => {
      val v = vecs(s, d); Similarity.hammingTopK(q5(v), v)
    }),
    "embed_centroids" -> ((s, d) => r6(Similarity.centroids(vecs(s, d)))),
    "embed_ivf" -> ((s, d) => {
      val v = vecs(s, d)
      Similarity.ivfAssign(v, Similarity.centroidArrays(Similarity.centroids(v)))
    }),
    // PQ code sequences: the int8-per-subspace encoding a 100 TB corpus
    // stores instead of raw floats — codebook = per-label centroid slices.
    "pq_codes" -> ((s, d) => {
      val v = vecs(s, d)
      Similarity.pqAssign(v,
        Similarity.centroidArrays(Similarity.centroids(v)), PqSubDims)
    }),
    // IVF probe search: each query reranks only the vectors assigned to
    // its IvfNprobe nearest cells — the inverted-file recall/cost dial.
    "ivf_probe_topk" -> ((s, d) => {
      val v = vecs(s, d)
      Similarity.ivfProbeTopK(q5(v), v,
        Similarity.centroidArrays(Similarity.centroids(v)), IvfNprobe)
    }),
    // ADC search over the PQ codes: query→vector distance = Σ of LUT'd
    // query→codeword distances — the IVFADC read path (scan M codes per
    // vector instead of dim floats).
    "pq_adc_topk" -> ((s, d) => {
      val v = vecs(s, d)
      Similarity.pqAdcTopK(q5(v), v,
        Similarity.centroidArrays(Similarity.centroids(v)), PqSubDims)
    }),
    // IVFADC — the COMPOSED FAISS IndexIVFPQ read path (Jégou TPAMI'11
    // §IV): the coarse quantizer bounds the corpus fraction touched per
    // query (probing = partition pruning at 100 TB), PQ codes bound the
    // bytes per surviving vector; the two dials multiply. Degenerates
    // bit-for-bit to pq_adc_topk at nprobe ≥ |codebook| (spec-pinned).
    "ivfpq_topk" -> ((s, d) => {
      val v = vecs(s, d)
      Similarity.ivfPqTopK(q5(v), v,
        Similarity.centroidArrays(Similarity.centroids(v)),
        IvfNprobe, PqSubDims)
    }),
    // Cluster-balanced exact-k sample: IVF-assign, then keep the first
    // ClusterK vectors per cluster in deterministic md5 order — the
    // semantic-diversity downsampling pass of a curation pipeline
    // (uniform sampling over-represents dense clusters; per-cluster
    // quotas flatten the topic distribution). Spark ≥3.5 rewrites the
    // rk<=k filter into a WindowGroupLimit partial top-k, so no cluster
    // is ever fully sorted.
    "cluster_sample" -> ((s, d) => {
      val v = vecs(s, d)
      val assign = Similarity.ivfAssign(v,
        Similarity.centroidArrays(Similarity.centroids(v)))
      val sizes = assign.groupBy(col("assigned_label"))
        .agg(count(lit(1)).as("cluster_n"))
      val w = Window.partitionBy(col("assigned_label"))
        .orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
      assign
        .withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= ClusterK)
        .join(broadcast(sizes), Seq("assigned_label"))
        .select(col("assigned_label"), col("rk"), col("vec_id"),
          col("cluster_n"))
    }),
    // All-vectors kNN graph (SemDeDup/graph-ANN backbone): bucket
    // equi-self-join with corpus-sized planes — Similarity.knnGraph has
    // the no-broadcast scale argument.
    "knn_graph" -> ((s, d) =>
      Similarity.knnGraph(vecs(s, d), KnnK, KnnTarget)),
    // SemDeDup-style semantic pruning ON TOP of the kNN graph: a vector
    // is dropped when a LOWER-ID vector sits within cosine >= tau among
    // its bucket neighbors (min-id survivor rule — the same canonical
    // convention as every dedup family here). Output: per vector the
    // keep flag plus the nearest offending neighbor; the graph edges
    // are knn_graph's, so the prune is one doc-dimension aggregate on
    // an already-bounded frame.
    "semantic_prune" -> ((s, d) => {
      val g = Similarity.knnGraph(vecs(s, d), KnnK, KnnTarget)
      val off = g.filter(col("cosine") >= SemTau && col("nbr_id") < col("vec_id"))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("vec_id")).orderBy(col("cosine").desc, col("nbr_id"))))
        .filter(col("rn") === 1)
        .select(col("vec_id"), col("nbr_id").as("dup_nbr"),
          col("cosine").as("dup_cosine"))
      vecs(s, d).select(col("vec_id"))
        .join(off, Seq("vec_id"), "left")
        .select(col("vec_id"), col("dup_nbr"), col("dup_cosine"),
          col("dup_nbr").isNull.as("keep"))
    }),
    // Label homophily of the kNN graph — the intrinsic embedding-quality
    // eval (a kNN classifier in disguise): per label, how often a
    // vector's graph neighbors share its label. Edges are knn_graph's
    // (already k·n-bounded); the id→label sides join keyed on the edge
    // endpoints — at 100 TB the label map is corpus-dimension (NOT
    // broadcastable) but narrow (id + int), so both lookups are ordinary
    // shuffled equi-joins on already-bounded frames; the final aggregate
    // is |labels|-sized. Counts exact; purity is one IEEE division of
    // exact longs, 6-dp snapped.
    "knn_purity" -> ((s, d) => {
      val v = vecs(s, d).select(col("vec_id"), col("label"))
      Similarity.knnGraph(vecs(s, d), KnnK, KnnTarget)
        .join(v, Seq("vec_id"))
        .join(v.select(col("vec_id").as("nbr_id"), col("label").as("nbr_label")),
          Seq("nbr_id"))
        .groupBy(col("label"))
        .agg(
          countDistinct(col("vec_id")).as("n_vectors"),
          count(lit(1)).as("n_edges"),
          count(when(col("nbr_label") === col("label"), 1)).as("n_agree"))
        .select(col("label"), col("n_vectors"), col("n_edges"), col("n_agree"),
          Det.snap(col("n_agree").cast("double") / col("n_edges").cast("double"), 6)
            .as("purity"))
    }),
    // In-degree histogram of the kNN graph — the hubness audit (a
    // heavy-tailed in-degree means a few "hub" vectors dominate
    // everyone's neighbor lists and poison ANN recall; the classic
    // high-dimensional pathology to check before trusting any
    // graph-ANN index). Shapes: in-degree aggregate keyed on the edge
    // target (k·n-bounded input), one corpus-dimension left join to
    // count never-referenced vectors into the 0 bucket, final
    // histogram |distinct in-degree|-sized. All exact integers.
    "knn_indegree" -> ((s, d) => {
      val ind = Similarity.knnGraph(vecs(s, d), KnnK, KnnTarget)
        .groupBy(col("nbr_id")).agg(count(lit(1)).as("indeg"))
      vecs(s, d).select(col("vec_id").as("nbr_id"))
        .join(ind, Seq("nbr_id"), "left")
        .select(coalesce(col("indeg"), lit(0L)).as("indeg"))
        .groupBy(col("indeg")).agg(count(lit(1)).as("n_vectors"))
    }),
    // Johnson–Lindenstrauss random projection to JlK dims with the
    // md5-seeded ±1 (Achlioptas/Rademacher) matrix — THE classic
    // dimensionality-reduction preprocessing before clustering/ANN at
    // scale, here with its own distortion audit: per vector the JlK
    // projected coordinates (exact 1e-12-grid longs — one codegen'd
    // dotl_grid kernel per output dim, zero shuffle, scan-bound) and
    // the norm-preservation ratio ‖y‖²/(k·‖x‖²·1e12) whose
    // concentration around 1 is the JL guarantee being re-checked on
    // live data. The squared terms leave the long grid (y² ~ 1e27),
    // so the finishing chain runs in IEEE doubles in a FIXED
    // left-associated order — bit-identical in both engines (each y
    // is < 2^53, its int64→double conversion exact).
    "embed_jl" -> ((s, d) => {
      graft.functions.GraftFunctions.register(s)
      val signs = Similarity.planeSigns(JlK, 64, JlSalt)
      val yCols = signs.zipWithIndex.map { case (sp, j) =>
        Similarity.dotL(col("embedding"), typedLit(sp.toSeq)).as(s"y$j")
      }
      val base = vecs(s, d).select(
        (col("vec_id") +:
          Similarity.dotL(col("embedding"), col("embedding")).as("nx") +:
          yCols.toSeq): _*)
      val sumY2 = (0 until JlK)
        .map(j => col(s"y$j").cast("double") * col(s"y$j").cast("double"))
        .reduceLeft(_ + _)
      base.withColumn("norm_ratio",
        when(col("nx") > 0,
          Det.snap(sumY2 / (col("nx").cast("double") * lit(1e12) * lit(JlK.toDouble)), 6)))
    }),
    // Per-dimension embedding statistics — the feature-scaling audit
    // (dead dimensions, scale imbalance, mean offset) run before any
    // standardization/PQ/JL step. posexplode is a codegen'd generator on
    // the scan; one |dims|-keyed aggregate; Det grids (scale 6: k²
    // sums stay inside 2^63 to ~10^6 rows/dim per the envelope —
    // raise to a two-pass mean-shifted form beyond that).
    "embed_dim_stats" -> ((s, d) =>
      vecs(s, d)
        .select(posexplode(col("embedding")).as(Seq("dim", "v")))
        .select(col("dim"), col("v").cast("double").as("v"))
        .groupBy(col("dim"))
        .agg(count(lit(1)).as("n"),
          Det.snap(Det.avgD(col("v"), 6), 6).as("mean"),
          Det.snap(Det.stddevPopD(col("v"), 6), 6).as("stddev"),
          Det.snap(min(col("v")), 6).as("min_v"),
          Det.snap(max(col("v")), 6).as("max_v"))),
    // Cross-table curation composition: per embedding-space cluster
    // (IVF assignment), document count, token mass, and mean text
    // quality — the "which semantic regions of the corpus are
    // low-quality" audit that drives cluster-level filtering and
    // mixture rebalancing (text joined to vectors on the shared id).
    // Shapes: the quality side is the zero-shuffle stats scan; the
    // assignment side is the compiled codebook argmin (no join); the
    // id-keyed equi-join carries two narrow frames; the final aggregate
    // is |clusters|-sized. Quality doubles ride Det.avgD (grid-snapped
    // inputs, exact long sums); token sums exact.
    "cluster_quality" -> ((s, d) => {
      val v = vecs(s, d)
      val assign = Similarity.ivfAssign(v,
          Similarity.centroidArrays(Similarity.centroids(v)))
        .select(col("vec_id"), col("assigned_label"))
      val q = TextOps.stats(DocQueries.docs(s, d))
        .select(col("doc_id").as("vec_id"), col("quality_score"),
          col("n_tokens"))
      assign.join(q, Seq("vec_id"))
        .groupBy(col("assigned_label"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("n_tokens"),
          Det.snap(Det.avgD(col("quality_score"), 6), 6).as("avg_quality"))
    }),
    // Lloyd's k-means refinement (fixed iterations, deterministic
    // smallest-vec_id seeds) — the IVF codebook TRAINING loop as a
    // contract query; Similarity.kmeansRefine has the per-iteration
    // aggregate-collect-rebroadcast scale argument.
    "kmeans_iter" -> ((s, d) =>
      Similarity.kmeansRefine(vecs(s, d), KmK, KmIters)),
    // Held-out clustering eval closing the train→eval loop for
    // kmeans_iter (the holt_eval/bpe_eval pattern on the vector side):
    // codebook trained on vec_id % 5 <> 0 only, held-out fifth assigned
    // through the shared argmin kernel, per-cluster exact d2-grid
    // stats — the "does the codebook generalize" readout an IVF build
    // ships before serving.
    "kmeans_eval" -> ((s, d) => {
      import s.implicits._
      import org.apache.spark.sql.types.DecimalType
      val v = vecs(s, d)
      val cb = Similarity.kmeansCodebook(
        v.filter(col("vec_id") % 5 =!= 0), KmK, KmIters)
      val assigned = v.filter(col("vec_id") % 5 === 0)
        .select(col("vec_id").cast("long"), col("embedding"))
        .as[(Long, Seq[Float])]
        .map { case (_, emb) =>
          val (cid, d2l) = graft.ops.VecKernels.argminCell(cb, emb.toArray)
          (cid.toLong, d2l)
        }.toDF("cluster", "d2l")
      assigned.groupBy(col("cluster"))
        .agg(count(lit(1)).as("n_eval"),
          sum(col("d2l").cast(DecimalType(38, 0))).as("sd2"),
          max(col("d2l")).as("mx"))
        .select(col("cluster"), col("n_eval"),
          Det.snap(col("sd2").cast("string").cast("double") / 1e12 /
            col("n_eval"), 6).as("mean_d2"),
          Det.snap(col("mx").cast("double") / 1e12, 6).as("max_d2"))
    }),
    "dedup_embed" -> ((s, d) => Similarity.cosineNearDupPairsAuto(vecs(s, d),
      targetBucketRows = TargetBucket, maxBucket = MaxBucket)),
    "embed_quantize" -> ((s, d) =>
      Similarity.scalarQuantize(vecs(s, d), QuantLevels)),
    // Recall@10 of EVERY approximate path vs brute-force truth — the eval
    // a user runs before trusting any of the four ANN branches.
    "pca_power" -> ((s, d) => {
      // Top principal component via exact-integer max-norm power
      // iteration (Similarity.pcaTopComponent scaladoc has the full
      // determinism + scale story).
      Similarity.pcaTopComponent(vecs(s, d), PcaDim, PcaIters)
    }),
    "pca_scores" -> ((s, d) => {
      // PC1 transform + explained-variance share (the usable end of the
      // PCA family — Similarity.pcaScores scaladoc).
      Similarity.pcaScores(vecs(s, d), PcaDim, PcaIters)
    }),
    "mmr_diversify" -> ((s, d) => {
      // Redundancy-aware re-ranking: MMR-pick MmrK of the top-MmrN
      // cosine candidates per query (Similarity.mmrDiversify scaladoc
      // has the shape + determinism story).
      val v = vecs(s, d)
      Similarity.mmrDiversify(q5(v), v, MmrN, MmrK, MmrLam, MmrOml)
    }),
    // IVF serving-tuning curve: recall@10 vs nprobe against the shared
    // brute-force truth — the ANN mirror of dedup_sweep's banding curve
    // (what a platform reads before fixing the probe budget). ONE truth
    // pass and one codebook; each nprobe reuses the same driver-built
    // probe ranking, so the corpus-side cost per setting is its own
    // bucketed scan (inherent — different cells). Aggregated across
    // queries; the nprobe dimension frame keeps zero-hit settings.
    "ivf_sweep" -> ((s, d) => {
      import s.implicits._
      val v = vecs(s, d)
      val cents = Similarity.centroidArrays(Similarity.centroids(v))
      val truth = Similarity.bruteForceTopK(q5(v), v)
        .select(col("qid"), col("vec_id")).localCheckpoint(true)
      val cands = SweepNprobes.map { np =>
        Similarity.ivfProbeTopK(q5(v), v, cents, np)
          .select(col("qid"), col("vec_id"))
          .withColumn("nprobe", lit(np.toLong))
      }.reduce(_ unionByName _)
      val hits = cands.join(truth, Seq("qid", "vec_id"))
        .groupBy(col("nprobe")).agg(count(lit(1)).as("n_hits"))
      val res = SweepNprobes.map(_.toLong).toDF("nprobe")
        .join(hits, Seq("nprobe"), "left")
        .crossJoin(broadcast(truth.agg(count(lit(1)).as("n_true"))))
        .select(col("nprobe"), col("n_true"),
          coalesce(col("n_hits"), lit(0L)).as("n_hits"),
          Det.snap(coalesce(col("n_hits"), lit(0L)).cast("double") /
            col("n_true").cast("double"), 6).as("recall_ivf"))
        .localCheckpoint(true)
      truth.unpersist()
      res
    }),
    // Hybrid retrieval: reciprocal-rank fusion of a LEXICAL arm
    // (bag-of-words cosine through the inverted index, the bow_cosine
    // shape over documents.text) and a VECTOR arm (exact cosine over
    // embeddings) — the modern RAG serving stack, where BM25-ish and
    // dense rankers each miss what the other catches and RRF needs no
    // score calibration (Cormack et al., SIGIR 2009). documents.doc_id
    // and embeddings.vec_id are the same corpus 1:1; queries = ids < 5.
    // Scale shape: the lexical arm is postings-bounded (a query only
    // meets docs sharing a term), the vector arm broadcasts the query
    // side, and the fusion itself is a FULL OUTER join of two
    // top-RrfDepth frames — Q·depth rows, driver-free. Determinism:
    // both arms rank (cosine DESC, id); RRF contributions are exact
    // integer divisions (10^12 div (60+rank)), so the fused score is a
    // BIGINT — no float ever reaches the compared columns except the
    // arms' own snapped ranks upstream.
    "rrf_fusion" -> ((s, d) => {
      val base = s.read.parquet(s"$d/documents.parquet")
      val tf = base.select(col("doc_id"),
        explode(split(col("text"), " ")).as("word"))
        .groupBy(col("doc_id"), col("word")).agg(count(lit(1)).as("tf"))
      val norms = tf.groupBy(col("doc_id")).agg(sum(col("tf") * col("tf")).as("n2"))
      val qtf = tf.filter(col("doc_id") < 5)
        .select(col("doc_id").as("qid"), col("word"), col("tf").as("qtf"))
      val dots = tf.join(broadcast(qtf), Seq("word"))
        .filter(col("doc_id") =!= col("qid"))
        .groupBy(col("qid"), col("doc_id"))
        .agg(sum(col("qtf") * col("tf")).as("dot"))
      val qn2 = norms.filter(col("doc_id") < 5)
        .select(col("doc_id").as("qid"), col("n2").as("qn2"))
      val lex = dots.join(broadcast(qn2), Seq("qid")).join(norms, Seq("doc_id"))
        .select(col("qid"), col("doc_id"),
          Det.snap(col("dot").cast("double") /
            (sqrt(col("qn2").cast("double")) * sqrt(col("n2").cast("double"))), 6)
            .as("cosine"))
        .withColumn("lex_rnk", row_number().over(
          Window.partitionBy(col("qid"))
            .orderBy(col("cosine").desc, col("doc_id"))).cast("long"))
        .filter(col("lex_rnk") <= RrfDepth)
        .select(col("qid"), col("doc_id"), col("lex_rnk"))
      val v = vecs(s, d)
      val vec = Similarity.bruteForceTopK(q5(v), v, k = RrfDepth)
        .select(col("qid"), col("vec_id").as("doc_id"), col("rnk").as("vec_rnk"))
      lex.join(vec, Seq("qid", "doc_id"), "full_outer")
        .withColumn("rrf",
          coalesce(expr(s"CAST(1000000000000 AS BIGINT) div ($RrfK + lex_rnk)"), lit(0L)) +
          coalesce(expr(s"CAST(1000000000000 AS BIGINT) div ($RrfK + vec_rnk)"), lit(0L)))
        .withColumn("rnk", row_number().over(
          Window.partitionBy(col("qid"))
            .orderBy(col("rrf").desc, col("doc_id"))).cast("long"))
        .filter(col("rnk") <= RrfTopK)
        .select(col("qid"), col("doc_id"), col("lex_rnk"), col("vec_rnk"),
          col("rrf"), col("rnk"))
    }),
    // Position-weighted retrieval eval: NDCG@10 of every ANN path
    // against the brute-force truth — ann_recall counts HITS, this
    // weighs WHERE they landed (a hit at rank 1 ≫ a hit at rank 10),
    // the readout that actually decides which index serves a RAG
    // stack. rel ∈ {0,1} (truth membership), so DCG = Σ over hits of
    // the rank's grid weight and IDCG = the running-sum lookup at
    // n_true; both exact BIGINTs, ndcg = one correctly-rounded
    // division. The 25-row (ranker × query) literal frame keeps
    // zero-hit cells visible (ivf_sweep's dimension-frame pattern).
    "ndcg_eval" -> ((s, d) => {
      import s.implicits._
      val v = vecs(s, d)
      val cents = Similarity.centroidArrays(Similarity.centroids(v))
      val truth = Similarity.bruteForceTopK(q5(v), v)
        .select(col("qid"), col("vec_id")).localCheckpoint(true)
      val cands = Seq(
        "single" -> Similarity.lshTopK(q5(v), v),
        "multi" -> Similarity.lshTopKMulti(q5(v), v, k = 10,
          planes = MultiPlanes, tables = MultiTables),
        "ivf" -> Similarity.ivfProbeTopK(q5(v), v, cents, IvfNprobe),
        "adc" -> Similarity.pqAdcTopK(q5(v), v, cents, PqSubDims),
        "hamming" -> Similarity.hammingTopK(q5(v), v))
        .map { case (tag, df) =>
          df.select(lit(tag).as("ranker"), col("qid"), col("vec_id"), col("rnk")) }
        .reduce(_ unionByName _)
      val dcg = cands.join(truth, Seq("qid", "vec_id"))
        .join(broadcast(NdcgW.toDF("rnk", "w")), Seq("rnk"))
        .groupBy(col("ranker"), col("qid")).agg(sum(col("w")).as("dcg_grid"))
      val tt = truth.groupBy(col("qid")).agg(count(lit(1)).as("n_true"))
        .join(broadcast(NdcgCw.toDF("n_true", "idcg_grid")), Seq("n_true"))
      val frame = NdcgRankers.flatMap(r => (0L until 5L).map(q => (r, q)))
        .toDF("ranker", "qid")
      val res = frame.join(tt, Seq("qid"))
        .join(dcg, Seq("ranker", "qid"), "left")
        .select(col("ranker"), col("qid"), col("n_true"),
          coalesce(col("dcg_grid"), lit(0L)).as("dcg_grid"),
          col("idcg_grid"),
          Det.snap(coalesce(col("dcg_grid"), lit(0L)).cast("double") /
            col("idcg_grid").cast("double"), 6).as("ndcg"))
        .localCheckpoint(true)
      truth.unpersist()
      res
    }),
    "ann_recall" -> ((s, d) => {
      val v = vecs(s, d)
      val cents = Similarity.centroidArrays(Similarity.centroids(v))
      // r17 probed and REJECTED (guide §1 measure-first): the truth
      // subtree feeds six places and un-checkpointed the plan is 1,382
      // operator lines / 64 Exchanges / 40 parquet scans — yet BOTH a
      // truth localCheckpoint(+result checkpoint for hygiene) and a
      // truth cache() measured SLOWER (1.58 s → 1.82 s / 1.84 s): on
      // the 2,000-row base every re-evaluated subtree is sub-ms and the
      // one giant lazy plan schedules as a single DAG, while the
      // materialization adds a job barrier + block round-trip. The
      // re-evaluation is the fast shape at this scale.
      val truth = Similarity.bruteForceTopK(q5(v), v).select("qid", "vec_id")
      val paths = Seq(
        "single" -> Similarity.lshTopK(q5(v), v).select("qid", "vec_id"),
        "multi" -> Similarity.lshTopKMulti(q5(v), v, k = 10,
          planes = MultiPlanes, tables = MultiTables).select("qid", "vec_id"),
        "ivf" -> Similarity.ivfProbeTopK(q5(v), v, cents, IvfNprobe)
          .select("qid", "vec_id"),
        "adc" -> Similarity.pqAdcTopK(q5(v), v, cents, PqSubDims)
          .select("qid", "vec_id"),
        "hamming" -> Similarity.hammingTopK(q5(v), v)
          .select("qid", "vec_id"))
      val tt = truth.groupBy("qid").agg(count(lit(1)).as("n_true"))
      val joined = paths.foldLeft(tt) { case (acc, (tag, cand)) =>
        acc.join(truth.join(cand, Seq("qid", "vec_id"))
          .groupBy("qid").agg(count(lit(1)).as(s"hits_$tag")),
          Seq("qid"), "left")
      }
      paths.foldLeft(joined
        .select(col("qid") +: col("n_true") +: paths.map { case (tag, _) =>
          coalesce(col(s"hits_$tag"), lit(0L)).as(s"hits_$tag") }: _*)) {
        case (acc, (tag, _)) =>
          acc.withColumn(s"recall_$tag", Det.snap(
            col(s"hits_$tag").cast("double") / col("n_true").cast("double"), 6))
      }
    })
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
  /** One-row sign-list CTE body for `planes` SRP planes under `salt`,
    * as columns `<prefix>0..<prefix>{planes-1}` — HOISTING these out of
    * the lambda is the r14 capacity fix: a literal list indexed inside
    * a DuckDB list-comprehension is RE-CONSTRUCTED per element per row
    * (78.6 s per plane over 200k vectors at 100×), while a one-row
    * CROSS JOIN column is built once (0.5 s — 157×; same per-element
    * floor/grid arithmetic, checksum-identical). */
  private def signsCteCols(planes: Int, salt: String,
                           prefix: String = "p"): String =
    Similarity.planeSigns(planes, 64, salt).zipWithIndex.map { case (s, j) =>
      s.map(_.toInt).mkString("[", ",", "]") + s" AS $prefix$j"
    }.mkString(",\n         ")

  /** SRP bucket string over hoisted sign columns `<alias>.<prefix>j`
    * (pair with [[signsCteCols]] + a CROSS JOIN in the caller). */
  private def bucketSql(v: String, alias: String, planes: Int = 8,
                        prefix: String = "p"): String =
    (0 until planes).map { j =>
      val dot =
        s"""list_sum([CAST(floor(CAST(($v)[i] AS DOUBLE)*(($alias.$prefix$j)[i])*1e12+0.5) AS BIGINT)
        for i in range(1, len($v)+1)])"""
      s"(CASE WHEN $dot >= 0 THEN '1' ELSE '0' END)"
    }.mkString(" || ")

  /** Twin of Similarity.planesFor: smallest k ∈ [1,30] with 2^k ≥ cr,
    * as an exact integer CASE chain over cr = ⌈n/target⌉ (monotone, so
    * the first matching branch IS the ceil-log2 — no FP log anywhere,
    * matching planesFor's bit-length form for every ratio incl. exact
    * powers of two). */
  private def planesForSql(cr: String): String =
    "(CASE " +
      (1 to 30).map(k => s"WHEN ($cr) <= ${1L << k} THEN $k").mkString(" ") +
      " ELSE 30 END)"

  /** Bucket key whose LENGTH follows the corpus size: per plane p, emit
    * its sign bit only when p < the planes CTE's value (CASE short-
    * circuits, so only the active planes' dot products evaluate). The
    * plane constants are prefix-stable — planeSigns(p, i) depends only on
    * (salt, p, i) — so this equals bucketSql at the chosen plane count. */
  /** Dynamic-plane SRP bucket over HOISTED sign columns `pl.p0..p29`
    * (the r14 literal-list-in-lambda fix — pair with [[signsCteCols]]
    * in the `pl` CTE the caller already CROSS JOINs). */
  private def dynBucketSql(v: String, pMax: Int = 30): String =
    (0 until pMax).map { p =>
      val dot =
        s"""list_sum([CAST(floor(CAST(($v)[i] AS DOUBLE)*((pl.p$p)[i])*1e12+0.5) AS BIGINT)
        for i in range(1, len($v)+1)])"""
      s"(CASE WHEN $p < pl.planes THEN (CASE WHEN $dot >= 0 THEN '1' ELSE '0' END) ELSE '' END)"
    }.mkString(" || ")

  /** Twin of embed_standardize: the same 1e-6 grid snap, per-pos window
    * moments, HUGEINT variance numerator, and the string-routed casts
    * into the identical (num)/sqrt(den) IEEE finish. */
  private val standardizeSql = {
    s"""WITH ex AS (
  SELECT vec_id, unnest(range(0, len(embedding))) AS pos, embedding
  FROM embeddings
), kk AS (
  SELECT vec_id, CAST(pos AS BIGINT) AS pos,
         ${Det.klSql("CAST(embedding[CAST(pos + 1 AS INTEGER)] AS DOUBLE)", 6)} AS k
  FROM ex
), w AS (
  SELECT vec_id, pos, k,
         count(*) OVER (PARTITION BY pos) AS n,
         CAST(sum(k) OVER (PARTITION BY pos) AS HUGEINT) AS sk,
         CAST(sum(k * k) OVER (PARTITION BY pos) AS HUGEINT) AS sk2
  FROM kk
), v AS (
  SELECT vec_id, pos, k, n, sk, n * sk2 - sk * sk AS vnum
  FROM w
)
SELECT vec_id, pos,
       ${s6("CAST(CAST(k * n - sk AS VARCHAR) AS DOUBLE) / sqrt(CAST(CAST(vnum AS VARCHAR) AS DOUBLE))")} AS z
FROM v WHERE vnum > 0"""
  }

  /** Twin of embed_robust_scale: identical grid, rank picks at
    * ⌊(n+1)/2⌋ with the same (k, vec_id) / (|k−med|, vec_id) tie
    * orders, window-pick median (no join), exact-long MAD. */
  private val robustScaleSql = {
    s"""WITH ex AS (
  SELECT vec_id, unnest(range(0, len(embedding))) AS pos, embedding
  FROM embeddings
), kk AS (
  SELECT vec_id, CAST(pos AS BIGINT) AS pos,
         ${Det.klSql("CAST(embedding[CAST(pos + 1 AS INTEGER)] AS DOUBLE)", 6)} AS k
  FROM ex
), r1 AS (
  SELECT vec_id, pos, k,
         count(*) OVER (PARTITION BY pos) AS n,
         CAST(row_number() OVER (PARTITION BY pos ORDER BY k, vec_id) AS BIGINT) AS rn
  FROM kk
), m AS (
  SELECT vec_id, pos, k, n, rn,
         max(CASE WHEN rn = (n + 1) // 2 THEN k END) OVER (PARTITION BY pos) AS med
  FROM r1
), r2 AS (
  SELECT pos, n, rn, k, med,
         CAST(row_number() OVER (PARTITION BY pos ORDER BY abs(k - med), vec_id) AS BIGINT) AS rn2
  FROM m
)
SELECT pos, CAST(max(n) AS BIGINT) AS n_obs,
       ${s6("CAST(max(CASE WHEN rn = (n + 1) // 2 THEN k END) AS DOUBLE) / 1000000.0")} AS median_val,
       ${s6("CAST(max(CASE WHEN rn2 = (n + 1) // 2 THEN abs(k - med) END) AS DOUBLE) / 1000000.0")} AS mad
FROM r2 GROUP BY 1"""
  }

  /** Twin of embed_hamming_topk: the same two-half sign pack (32 CASE
    * shift terms per half — halves stay non-negative 32-bit, clearing
    * DuckDB's shift-overflow check), xor + bit_count Hamming, and the
    * (hamming, vec_id) rank. */
  private val hammingSql = {
    def half(lo: Int, hi: Int, shiftBase: Int): String =
      (lo to hi).map(j =>
        s"(CASE WHEN embedding[${j + 1}] > 0 THEN CAST(1 AS BIGINT) << ${j - shiftBase} ELSE CAST(0 AS BIGINT) END)")
        .mkString(" + ")
    s"""WITH sig AS MATERIALIZED (
  SELECT vec_id, ${half(0, 31, 0)} AS sig_lo, ${half(32, 63, 32)} AS sig_hi
  FROM embeddings
), q AS (
  SELECT vec_id AS qid, sig_lo AS qlo, sig_hi AS qhi FROM sig WHERE vec_id < 5
), d AS (
  SELECT q.qid, s.vec_id,
         CAST(bit_count(xor(s.sig_lo, q.qlo)) +
              bit_count(xor(s.sig_hi, q.qhi)) AS BIGINT) AS hamming
  FROM sig s JOIN q ON s.vec_id <> q.qid
)
SELECT qid, vec_id, hamming,
       CAST(row_number() OVER (PARTITION BY qid ORDER BY hamming, vec_id)
         AS BIGINT) AS rnk
FROM d QUALIFY rnk <= 10"""
  }

  // `base` CTEs here are MATERIALIZED (r14): each is referenced twice
  // (the q filter + the corpus join side), and DuckDB re-inlines plain
  // CTEs per reference — invisible at sf0.1, but at 100× the
  // interpreted list-comprehension norm/signature pass over 200k
  // vectors re-runs per reference (embed_lsh_topk's 8-plane base made
  // its standalone oracle >12 min, and the SAME re-inline inside the
  // composed ndcg twin was most of its 39m49s; see docs/SCALE.md r14).
  private val topkSql =
    s"""WITH base AS MATERIALIZED (
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
    s"""WITH sgl AS (
  SELECT ${signsCteCols(8, "srp")}
), base AS MATERIALIZED (
  SELECT vec_id, embedding, ${dotSql("embedding", "embedding")} AS nv,
         ${bucketSql("embedding", "sg")} AS bucket
  FROM embeddings CROSS JOIN sgl sg
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

  /** Shared IVF-assignment CTE chain ending in `ivf` (vec_id, label,
    * assigned_label, d2l) — rnk=1 of the declarative argmin. */
  // centarr MATERIALIZED (r14): it is referenced by BOTH the assignment
  // join and the probe ranking in ivfProbeSqlFor/ivfPqSql, and a plain
  // CTE re-inlines the whole cent→ex centroid-train pipeline (a full
  // 200k×64 unnest + grid-avg at 100×) per reference. ivf MATERIALIZED
  // for the same reason where composed twins reference it repeatedly.
  private val ivfCte =
    s"""$centSql, centarr AS MATERIALIZED (
  SELECT label AS cand_label, list(c ORDER BY pos) AS cv FROM cent GROUP BY label
), assign AS (
  SELECT e.vec_id, e.label, c.cand_label,
         ${dist2Sql("e.embedding", "c.cv")} AS d2l
  FROM embeddings e, centarr c), ivf AS MATERIALIZED (
  SELECT vec_id, label, cand_label AS assigned_label, d2l
  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d2l, cand_label) AS rnk
        FROM assign)
  WHERE rnk = 1)"""

  private val ivfSql =
    s"""$ivfCte
SELECT vec_id, label, assigned_label,
       ${s6("CAST(d2l AS DOUBLE)/1e12")} AS d2,
       assigned_label = label AS correct
FROM ivf"""

  /** Twin of Similarity.pqAssign: per-(label, subspace) centroid slices
    * as the codebook, declarative argmin per (vector, subspace) over the
    * SAME exact 1e-12 grid distance on the sliced lists. */
  private val pqSql = {
    val sub = s"list_slice(e.embedding, CAST((c.subspace-1)*$PqSubDims+1 AS BIGINT), CAST(c.subspace*$PqSubDims AS BIGINT))"
    s"""$centSql, subcent AS (
  SELECT label AS code, CAST((pos-1)//$PqSubDims AS BIGINT)+1 AS subspace,
         list(c ORDER BY pos) AS cv
  FROM cent GROUP BY 1, 2
), assign AS (
  SELECT e.vec_id, c.subspace, c.code,
         ${dist2Sql(sub, "c.cv")} AS d2l
  FROM embeddings e, subcent c)
SELECT vec_id, subspace, code, ${s6("CAST(d2l AS DOUBLE)/1e12")} AS d2
FROM (SELECT *, row_number() OVER (PARTITION BY vec_id, subspace ORDER BY d2l, code) AS rnk
      FROM assign)
WHERE rnk = 1"""
  }

  /** Twin of Similarity.pqAdcTopK: re-derive the PQ codes declaratively
    * (same argmin as pqSql), then the ADC distance is the SUM over
    * subspaces of the grid distance between the QUERY's subvector and
    * the vector's CODEWORD — never the vector itself (asymmetric).
    * sum(BIGINT) is exact HUGEINT; the total is non-negative and
    * < 2^53, so the finishing DOUBLE cast is exact. */
  private val pqAdcSql = {
    val xsub = s"list_slice(e.embedding, CAST((c.subspace-1)*$PqSubDims+1 AS BIGINT), CAST(c.subspace*$PqSubDims AS BIGINT))"
    val qsub = s"list_slice(q.qv, CAST((c.subspace-1)*$PqSubDims+1 AS BIGINT), CAST(c.subspace*$PqSubDims AS BIGINT))"
    s"""$centSql, subcent AS MATERIALIZED (
  SELECT label AS code, CAST((pos-1)//$PqSubDims AS BIGINT)+1 AS subspace,
         list(c ORDER BY pos) AS cv
  FROM cent GROUP BY 1, 2
), pq AS (
  SELECT vec_id, subspace, code FROM (
    SELECT e.vec_id, c.subspace, c.code,
           row_number() OVER (PARTITION BY e.vec_id, c.subspace
                ORDER BY ${dist2Sql(xsub, "c.cv")}, c.code) AS rnk
    FROM embeddings e, subcent c)
  WHERE rnk = 1
), q AS (
  SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 5
), parts AS (
  SELECT q.qid, p.vec_id, ${dist2Sql(qsub, "c.cv")} AS d2l
  FROM pq p
  JOIN subcent c ON p.subspace = c.subspace AND p.code = c.code
  CROSS JOIN q
  WHERE p.vec_id <> q.qid
), adc AS (
  SELECT qid, vec_id, sum(d2l) AS adcl FROM parts GROUP BY 1, 2)
SELECT qid, vec_id, ${s6("CAST(adcl AS DOUBLE)/1e12")} AS adc_d2, rnk
FROM (SELECT *, CAST(row_number() OVER (PARTITION BY qid ORDER BY adcl, vec_id) AS BIGINT) AS rnk
      FROM adc)
WHERE rnk <= 10"""
  }

  /** Twin of the rrf_fusion query: the bow_cosine lexical algebra over
    * documents and the embed_topk vector algebra over embeddings, each
    * cut at RrfDepth, fused by FULL OUTER join with exact-integer RRF
    * contributions (10^12 // (k + rank) — DuckDB `//` and Spark `div`
    * truncate identically on positive BIGINTs). Arm frames are
    * MATERIALIZED (each is referenced by the join twice through the
    * COALESCEs — the round-12 oracle-capacity rule). `tf` stays a PLAIN
    * CTE deliberately despite 3 references: inlining lets DuckDB push
    * `doc_id < 5` into the query-arm instance (one full tokenization +
    * one 5-doc one, not three full) — measured 8.5 s vs 25 s
    * MATERIALIZED at the 100× docs tier, the one probed case where the
    * multiply-referenced-CTE rule inverts because per-reference filter
    * pushdown beats compute-once. */
  private val rrfSql =
    s"""WITH tf AS (
  SELECT doc_id, word, count(*) AS tf
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
  GROUP BY 1, 2
), norms AS MATERIALIZED (
  SELECT doc_id, CAST(sum(tf*tf) AS BIGINT) AS n2 FROM tf GROUP BY 1
), lq AS (
  SELECT doc_id AS qid, word, tf AS qtf FROM tf WHERE doc_id < 5
), dots AS (
  SELECT lq.qid, t.doc_id, CAST(sum(lq.qtf * t.tf) AS BIGINT) AS dot
  FROM tf t JOIN lq USING (word)
  WHERE t.doc_id <> lq.qid
  GROUP BY 1, 2
), lexscored AS (
  SELECT d.qid, d.doc_id,
         ${s6("CAST(d.dot AS DOUBLE) / (sqrt(CAST(qn.n2 AS DOUBLE)) * sqrt(CAST(dn.n2 AS DOUBLE)))")} AS cosine
  FROM dots d
  JOIN norms qn ON qn.doc_id = d.qid
  JOIN norms dn ON dn.doc_id = d.doc_id
), lex AS MATERIALIZED (
  SELECT qid, doc_id, lex_rnk FROM (
    SELECT qid, doc_id, CAST(row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, doc_id) AS BIGINT) AS lex_rnk
    FROM lexscored)
  WHERE lex_rnk <= $RrfDepth
), vbase AS (
  SELECT vec_id, embedding, ${dotSql("embedding", "embedding")} AS nv FROM embeddings
), vq AS (
  SELECT vec_id AS qid, embedding AS qv, nv AS nq FROM vbase WHERE vec_id < 5
), vscored AS (
  SELECT vq.qid, e.vec_id,
         ${cosSql(dotSql("vq.qv", "e.embedding"), "vq.nq", "e.nv")} AS cosine
  FROM vq, vbase e
  WHERE e.vec_id <> vq.qid AND e.nv > 0 AND vq.nq > 0
), vec AS MATERIALIZED (
  SELECT qid, vec_id AS doc_id, vec_rnk FROM (
    SELECT qid, vec_id, CAST(row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, vec_id) AS BIGINT) AS vec_rnk
    FROM vscored)
  WHERE vec_rnk <= $RrfDepth
), fused AS (
  SELECT COALESCE(l.qid, v.qid) AS qid, COALESCE(l.doc_id, v.doc_id) AS doc_id,
         l.lex_rnk, v.vec_rnk,
         CAST(COALESCE(1000000000000 // ($RrfK + l.lex_rnk), 0) +
              COALESCE(1000000000000 // ($RrfK + v.vec_rnk), 0) AS BIGINT) AS rrf
  FROM lex l FULL OUTER JOIN vec v ON l.qid = v.qid AND l.doc_id = v.doc_id)
SELECT qid, doc_id, lex_rnk, vec_rnk, rrf, rnk FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY qid ORDER BY rrf DESC, doc_id) AS BIGINT) AS rnk
  FROM fused)
WHERE rnk <= $RrfTopK"""

  /** Twin of Similarity.ivfPqTopK (IVFADC): candidates = ivf-assigned
    * members of the query's probed cells (the ivfProbeSql probe
    * ranking), scored by the pqAdcSql ADC algebra — codes re-derived
    * declaratively, distance = Σ over subspaces of the grid distance
    * between the QUERY's subvector and the vector's codeword. The
    * multiply-referenced intermediates (subcent, pq, qprobe) are
    * MATERIALIZED so the 100× tier cannot re-inline them per reference
    * (the round-12 oracle-capacity rule). */
  private val ivfPqSql = {
    val xsub = s"list_slice(e.embedding, CAST((c.subspace-1)*$PqSubDims+1 AS BIGINT), CAST(c.subspace*$PqSubDims AS BIGINT))"
    val qsub = s"list_slice(q.qv, CAST((c.subspace-1)*$PqSubDims+1 AS BIGINT), CAST(c.subspace*$PqSubDims AS BIGINT))"
    s"""$ivfCte, subcent AS MATERIALIZED (
  SELECT label AS code, CAST((pos-1)//$PqSubDims AS BIGINT)+1 AS subspace,
         list(c ORDER BY pos) AS cv
  FROM cent GROUP BY 1, 2
), pq AS MATERIALIZED (
  SELECT vec_id, subspace, code FROM (
    SELECT e.vec_id, c.subspace, c.code,
           row_number() OVER (PARTITION BY e.vec_id, c.subspace
                ORDER BY ${dist2Sql(xsub, "c.cv")}, c.code) AS rnk
    FROM embeddings e, subcent c)
  WHERE rnk = 1
), q AS (
  SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 5
), qprobe AS MATERIALIZED (
  SELECT qid, cand_label AS plabel FROM (
    SELECT q.qid, c.cand_label,
           row_number() OVER (PARTITION BY q.qid
                ORDER BY ${dist2Sql("q.qv", "c.cv")}, c.cand_label) AS prnk
    FROM q, centarr c)
  WHERE prnk <= $IvfNprobe
), parts AS (
  SELECT pr.qid, p.vec_id, ${dist2Sql(qsub, "c.cv")} AS d2l
  FROM pq p
  JOIN subcent c ON p.subspace = c.subspace AND p.code = c.code
  JOIN ivf a ON a.vec_id = p.vec_id
  JOIN qprobe pr ON pr.plabel = a.assigned_label
  JOIN q ON q.qid = pr.qid
  WHERE p.vec_id <> pr.qid
), adc AS (
  SELECT qid, vec_id, sum(d2l) AS adcl FROM parts GROUP BY 1, 2)
SELECT qid, vec_id, ${s6("CAST(adcl AS DOUBLE)/1e12")} AS adc_d2, rnk
FROM (SELECT *, CAST(row_number() OVER (PARTITION BY qid ORDER BY adcl, vec_id) AS BIGINT) AS rnk
      FROM adc)
WHERE rnk <= 10"""
  }

  /** Twin of Similarity.ivfProbeTopK: probe sets from a row_number over
    * the SAME grid centroid distance (ties toward smaller label),
    * candidates = ivf-assigned members of probed cells, reranked with
    * the exact-grid cosine. */
  private def ivfProbeSqlFor(nprobe: Int) =
    s"""$ivfCte,
base AS MATERIALIZED (
  SELECT vec_id, embedding, ${dotSql("embedding", "embedding")} AS nv FROM embeddings
), q AS MATERIALIZED (
  SELECT vec_id AS qid, embedding AS qv, nv AS nq FROM base WHERE vec_id < 5
), qprobe AS (
  SELECT qid, cand_label AS plabel FROM (
    SELECT q.qid, c.cand_label,
           row_number() OVER (PARTITION BY q.qid
                ORDER BY ${dist2Sql("q.qv", "c.cv")}, c.cand_label) AS prnk
    FROM q, centarr c)
  WHERE prnk <= $nprobe
), scored AS (
  SELECT q.qid, e.vec_id,
         ${cosSql(dotSql("q.qv", "e.embedding"), "q.nq", "e.nv")} AS cosine
  FROM ivf a
  JOIN qprobe p ON a.assigned_label = p.plabel
  JOIN base e ON e.vec_id = a.vec_id
  JOIN q ON q.qid = p.qid
  WHERE e.vec_id <> q.qid AND e.nv > 0 AND q.nq > 0)
SELECT qid, vec_id, cosine, rnk FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, vec_id) AS BIGINT) AS rnk
  FROM scored)
WHERE rnk <= 10"""

  private val ivfProbeSql = ivfProbeSqlFor(IvfNprobe)

  /** Twin of ivf_sweep: one candidate CTE per nprobe (each re-running
    * the parameterized probe twin), recall against the shared
    * brute-force truth, a generated nprobe dimension so zero-hit
    * settings still emit their row. */
  private val ivfSweepSql = {
    val cands = SweepNprobes.map(np =>
      s"(SELECT CAST($np AS BIGINT) AS nprobe, qid, vec_id FROM (${ivfProbeSqlFor(np)}))")
      .mkString("\n  UNION ALL ")
    s"""WITH truth AS MATERIALIZED (SELECT qid, vec_id FROM ($topkSql)),
cands AS (${cands}),
tt AS (SELECT CAST(count(*) AS BIGINT) AS n_true FROM truth),
h AS (SELECT nprobe, CAST(count(*) AS BIGINT) AS n_hits
      FROM cands c JOIN truth USING (qid, vec_id) GROUP BY 1),
np AS (SELECT CAST(unnest([${SweepNprobes.mkString(", ")}]) AS BIGINT) AS nprobe)
SELECT np.nprobe, tt.n_true,
       COALESCE(h.n_hits, CAST(0 AS BIGINT)) AS n_hits,
       ${s6("CAST(COALESCE(h.n_hits, 0) AS DOUBLE) / CAST(tt.n_true AS DOUBLE)")} AS recall_ivf
FROM np CROSS JOIN tt LEFT JOIN h USING (nprobe)"""
  }

  /** Twin of the cluster_sample composition: same ivf CTE, md5-ordered
    * row_number per assigned cluster, ClusterK quota, size join. */
  private val clusterSampleSql =
    s"""$ivfCte,
sizes AS (SELECT assigned_label, count(*) AS cluster_n FROM ivf GROUP BY 1),
picked AS (
  SELECT assigned_label, vec_id,
         CAST(row_number() OVER (PARTITION BY assigned_label
              ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS BIGINT) AS rk
  FROM ivf)
SELECT p.assigned_label, p.rk, p.vec_id, s.cluster_n
FROM picked p JOIN sizes s USING (assigned_label)
WHERE p.rk <= $ClusterK"""

  /** Twin of Similarity.lshTopKProbe: the same bit-string surgery —
    * per plane i, flip character i of the query's bucket — giving the
    * planes+1 pairwise-distinct probe keys (so no dedup is needed on
    * either side), then the standard bucket join + exact-grid cosine
    * rank. */
  private val lshProbeSql = {
    val planes = 8
    val flips = (1 to planes).map(i =>
      s"""substring(qb, 1, ${i - 1}) ||
          (CASE WHEN substring(qb, $i, 1) = '1' THEN '0' ELSE '1' END) ||
          substring(qb, ${i + 1}, ${planes - i})""")
    val probeList = (Seq("qb") ++ flips).mkString("[", ",\n      ", "]")
    s"""WITH sgl AS (
  SELECT ${signsCteCols(8, "srp")}
), base AS MATERIALIZED (
  SELECT vec_id, embedding, ${dotSql("embedding", "embedding")} AS nv,
         ${bucketSql("embedding", "sg")} AS bucket
  FROM embeddings CROSS JOIN sgl sg
), q0 AS (
  SELECT vec_id AS qid, embedding AS qv, nv AS nq, bucket AS qb
  FROM base WHERE vec_id < 5
), q AS (
  SELECT qid, qv, nq, unnest($probeList) AS bucket FROM q0
), scored AS (
  SELECT q.qid, e.vec_id,
         ${cosSql(dotSql("q.qv", "e.embedding"), "q.nq", "e.nv")} AS cosine
  FROM q JOIN base e ON q.bucket = e.bucket
  WHERE e.vec_id <> q.qid AND e.nv > 0 AND q.nq > 0)
SELECT qid, vec_id, cosine, rnk FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, vec_id) AS BIGINT) AS rnk
  FROM scored)
WHERE rnk <= 10"""
  }

  /** Twin of Similarity.lshTopKMulti: a pair is a candidate when its
    * buckets collide in ANY of the `MultiTables` independent plane sets
    * (per-table equi-join UNION'd then DISTINCT ≡ Spark's explode +
    * dropDuplicates — each (qid, vec_id) appears once either way),
    * scored with the same exact-grid cosine. Round-12 capacity rework
    * (the 100× tier couldn't grade this oracle): `base` is MATERIALIZED
    * (the plane-dot bucket strings are computed once, not re-inlined
    * per reference — the DuckDB CTE-inlining footgun), and the OR-join
    * — which forces a nested-loop over query×corpus — became one HASH
    * join per table on the bucket key, with the cosine evaluated once
    * per distinct surviving pair instead of per candidate row. */
  private val lshMultiSql = {
    val sgCols = (0 until MultiTables).map(t =>
      signsCteCols(MultiPlanes, Similarity.tableSalt(t), s"t${t}p"))
      .mkString(",\n         ")
    val bs = (0 until MultiTables).map(t =>
      bucketSql("embedding", "sg", MultiPlanes, s"t${t}p"))
    val bCols = bs.zipWithIndex.map { case (b, t) => s"$b AS b$t" }.mkString(",\n         ")
    val qCols = (0 until MultiTables).map(t => s"b$t").mkString(", ")
    val perTable = (0 until MultiTables).map(t =>
      s"    SELECT q.qid, e.vec_id FROM q JOIN base e ON q.b$t = e.b$t")
      .mkString("\n    UNION ALL\n")
    s"""WITH sgl AS (
  SELECT $sgCols
), base AS MATERIALIZED (
  SELECT vec_id, embedding, ${dotSql("embedding", "embedding")} AS nv,
         $bCols
  FROM embeddings CROSS JOIN sgl sg
), q AS MATERIALIZED (
  SELECT vec_id AS qid, embedding AS qv, nv AS nq, $qCols FROM base WHERE vec_id < 5
), cand AS (
  SELECT DISTINCT qid, vec_id FROM (
$perTable)
), scored AS (
  SELECT c.qid, c.vec_id,
         ${cosSql(dotSql("q.qv", "e.embedding"), "q.nq", "e.nv")} AS cosine
  FROM cand c JOIN q ON c.qid = q.qid JOIN base e ON c.vec_id = e.vec_id
  WHERE c.vec_id <> c.qid AND e.nv > 0 AND q.nq > 0)
SELECT qid, vec_id, cosine, rnk FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, vec_id) AS BIGINT) AS rnk
  FROM scored)
WHERE rnk <= 10"""
  }

  /** Twin of Similarity.cosineNearDupPairsAuto: the plane count comes
    * from this SAME corpus's count(*) through planesForSql (exact integer
    * ceil-log2, matching planesFor bit for bit), and the maxBucket cap is
    * mirrored as per-bucket row_number ≤ cap on vec_id order — the exact
    * survivor set of the Spark side's sorted streaming buffer. */
  private def dedupEmbedSql =
    s"""WITH pl AS (
  SELECT ${planesForSql(s"(greatest(count(*), 1) + ${TargetBucket - 1}) // $TargetBucket")} AS planes,
         ${signsCteCols(30, "srp")}
  FROM embeddings
), e AS (
  SELECT vec_id, embedding, ${dotSql("embedding", "embedding")} AS n,
         ${dynBucketSql("embedding")} AS bucket
  FROM embeddings CROSS JOIN pl
), capped AS (
  SELECT vec_id, embedding, n, bucket FROM (
    SELECT *, row_number() OVER (PARTITION BY bucket ORDER BY vec_id) AS rn FROM e)
  WHERE rn <= $MaxBucket
), p AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         ${cosSql(dotSql("a.embedding", "b.embedding"), "a.n", "b.n")} AS cosine
  FROM capped a JOIN capped b
    ON a.bucket = b.bucket AND a.vec_id < b.vec_id
  WHERE a.n > 0 AND b.n > 0)
SELECT vec_a, vec_b, cosine FROM p WHERE cosine >= 0.2"""

  /** ANN quality report: per query, recall@10 of the single-table and
    * multi-table SRP-LSH paths against the brute-force ground truth —
    * the eval harness a user runs before trusting the approximate path
    * at scale, as a contract query so the recall numbers themselves are
    * engine-portable. Counts are exact; each recall is one IEEE division
    * of exactly-converted longs, 6-dp snapped. The oracle composes the
    * three existing twins as nested-WITH subqueries (each keeps its own
    * CTE scope), so both sides share one source of truth per path.
    *
    * Scale shape: the expensive member is the brute-force truth side,
    * which is inherently query-sampled (q5 here — an eval never runs on
    * the full query load); the hit joins are (qid, vec_id)-keyed over
    * top-k-sized frames.
    */
  /** Twin of ndcg_eval: the five ranker twins as tagged candidate CTEs
    * (the annRecallSql composition, keeping each twin's own rnk), DCG
    * weights and ideal-DCG running sums as VALUES lists interpolated
    * from the SAME Scala-computed Long grid constants, one LEFT JOIN
    * from the 25-row (ranker × query) frame so zero-hit cells emit. */
  private val ndcgSql = {
    val wVals = NdcgW.map { case (r, w) =>
      s"(CAST($r AS BIGINT), CAST($w AS BIGINT))" }.mkString(", ")
    val cwVals = NdcgCw.map { case (n, cw) =>
      s"(CAST($n AS BIGINT), CAST($cw AS BIGINT))" }.mkString(", ")
    val frameVals = NdcgRankers.flatMap(r => (0L until 5L).map(q =>
      s"('$r', CAST($q AS BIGINT))")).mkString(", ")
    s"""WITH truth AS MATERIALIZED (SELECT qid, vec_id FROM ($topkSql)),
r_single AS MATERIALIZED (SELECT qid, vec_id, rnk FROM ($lshTopkSql)),
r_multi AS MATERIALIZED (SELECT qid, vec_id, rnk FROM ($lshMultiSql)),
r_ivf AS MATERIALIZED (SELECT qid, vec_id, rnk FROM ($ivfProbeSql)),
r_adc AS MATERIALIZED (SELECT qid, vec_id, rnk FROM ($pqAdcSql)),
r_hamming AS MATERIALIZED (SELECT qid, vec_id, rnk FROM ($hammingSql)),
cands AS (
  SELECT 'single' AS ranker, qid, vec_id, rnk FROM r_single
  UNION ALL SELECT 'multi' AS ranker, qid, vec_id, rnk FROM r_multi
  UNION ALL SELECT 'ivf' AS ranker, qid, vec_id, rnk FROM r_ivf
  UNION ALL SELECT 'adc' AS ranker, qid, vec_id, rnk FROM r_adc
  UNION ALL SELECT 'hamming' AS ranker, qid, vec_id, rnk FROM r_hamming),
w(rnk, w) AS (VALUES $wVals),
cw(n_true, idcg_grid) AS (VALUES $cwVals),
frame(ranker, qid) AS (VALUES $frameVals),
tt AS (SELECT qid, CAST(count(*) AS BIGINT) AS n_true FROM truth GROUP BY 1),
dcg AS (
  SELECT c.ranker, c.qid, CAST(sum(w.w) AS BIGINT) AS dcg_grid
  FROM cands c JOIN truth t USING (qid, vec_id) JOIN w ON w.rnk = c.rnk
  GROUP BY 1, 2)
SELECT f.ranker, f.qid, tt.n_true,
       COALESCE(d.dcg_grid, CAST(0 AS BIGINT)) AS dcg_grid,
       cw.idcg_grid,
       ${s6("CAST(COALESCE(d.dcg_grid, 0) AS DOUBLE) / CAST(cw.idcg_grid AS DOUBLE)")} AS ndcg
FROM frame f
JOIN tt ON tt.qid = f.qid
JOIN cw ON cw.n_true = tt.n_true
LEFT JOIN dcg d ON d.ranker = f.ranker AND d.qid = f.qid"""
  }

  // truth MATERIALIZED (r14): it is referenced SIX times (tt + the five
  // hit joins) and a plain CTE re-inlines the full brute-force scan per
  // reference — with the arm CTEs also MATERIALIZED so one compose pays
  // each ranker once (the ndcg_eval / embed_lsh_topk 100× finding).
  private val annRecallSql =
    s"""WITH truth AS MATERIALIZED (SELECT qid, vec_id FROM ($topkSql)),
s1 AS MATERIALIZED (SELECT qid, vec_id FROM ($lshTopkSql)),
m AS MATERIALIZED (SELECT qid, vec_id FROM ($lshMultiSql)),
iv AS MATERIALIZED (SELECT qid, vec_id FROM ($ivfProbeSql)),
ad AS MATERIALIZED (SELECT qid, vec_id FROM ($pqAdcSql)),
hb AS MATERIALIZED (SELECT qid, vec_id FROM ($hammingSql)),
tt AS (SELECT qid, count(*) AS n_true FROM truth GROUP BY 1),
hs AS (SELECT t.qid, count(*) AS hits_single
       FROM truth t JOIN s1 USING (qid, vec_id) GROUP BY 1),
hm AS (SELECT t.qid, count(*) AS hits_multi
       FROM truth t JOIN m USING (qid, vec_id) GROUP BY 1),
hi AS (SELECT t.qid, count(*) AS hits_ivf
       FROM truth t JOIN iv USING (qid, vec_id) GROUP BY 1),
ha AS (SELECT t.qid, count(*) AS hits_adc
       FROM truth t JOIN ad USING (qid, vec_id) GROUP BY 1),
hh AS (SELECT t.qid, count(*) AS hits_hamming
       FROM truth t JOIN hb USING (qid, vec_id) GROUP BY 1)
SELECT tt.qid, tt.n_true,
       COALESCE(hs.hits_single, CAST(0 AS BIGINT)) AS hits_single,
       COALESCE(hm.hits_multi, CAST(0 AS BIGINT)) AS hits_multi,
       COALESCE(hi.hits_ivf, CAST(0 AS BIGINT)) AS hits_ivf,
       COALESCE(ha.hits_adc, CAST(0 AS BIGINT)) AS hits_adc,
       COALESCE(hh.hits_hamming, CAST(0 AS BIGINT)) AS hits_hamming,
       ${s6("CAST(COALESCE(hs.hits_single, 0) AS DOUBLE) / CAST(tt.n_true AS DOUBLE)")} AS recall_single,
       ${s6("CAST(COALESCE(hm.hits_multi, 0) AS DOUBLE) / CAST(tt.n_true AS DOUBLE)")} AS recall_multi,
       ${s6("CAST(COALESCE(hi.hits_ivf, 0) AS DOUBLE) / CAST(tt.n_true AS DOUBLE)")} AS recall_ivf,
       ${s6("CAST(COALESCE(ha.hits_adc, 0) AS DOUBLE) / CAST(tt.n_true AS DOUBLE)")} AS recall_adc,
       ${s6("CAST(COALESCE(hh.hits_hamming, 0) AS DOUBLE) / CAST(tt.n_true AS DOUBLE)")} AS recall_hamming
FROM tt LEFT JOIN hs USING (qid) LEFT JOIN hm USING (qid)
LEFT JOIN hi USING (qid) LEFT JOIN ha USING (qid) LEFT JOIN hh USING (qid)"""

  /** Twin of Similarity.scalarQuantize: the same two-pass shape — per-pos
    * exact min/max, then the identical fixed IEEE quantize→reconstruct→
    * error sequence per value (sub, div, mul·$QuantLevels, floor — each
    * correctly rounded, so the bits match without any grid), max|err| as
    * an exact comparison aggregate, MSE through the avgD long-grid twin.
    * 255.0 / 0.5 / 0.0 literals are exactly representable, so DuckDB's
    * DECIMAL→DOUBLE coercion is exact for them. */
  private val quantizeSql = {
    val L = s"$QuantLevels.0"
    s"""WITH ex AS (
  SELECT unnest(range(1, len(embedding)+1)) AS pos,
         unnest([CAST(x AS DOUBLE) for x in embedding]) AS val
  FROM embeddings
), st AS (
  SELECT pos, min(val) AS mn, max(val) AS mx FROM ex GROUP BY pos
), er AS (
  SELECT e.pos, s.mn, s.mx,
         (e.val - (s.mn + (CASE WHEN s.mx > s.mn
            THEN floor((e.val - s.mn)/(s.mx - s.mn)*$L + 0.5)
            ELSE 0.0 END) * ((s.mx - s.mn)/$L))) AS err
  FROM ex e JOIN st s USING (pos))
SELECT pos, mn, mx,
       ${s9(s"(mx - mn)/$L")} AS scale,
       ${s9("max(abs(err))")} AS max_abs_err,
       ${Det.snapSql(Det.avgDSql("err*err", 12), 12)} AS mse
FROM er GROUP BY pos, mn, mx"""
  }

  private def s9(x: String): String = Det.snapSql(x, 9)

  /** Twin of Similarity.kmeansRefine at (KmK, KmIters): the iteration
    * loop UNROLLED into CTE blocks generated from the same constants —
    * seeds are the KmK smallest vec_ids (row_number cid), each block is
    * the declarative argmin (ORDER BY d2l, cid ≡ the Spark strict-<
    * over a cid-sorted codebook) followed by avgDSql centroid means
    * (bit-identical to Det.avgD, so both engines walk the SAME
    * trajectory). Empty clusters vanish from the GROUP BY exactly as
    * they drop out of the collected codebook. */
  private val kmeansSql = {
    val ex =
      """ex AS (
  SELECT vec_id, unnest(range(1, len(embedding)+1)) AS pos,
         unnest([CAST(x AS DOUBLE) for x in embedding]) AS val
  FROM embeddings)"""
    val carr0 =
      s"""carr0 AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cid,
         [CAST(x AS DOUBLE) for x in embedding] AS cv
  FROM embeddings ORDER BY vec_id LIMIT $KmK)"""
    val iterBlocks = (1 to KmIters).map { i =>
      s"""a$i AS (
  SELECT e.vec_id, c.cid, ${dist2Sql("e.embedding", "c.cv")} AS d2l
  FROM embeddings e, carr${i - 1} c),
assign$i AS (
  SELECT vec_id, cid FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d2l, cid) AS rnk
    FROM a$i)
  WHERE rnk = 1),
cent$i AS (
  SELECT a.cid, x.pos, ${Det.avgDSql("x.val", 12)} AS c
  FROM assign$i a JOIN ex x USING (vec_id) GROUP BY a.cid, x.pos),
carr$i AS (
  SELECT cid, list(c ORDER BY pos) AS cv FROM cent$i GROUP BY cid)"""
    }.mkString(",\n")
    s"""WITH $ex,
$carr0,
$iterBlocks,
af AS (
  SELECT e.vec_id, c.cid, ${dist2Sql("e.embedding", "c.cv")} AS d2l
  FROM embeddings e, carr$KmIters c),
fin AS (
  SELECT vec_id, cid, d2l FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d2l, cid) AS rnk
    FROM af)
  WHERE rnk = 1),
sizes AS (SELECT cid, count(*) AS n_members FROM fin GROUP BY cid)
SELECT f.vec_id, CAST(f.cid AS BIGINT) AS cluster,
       ${s6("CAST(f.d2l AS DOUBLE)/1e12")} AS d2,
       s.n_members
FROM fin f JOIN sizes s USING (cid)"""
  }

  /** Twin of kmeans_eval: the kmeansSql chain with every training-side
    * scan filtered to the train split, then the final assignment pass
    * over the HELD-OUT split against carr$KmIters; per-cluster exact
    * d2-grid stats, mean through the exact VARCHAR cast (HUGEINT sum
    * can pass 2⁵³). */
  private val kmeansEvalSql = {
    val ex =
      """ex AS (
  SELECT vec_id, unnest(range(1, len(embedding)+1)) AS pos,
         unnest([CAST(x AS DOUBLE) for x in embedding]) AS val
  FROM embeddings WHERE vec_id % 5 <> 0)"""
    val carr0 =
      s"""carr0 AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cid,
         [CAST(x AS DOUBLE) for x in embedding] AS cv
  FROM embeddings WHERE vec_id % 5 <> 0 ORDER BY vec_id LIMIT $KmK)"""
    val iterBlocks = (1 to KmIters).map { i =>
      s"""a$i AS (
  SELECT e.vec_id, c.cid, ${dist2Sql("e.embedding", "c.cv")} AS d2l
  FROM embeddings e, carr${i - 1} c WHERE e.vec_id % 5 <> 0),
assign$i AS (
  SELECT vec_id, cid FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d2l, cid) AS rnk
    FROM a$i)
  WHERE rnk = 1),
cent$i AS (
  SELECT a.cid, x.pos, ${Det.avgDSql("x.val", 12)} AS c
  FROM assign$i a JOIN ex x USING (vec_id) GROUP BY a.cid, x.pos),
carr$i AS (
  SELECT cid, list(c ORDER BY pos) AS cv FROM cent$i GROUP BY cid)"""
    }.mkString(",\n")
    s"""WITH $ex,
$carr0,
$iterBlocks,
af AS (
  SELECT e.vec_id, c.cid, ${dist2Sql("e.embedding", "c.cv")} AS d2l
  FROM embeddings e, carr$KmIters c WHERE e.vec_id % 5 = 0),
fin AS (
  SELECT vec_id, cid, d2l FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d2l, cid) AS rnk
    FROM af)
  WHERE rnk = 1),
agg AS (
  SELECT CAST(cid AS BIGINT) AS cluster, CAST(count(*) AS BIGINT) AS n_eval,
         sum(d2l) AS sd2, max(d2l) AS mx
  FROM fin GROUP BY 1)
SELECT cluster, n_eval,
       ${s6("CAST(CAST(sd2 AS VARCHAR) AS DOUBLE) / 1e12 / n_eval")} AS mean_d2,
       ${s6("CAST(mx AS DOUBLE) / 1e12")} AS max_d2
FROM agg"""
  }

  /** Twin of Similarity.knnGraph: the same corpus-sized plane count
    * (planesForSql of this corpus's count), dynamic bucket key, bucket
    * self-join, per-vector (cosine DESC, nbr_id) rank ≤ KnnK. `e` is
    * MATERIALIZED (round-12 capacity rework): the per-row dynamic
    * bucket string is a planes-sized chain of interpreted 64-dim plane
    * dots — inlining it into BOTH sides of the self-join recomputed the
    * corpus's buckets twice and kept the 100× oracle past budget. */
  private def knnGraphSql =
    s"""WITH pl AS (
  SELECT ${planesForSql(s"(greatest(count(*), 1) + ${KnnTarget - 1}) // $KnnTarget")} AS planes,
         ${signsCteCols(30, "srp")}
  FROM embeddings
), e AS MATERIALIZED (
  SELECT vec_id, embedding, ${dotSql("embedding", "embedding")} AS n,
         ${dynBucketSql("embedding")} AS bucket
  FROM embeddings CROSS JOIN pl
), scored AS (
  SELECT a.vec_id, b.vec_id AS nbr_id,
         ${cosSql(dotSql("a.embedding", "b.embedding"), "a.n", "b.n")} AS cosine
  FROM e a JOIN e b
    ON a.bucket = b.bucket AND a.vec_id <> b.vec_id
  WHERE a.n > 0 AND b.n > 0)
SELECT vec_id, nbr_id, cosine, rnk FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY vec_id ORDER BY cosine DESC, nbr_id) AS BIGINT) AS rnk
  FROM scored)
WHERE rnk <= $KnnK"""

  /** Twin of the knn_purity eval: the knn_graph twin as the edge source,
    * labels joined on both endpoints, |labels|-sized aggregate. */
  private def knnPuritySql =
    s"""WITH g AS ($knnGraphSql)
SELECT e.label AS label,
       count(DISTINCT g.vec_id) AS n_vectors,
       count(*) AS n_edges,
       count(CASE WHEN n2.label = e.label THEN 1 END) AS n_agree,
       ${s6("CAST(count(CASE WHEN n2.label = e.label THEN 1 END) AS DOUBLE) / CAST(count(*) AS DOUBLE)")} AS purity
FROM g
JOIN embeddings e ON e.vec_id = g.vec_id
JOIN embeddings n2 ON n2.vec_id = g.nbr_id
GROUP BY 1"""

  /** Twin of embed_jl: per output dim the SAME grid dot against the SAME
    * md5-seeded ±1 "jl" planes (one source of truth via planeSigns);
    * the norm-ratio chain re-runs the identical left-associated IEEE
    * double sequence. */
  private def jlSql = {
    val ys = (0 until JlK).map { j =>
      s"""CAST(list_sum([CAST(floor(CAST(embedding[i] AS DOUBLE)*((sg.p$j)[i])*1e12+0.5) AS BIGINT)
        for i in range(1, len(embedding)+1)]) AS BIGINT) AS y$j"""
    }
    val chain = (0 until JlK)
      .map(j => s"CAST(y$j AS DOUBLE)*CAST(y$j AS DOUBLE)").mkString(" + ")
    s"""WITH sgl AS (
  SELECT ${signsCteCols(JlK, JlSalt)}
), base AS (
  SELECT vec_id,
         CAST(${dotSql("embedding", "embedding")} AS BIGINT) AS nx,
         ${ys.mkString(",\n         ")}
  FROM embeddings CROSS JOIN sgl sg)
SELECT vec_id, nx, ${(0 until JlK).map(j => s"y$j").mkString(", ")},
       CASE WHEN nx > 0
            THEN ${s6(s"($chain) / (CAST(nx AS DOUBLE)*1e12*${JlK.toDouble})")}
       END AS norm_ratio
FROM base"""
  }

  /** Twin of embed_dim_stats: list-comprehension unpivot (0-based dim
    * matching posexplode), same Det grids. */
  private def dimStatsSql =
    s"""WITH u AS (
  SELECT CAST(i - 1 AS INTEGER) AS dim, CAST(embedding[i] AS DOUBLE) AS v
  FROM (SELECT embedding,
               unnest([i for i in range(1, len(embedding) + 1)]) AS i
        FROM embeddings))
SELECT dim, count(*) AS n,
       ${s6(Det.avgDSql("v", 6))} AS mean,
       ${s6(Det.stddevPopDSql("v", 6))} AS stddev,
       ${s6("min(v)")} AS min_v,
       ${s6("max(v)")} AS max_v
FROM u GROUP BY dim"""

  /** Twin of cluster_quality: the IVF-assignment twin joined to the
    * text-stats twin on the shared id, |clusters|-sized aggregate. */
  private def clusterQualitySql =
    s"""SELECT a.assigned_label,
       count(*) AS n_docs,
       CAST(sum(q.n_tokens) AS BIGINT) AS n_tokens,
       ${s6(Det.avgDSql("q.quality_score", 6))} AS avg_quality
FROM ($ivfSql) a JOIN (${DocQueries.statsSql}) q ON q.doc_id = a.vec_id
GROUP BY 1"""

  /** Twin of the knn_indegree hubness audit: in-degree per edge target,
    * never-referenced vectors joined into the 0 bucket. */
  private def knnIndegreeSql =
    s"""WITH g AS ($knnGraphSql),
ind AS (SELECT nbr_id, count(*) AS indeg FROM g GROUP BY 1)
SELECT coalesce(ind.indeg, 0) AS indeg, count(*) AS n_vectors
FROM embeddings e LEFT JOIN ind ON ind.nbr_id = e.vec_id
GROUP BY 1"""

  /** Twin of the semantic_prune composition: the knn_graph twin as the
    * edge source, the same lower-id offending filter, (cosine DESC,
    * nbr_id) pick, left join back onto the full id space. */
  private def semanticPruneSql =
    s"""WITH g AS ($knnGraphSql),
off AS (
  SELECT vec_id, nbr_id AS dup_nbr, cosine AS dup_cosine
  FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id
                 ORDER BY cosine DESC, nbr_id) AS rn
    FROM g WHERE cosine >= ${Det.dblLit(SemTau)} AND nbr_id < vec_id)
  WHERE rn = 1)
SELECT e.vec_id, off.dup_nbr, off.dup_cosine,
       off.dup_nbr IS NULL AS keep
FROM embeddings e LEFT JOIN off ON off.vec_id = e.vec_id"""

  /** Twin of Similarity.mmrDiversify: the k−1 greedy rounds unrolled as
    * MATERIALIZED CTEs (CLAUDE.md iterative-twin rule — a plain CTE
    * referencing its predecessor would inline exponentially). Candidate
    * and pair cosines are snapped before the greedy arithmetic, so
    * `lam·simq − oml·ms` sees identical double bits; ranking uses the
    * raw score with the vec_id tie-break, exactly as the Spark side. */
  private val mmrSql = {
    val lam = Det.dblLit(MmrLam); val oml = Det.dblLit(MmrOml)
    val rounds = (2 to MmrK).map { r =>
      s"""sel$r AS MATERIALIZED (
  SELECT qid, $r AS pick, vec_id, ${s6("score")} AS mmr_score FROM (
    SELECT c.qid, c.vec_id, $lam*c.simq - $oml*m.ms AS score,
           row_number() OVER (PARTITION BY c.qid
               ORDER BY $lam*c.simq - $oml*m.ms DESC, c.vec_id) AS rn
    FROM cand c
    JOIN (SELECT p.qid, p.a, max(p.psim) AS ms
          FROM pairs p JOIN all${r - 1} s ON p.qid = s.qid AND p.b = s.vec_id
          GROUP BY 1, 2) m
      ON c.qid = m.qid AND c.vec_id = m.a
    WHERE NOT EXISTS (SELECT 1 FROM all${r - 1} s2
                      WHERE s2.qid = c.qid AND s2.vec_id = c.vec_id)) t
  WHERE rn = 1),
all$r AS MATERIALIZED (
  SELECT * FROM all${r - 1} UNION ALL SELECT * FROM sel$r)"""
    }.mkString(",\n")
    s"""WITH base AS MATERIALIZED (
  SELECT vec_id, embedding, ${dotSql("embedding", "embedding")} AS nv FROM embeddings
), q AS MATERIALIZED (
  SELECT vec_id AS qid, embedding AS qv, nv AS nq FROM base WHERE vec_id < 5
), scored AS MATERIALIZED (
  SELECT q.qid, e.vec_id, ${cosSql(dotSql("q.qv", "e.embedding"), "q.nq", "e.nv")} AS simq,
         e.embedding, e.nv
  FROM q, base e
  WHERE e.vec_id <> q.qid AND e.nv > 0 AND q.nq > 0
), cand AS MATERIALIZED (
  SELECT qid, vec_id, simq, embedding, nv FROM (
    SELECT *, row_number() OVER (PARTITION BY qid ORDER BY simq DESC, vec_id) AS rnk
    FROM scored) t
  WHERE rnk <= $MmrN
), pairs AS MATERIALIZED (
  SELECT a.qid, a.vec_id AS a, b.vec_id AS b,
         ${cosSql(dotSql("a.embedding", "b.embedding"), "a.nv", "b.nv")} AS psim
  FROM cand a JOIN cand b ON a.qid = b.qid AND a.vec_id <> b.vec_id
), sel1 AS MATERIALIZED (
  SELECT qid, 1 AS pick, vec_id, ${s6(s"$lam*simq")} AS mmr_score
  FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY simq DESC, vec_id) AS rn
        FROM cand) t
  WHERE rn = 1),
all1 AS MATERIALIZED (SELECT * FROM sel1),
$rounds
SELECT qid, pick, vec_id, mmr_score FROM all$MmrK"""
  }

  /** Twin of Similarity.pcaTopComponent: covariance-numerator cells as a
    * HUGEINT (j,k,m) table, then the fixed power-iteration rounds
    * unrolled as MATERIALIZED CTEs. Every per-round sum is exact integer
    * algebra; the only floating ops are the signed int→double casts
    * (Det.signedDblSql — DuckDB misrounds negative HUGEINT→DOUBLE), one
    * division by max|w|, and the IEEE snap back to the 1e-6 grid —
    * matching the Spark driver's decimal-string-routed sequence bit for
    * bit. */
  private val pcaCtes = {
    val rounds = (1 to PcaIters).map { r =>
      s"""w$r AS MATERIALIZED (
  SELECT s.a AS j, sum(s.m * v.kv) AS w
  FROM msym s JOIN v${r - 1} v ON s.b = v.j GROUP BY 1),
mx$r AS MATERIALIZED (SELECT max(abs(w)) AS mx FROM w$r),
v$r AS MATERIALIZED (
  SELECT j, CASE WHEN mx > 0
       THEN CAST(floor(${Det.signedDblSql("w")} / CAST(mx AS DOUBLE) * 1e6 + 0.5) AS BIGINT)
       ELSE 0 END AS kv
  FROM w$r, mx$r)"""
    }.mkString(",\n")
    s"""e AS MATERIALIZED (
  SELECT vec_id,
         [CAST(floor(CAST(x AS DOUBLE)*1e6+0.5) AS BIGINT) for x in embedding] AS k
  FROM embeddings
), cells AS MATERIALIZED (
  SELECT g1.j, g2.l, sum(k[g1.j] * k[g2.l]) AS sp
  FROM e, generate_series(1, $PcaDim) g1(j), generate_series(1, $PcaDim) g2(l)
  WHERE g1.j <= g2.l
  GROUP BY 1, 2
), s1 AS MATERIALIZED (
  SELECT g.j, sum(k[g.j]) AS s1 FROM e, generate_series(1, $PcaDim) g(j) GROUP BY 1
), tot AS (SELECT count(*) AS n FROM e),
mm AS MATERIALIZED (
  SELECT c.j AS a, c.l AS b, tot.n * c.sp - sa.s1 * sb.s1 AS m
  FROM cells c
  CROSS JOIN tot
  JOIN s1 sa ON sa.j = c.j
  JOIN s1 sb ON sb.j = c.l
), msym AS MATERIALIZED (
  SELECT a, b, m FROM mm UNION ALL SELECT b AS a, a AS b, m FROM mm WHERE a <> b
), v0 AS MATERIALIZED (
  SELECT g.j, CAST(1000000 AS BIGINT) AS kv FROM generate_series(1, $PcaDim) g(j)
),
$rounds"""
  }

  private val pcaSql =
    s"""WITH $pcaCtes
SELECT CAST(j AS INTEGER) AS dim, CAST(kv AS DOUBLE) / 1e6 AS loading FROM v$PcaIters"""

  /** Twin of Similarity.pcaScores: sc = kᵀv per vector (exact HUGEINT),
    * explained = (n·Σsc² − (Σsc)²)/(vᵀv·trace M) — both sides of the
    * ratio non-negative exact integers, so the direct casts are
    * correctly rounded and match Spark's decimal-string route. */
  private val pcaScoresSql =
    s"""WITH $pcaCtes,
scores AS MATERIALIZED (
  SELECT t.vec_id, sum(t.kj * v.kv) AS sc
  FROM (SELECT e.vec_id, g.j, k[g.j] AS kj
        FROM e, generate_series(1, $PcaDim) g(j)) t
  JOIN v$PcaIters v ON v.j = t.j
  GROUP BY 1),
den AS (
  SELECT (SELECT sum(kv * kv) FROM v$PcaIters) *
         (SELECT sum(m) FROM mm WHERE a = b) AS den),
ex AS (
  SELECT CASE WHEN den.den > 0
       THEN ${s6("CAST(agg.num AS DOUBLE) / CAST(den.den AS DOUBLE)")} END AS explained
  FROM (SELECT CAST(count(*) AS HUGEINT) * sum(sc * sc) - sum(sc) * sum(sc) AS num
        FROM scores) agg, den)
SELECT s.vec_id, ${s6(s"${Det.signedDblSql("s.sc")} / 1e12")} AS pc1, ex.explained
FROM scores s, ex"""

  def oracleSql: Map[String, String] = Map(
    "pca_power" -> pcaSql,
    "pca_scores" -> pcaScoresSql,
    "mmr_diversify" -> mmrSql,
    "semantic_prune" -> semanticPruneSql,
    "knn_graph" -> knnGraphSql,
    "knn_purity" -> knnPuritySql,
    "knn_indegree" -> knnIndegreeSql,
    "cluster_quality" -> clusterQualitySql,
    "embed_jl" -> jlSql,
    "embed_dim_stats" -> dimStatsSql,
    "ann_recall" -> annRecallSql,
    "ndcg_eval" -> ndcgSql,
    "ivf_sweep" -> ivfSweepSql,
    "embed_quantize" -> quantizeSql,
    "dedup_embed" -> dedupEmbedSql,
    "embed_topk" -> topkSql,
    "embed_hamming_topk" -> hammingSql,
    "embed_standardize" -> standardizeSql,
    "embed_robust_scale" -> robustScaleSql,
    "embed_lsh_topk" -> lshTopkSql,
    "embed_lsh_probe" -> lshProbeSql,
    "embed_lsh_multi" -> lshMultiSql,
    "embed_centroids" -> centroidsSql,
    "embed_ivf" -> ivfSql,
    "pq_codes" -> pqSql,
    "pq_adc_topk" -> pqAdcSql,
    "ivfpq_topk" -> ivfPqSql,
    "rrf_fusion" -> rrfSql,
    "ivf_probe_topk" -> ivfProbeSql,
    "cluster_sample" -> clusterSampleSql,
    "kmeans_iter" -> kmeansSql,
    "kmeans_eval" -> kmeansEvalSql
  )

  /** Build + persist the ANN serving index (train the codebook once,
    * quantize the corpus once) — the [[graft.ops.VecIndex]] artifact
    * Bench's SPARK_GRAFT_BENCH_AMORTIZE mode measures for the
    * retrieval family (r13 verdict stretch). Uses the contract
    * constants, so readers reproduce the contract queries exactly. */
  private[graft] def buildVecIndexArtifact(s: SparkSession, d: String,
                                           path: String): Unit = {
    val v = vecs(s, d)
    graft.ops.VecIndex.store(v,
      Similarity.centroidArrays(Similarity.centroids(v)), PqSubDims, path)
  }

  /** [[buildVecIndexArtifact]] over an explicit corpus frame — the
    * [[graft.tools.RefreshBench]] seam (train the codebook on history,
    * then append the day's vectors under it). */
  private[graft] def buildVecIndexArtifactOver(corpus: DataFrame, path: String): Unit =
    graft.ops.VecIndex.store(corpus,
      Similarity.centroidArrays(Similarity.centroids(corpus)), PqSubDims, path)

  /** The [[buildVecIndexArtifact]] twin for the 100 TB layout: shard
    * written `partitionBy("cell")`, so probe sets prune to nprobe cell
    * directories at the scan ([[graft.ops.VecIndex.loadShardPruned]]). */
  private[graft] def buildVecIndexArtifactPartitioned(s: SparkSession, d: String,
                                                      path: String): Unit = {
    val v = vecs(s, d)
    graft.ops.VecIndex.storePartitioned(v,
      Similarity.centroidArrays(Similarity.centroids(v)), PqSubDims, path)
  }

  /** Probe-pruned bodies over a PARTITIONED index: the two probe-based
    * readers (ADC scans every code, so pruning does not apply to
    * pq_adc_topk) with the shard read pruned to the queries' probe-set
    * union — bit-identical to the contract queries (VecIndexSpec), with
    * the probe filter now a PartitionFilters entry at the parquet scan. */
  private[graft] def prunedVecQueries(path: String): Map[String, (SparkSession, String) => DataFrame] = {
    import graft.ops.VecIndex._
    def pruned(s: SparkSession, d: String): (DataFrame, DataFrame) = {
      val cb = loadCodebook(s, path)
      val cells = Similarity.probedCellUnion(q5(vecs(s, d)), cb, IvfNprobe)
      (loadShardPruned(s, path, cells), cb)
    }
    Map(
      "ivfpq_topk" -> ((s, d) => {
        val (shard, cb) = pruned(s, d)
        Similarity.ivfPqTopKFromIndex(q5(vecs(s, d)), shard, cb,
          IvfNprobe, PqSubDims)
      }),
      "ivf_probe_topk" -> ((s, d) => {
        val (shard, cb) = pruned(s, d)
        Similarity.ivfProbeTopKFromIndex(q5(vecs(s, d)), shard, cb, IvfNprobe)
      })
    )
  }

  /** Amortized bodies for the ANN read paths: identical bits to the
    * contract queries (VecIndexSpec), but the per-query k-means train +
    * corpus re-quantization is replaced by an index load. Queries stay
    * ad-hoc (read from the raw table) — the INDEX is the corpus side,
    * which is what a serving deployment persists. */
  private[graft] def amortizedVecQueries(path: String): Map[String, (SparkSession, String) => DataFrame] = {
    import graft.ops.VecIndex._
    Map(
      "ivfpq_topk" -> ((s, d) => Similarity.ivfPqTopKFromIndex(
        q5(vecs(s, d)), loadShard(s, path), loadCodebook(s, path),
        IvfNprobe, PqSubDims)),
      "pq_adc_topk" -> ((s, d) => Similarity.pqAdcTopKFromCodes(
        q5(vecs(s, d)), loadShard(s, path), loadCodebook(s, path),
        PqSubDims)),
      "ivf_probe_topk" -> ((s, d) => Similarity.ivfProbeTopKFromIndex(
        q5(vecs(s, d)), loadShard(s, path), loadCodebook(s, path),
        IvfNprobe))
    )
  }
}

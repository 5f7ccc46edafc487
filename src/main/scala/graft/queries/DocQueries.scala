package graft.queries

import graft.ops._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{abs, array, array_join, bin, broadcast, coalesce, col, concat, count, countDistinct, explode, expr, greatest, least, length, levenshtein, lit, max, md5, min, posexplode, row_number, slice, split, struct, sum, when}

/** Driver-verifiable queries for the text-analysis + deduplication
  * operator families (TextOps, Dedup) over `documents.parquet`, each with
  * a DuckDB oracle twin assembled from the same constants. All hashes are
  * md5 (identical hex in both engines); all arithmetic follows the Det
  * determinism rules, so every query hash-matches exactly.
  */
object DocQueries {

  import TickQueries.r6

  private def s6(x: String): String = Det.snapSql(x, 6)

  // multimodal_decode frame geometry (shared by the Spark call + oracle)
  private val FrameBytes = 64
  private val SampleEvery = 2
  // multimodal_resize pooled-thumbnail width (shared Spark/oracle)
  private val PoolBuckets = 16
  // multimodal_bilinear resample width (shared Spark/oracle)
  private val BilinearSamples = 16
  // phrase_search target phrase (shared Spark/oracle constants)
  private val PhraseA = "merge"
  private val PhraseB = "sort"

  /** dedup_recall truth threshold on TRUE n-gram Jaccard (shared by the
    * Spark call and the oracle — interpolated via [[Det.dblLit]] so the
    * comparison constant is the same double in both engines). */
  private val RecallTau = 0.5

  /** simhash_hamming neighbor budget (shared Spark/oracle constant). */
  private val HammingMax = 1

  /** dedup_containment keep threshold (shared Spark/oracle constant). */
  private val ContainTau = 0.5

  /** perceptron_lang training epochs (shared Spark/oracle constant). */
  private val PerceptronEpochs = 3

  /** dataset_split hash cuts on the 48-bit md5 fraction (exact integer
    * thresholds ≈ 80 / 10 / 10 — the conventional train/val/test mix;
    * shared Spark/oracle constants so the boundary is bit-identical).
    * Salted ("split:" prefix) so the assignment is independent of every
    * other md5-keyed decision in the pipeline (sampling, cluster quotas)
    * — unsalted reuse would correlate the held-out set with them. */
  private val SplitScale = 1L << 48
  private val TrainCut = SplitScale / 10L * 8L
  private val ValCut = SplitScale / 10L * 9L

  /** importance_weights target domain (shared Spark/oracle constant). */
  private val TargetSource = "src0"

  /** epoch_shuffle epoch count (shared Spark/oracle constant). */
  private val ShuffleEpochs = 2

  /** dedup_sweep banding grid (numHashes, bands) — rows-per-band 8/4/2/4
    * walks the LSH precision↔recall dial (shared Spark/oracle constant). */
  private val SweepConfigs = Seq((8, 1), (8, 2), (8, 4), (16, 4))

  def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  /** The corpus scan SPREAD to session parallelism (r16): the sf
    * fixtures are single-row-group files — one scan partition — so a
    * per-record kernel running before its first Exchange executes
    * single-threaded. Opt-in PER QUERY, not in [[docs]] itself: the
    * extra Exchange wins only where the pre-shuffle kernel is heavy
    * (shingling, minhash signatures, md5 windows, regex scrubbing —
    * measured 0.26×-0.8×); light multi-pass bodies (sketches, BPE's
    * per-round re-reads, per-doc map stats) re-pay the shuffle per
    * pass and regressed +0.2-0.6 s under a blanket spread. See
    * [[graft.ops.Par.spread]]; identity on wide inputs and under
    * forced-distributed. */
  private def docsW(s: SparkSession, dir: String): DataFrame =
    graft.ops.Par.spread(docs(s, dir))

  /** quality_sweep candidate cutoffs (shared Spark/oracle constant; each
    * crosses engines as the same decimal string → same double bits). */
  private val QualityTaus = Seq(0.5, 0.55, 0.6, 0.65, 0.7, 0.75, 0.8)

  /** boilerplate_detect prefix length (tokens) and report size. */
  private val BpfxTokens = 3
  private val BpfxTopK = 50

  /** pii_scrub fixture: splice synthetic PII into the (digit-free) corpus
    * text with pure doc_id arithmetic — every doc gets one email and one
    * IPv4; every third doc a second email; every second doc a phone. The
    * SQL twin [[piiScrubSql]] rebuilds the SAME string, so the md5 gate
    * proves the two engines' regex replacement produced identical bytes.
    */
  private def piiInjected(d: DataFrame): DataFrame = {
    val id = col("doc_id")
    def s(c: org.apache.spark.sql.Column) = c.cast("string")
    d.select(id, concat(
      col("text"),
      lit(" contact user"), s(id), lit("@mail"), s(id % 7), lit(".example.com"),
      when(id % 3 === 0,
        concat(lit(" cc admin"), s(id), lit("@corp.net"))).otherwise(lit("")),
      lit(" from "), s(id % 200 + 10), lit("."), s(id % 250), lit(".0."),
      s((id * 3) % 250),
      when(id % 2 === 0,
        concat(lit(" call "), s(id % 900 + 100), lit("-"),
          s((id * 7) % 900 + 100), lit("-"), s(id % 9000 + 1000)))
        .otherwise(lit(""))).as("text"))
  }

  /** DuckDB twin of [[piiInjected]] (same splice, same arithmetic). */
  private val piiInjectedSql = {
    def v(x: String) = s"CAST($x AS VARCHAR)"
    s"""SELECT doc_id,
       text || ' contact user' || ${v("doc_id")} || '@mail' || ${v("doc_id % 7")}
            || '.example.com'
            || CASE WHEN doc_id % 3 = 0
                    THEN ' cc admin' || ${v("doc_id")} || '@corp.net'
                    ELSE '' END
            || ' from ' || ${v("doc_id % 200 + 10")} || '.' || ${v("doc_id % 250")}
            || '.0.' || ${v("(doc_id * 3) % 250")}
            || CASE WHEN doc_id % 2 = 0
                    THEN ' call ' || ${v("doc_id % 900 + 100")} || '-'
                         || ${v("(doc_id * 7) % 900 + 100")} || '-'
                         || ${v("doc_id % 9000 + 1000")}
                    ELSE '' END AS text
FROM documents"""
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_stats" -> ((s, d) => r6(TextOps.stats(docsW(s, d)))),
    // Gopher-family intra-document repetition signals; doc-local typed
    // map, zero shuffle (TextOps.repetition's scaladoc has the scale
    // argument). Fractions snapped at the edge per the Det contract.
    "repetition_stats" -> ((s, d) => r6(TextOps.repetition(docs(s, d)))),
    // DSIR-flavored exact-integer importance weighting for domain-
    // targeted resampling (TextOps.importanceWeights has the formula
    // and the scale argument).
    "importance_weights" -> ((s, d) =>
      TextOps.importanceWeights(docs(s, d), TargetSource)),
    // PII scrub over a deterministically injected corpus: the fixture
    // text is digit-free word soup, so the query splices synthetic
    // emails/IPs/phones (pure doc_id arithmetic, mirrored verbatim in
    // the twin) and the gate then verifies detection counts AND the
    // md5 of the redacted text — i.e. the exact replacement spans.
    "pii_scrub" -> ((s, d) => TextOps.piiScrub(piiInjected(docsW(s, d)))),
    // Vocabulary-richness quality signals (TTR, hapax fraction, log-free
    // Gini-Simpson diversity); doc-local zero-shuffle typed map —
    // TextOps.lexicalDiversity has the measure and scale arguments.
    "lexical_diversity" -> ((s, d) => r6(TextOps.lexicalDiversity(docs(s, d)))),
    "text_vocab" -> ((s, d) => r6(TextOps.vocab(docs(s, d)))),
    "lang_id" -> ((s, d) => TextOps.langId(docsW(s, d))),
    // Confusion matrix of the langId heuristic against the labeled
    // `lang` column — the classifier-eval harness run before trusting a
    // filter gate at corpus scale. One |langs|²-sized aggregate over the
    // zero-shuffle langId scan; label totals via a window over the tiny
    // cell table. Counts exact; recall share is one IEEE division of
    // exact longs, 6-dp snapped.
    "lang_confusion" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      TextOps.langId(docs(s, d))
        .groupBy(col("label_lang"), col("predicted_lang"))
        .agg(count(lit(1)).as("n_docs"))
        .withColumn("label_total",
          sum(col("n_docs")).over(Window.partitionBy(col("label_lang"))))
        .select(col("label_lang"), col("predicted_lang"), col("n_docs"),
          col("label_total"),
          Det.snap(col("n_docs").cast("double") / col("label_total").cast("double"), 6)
            .as("share"))
    }),
    // In-engine classifier TRAINING: batch-gradient integer perceptron
    // learning en-vs-rest from stopword-profile counts — the fastText-
    // style filter gate, with a bit-exact training trajectory
    // (Perceptron scaladoc has the epoch-aggregate scale shape).
    "perceptron_lang" -> ((s, d) =>
      Perceptron.train(docs(s, d), PerceptronEpochs)),
    // Held-out eval of the perceptron gate (the train→eval closure all
    // four in-engine trainers now carry): weights from doc_id % 5 <> 0
    // only, confusion counts + accuracy on the held-out fifth.
    "perceptron_eval" -> ((s, d) => {
      val base = docs(s, d)
      Perceptron.evalHeldOut(base.filter(col("doc_id") % 5 =!= 0),
        base.filter(col("doc_id") % 5 === 0), PerceptronEpochs)
    }),
    // Threshold-free ranking quality of the same gate: exact AUC via
    // the integer Mann–Whitney identity (Perceptron.aucHeldOut scaladoc
    // has the 2×-scaled-U arithmetic and the range-partitioned shape).
    "perceptron_auc" -> ((s, d) => {
      val base = docs(s, d)
      Perceptron.aucHeldOut(base.filter(col("doc_id") % 5 =!= 0),
        base.filter(col("doc_id") % 5 === 0), PerceptronEpochs)
    }),
    // The operating-point sweep next to the AUC single number: one row
    // per distinct margin threshold with exact tp/fp/fn and snapped
    // precision/recall (Perceptron.prCurveHeldOut scaladoc).
    "perceptron_pr_curve" -> ((s, d) => {
      val base = docs(s, d)
      Perceptron.prCurveHeldOut(base.filter(col("doc_id") % 5 =!= 0),
        base.filter(col("doc_id") % 5 === 0), PerceptronEpochs)
    }),
    "fingerprint" -> ((s, d) => TextOps.fingerprint(docsW(s, d))),
    "dedup_exact" -> ((s, d) => Dedup.exact(docs(s, d))),
    "dedup_jaccard" -> ((s, d) => Dedup.ngramJaccardTopK(docsW(s, d))),
    "dedup_minhash" -> ((s, d) => Dedup.minhashLshPairs(docsW(s, d))),
    // Incremental dedup of a simulated daily delta (doc_id % 5 == 0 is
    // "today's batch") against the standing corpus: candidate pairs
    // must TOUCH the delta — the filter lives inside the bucket pair
    // generator so history×history never materializes
    // (Dedup.minhashLshDeltaPairs scaladoc has the Σ|new∩b|·|b| bound).
    "dedup_delta" -> ((s, d) =>
      Dedup.minhashLshDeltaPairs(docsW(s, d), col("doc_id") % 5 === 0)),
    // Asymmetric containment |A∩B|/|A| — the quote/superset axis of text
    // dedup that symmetric Jaccard misses (Dedup.containmentPairs has
    // the measure and the scale argument; same Σdf²-bounded postings).
    "dedup_containment" -> ((s, d) =>
      Dedup.containmentPairs(docsW(s, d), tau = ContainTau)),
    "dedup_simhash" -> ((s, d) => Dedup.simhash(docs(s, d))),
    // SimHash Hamming-neighbor pairs via pigeonhole banding; the oracle
    // is the brute-force quadratic, so the hash gate itself proves the
    // banding surfaces EVERY within-budget pair on the live corpus.
    // docsW (r17): the per-word md5+hex kernel of the inner simhash is
    // the query's heaviest pre-Exchange stage — the measured-winner
    // spread profile (its r16 blanket reading was 0.77×; the opt-in
    // was missed then).
    "simhash_hamming" -> ((s, d) =>
      Dedup.simhashHamming(docsW(s, d), maxHamming = HammingMax)),
    // MinHash-LSH candidate quality vs EXACT Jaccard ground truth — the
    // eval a curator runs before trusting the approximate path at scale
    // (the ann_recall companion for text dedup). One summary row:
    // truth/candidate/hit counts plus precision and recall of the LSH
    // candidate set against true-jaccard >= RecallTau pairs. All counts
    // exact; each ratio is one IEEE division of exactly-converted longs,
    // 6-dp snapped. Scale shape: both sides are the existing bounded
    // pipelines (sum-df-squared postings, banded buckets); the hit join
    // is pair-dimension-keyed.
    "dedup_recall" -> ((s, d) => {
      // Shingles are banding-independent: one shared shingle PLAN feeds
      // both the exact-Jaccard truth and the LSH candidate side. It is
      // deliberately NOT checkpointed — the exploded frame is LARGER
      // than the corpus, so materializing it costs more than the two
      // cheap scan+explode recomputes (measured; and the asymmetry only
      // grows at 100 TB). truth/cand are pair-dimension-sized and each
      // read twice below (count + hit join), so they DO materialize.
      val sh = Shingles.exploded(docsW(s, d), 3)
      val truth = Dedup.jaccardPairsOf(sh, tau = RecallTau)
        .select(col("doc_a"), col("doc_b")).localCheckpoint(true)
      val cand = Dedup.minhashLshPairsOf(sh)
        .select(col("doc_a"), col("doc_b")).localCheckpoint(true)
      val tt = truth.agg(count(lit(1)).as("n_truth"))
      val cc = cand.agg(count(lit(1)).as("n_candidates"))
      val hh = truth.join(cand, Seq("doc_a", "doc_b"))
        .agg(count(lit(1)).as("n_hits"))
      val res = tt.crossJoin(cc).crossJoin(hh)
        .select(col("n_truth"), col("n_candidates"), col("n_hits"),
          when(col("n_candidates") > 0, Det.snap(
            col("n_hits").cast("double") / col("n_candidates").cast("double"), 6))
            .as("precision_lsh"),
          when(col("n_truth") > 0, Det.snap(
            col("n_hits").cast("double") / col("n_truth").cast("double"), 6))
            .as("recall_lsh"))
        .localCheckpoint(true)
      truth.unpersist(); cand.unpersist()
      res
    }),
    "multimodal_features" -> ((s, d) =>
      Multimodal.features(Multimodal.toBlobTable(docs(s, d)))),
    // Oracle replays the stub codec's byte slicing in SQL: hex(encode(text))
    // is the payload, substring picks each frame's hex span, per-byte stats
    // are exact ints (pos_checksum pins slice ORDER, not just content).
    "multimodal_decode" -> ((s, d) =>
      Multimodal.decodeFrames(Multimodal.toBlobTable(docs(s, d)),
        FrameBytes, SampleEvery).toDF()),
    // STUB resize (the decode→RESIZE→feature link of the media chain):
    // average-pool each payload into PoolBuckets fixed index ranges —
    // Multimodal.resizePool scaladoc has the ⌊i·P/n⌋ index map and the
    // one-blob-per-task memory bound.
    "multimodal_resize" -> ((s, d) =>
      Multimodal.resizePool(Multimodal.toBlobTable(docs(s, d)),
        PoolBuckets).toDF()),
    // BILINEAR resize (round-12 stretch): linear interpolation at
    // half-pixel centers over the same synthetic byte frames — the
    // exact-rational index algebra is real resize math; see
    // Multimodal.resizeBilinear for the num/(2P) grid derivation.
    "multimodal_bilinear" -> ((s, d) =>
      Multimodal.resizeBilinear(Multimodal.toBlobTable(docs(s, d)),
        BilinearSamples).toDF()),
    // Positional-index PHRASE search — exact adjacent-token match via
    // posting-list intersection: tokenize with positions, filter each
    // posting list to its phrase term directly above the Generate —
    // BEFORE any join or shuffle — then one (doc, pos)-keyed equi-join
    // per adjacency (the smaller posting list broadcasts; plan
    // verified). The classic inverted-index phrase plan: a k-term
    // phrase chains k−1 such joins, cost bounded by the rarest term's
    // posting list, never the corpus. Counts/positions exact longs.
    "phrase_search" -> ((s, d) => {
      val tok = docs(s, d).select(col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("pos", "term")))
      val t0 = tok.filter(col("term") === PhraseA)
        .select(col("doc_id"), col("pos").cast("long").as("p0"))
      val t1 = tok.filter(col("term") === PhraseB)
        .select(col("doc_id").as("doc1"), col("pos").cast("long").as("p1"))
      t0.join(t1, col("doc_id") === col("doc1") && col("p1") === col("p0") + 1L)
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_matches"), min(col("p0")).as("first_pos"))
    }),
    // Distribution-drift audit between two corpus slices (even vs odd
    // doc_id playing "yesterday's batch vs today's"): EXACT total-
    // variation distance over the word distributions — TV = ½Σ|p−q|
    // computed as Σ|c_a·N_b − c_b·N_a| / (2·N_a·N_b), one division of
    // exact integers — plus the top-10 drifting words. The drift gate a
    // continuously-ingesting pipeline alarms on; log-free by design
    // (KL needs ln, TV doesn't).
    "dataset_drift" -> ((s, d) => {
      val words = docs(s, d).select((col("doc_id") % 2 === 0).as("is_a"),
        explode(split(col("text"), " ")).as("word"))
      val wc = words.groupBy(col("word"))
        .agg(count(when(col("is_a"), 1)).as("c_a"),
          count(when(!col("is_a"), 1)).as("c_b"))
      val tot = wc.agg(sum(col("c_a")).as("n_a"), sum(col("c_b")).as("n_b"))
      val scored = wc.crossJoin(broadcast(tot))
        .withColumn("drift_num",
          abs(col("c_a") * col("n_b") - col("c_b") * col("n_a")))
      val tvRow = scored
        .groupBy(col("n_a"), col("n_b"))
        .agg(sum(col("drift_num")).as("tv_num"))
        .select(Det.snap(col("tv_num").cast("double") /
          (lit(2.0) * col("n_a").cast("double") * col("n_b").cast("double")), 6)
          .as("tv_distance"))
      scored
        .withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col("drift_num").desc, col("word"))).cast("long"))
        .filter(col("rk") <= 10)
        .crossJoin(broadcast(tvRow))
        .select(col("rk"), col("word"), col("c_a"), col("c_b"),
          col("drift_num"), col("tv_distance"))
    }),
    // Deterministic train/val/test split — the reproducible holdout
    // assignment every training-data pipeline needs: doc → split from
    // the salted 48-bit md5 fraction against exact integer cuts (no RNG,
    // no state; re-running on a grown corpus never reassigns an old
    // doc). Report = per-(source, split) counts and within-source share
    // — the leakage/balance audit a dataset card publishes. Assignment
    // itself is a narrow codegen'd select; the report is one tiny
    // aggregate + broadcast totals.
    "dataset_split" -> ((s, d) => {
      val hv = expr("cast(conv(substring(md5(concat('split:', cast(doc_id as string))), 1, 12), 16, 10) as long)")
      val split = when(hv < TrainCut, "train")
        .when(hv < ValCut, "val").otherwise(lit("test"))
      val base = docs(s, d).select(col("source"), split.as("split"))
      val counts = base.groupBy(col("source"), col("split"))
        .agg(count(lit(1)).as("n_docs"))
      val totals = counts.groupBy(col("source"))
        .agg(sum(col("n_docs")).as("n_source"))
      counts.join(broadcast(totals), Seq("source"))
        .select(col("source"), col("split"), col("n_docs"),
          Det.snap(col("n_docs").cast("double") / col("n_source").cast("double"), 6)
            .as("share"))
    }),
    // Per-document n-gram novelty in doc_id order — the "is new data
    // still new" memorization diagnostic at shingle granularity (the
    // doc-level sibling of vocab_growth): fraction of a doc's distinct
    // 3-grams first seen in THIS doc. One inverted-index min-aggregate
    // (the same shuffle a dedup index build pays) + a doc-keyed count.
    "ngram_novelty" -> ((s, d) => {
      val sh = Shingles.exploded(docs(s, d), 3)
      val first = sh.groupBy(col("shingle")).agg(min(col("doc_id")).as("first_doc"))
      sh.join(first, Seq("shingle"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_shingles"),
          count(when(col("first_doc") === col("doc_id"), 1)).as("n_novel"))
        .select(col("doc_id"), col("n_shingles"), col("n_novel"),
          Det.snap(col("n_novel").cast("double") / col("n_shingles").cast("double"), 6)
            .as("novelty"))
    }),
    // LSH banding parameter sweep: precision/recall of FOUR banding
    // configs against the same true-Jaccard truth in one output — the
    // tuning CURVE (dedup_recall is one point on it) a curator reads
    // before spending a corpus-scale dedup pass; rows-per-band 8→2
    // walks the P[candidate] = j^(hashes/bands) dial. Shapes: ONE
    // signature aggregate at max(numHashes) serves every geometry
    // (narrower configs band a PREFIX of the checkpointed doc-dimension
    // sigs frame — Dedup.lshPairsOfSigs), so the corpus-wide cost is
    // one shingle scan for truth + one for signatures (the exploded
    // shingle frame itself is larger than the corpus and is NOT
    // checkpointed — see dedup_recall); the tagged candidate union
    // joins the truth frame ONCE (left join, marker count), and the
    // config dimension frame left-joins back so a zero-candidate config
    // still emits its row (mirroring the oracle's per-config counts).
    "dedup_sweep" -> ((s, d) => {
      import s.implicits._
      val sh = Shingles.exploded(docsW(s, d), 3)
      val truth = Dedup.jaccardPairsOf(sh, tau = RecallTau)
        .select(col("doc_a"), col("doc_b")).withColumn("t", lit(1))
        .localCheckpoint(true)
      // ONE signature aggregate at max(numHashes): narrower configs
      // band over a prefix of the same doc-dimension-sized frame
      // (Dedup.lshPairsOfSigs scaladoc) — 4 geometries, 1 corpus-wide
      // signature pass instead of 4.
      val sigs = Dedup.minhashSignaturesOf(sh, SweepConfigs.map(_._1).max)
        .localCheckpoint(true)
      val cands = SweepConfigs.map { case (h, b) =>
        Dedup.lshPairsOfSigs(sigs, numHashes = h, bands = b)
          .select(col("doc_a"), col("doc_b"))
          .withColumn("num_hashes", lit(h)).withColumn("bands", lit(b))
      }.reduce(_ unionByName _)
      val agg = cands.join(truth, Seq("doc_a", "doc_b"), "left")
        .groupBy(col("num_hashes"), col("bands"))
        .agg(count(lit(1)).as("n_candidates"), count(col("t")).as("n_hits"))
      val res = SweepConfigs.toDF("num_hashes", "bands")
        .join(agg, Seq("num_hashes", "bands"), "left")
        .crossJoin(truth.agg(count(lit(1)).as("n_truth")))
        .select(col("num_hashes"), col("bands"), col("n_truth"),
          coalesce(col("n_candidates"), lit(0L)).as("n_candidates"),
          coalesce(col("n_hits"), lit(0L)).as("n_hits"))
        .select(col("num_hashes"), col("bands"), col("n_truth"),
          col("n_candidates"), col("n_hits"),
          when(col("n_candidates") > 0, Det.snap(
            col("n_hits").cast("double") / col("n_candidates").cast("double"), 6))
            .as("precision_lsh"),
          when(col("n_truth") > 0, Det.snap(
            col("n_hits").cast("double") / col("n_truth").cast("double"), 6))
            .as("recall_lsh"))
        .localCheckpoint(true)
      truth.unpersist(); sigs.unpersist()
      res
    }),
    // Quality-aware canonical selection: within each near-dup cluster
    // keep the HIGHEST-QUALITY member (ties → lowest id) — the keep
    // rule production dedup actually uses, vs the min-id convention the
    // cluster queries standardize on for verification. Singletons keep
    // themselves (cluster = own id via the left join). The rank window
    // runs per cluster (cluster-sized partitions); quality doubles are
    // bit-identical in both engines so the DESC order is engine-stable.
    "dedup_keep_best" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val cl = ConnectedComponents.clusters(
          Dedup.minhashLshPairs(docsW(s, d)), "doc_a", "doc_b")
        .select(col("id").as("doc_id"), col("cluster_id"))
      val q = TextOps.stats(docs(s, d)).select(col("doc_id"), col("quality_score"))
      docs(s, d).select(col("doc_id"))
        .join(cl, Seq("doc_id"), "left")
        .withColumn("cluster_id", coalesce(col("cluster_id"), col("doc_id")))
        .join(q, Seq("doc_id"))
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("cluster_id"))
            .orderBy(col("quality_score").desc, col("doc_id"))))
        .select(col("doc_id"), col("cluster_id"),
          Det.snap(col("quality_score"), 6).as("quality_score"),
          (col("rk") === 1).as("keep"))
    }),
    // Redundancy audit of the quality-signal battery: exact Pearson
    // correlations among the four base signals — a pair correlating
    // ~1 means one signal is paying scan cost for no extra filtering
    // information. One zero-shuffle stats scan + ONE map-side-combined
    // aggregate computing all six pairs (Det.corrD exact moments).
    "quality_corr" -> ((s, d) => {
      val st = TextOps.stats(docs(s, d)).select(
        col("n_tokens").cast("double").as("t"),
        col("n_distinct_tokens").cast("double").as("u"),
        col("n_stopwords").cast("double").as("w"),
        col("n_chars").cast("double").as("c"))
      st.agg(
        count(lit(1)).as("n_docs"),
        Det.snap(Det.corrD(col("t"), col("u"), 2), 6).as("corr_tokens_distinct"),
        Det.snap(Det.corrD(col("t"), col("w"), 2), 6).as("corr_tokens_stop"),
        Det.snap(Det.corrD(col("t"), col("c"), 2), 6).as("corr_tokens_chars"),
        Det.snap(Det.corrD(col("u"), col("w"), 2), 6).as("corr_distinct_stop"),
        Det.snap(Det.corrD(col("u"), col("c"), 2), 6).as("corr_distinct_chars"),
        Det.snap(Det.corrD(col("w"), col("c"), 2), 6).as("corr_stop_chars"))
    }),
    // Candidate VERIFICATION stage of the dedup pipeline: LSH surfaces
    // candidates cheaply; each candidate pair then pays one exact
    // Levenshtein comparison (identical DP definition in both engines)
    // and only verified pairs survive. This is the standard
    // generate-then-verify split at corpus scale — the quadratic
    // comparator runs on the LSH-bounded pair frame, never the corpus;
    // the two text lookups are id-keyed joins of narrow frames.
    "dedup_verify" -> ((s, d) => {
      val txt = docsW(s, d).select(col("doc_id"), col("text"))
      Dedup.minhashLshPairs(docsW(s, d))
        .select(col("doc_a"), col("doc_b"), col("est_jaccard"))
        .join(txt.select(col("doc_id").as("doc_a"), col("text").as("ta")),
          Seq("doc_a"))
        .join(txt.select(col("doc_id").as("doc_b"), col("text").as("tb")),
          Seq("doc_b"))
        .select(col("doc_a"), col("doc_b"), col("est_jaccard"),
          levenshtein(col("ta"), col("tb")).cast("long").as("lev_dist"),
          greatest(length(col("ta")), length(col("tb"))).cast("long")
            .as("max_len"))
        .withColumn("verified",
          col("lev_dist") * 5 <= col("max_len")) // ≤20% of the longer doc
    }),
    // Cross-source duplication matrix: near-dup pairs rolled up by
    // (source, source) — the dataset-card "which sources copy from each
    // other" table that decides whether a source earns its mixture
    // weight. Pair endpoints take their source via two id-keyed joins
    // (pair frame is LSH-bounded, source map is narrow); the pair key
    // canonicalizes by least/greatest so the matrix is triangular; the
    // final aggregate is |sources|²-sized.
    "dedup_sources" -> ((s, d) => {
      val src = docs(s, d).select(col("doc_id"), col("source"))
      Dedup.minhashLshPairs(docsW(s, d)).select(col("doc_a"), col("doc_b"))
        .join(src.select(col("doc_id").as("doc_a"), col("source").as("sa")),
          Seq("doc_a"))
        .join(src.select(col("doc_id").as("doc_b"), col("source").as("sb")),
          Seq("doc_b"))
        .select(least(col("sa"), col("sb")).as("source_a"),
          greatest(col("sa"), col("sb")).as("source_b"))
        .groupBy(col("source_a"), col("source_b"))
        .agg(count(lit(1)).as("n_pairs"))
        .withColumn("cross_source", col("source_a") =!= col("source_b"))
    }),
    // Train/test contamination audit: near-dup pairs rolled up by the
    // SPLIT assignment of their endpoints — a cross-split cell
    // (train×test, train×val) is leakage the decontamination pass must
    // remove before eval numbers mean anything. Same LSH-bounded pair
    // frame + two narrow joins; the split comes from the identical
    // salted-hash cut as dataset_split (one source of truth).
    "split_leakage" -> ((s, d) => {
      val hv = expr("cast(conv(substring(md5(concat('split:', cast(doc_id as string))), 1, 12), 16, 10) as long)")
      val sp = docs(s, d).select(col("doc_id"),
        when(hv < TrainCut, "train").when(hv < ValCut, "val")
          .otherwise(lit("test")).as("split"))
      Dedup.minhashLshPairs(docsW(s, d)).select(col("doc_a"), col("doc_b"))
        .join(sp.select(col("doc_id").as("doc_a"), col("split").as("pa")),
          Seq("doc_a"))
        .join(sp.select(col("doc_id").as("doc_b"), col("split").as("pb")),
          Seq("doc_b"))
        .select(least(col("pa"), col("pb")).as("split_a"),
          greatest(col("pa"), col("pb")).as("split_b"))
        .groupBy(col("split_a"), col("split_b"))
        .agg(count(lit(1)).as("n_pairs"))
        .withColumn("cross_split", col("split_a") =!= col("split_b"))
    }),
    // Quality-vs-duplication calibration: per quality quintile, the
    // exact-duplicate rate — answers "does the quality gate already
    // remove the dup mass, or are the two filters orthogonal?" before
    // spending a dedup pass at corpus scale. Quintiles ride
    // Ranks.ntileByRange (no single-partition sort; size-adaptive, the
    // forced run takes the two-pass branch); the dup flag joins back
    // id-keyed; the output is 5 rows.
    "quality_dup" -> ((s, d) => {
      val q = TextOps.stats(docs(s, d)).select(col("doc_id"), col("quality_score"))
      val binned = Ranks.ntileByRange(q,
        Seq(col("quality_score"), col("doc_id")), 5, "q_bin")
      binned.join(Dedup.exact(docs(s, d)).select(col("doc_id"), col("is_duplicate")),
          Seq("doc_id"))
        .groupBy(col("q_bin"))
        .agg(count(lit(1)).as("n_docs"),
          count(when(col("is_duplicate"), 1)).as("n_dup"),
          Det.snap(count(when(col("is_duplicate"), 1)).cast("double") /
            count(lit(1)).cast("double"), 6).as("dup_rate"),
          Det.snap(Det.avgD(col("quality_score"), 6), 6).as("avg_quality"))
    }),
    // Deterministic per-epoch training shuffle: every (doc, epoch) gets
    // a reproducible random-looking position — the data-loader shuffle
    // made auditable at corpus scale (same order on every run, retry,
    // and engine; epoch-salted md5 keys decorrelate epochs). The global
    // order is ONE two-pass range rank over (epoch, key) —
    // Ranks.rowNumberByRange, no single-partition window even at E×
    // corpus size — and the per-epoch position is global_rn − epoch·N
    // (epochs are equal-sized by construction; N is one scalar count
    // job, the same cost class as the rank's own counts pass).
    "epoch_shuffle" -> ((s, d) => {
      val base = docs(s, d).select(col("doc_id"))
      val n = base.count()
      val ep = base
        .withColumn("epoch", explode(array((0 until ShuffleEpochs).map(lit): _*)))
        .withColumn("skey", md5(concat(lit("ep"), col("epoch").cast("string"),
          lit(":"), col("doc_id").cast("string"))))
      Ranks.rowNumberByRange(ep,
          Seq(col("epoch"), col("skey"), col("doc_id")), "grn")
        .select(col("doc_id"), col("epoch"), col("skey"),
          (col("grn") - col("epoch").cast("long") * n).as("position"))
    }),
    // Shingle document-frequency profile: the tuning audit behind every
    // Σdf²-bounded dedup operator — per ⌊log2 df⌋ bucket, how many
    // distinct 3-gram shingles sit there, their posting mass Σdf, and
    // their pair-generation mass Σdf² (the quantity the maxDf
    // stop-shingle cap bounds; a crawl-scale corpus reads the top
    // buckets off this table to SET maxDf). One inverted-index
    // aggregate + a ⌊log2⌋-sized re-aggregate; the log2 is integer-
    // exact via the binary string length (bin() is identical in both
    // engines — no float log anywhere).
    "shingle_profile" -> ((s, d) => {
      val dfs = Shingles.exploded(docs(s, d), 3)
        .groupBy(col("shingle")).agg(count(lit(1)).as("df"))
      dfs.groupBy((length(bin(col("df"))) - 1).cast("long").as("df_bucket"))
        .agg(count(lit(1)).as("n_shingles"),
          sum(col("df")).as("n_postings"),
          sum(col("df") * col("df")).as("df2_mass"))
    }),
    // Numeric histogram: fixed-width document-length bins per language
    // (integer bin arithmetic — exact; one partial/final aggregate).
    "doc_histogram" -> ((s, d) =>
      docs(s, d)
        .groupBy(col("lang"), expr("n_chars div 500").as("bin"))
        .agg(count(lit(1)).as("n_docs"),
          min(col("n_chars")).as("min_chars"), max(col("n_chars")).as("max_chars"))),
    // Near-dup pairs -> canonical clusters (min-id label propagation).
    "dedup_clusters" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      ConnectedComponents.clusters(Dedup.minhashLshPairs(docsW(s, d)), "doc_a", "doc_b")
        .select(col("id").as("doc_id"), col("cluster_id"))
        .withColumn("n_members",
          count(lit(1)).over(Window.partitionBy(col("cluster_id"))))
    }),
    // Data-quality profiling of the corpus table (no float columns: the
    // string rendering of ints/strings is engine-portable).
    "profile_docs" -> ((s, d) =>
      Profiler.stringProfile(docs(s, d), Seq("doc_id", "lang", "source", "n_chars"))),
    // Benchmark decontamination: training docs sharing word 5-grams with
    // the held-out "benchmark" source (src0 plays the eval set).
    "decontaminate" -> ((s, d) =>
      r6(Decontaminate.report(docs(s, d), col("source") === "src0"))),
    // End-to-end purge REPORT: every doc gets a verdict from the first
    // failing gate — near-dup (MinHash→LSH→connected components, only
    // the cluster-minimum survives), Gopher quality rules, language ID,
    // embedding linkage (documents⟕embeddings on the shared id space).
    // Four operator families composed in one contract query; the joins
    // are all doc-dimension-sized (one row per doc per side).
    "curation_report" -> ((s, d) => {
      val base = docsW(s, d)
      val clusters = ConnectedComponents
        .clusters(Dedup.minhashLshPairs(base), "doc_a", "doc_b")
        .select(col("id").as("doc_id"), col("cluster_id"))
      val lang = TextOps.langId(base).select(col("doc_id"), col("predicted_lang"))
      val quality = CorpusQueries.qualityRules(s, d)
        .select(col("doc_id"), col("keep").as("quality_keep"))
      val emb = VecQueries.vecs(s, d)
        .select(col("vec_id").as("doc_id"), lit(true).as("has_embedding"))
      base.select(col("doc_id"))
        .join(clusters, Seq("doc_id"), "left")
        .join(lang, Seq("doc_id"))
        .join(quality, Seq("doc_id"))
        .join(emb, Seq("doc_id"), "left")
        .select(col("doc_id"),
          (col("cluster_id").isNull || col("cluster_id") === col("doc_id"))
            .as("is_canonical"),
          col("quality_keep"), col("predicted_lang"),
          coalesce(col("has_embedding"), lit(false)).as("has_embedding"))
        .withColumn("verdict",
          when(!col("is_canonical"), "near_dup")
            .when(!col("quality_keep"), "low_quality")
            .when(col("predicted_lang") =!= "en", "non_en")
            .when(!col("has_embedding"), "no_embedding")
            .otherwise("keep"))
    }),
    // Composite curation pipeline: quality × language × dedup filters —
    // the canonical LLM-corpus cleaning pass, composed from the same ops.
    "boilerplate_detect" -> ((s, d) => {
      // Template/boilerplate detection — the curation pass that finds
      // repeated document openings (shared headers, scraped templates)
      // BEFORE they skew dedup and quality stats: group docs by their
      // first-BpfxTokens-token prefix, keep prefixes appearing ≥ 2
      // times, report doc counts, how many sources they span (a
      // cross-source prefix is template, not topical), and corpus
      // share. One explode-free scan (slice of the split array) + one
      // prefix-keyed aggregate; global top-k via TakeOrdered (the
      // survivor table is |distinct prefixes|-sized — unbounded at
      // corpus scale), rank window only on the ≤TopK serving frame.
      val pfx = array_join(
        slice(split(col("text"), " "), 1, BpfxTokens), " ")
      val base = docs(s, d).select(pfx.as("prefix"), col("source"))
      val tot = base.agg(count(lit(1)).as("n_total"))
      base.groupBy(col("prefix"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("source")).as("n_sources"))
        .filter(col("n_docs") >= 2)
        .orderBy(col("n_docs").desc, col("prefix")).limit(BpfxTopK)
        .withColumn("rk", row_number().over(org.apache.spark.sql.expressions
          .Window.orderBy(col("n_docs").desc, col("prefix"))).cast("long"))
        .crossJoin(broadcast(tot))
        .select(col("rk"), col("prefix"), col("n_docs"), col("n_sources"),
          Det.snap(col("n_docs").cast("double") /
            col("n_total").cast("double"), 6).as("doc_share"))
    }),
    "ks_drift" -> ((s, d) => {
      // Pairwise two-sample Kolmogorov–Smirnov over the doc-length
      // distribution of every source pair — the exact continuous
      // complement to dataset_drift's bucketed total-variation: D =
      // max_v |F_a(v) − F_b(v)| = max_v |c_a·n_b − c_b·n_a| / (n_a·n_b)
      // stays ALL-INTEGER until one final division of a non-negative
      // exact value. Shape: a DENSE |sources|×|distinct values| ECDF
      // grid (missing (source, value) cells must exist with the carried
      // cumulative count, or the ECDF compare is wrong), then a
      // per-VALUE pair join — |values|·|sources|² cells, never doc×doc.
      // For a truly continuous column at 100 TB, bucket first (as
      // dataset_drift does); n_chars is already integral. Envelope:
      // c·n < 2^63 holds to ~3e9 docs/source.
      val d0 = docs(s, d).select(col("source"), col("n_chars"))
      val counts = d0.groupBy(col("source"), col("n_chars"))
        .agg(count(lit(1)).as("m"))
      val vals = d0.select(col("n_chars")).distinct()
      val totals = d0.groupBy(col("source")).agg(count(lit(1)).as("n"))
      val grid = vals.crossJoin(broadcast(totals))
        .join(counts, Seq("source", "n_chars"), "left")
        .withColumn("m", coalesce(col("m"), lit(0L)))
      val cells = grid.withColumn("c", sum(col("m")).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("source")).orderBy(col("n_chars"))))
      val pairs = cells.as("a").join(cells.as("b"),
          col("a.n_chars") === col("b.n_chars") && col("a.source") < col("b.source"))
        .select(col("a.source").as("src_a"), col("b.source").as("src_b"),
          col("a.n").as("n_a"), col("b.n").as("n_b"),
          abs(col("a.c") * col("b.n") - col("b.c") * col("a.n")).as("num"))
      pairs.groupBy(col("src_a"), col("src_b"), col("n_a"), col("n_b"))
        .agg(max(col("num")).as("num"))
        .select(col("src_a"), col("src_b"), col("n_a"), col("n_b"),
          Det.snap(col("num").cast("double") /
            (col("n_a") * col("n_b")).cast("double"), 6).as("ks_d"))
    }),
    "quality_sweep" -> ((s, d) => {
      // Quality-threshold ablation curve — the tuning pass a curation
      // pipeline runs BEFORE fixing its filter cutoff: for each
      // candidate tau, how many docs/tokens survive and how good are
      // the survivors. ONE stats scan feeding ONE map-side-combined
      // aggregate that carries all |taus|·3 conditional sums (no
      // per-threshold re-scan, no explode multiplying the corpus); the
      // one-row result then unpivots to the curve. Per-row quality
      // doubles are bit-identical across engines (rational arithmetic),
      // so every tau-compare partitions docs identically; survivor
      // means go through the exact 1e-6 quality grid.
      val st = TextOps.stats(docs(s, d))
        .select(col("n_tokens"), col("quality_score"),
          Det.kl(col("quality_score"), 6).as("ql"))
      val aggExprs =
        count(lit(1)).as("n_docs") +: sum(col("n_tokens")).as("n_tok") +:
          QualityTaus.zipWithIndex.flatMap { case (t, i) => Seq(
            sum(when(col("quality_score") >= t, 1L)).as(s"k_$i"),
            sum(when(col("quality_score") >= t, col("n_tokens"))).as(s"kt_$i"),
            sum(when(col("quality_score") >= t, col("ql"))).as(s"kq_$i")) }
      val m = st.agg(aggExprs.head, aggExprs.tail: _*)
      val arms = QualityTaus.zipWithIndex.map { case (t, i) =>
        val k = coalesce(col(s"k_$i"), lit(0L))
        val kt = coalesce(col(s"kt_$i"), lit(0L))
        val kq = col(s"kq_$i")
        struct(lit(t).as("tau"),
          k.as("n_kept"),
          Det.snap(k.cast("double") / col("n_docs").cast("double"), 6)
            .as("retention"),
          when(col("n_tok") > 0,
            Det.snap(kt.cast("double") / col("n_tok").cast("double"), 6))
            .as("token_share"),
          when(k > 0, Det.snap(kq.cast("double") / lit(1e6) / col(s"k_$i"), 6))
            .as("avg_quality_kept"))
      }
      m.select(explode(array(arms: _*)).as("r")).select(col("r.*"))
    }),
    "corpus_clean" -> ((s, d) => {
      val base = docsW(s, d)
      r6(TextOps.stats(base))
        .join(TextOps.langId(base).select("doc_id", "predicted_lang"), Seq("doc_id"))
        .join(Dedup.exact(base).select("doc_id", "is_duplicate"), Seq("doc_id"))
        .filter(col("quality_score") >= 0.68 &&
          col("predicted_lang") === "en" && !col("is_duplicate"))
        .select(col("doc_id"), col("n_tokens"), col("n_subtokens"),
          col("predicted_lang"), col("quality_score"))
    })
  )

  // ---------------------------------------------------------------------
  // DuckDB oracle SQL
  // ---------------------------------------------------------------------

  private def inList(ws: Seq[String]): String =
    ws.map(w => s"'$w'").mkString("(", ", ", ")")

  /** len(list_filter(words, w -> w IN (...))) — duck twin of
    * TextOps.countIn. */
  private def nIn(ws: Seq[String]): String =
    s"len(list_filter(string_split(text, ' '), w -> w IN ${inList(ws)}))"

  /** Twin of TextOps.repetition: per-doc n-gram multiplicity via
    * unnest + two-level GROUP BY (the oracle may shuffle; the Spark side
    * deliberately does not). Fractions are one division of
    * BIGINT-converted exact counts, 6-dp snapped; NULL when the doc has
    * no n-gram of that order (LEFT JOIN keeps 1-token docs). */
  private val repetitionSql =
    s"""WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
ng AS (
  SELECT doc_id,
         list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1]) AS bgs,
         list_transform(range(1, len(ws) - 1),
                        i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]) AS tgs
  FROM w),
bc AS (
  SELECT doc_id, g, count(*) AS c
  FROM (SELECT doc_id, unnest(bgs) AS g FROM ng) GROUP BY 1, 2),
bs AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
         CAST(count(*) AS BIGINT) AS n_distinct_bigrams,
         CAST(max(c) AS BIGINT) AS top_bigram_count
  FROM bc GROUP BY 1),
tc AS (
  SELECT doc_id, g, count(*) AS c
  FROM (SELECT doc_id, unnest(tgs) AS g FROM ng) GROUP BY 1, 2),
ts AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_trigrams,
         CAST(sum(CASE WHEN c >= 2 THEN c ELSE 0 END) AS BIGINT)
           AS dup_trigram_count
  FROM tc GROUP BY 1)
SELECT d.doc_id,
       coalesce(bs.n_bigrams, 0) AS n_bigrams,
       coalesce(bs.n_distinct_bigrams, 0) AS n_distinct_bigrams,
       coalesce(bs.top_bigram_count, 0) AS top_bigram_count,
       ${s6("bs.top_bigram_count::DOUBLE / bs.n_bigrams::DOUBLE")}
         AS top_bigram_frac,
       coalesce(ts.n_trigrams, 0) AS n_trigrams,
       coalesce(ts.dup_trigram_count, 0) AS dup_trigram_count,
       ${s6("ts.dup_trigram_count::DOUBLE / ts.n_trigrams::DOUBLE")}
         AS dup_trigram_frac
FROM documents d
LEFT JOIN bs ON d.doc_id = bs.doc_id
LEFT JOIN ts ON d.doc_id = ts.doc_id"""

  /** Twin of the dataset_drift audit: same even/odd split, exact
    * |c_a·N_b − c_b·N_a| drift numerators (HUGEINT-safe sums), the same
    * left-associated TV finishing sequence, (drift DESC, word) top-10. */
  private val datasetDriftSql =
    s"""WITH words AS (
  SELECT (doc_id % 2 = 0) AS is_a, unnest(string_split(text, ' ')) AS word
  FROM documents),
wc AS (
  SELECT word,
         CAST(count(CASE WHEN is_a THEN 1 END) AS BIGINT) AS c_a,
         CAST(count(CASE WHEN NOT is_a THEN 1 END) AS BIGINT) AS c_b
  FROM words GROUP BY 1),
tot AS (
  SELECT CAST(sum(c_a) AS BIGINT) AS n_a, CAST(sum(c_b) AS BIGINT) AS n_b FROM wc),
scored AS (
  SELECT wc.word, wc.c_a, wc.c_b,
         abs(wc.c_a * tot.n_b - wc.c_b * tot.n_a) AS drift_num,
         tot.n_a, tot.n_b
  FROM wc CROSS JOIN tot),
tv AS (
  SELECT ${s6("CAST(sum(drift_num) AS DOUBLE) / (2.0 * CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))")} AS tv_distance
  FROM scored GROUP BY n_a, n_b)
SELECT rk, word, c_a, c_b, CAST(drift_num AS BIGINT) AS drift_num, tv.tv_distance
FROM (
  SELECT *, CAST(row_number() OVER (ORDER BY drift_num DESC, word) AS BIGINT) AS rk
  FROM scored)
CROSS JOIN tv
WHERE rk <= 10"""

  /** Twin of the dataset_split query: same salted 48-bit hash fraction
    * (CorpusQueries.hv48Sql re-parses the md5 nibbles Spark's conv
    * reads), same exact integer cuts, same share division. */
  private val datasetSplitSql =
    s"""WITH h AS (
  SELECT source,
         CAST(${CorpusQueries.hv48Sql("md5('split:' || CAST(doc_id AS VARCHAR))")} AS BIGINT) AS hv
  FROM documents),
a AS (
  SELECT source,
         CASE WHEN hv < $TrainCut THEN 'train'
              WHEN hv < $ValCut THEN 'val'
              ELSE 'test' END AS split
  FROM h),
c AS (SELECT source, split, count(*) AS n_docs FROM a GROUP BY 1, 2),
t AS (SELECT source, CAST(sum(n_docs) AS BIGINT) AS n_source FROM c GROUP BY 1)
SELECT c.source, c.split, c.n_docs,
       ${s6("CAST(c.n_docs AS DOUBLE) / CAST(t.n_source AS DOUBLE)")} AS share
FROM c JOIN t USING (source)"""

  /** Twin of the ngram_novelty query: distinct 3-gram shingles per doc
    * (Shingles.ofSql), corpus-wide first-seen doc per shingle, per-doc
    * novel fraction. Docs under 3 words have no shingles and are absent
    * on both sides. */
  private val ngramNoveltySql =
    s"""WITH sh AS (
  SELECT doc_id, ${Shingles.ofSql("text", 3)} AS sh FROM documents
), ex AS (
  SELECT doc_id, unnest(sh) AS shingle FROM sh
), fs AS (
  SELECT shingle, min(doc_id) AS first_doc FROM ex GROUP BY 1)
SELECT e.doc_id, count(*) AS n_shingles,
       CAST(count(CASE WHEN f.first_doc = e.doc_id THEN 1 END) AS BIGINT) AS n_novel,
       ${s6("CAST(count(CASE WHEN f.first_doc = e.doc_id THEN 1 END) AS DOUBLE) / CAST(count(*) AS DOUBLE)")} AS novelty
FROM ex e JOIN fs f USING (shingle)
GROUP BY e.doc_id"""

  /** Twin of TextOps.lexicalDiversity: per-doc word multiplicities via
    * unnest + GROUP BY (the oracle may shuffle; the Spark side is a
    * doc-local map). n_tokens = Σcᵢ ≡ the split length; each ratio is
    * one division of BIGINT-exact integers, 6-dp snapped; Simpson NULL
    * below two tokens (guards mirror the Spark Options — n = 0 cannot
    * occur since string_split('', ' ') is [''] in both engines, but the
    * guard is kept identical anyway). */
  private val lexicalDiversitySql =
    s"""WITH c AS (
  SELECT doc_id, word, count(*) AS c
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
  GROUP BY 1, 2),
agg AS (
  SELECT doc_id,
         CAST(sum(c) AS BIGINT) AS n_tokens,
         CAST(count(*) AS BIGINT) AS n_types,
         CAST(count(CASE WHEN c = 1 THEN 1 END) AS BIGINT) AS n_hapax,
         CAST(sum(c*(c-1)) AS BIGINT) AS coll
  FROM c GROUP BY 1)
SELECT doc_id, n_tokens, n_types, n_hapax,
       CASE WHEN n_tokens > 0
            THEN ${s6("n_types::DOUBLE / n_tokens::DOUBLE")} END AS ttr,
       CASE WHEN n_tokens > 0
            THEN ${s6("n_hapax::DOUBLE / n_tokens::DOUBLE")} END AS hapax_frac,
       CASE WHEN n_tokens >= 2
            THEN ${s6("(n_tokens*(n_tokens-1) - coll)::DOUBLE / (n_tokens*(n_tokens-1))::DOUBLE")}
       END AS simpson
FROM agg"""

  /** Twin of the importance_weights query: identical word-count algebra
    * in HUGEINT (DuckDB sums BIGINT exactly as HUGEINT; the final score
    * fits BIGINT by the envelope in the query's comment, so the closing
    * CAST is exact). */
  private val importanceWeightsSql =
    s"""WITH tok AS (
  SELECT doc_id, source, unnest(string_split(text, ' ')) AS w FROM documents),
wc AS (
  SELECT w, count(*) AS p_w,
         count(CASE WHEN source = '$TargetSource' THEN 1 END) AS t_w
  FROM tok GROUP BY 1),
tot AS (
  SELECT CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS p_total,
         CAST(sum(CASE WHEN source = '$TargetSource'
                       THEN len(string_split(text, ' ')) ELSE 0 END) AS BIGINT)
           AS t_total
  FROM documents)
SELECT tok.doc_id, tok.source, count(*) AS n_tokens,
       CAST(sum(wc.t_w * tot.p_total - wc.p_w * tot.t_total) AS BIGINT) AS score,
       CAST(sum(wc.t_w * tot.p_total - wc.p_w * tot.t_total) AS BIGINT) > 0
         AS upweight
FROM tok JOIN wc USING (w) CROSS JOIN tot
GROUP BY 1, 2"""

  /** Twin of TextOps.piiScrub over [[piiInjectedSql]]: same regexes
    * (shared Scala constants — character-class-only so Java regex and
    * RE2 agree), same redaction sequence, counts on the same stages. */
  private val piiScrubSql =
    s"""WITH pii AS ($piiInjectedSql),
r1 AS (
  SELECT doc_id, text,
         regexp_replace(text, '${TextOps.emailRe}', '[EMAIL]', 'g') AS after_email
  FROM pii),
r2 AS (
  SELECT *, regexp_replace(after_email, '${TextOps.ipRe}', '[IP]', 'g') AS after_ip
  FROM r1),
r3 AS (
  SELECT *, regexp_replace(after_ip, '${TextOps.phoneRe}', '[PHONE]', 'g') AS after_phone
  FROM r2)
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '${TextOps.emailRe}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(after_email, '${TextOps.ipRe}')) AS BIGINT) AS n_ips,
       CAST(len(regexp_extract_all(after_ip, '${TextOps.phoneRe}')) AS BIGINT) AS n_phones,
       CAST(length(after_phone) AS BIGINT) AS redacted_len,
       md5(after_phone) AS redacted_md5
FROM r3"""

  private[queries] val statsSql = {
    val q =
      """(least(n_tokens, 100)::DOUBLE / 100) * 0.3 +
         (n_distinct_tokens::DOUBLE / n_tokens::DOUBLE) * 0.3 +
         (1.0 - n_stopwords::DOUBLE / n_tokens::DOUBLE) * 0.2 +
         least(1.0, n_vowels::DOUBLE * 5 / n_chars::DOUBLE) * 0.2"""
    s"""WITH st AS (
  SELECT doc_id,
         length(text) AS n_chars,
         len(string_split(text, ' ')) AS n_tokens,
         len(list_distinct(string_split(text, ' '))) AS n_distinct_tokens,
         ${nIn(TextOps.stopwords)} AS n_stopwords,
         length(text) - length(regexp_replace(text, '[aeiou]', '', 'g')) AS n_vowels,
         strlen(text) - length(text) AS n_multibyte,
         len(regexp_extract_all(text, '${TextOps.subtokenPattern}')) AS n_subtokens
  FROM documents)
SELECT doc_id, n_chars, n_tokens, n_distinct_tokens, n_stopwords, n_vowels,
       n_multibyte, n_subtokens, ${s6(q)} AS quality_score
FROM st"""
  }

  private[queries] val langIdSql = {
    val ps = TextOps.langProfiles
    val scoreCols = ps.zipWithIndex
      .map { case ((_, ws), i) => s"${nIn(ws)} AS s$i" }.mkString(",\n         ")
    // Mirrors TextOps.langId's fold: lang i wins iff its score is > 0,
    // strictly beats every earlier profile and >= every later one
    // (first-of-max wins); zh on any multibyte content; fallback en.
    val cases = ps.zipWithIndex.map { case ((l, _), i) =>
      val conds = Seq(s"s$i > 0") ++
        (0 until i).map(j => s"s$i > s$j") ++
        (i + 1 until ps.size).map(j => s"s$i >= s$j")
      s"WHEN ${conds.mkString(" AND ")} THEN '$l'"
    }.mkString("\n            ")
    s"""WITH sc AS (
  SELECT doc_id, lang,
         strlen(text) - length(text) AS mb,
         $scoreCols
  FROM documents)
SELECT doc_id, lang AS label_lang,
       CASE WHEN mb > 0 THEN 'zh'
            $cases
            ELSE 'en' END AS predicted_lang,
       CAST(greatest(${ps.indices.map(i => s"s$i").mkString(", ")}) AS BIGINT) AS top_score
FROM sc"""
  }

  private val fingerprintSql =
    s"""WITH sh AS (
  SELECT doc_id, md5(text) AS text_md5, ${Shingles.ofSql("text", 3)} AS sh
  FROM documents)
SELECT doc_id, text_md5, len(sh) AS n_shingles,
       list_min([md5(s) for s in sh]) AS min_shingle_md5,
       list_max([md5(s) for s in sh]) AS max_shingle_md5
FROM sh"""

  private[queries] val dedupExactSql =
    """SELECT doc_id, md5(text) AS text_md5,
       min(doc_id) OVER (PARTITION BY md5(text)) AS canonical_id,
       count(*) OVER (PARTITION BY md5(text)) AS group_size,
       doc_id <> min(doc_id) OVER (PARTITION BY md5(text)) AS is_duplicate
FROM documents"""

  /** Shared inverted-index pair-count CTE prefix (twin of
    * Dedup.pairCounts), ending in `pairs(doc_a, doc_b, sz_a, sz_b,
    * intersection)` — the Jaccard and containment twins both build on
    * it, mirroring the Spark-side factoring. */
  private val pairCountsSqlBase =
    s"""WITH sh AS (
  SELECT doc_id, ${Shingles.ofSql("text", 3)} AS sh FROM documents
), ex AS (
  SELECT doc_id, len(sh) AS sz, unnest(sh) AS shingle FROM sh
), capped AS (
  SELECT * FROM (
    SELECT *, count(*) OVER (PARTITION BY shingle) AS df FROM ex)
  WHERE df <= 500
), pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.sz AS sz_a, b.sz AS sz_b,
         count(*) AS intersection
  FROM capped a JOIN capped b
    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2, 3, 4)"""

  /** Shared pair-with-jaccard subquery (twin of Dedup.pairsJaccard) —
    * the top-k query wraps it with ORDER/LIMIT, the recall eval with a
    * threshold filter. */
  private val jaccardPairsSqlBase =
    s"""$pairCountsSqlBase
SELECT doc_a, doc_b, intersection,
       sz_a + sz_b - intersection AS union_size,
       ${s6("intersection::DOUBLE / (sz_a + sz_b - intersection)::DOUBLE")} AS jaccard
FROM pairs"""

  /** Twin of Dedup.containmentPairs: both directed containments from
    * the same pair counts; kept when either direction reaches
    * [[ContainTau]] (compared against the identical double via
    * Det.dblLit). */
  private val containmentSql =
    s"""$pairCountsSqlBase
SELECT doc_a, doc_b, intersection, sz_a, sz_b, containment_a, containment_b
FROM (
  SELECT doc_a, doc_b, intersection, sz_a, sz_b,
         ${s6("intersection::DOUBLE / sz_a::DOUBLE")} AS containment_a,
         ${s6("intersection::DOUBLE / sz_b::DOUBLE")} AS containment_b
  FROM pairs)
WHERE greatest(containment_a, containment_b) >= ${Det.dblLit(ContainTau)}"""

  private val dedupJaccardSql =
    s"""$jaccardPairsSqlBase
ORDER BY jaccard DESC, doc_a, doc_b
LIMIT 50"""

  /** Twin of Dedup.minhashLshPairs at any (numHashes, bands) geometry —
    * same md5-slice min-hashes, same '|'-joined band keys. The fixed
    * contract twin [[dedupMinhashSql]] and the dedup_sweep grid both
    * instantiate this one builder (the sweep's chains share ONE
    * signature CTE via [[bandedPairsFromSigs]] instead). */
  private def dedupMinhashSqlFor(numHashes: Int, bands: Int): String = {
    require(numHashes % bands == 0 && numHashes % 4 == 0)
    val rows = numHashes / bands
    val mins = (0 until numHashes)
      .map(h => s"min(substring(md5('${h / 4}:' || shingle), ${(h % 4) * 8 + 1}, 8)) AS m$h")
      .mkString(",\n         ")
    val bandCase = (0 until bands).map { i =>
      val key = (0 until rows).map(r => s"m${i * rows + r}").mkString(" || '|' || ")
      s"WHEN b.idx = $i THEN md5($key)"
    }.mkString("\n              ")
    val eqs = (0 until numHashes)
      .map(h => s"CASE WHEN a.m$h = b.m$h THEN 1 ELSE 0 END AS eq$h")
      .mkString(",\n         ")
    val agree = (0 until numHashes).map(h => s"eq$h").mkString(" + ")
    s"""WITH sh AS (
  SELECT doc_id, ${Shingles.ofSql("text", 3)} AS sh FROM documents
), sigs AS (
  SELECT doc_id,
         $mins
  FROM (SELECT doc_id, unnest(sh) AS shingle FROM sh)
  GROUP BY doc_id
), banded AS MATERIALIZED (
  SELECT s.*, b.idx AS band_idx,
         CASE $bandCase END AS band_key
  FROM sigs s, (SELECT unnest([${(0 until bands).mkString(", ")}]) AS idx) b
), bok AS MATERIALIZED (
  -- stop-band cap (Dedup.LshMaxBucket twin): keys with a bucket past
  -- the cap are non-discriminative boilerplate collisions, excluded
  -- from pair generation on BOTH engines
  SELECT band_idx, band_key FROM banded GROUP BY 1, 2
  HAVING count(*) BETWEEN 2 AND ${graft.ops.Dedup.LshMaxBucket}
), bj AS (
  SELECT a.* FROM banded a JOIN bok k
    ON a.band_idx = k.band_idx AND a.band_key = k.band_key
), cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         $eqs
  FROM bj a JOIN bj b
    ON a.band_idx = b.band_idx AND a.band_key = b.band_key
   AND a.doc_id < b.doc_id)
SELECT doc_a, doc_b, CAST($agree AS BIGINT) AS n_agree,
       ${s6(s"($agree)::DOUBLE / $numHashes")} AS est_jaccard
FROM cand"""
  }

  private[queries] val dedupMinhashSql = dedupMinhashSqlFor(8, 2)

  /** Twin of dedup_delta: the dedupMinhashSqlFor banding chain with the
    * delta-touch predicate in the candidate join and the new_a/new_b
    * flags carried out. */
  private val dedupDeltaSql = {
    val numHashes = 8; val bands = 2
    val rows = numHashes / bands
    val mins = (0 until numHashes)
      .map(h => s"min(substring(md5('${h / 4}:' || shingle), ${(h % 4) * 8 + 1}, 8)) AS m$h")
      .mkString(",\n         ")
    val bandCase = (0 until bands).map { i =>
      val key = (0 until rows).map(r => s"m${i * rows + r}").mkString(" || '|' || ")
      s"WHEN b.idx = $i THEN md5($key)"
    }.mkString("\n              ")
    val eqs = (0 until numHashes)
      .map(h => s"CASE WHEN a.m$h = b.m$h THEN 1 ELSE 0 END AS eq$h")
      .mkString(",\n         ")
    val agree = (0 until numHashes).map(h => s"eq$h").mkString(" + ")
    s"""WITH sh AS (
  SELECT doc_id, ${Shingles.ofSql("text", 3)} AS sh FROM documents
), sigs AS (
  SELECT doc_id,
         $mins
  FROM (SELECT doc_id, unnest(sh) AS shingle FROM sh)
  GROUP BY doc_id
), banded AS MATERIALIZED (
  SELECT s.*, b.idx AS band_idx,
         CASE $bandCase END AS band_key
  FROM sigs s, (SELECT unnest([${(0 until bands).mkString(", ")}]) AS idx) b
), bok AS MATERIALIZED (
  -- stop-band cap, mirroring Dedup.LshMaxBucket (see dedupMinhashSqlFor)
  SELECT band_idx, band_key FROM banded GROUP BY 1, 2
  HAVING count(*) BETWEEN 2 AND ${graft.ops.Dedup.LshMaxBucket}
), bj AS (
  SELECT a.* FROM banded a JOIN bok k
    ON a.band_idx = k.band_idx AND a.band_key = k.band_key
), cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         (a.doc_id % 5 = 0) AS new_a, (b.doc_id % 5 = 0) AS new_b,
         $eqs
  FROM bj a JOIN bj b
    ON a.band_idx = b.band_idx AND a.band_key = b.band_key
   AND a.doc_id < b.doc_id
   AND (a.doc_id % 5 = 0 OR b.doc_id % 5 = 0))
SELECT doc_a, doc_b, new_a, new_b, CAST($agree AS BIGINT) AS n_agree,
       ${s6(s"($agree)::DOUBLE / $numHashes")} AS est_jaccard
FROM cand"""
  }

  /** Shared SimHash fingerprint CTE chain (twin of Dedup.simhash's
    * fingerprint computation) ending in `fp(doc_id, simhash)`. */
  private val simhashFpSqlBase = {
    val bits = 16
    def hv(c: String) = s"(strpos('0123456789abcdef', $c) - 1)"
    val v16 =
      s"""((${hv("substring(h4, 1, 1)")} * 16 + ${hv("substring(h4, 2, 1)")}) * 16 +
          ${hv("substring(h4, 3, 1)")}) * 16 + ${hv("substring(h4, 4, 1)")}"""
    val sums = (0 until bits)
      .map(j => s"CAST(sum(((v >> $j) & 1) * 2 - 1) AS BIGINT) AS s$j")
      .mkString(",\n         ")
    val fp = (0 until bits)
      .map(j => s"(CASE WHEN s$j > 0 THEN ${1L << j} ELSE 0 END)")
      .mkString(" + ")
    s"""WITH pw AS (
  SELECT doc_id, substring(md5(word), 1, 4) AS h4
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
), pv AS (
  SELECT doc_id, CAST($v16 AS BIGINT) AS v FROM pw
), sums AS (
  SELECT doc_id,
         $sums
  FROM pv GROUP BY doc_id
), fp AS (
  SELECT doc_id, CAST($fp AS BIGINT) AS simhash FROM sums)"""
  }

  private val dedupSimhashSql =
    s"""$simhashFpSqlBase
SELECT doc_id, simhash,
       min(doc_id) OVER (PARTITION BY simhash) AS canonical_id,
       count(*) OVER (PARTITION BY simhash) AS cluster_size
FROM fp"""

  /** Twin of Dedup.simhashHamming at the contract knobs (16 bits,
    * Hamming ≤ [[HammingMax]]): the BRUTE-FORCE quadratic over the same
    * fingerprints. The Spark side only ever compares within pigeonhole
    * buckets — hash-equality of the two sides proves the banding has no
    * false negatives on the live corpus, not just on spec fixtures. */
  private val simhashHammingSql =
    s"""$simhashFpSqlBase
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
FROM fp a JOIN fp b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= $HammingMax"""

  private val multimodalFeaturesSql = {
    def nib(i: Int) = s"(strpos('0123456789abcdef', substring(md5(text), $i, 1)) - 1)"
    s"""SELECT doc_id,
       'application/octet-stream' AS media_type,
       strlen(text) AS n_bytes,
       md5(text) AS checksum_md5,
       CAST(16 + ${nib(1)} * 16 + ${nib(2)} AS BIGINT) AS width,
       CAST(16 + ${nib(3)} * 16 + ${nib(4)} AS BIGINT) AS height,
       (strlen(text) + 63) // 64 AS n_frames
FROM documents"""
  }

  /** DuckDB twin of Multimodal.decodeFrames ∘ toBlobTable: the payload is
    * the UTF-8 bytes of `text` (hex(encode(text)) — byte-exact even for
    * multibyte content), frames are FrameBytes-sized hex spans, every
    * SampleEvery-th kept, and each byte is re-parsed from its two hex
    * digits. mean_byte = exactInt/exactInt (correctly rounded in both
    * engines); pos_checksum = Σ (j+1)·byte(j), exact BIGINT. */
  private val multimodalDecodeSql = {
    val fb = FrameBytes
    s"""WITH f AS (
  SELECT doc_id, hex(encode(text)) AS hx, strlen(text) AS n FROM documents
), fr AS (
  SELECT doc_id, n, hx,
         unnest(range(0, CAST((n + ${fb - 1}) // $fb AS BIGINT))) AS i
  FROM f
), frames AS (
  SELECT doc_id, CAST(i AS BIGINT) AS frame_idx,
         CAST(least($fb, n - i*$fb) AS BIGINT) AS n_bytes,
         substring(hx, CAST(${2 * fb}*i + 1 AS INTEGER), ${2 * fb}) AS fhx
  FROM fr WHERE i % $SampleEvery = 0
), byt AS (
  SELECT doc_id, frame_idx, n_bytes,
         unnest(range(0, CAST(n_bytes AS BIGINT))) AS j, fhx
  FROM frames
), bv AS (
  SELECT doc_id, frame_idx, n_bytes, j,
         (strpos('0123456789ABCDEF', substring(fhx, CAST(2*j+1 AS INTEGER), 1)) - 1) * 16
       + (strpos('0123456789ABCDEF', substring(fhx, CAST(2*j+2 AS INTEGER), 1)) - 1) AS b
  FROM byt
)
SELECT doc_id, frame_idx, n_bytes,
       CAST(sum(b) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mean_byte,
       CAST(max(b) AS INTEGER) AS max_byte,
       CAST(min(b) AS INTEGER) AS min_byte,
       CAST(sum((j + 1) * b) AS BIGINT) AS pos_checksum
FROM bv GROUP BY 1, 2, 3"""
  }

  /** Twin of [[Multimodal.resizePool]]: the same hex byte replay as the
    * decode twin, bucketed by the ⌊i·P/n⌋ downsample index map; exact
    * integer sums, one snapped division per bucket. */
  private val multimodalResizeSql = {
    val P = PoolBuckets
    s"""WITH f AS (
  SELECT doc_id, hex(encode(text)) AS hx, strlen(text) AS n FROM documents
  WHERE strlen(text) > 0
), byt AS (
  SELECT doc_id, n, unnest(range(0, CAST(n AS BIGINT))) AS i, hx
  FROM f
), bv AS (
  SELECT doc_id, CAST((i * $P) // n AS BIGINT) AS bucket,
         (strpos('0123456789ABCDEF', substring(hx, CAST(2*i+1 AS INTEGER), 1)) - 1) * 16
       + (strpos('0123456789ABCDEF', substring(hx, CAST(2*i+2 AS INTEGER), 1)) - 1) AS b
  FROM byt
)
SELECT doc_id, bucket, CAST(count(*) AS BIGINT) AS n_in,
       CAST(sum(b) AS BIGINT) AS sum_bytes,
       ${s6("CAST(sum(b) AS DOUBLE) / CAST(count(*) AS DOUBLE)")} AS mean_byte
FROM bv GROUP BY 1, 2"""
  }

  /** Twin of multimodal_bilinear: the identical exact-rational algebra —
    * num = (2j+1)·n − P on the 1/(2P) grid, i0/frac via integer div/mod
    * with the same edge clamps, bytes replayed from the hex payload, and
    * the single numerator/2P division snapped on the shared grid. */
  private val multimodalBilinearSql = {
    val P = BilinearSamples
    val twoP = 2 * P
    def byteAt(i: String) = // payload byte at 0-based index i, from hex
      s"""((strpos('0123456789ABCDEF', substring(hx, CAST(2*($i)+1 AS INTEGER), 1)) - 1) * 16
       + (strpos('0123456789ABCDEF', substring(hx, CAST(2*($i)+2 AS INTEGER), 1)) - 1))"""
    s"""WITH f AS (
  SELECT doc_id, hex(encode(text)) AS hx, strlen(text) AS n FROM documents
  WHERE strlen(text) > 0
), s AS (
  SELECT doc_id, hx, CAST(n AS BIGINT) AS n,
         unnest(range(0, $P)) AS j
  FROM f
), c AS (
  SELECT doc_id, hx, n, j, (2*j + 1) * n - $P AS num FROM s
), g AS (
  SELECT doc_id, hx, n, j,
         CASE WHEN num < 0 THEN 0
              WHEN num // $twoP >= n - 1 THEN n - 1
              ELSE num // $twoP END AS i0,
         CASE WHEN num < 0 OR num // $twoP >= n - 1 THEN 0
              ELSE num % $twoP END AS r
  FROM c
), v AS (
  SELECT doc_id, j, i0, r,
         ${byteAt("i0")} * ($twoP - r)
       + ${byteAt(s"LEAST(i0 + 1, n - 1)")} * r AS numer
  FROM g
)
SELECT doc_id, CAST(j AS BIGINT) AS sample_idx, CAST(i0 AS BIGINT) AS src_idx,
       CAST(r AS BIGINT) AS frac_num, CAST(numer AS BIGINT) AS value_num,
       ${s6(s"CAST(numer AS DOUBLE) / $twoP.0")} AS value
FROM v"""
  }

  /** Twin of the curation_report composition: the same four gates, the
    * same first-failure verdict, reusing each family's oracle SQL.
    * Lazy: CorpusQueries references this object back (source_mixture ←
    * dedupExactSql) — see the note there. */
  private lazy val curationReportSql =
    s"""WITH lang AS (${langIdSql}),
q AS (${CorpusQueries.qualityRulesSql}),
emb AS (SELECT vec_id AS doc_id, TRUE AS has_embedding FROM embeddings)
SELECT d.doc_id,
       (cc.cluster_id IS NULL OR cc.cluster_id = d.doc_id) AS is_canonical,
       q.keep AS quality_keep,
       lang.predicted_lang,
       coalesce(emb.has_embedding, FALSE) AS has_embedding,
       CASE WHEN NOT (cc.cluster_id IS NULL OR cc.cluster_id = d.doc_id) THEN 'near_dup'
            WHEN NOT q.keep THEN 'low_quality'
            WHEN lang.predicted_lang <> 'en' THEN 'non_en'
            WHEN NOT coalesce(emb.has_embedding, FALSE) THEN 'no_embedding'
            ELSE 'keep' END AS verdict
FROM documents d
LEFT JOIN (${ConnectedComponents.clustersSql(dedupMinhashSql, "doc_a", "doc_b")}) cc
  ON cc.id = d.doc_id
JOIN lang ON lang.doc_id = d.doc_id
JOIN q ON q.doc_id = d.doc_id
LEFT JOIN emb ON emb.doc_id = d.doc_id"""

  private val corpusCleanSql =
    s"""SELECT s1.doc_id, s1.n_tokens, s1.n_subtokens, s2.predicted_lang, s1.quality_score
FROM ($statsSql) s1
JOIN ($langIdSql) s2 USING (doc_id)
JOIN ($dedupExactSql) s3 USING (doc_id)
WHERE s1.quality_score >= 0.68 AND s2.predicted_lang = 'en' AND NOT s3.is_duplicate"""

  /** Twin of lang_confusion: the langId twin aggregated to the
    * |langs|²-cell confusion matrix, label totals via a window. */
  private val langConfusionSql =
    s"""WITH lang AS ($langIdSql),
cm AS (
  SELECT label_lang, predicted_lang, count(*) AS n_docs
  FROM lang GROUP BY 1, 2)
SELECT label_lang, predicted_lang, n_docs, label_total,
       ${s6("CAST(n_docs AS DOUBLE) / CAST(label_total AS DOUBLE)")} AS share
FROM (SELECT *, CAST(sum(n_docs) OVER (PARTITION BY label_lang) AS BIGINT) AS label_total
      FROM cm)"""

  /** Twin of epoch_shuffle: same epoch-salted md5 keys; the per-epoch
    * row_number equals the Spark side's global-rank-minus-offset because
    * epochs are equal-sized and lead the total order. */
  private val epochShuffleSql =
    s"""WITH ep AS (
  SELECT doc_id, epoch,
         md5('ep' || CAST(epoch AS VARCHAR) || ':' || CAST(doc_id AS VARCHAR)) AS skey
  FROM documents, (SELECT unnest([${(0 until ShuffleEpochs).mkString(",")}]) AS epoch) e)
SELECT doc_id, epoch, skey,
       CAST(row_number() OVER (PARTITION BY epoch ORDER BY skey, doc_id) AS BIGINT) AS position
FROM ep"""

  /** Pairs-only banding chain over a shared max-width `sigs` CTE — the
    * oracle form of the Spark side's lshPairsOfSigs prefix property
    * (an h-hash config reads a prefix of the widest signature frame):
    * per config only the banding projection (3 columns), the stop-band
    * cap, and the bucket pair join re-run; the corpus-wide shingle +
    * min-hash pass is computed ONCE (before r15 each config CTE
    * re-embedded it — 4 corpus-scale passes, the dominant share of the
    * sweep oracle's 100×-tier spill). */
  private def bandedPairsFromSigs(numHashes: Int, bands: Int, i: Int): String = {
    val rows = numHashes / bands
    val bandCase = (0 until bands).map { b =>
      val key = (0 until rows).map(r => s"m${b * rows + r}").mkString(" || '|' || ")
      s"WHEN b.idx = $b THEN md5($key)"
    }.mkString("\n              ")
    s"""bd$i AS MATERIALIZED (
  SELECT s.doc_id, b.idx AS band_idx,
         CASE $bandCase END AS band_key
  FROM sigs s, (SELECT unnest([${(0 until bands).mkString(", ")}]) AS idx) b
), bok$i AS MATERIALIZED (
  SELECT band_idx, band_key FROM bd$i GROUP BY 1, 2
  HAVING count(*) BETWEEN 2 AND ${graft.ops.Dedup.LshMaxBucket}
), bj$i AS (
  SELECT a.* FROM bd$i a JOIN bok$i k
    ON a.band_idx = k.band_idx AND a.band_key = k.band_key
), c$i AS MATERIALIZED (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bj$i a JOIN bj$i b
    ON a.band_idx = b.band_idx AND a.band_key = b.band_key
   AND a.doc_id < b.doc_id)"""
  }

  /** One dedup_sweep oracle statement over an arbitrary sub-grid of
    * [[SweepConfigs]]: ONE materialized signature frame at the
    * sub-grid's max(numHashes), one [[bandedPairsFromSigs]] chain per
    * config, per-config scalar counts, UNION ALL of the rows. (The
    * truth frame stays materialized — referenced 2× per config.)
    *
    * Decomposability (r15 verdict #1): each config's output row depends
    * only on the shared truth frame and its OWN banding chain — and a
    * min-hash slice m_h is width-independent — so
    * `sqlFor(Seq(cfg))` produces bit-identical rows to the full
    * statement's cfg rows. The full 4-chain statement needs ~85 GB of
    * DuckDB temp at the 100× docs_zipf tier (over the ~74 GB spill
    * ceiling); the per-geometry parts each fit, and their union IS the
    * full result — [[dedupSweepSqlParts]] ships them through Verify's
    * oracle_parts.json for check_oracle's --parts mode. */
  private def dedupSweepSqlFor(cfgs: Seq[(Int, Int)]): String = {
    val maxH = cfgs.map(_._1).max
    val mins = (0 until maxH)
      .map(h => s"min(substring(md5('${h / 4}:' || shingle), ${(h % 4) * 8 + 1}, 8)) AS m$h")
      .mkString(",\n         ")
    val cfgCtes = cfgs.zipWithIndex
      .map { case ((h, b), i) => bandedPairsFromSigs(h, b, i) }.mkString(",\n")
    val rows = cfgs.zipWithIndex.map { case ((h, b), i) =>
      s"""SELECT $h AS num_hashes, $b AS bands, tt.n_truth,
       (SELECT count(*) FROM c$i) AS n_candidates,
       (SELECT count(*) FROM c$i JOIN truth USING (doc_a, doc_b)) AS n_hits
FROM tt"""
    }.mkString("\nUNION ALL\n")
    s"""WITH sigs AS MATERIALIZED (
  SELECT doc_id,
         $mins
  FROM (SELECT doc_id, unnest(${Shingles.ofSql("text", 3)}) AS shingle
        FROM documents)
  GROUP BY doc_id
), truth AS MATERIALIZED (
  SELECT doc_a, doc_b FROM ($jaccardPairsSqlBase)
  WHERE jaccard >= ${Det.dblLit(RecallTau)}
),
$cfgCtes,
tt AS (SELECT count(*) AS n_truth FROM truth)
SELECT num_hashes, bands, n_truth, n_candidates, n_hits,
       CASE WHEN n_candidates > 0
            THEN ${s6("CAST(n_hits AS DOUBLE) / CAST(n_candidates AS DOUBLE)")}
       END AS precision_lsh,
       CASE WHEN n_truth > 0
            THEN ${s6("CAST(n_hits AS DOUBLE) / CAST(n_truth AS DOUBLE)")}
       END AS recall_lsh
FROM ($rows)"""
  }

  /** Twin of dedup_sweep — the full grid in one statement (the
    * contract-gate form; see [[dedupSweepSqlFor]]). */
  private val dedupSweepSql = dedupSweepSqlFor(SweepConfigs)

  /** Per-geometry decomposition of [[dedupSweepSql]] whose row union
    * equals the full statement — the capacity-bound 100×-tier grading
    * path (each part re-pays the shared truth/signature pass but fits
    * the spill ceiling alone). */
  private[graft] val dedupSweepSqlParts: Seq[String] =
    SweepConfigs.map(c => dedupSweepSqlFor(Seq(c)))

  /** Twin of dedup_keep_best: the cluster twin left-joined onto the id
    * space (singletons self-cluster), quality from the stats twin, same
    * (quality DESC, doc_id) pick. */
  private val dedupKeepBestSql =
    s"""WITH cl AS (
  SELECT id AS doc_id, cluster_id
  FROM (${ConnectedComponents.clustersSql(dedupMinhashSql, "doc_a", "doc_b")}) cc
), q AS (SELECT doc_id, quality_score FROM ($statsSql) st),
j AS (
  SELECT d.doc_id, coalesce(cl.cluster_id, d.doc_id) AS cluster_id,
         q.quality_score
  FROM documents d
  LEFT JOIN cl ON cl.doc_id = d.doc_id
  JOIN q ON q.doc_id = d.doc_id)
SELECT doc_id, cluster_id, ${s6("quality_score")} AS quality_score,
       rk = 1 AS keep
FROM (SELECT *, row_number() OVER (PARTITION BY cluster_id
              ORDER BY quality_score DESC, doc_id) AS rk
      FROM j)"""

  /** Twin of quality_corr: the stats twin's integer signals through the
    * same Det.corrD pairs. */
  private val qualityCorrSql =
    s"""WITH st AS ($statsSql),
sig AS (
  SELECT CAST(n_tokens AS DOUBLE) AS t,
         CAST(n_distinct_tokens AS DOUBLE) AS u,
         CAST(n_stopwords AS DOUBLE) AS w,
         CAST(n_chars AS DOUBLE) AS c
  FROM st)
SELECT count(*) AS n_docs,
       ${s6(Det.corrDSql("t", "u", 2))} AS corr_tokens_distinct,
       ${s6(Det.corrDSql("t", "w", 2))} AS corr_tokens_stop,
       ${s6(Det.corrDSql("t", "c", 2))} AS corr_tokens_chars,
       ${s6(Det.corrDSql("u", "w", 2))} AS corr_distinct_stop,
       ${s6(Det.corrDSql("u", "c", 2))} AS corr_distinct_chars,
       ${s6(Det.corrDSql("w", "c", 2))} AS corr_stop_chars
FROM sig"""

  /** Twin of dedup_verify: the banding twin's pairs + DuckDB's
    * levenshtein (same DP definition as Spark's), same 20% budget. */
  private val dedupVerifySql =
    s"""WITH p AS (SELECT doc_a, doc_b, est_jaccard FROM ($dedupMinhashSql)),
t AS (SELECT doc_id, text FROM documents)
SELECT p.doc_a, p.doc_b, p.est_jaccard,
       CAST(levenshtein(ta.text, tb.text) AS BIGINT) AS lev_dist,
       CAST(greatest(length(ta.text), length(tb.text)) AS BIGINT) AS max_len,
       CAST(levenshtein(ta.text, tb.text) AS BIGINT) * 5 <=
         CAST(greatest(length(ta.text), length(tb.text)) AS BIGINT) AS verified
FROM p
JOIN t ta ON ta.doc_id = p.doc_a
JOIN t tb ON tb.doc_id = p.doc_b"""

  /** Twin of dedup_sources: the MinHash-banding pair twin joined to the
    * source map on both endpoints, least/greatest-canonicalized. */
  private val dedupSourcesSql =
    s"""WITH p AS (SELECT doc_a, doc_b FROM ($dedupMinhashSql)),
s AS (SELECT doc_id, source FROM documents),
j AS (
  SELECT least(sa.source, sb.source) AS source_a,
         greatest(sa.source, sb.source) AS source_b
  FROM p
  JOIN s sa ON sa.doc_id = p.doc_a
  JOIN s sb ON sb.doc_id = p.doc_b)
SELECT source_a, source_b, count(*) AS n_pairs,
       source_a <> source_b AS cross_source
FROM j GROUP BY 1, 2"""

  /** Twin of split_leakage: the same salted-hash split cut as
    * dataset_split, applied to both pair endpoints. */
  private val splitLeakageSql =
    s"""WITH p AS (SELECT doc_a, doc_b FROM ($dedupMinhashSql)),
sp AS (
  SELECT doc_id,
         CASE WHEN hv < $TrainCut THEN 'train'
              WHEN hv < $ValCut THEN 'val'
              ELSE 'test' END AS split
  FROM (SELECT doc_id,
               CAST(${CorpusQueries.hv48Sql("md5('split:' || CAST(doc_id AS VARCHAR))")} AS BIGINT) AS hv
        FROM documents)),
j AS (
  SELECT least(sa.split, sb.split) AS split_a,
         greatest(sa.split, sb.split) AS split_b
  FROM p
  JOIN sp sa ON sa.doc_id = p.doc_a
  JOIN sp sb ON sb.doc_id = p.doc_b)
SELECT split_a, split_b, count(*) AS n_pairs,
       split_a <> split_b AS cross_split
FROM j GROUP BY 1, 2"""

  /** Twin of quality_dup: quality quintiles via the window ntile the
    * two-pass rank is bit-equal to, dup flags from the exact-dedup twin. */
  private val qualityDupSql =
    s"""WITH st AS ($statsSql),
b AS (
  SELECT doc_id, quality_score,
         CAST(ntile(5) OVER (ORDER BY quality_score, doc_id) AS BIGINT) AS q_bin
  FROM st),
d AS (SELECT doc_id, is_duplicate FROM ($dedupExactSql))
SELECT q_bin, count(*) AS n_docs,
       count(CASE WHEN is_duplicate THEN 1 END) AS n_dup,
       ${s6("CAST(count(CASE WHEN is_duplicate THEN 1 END) AS DOUBLE) / CAST(count(*) AS DOUBLE)")} AS dup_rate,
       ${s6(Det.avgDSql("quality_score", 6))} AS avg_quality
FROM b JOIN d USING (doc_id)
GROUP BY 1"""

  /** Twin of shingle_profile: same distinct-shingle postings, df per
    * shingle, ⌊log2 df⌋ via bin-string length; Σdf² in HUGEINT (CLAUDE
    * invariant: oracle-side integer algebra stays HUGEINT). */
  private val shingleProfileSql =
    s"""WITH sh AS (
  SELECT doc_id, ${Shingles.ofSql("text", 3)} AS sh FROM documents
), ex AS (
  SELECT doc_id, unnest(sh) AS shingle FROM sh
), dfs AS (
  SELECT shingle, count(*) AS df FROM ex GROUP BY 1)
SELECT CAST(length(bin(df)) - 1 AS BIGINT) AS df_bucket,
       count(*) AS n_shingles,
       CAST(sum(df) AS BIGINT) AS n_postings,
       CAST(sum(CAST(df AS HUGEINT) * df) AS BIGINT) AS df2_mass
FROM dfs GROUP BY 1"""

  def oracleSql: Map[String, String] = Map(
    "multimodal_features" -> multimodalFeaturesSql,
    "multimodal_decode" -> multimodalDecodeSql,
    "multimodal_resize" -> multimodalResizeSql,
    "multimodal_bilinear" -> multimodalBilinearSql,
    "phrase_search" ->
      s"""WITH ws AS (
  SELECT doc_id, string_split(text, ' ') AS ts FROM documents
), tok AS (
  SELECT doc_id, unnest(range(0, len(ts))) AS pos, ts FROM ws
), t2 AS (
  SELECT doc_id, pos, ts[CAST(pos + 1 AS INTEGER)] AS term FROM tok
), m AS (
  SELECT a.doc_id, a.pos AS p0
  FROM t2 a JOIN t2 b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
  WHERE a.term = '$PhraseA' AND b.term = '$PhraseB'
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_matches,
       CAST(min(p0) AS BIGINT) AS first_pos
FROM m GROUP BY 1""",
    "curation_report" -> curationReportSql,
    "corpus_clean" -> corpusCleanSql,
    "boilerplate_detect" ->
      s"""WITH p AS (
  SELECT array_to_string(string_split(text, ' ')[1:$BpfxTokens], ' ') AS prefix, source
  FROM documents),
tot AS (SELECT count(*) AS n_total FROM p),
g AS (
  SELECT prefix, count(*) AS n_docs, count(DISTINCT source) AS n_sources
  FROM p GROUP BY 1 HAVING count(*) >= 2)
SELECT rk, prefix, n_docs, n_sources,
       ${s6("CAST(n_docs AS DOUBLE) / CAST(n_total AS DOUBLE)")} AS doc_share
FROM (SELECT *, CAST(row_number() OVER (ORDER BY n_docs DESC, prefix) AS BIGINT) AS rk
      FROM g) t, tot
WHERE rk <= $BpfxTopK""",
    "ks_drift" ->
      s"""WITH d0 AS (SELECT source, n_chars FROM documents),
counts AS (SELECT source, n_chars, count(*) AS m FROM d0 GROUP BY 1, 2),
vals AS (SELECT DISTINCT n_chars FROM d0),
srcs AS (SELECT source, count(*) AS n FROM d0 GROUP BY 1),
grid AS (
  SELECT s.source, v.n_chars, s.n, COALESCE(c.m, 0) AS m
  FROM vals v CROSS JOIN srcs s
  LEFT JOIN counts c ON c.source = s.source AND c.n_chars = v.n_chars),
cells AS (
  SELECT source, n_chars, n,
         sum(m) OVER (PARTITION BY source ORDER BY n_chars) AS c
  FROM grid),
pairs AS (
  SELECT a.source AS src_a, b.source AS src_b, a.n AS n_a, b.n AS n_b,
         abs(a.c * b.n - b.c * a.n) AS num
  FROM cells a JOIN cells b
    ON a.n_chars = b.n_chars AND a.source < b.source)
SELECT src_a, src_b, CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       ${s6("CAST(max_num AS DOUBLE) / CAST(n_a * n_b AS DOUBLE)")} AS ks_d
FROM (SELECT src_a, src_b, n_a, n_b, max(num) AS max_num
      FROM pairs GROUP BY 1, 2, 3, 4) t""",
    "quality_sweep" -> {
      // Survivor quality means ride the exact 1e-6 grid; count/token
      // ratios are single divisions of correctly-rounded non-negative
      // casts. Sums surface as BIGINT to match Spark's long dtype.
      val condSel = QualityTaus.zipWithIndex.map { case (t, i) =>
        val cond = s"quality_score >= ${Det.dblLit(t)}"
        s"""sum(CASE WHEN $cond THEN 1 END) AS k_$i,
         sum(CASE WHEN $cond THEN n_tokens END) AS kt_$i,
         sum(CASE WHEN $cond THEN ${Det.klSql("quality_score", 6)} END) AS kq_$i"""
      }.mkString(",\n         ")
      val arms = QualityTaus.zipWithIndex.map { case (t, i) =>
        s"""SELECT ${Det.dblLit(t)} AS tau,
       CAST(COALESCE(k_$i, 0) AS BIGINT) AS n_kept,
       ${s6(s"CAST(COALESCE(k_$i, 0) AS DOUBLE) / CAST(n_docs AS DOUBLE)")} AS retention,
       CASE WHEN n_tok > 0 THEN ${s6(s"CAST(COALESCE(kt_$i, 0) AS DOUBLE) / CAST(n_tok AS DOUBLE)")} END AS token_share,
       CASE WHEN COALESCE(k_$i, 0) > 0 THEN ${s6(s"CAST(kq_$i AS DOUBLE)/1e6/k_$i")} END AS avg_quality_kept
  FROM m""" }.mkString("\n  UNION ALL\n  ")
      s"""WITH st AS (SELECT n_tokens, quality_score FROM ($statsSql) stx),
m AS (
  SELECT count(*) AS n_docs, sum(n_tokens) AS n_tok,
         $condSel
  FROM st)
  $arms"""
    },
    "decontaminate" -> Decontaminate.reportSql("documents", "source = 'src0'"),
    "dedup_clusters" ->
      s"""SELECT id AS doc_id, cluster_id,
       count(*) OVER (PARTITION BY cluster_id) AS n_members
FROM (${ConnectedComponents.clustersSql(dedupMinhashSql, "doc_a", "doc_b")}) cc""",
    "profile_docs" -> Profiler.stringProfileSql("documents",
      Seq("doc_id", "lang", "source", "n_chars")),
    "doc_histogram" ->
      """SELECT lang, CAST(n_chars // 500 AS BIGINT) AS bin,
       count(*) AS n_docs, min(n_chars) AS min_chars, max(n_chars) AS max_chars
FROM documents GROUP BY 1, 2""",
    "text_vocab" ->
      s"""SELECT count(DISTINCT doc_id) AS n_docs,
       count(*) AS n_tokens,
       count(DISTINCT word) AS vocab_size,
       ${s6(Det.avgDSql("length(word)::DOUBLE", 6))} AS avg_token_len
FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)""",
    "text_stats" -> statsSql,
    "repetition_stats" -> repetitionSql,
    "lexical_diversity" -> lexicalDiversitySql,
    "dataset_split" -> datasetSplitSql,
    "dataset_drift" -> datasetDriftSql,
    "ngram_novelty" -> ngramNoveltySql,
    "pii_scrub" -> piiScrubSql,
    "importance_weights" -> importanceWeightsSql,
    "lang_id" -> langIdSql,
    "lang_confusion" -> langConfusionSql,
    "shingle_profile" -> shingleProfileSql,
    "epoch_shuffle" -> epochShuffleSql,
    "dedup_sources" -> dedupSourcesSql,
    "dedup_sweep" -> dedupSweepSql,
    "dedup_verify" -> dedupVerifySql,
    "quality_corr" -> qualityCorrSql,
    "dedup_keep_best" -> dedupKeepBestSql,
    "split_leakage" -> splitLeakageSql,
    "quality_dup" -> qualityDupSql,
    "perceptron_lang" -> Perceptron.trainSql(PerceptronEpochs),
    "perceptron_eval" -> Perceptron.evalHeldOutSql(PerceptronEpochs),
    "perceptron_auc" -> Perceptron.aucHeldOutSql(PerceptronEpochs),
    "perceptron_pr_curve" -> Perceptron.prCurveHeldOutSql(PerceptronEpochs),
    "fingerprint" -> fingerprintSql,
    "dedup_exact" -> dedupExactSql,
    "dedup_jaccard" -> dedupJaccardSql,
    "dedup_minhash" -> dedupMinhashSql,
    "dedup_delta" -> dedupDeltaSql,
    "dedup_containment" -> containmentSql,
    "dedup_simhash" -> dedupSimhashSql,
    "simhash_hamming" -> simhashHammingSql,
    "dedup_recall" -> dedupRecallSql
  )

  /** Twin of the dedup_recall eval: truth = true-jaccard pairs at
    * [[RecallTau]] (the shared pair subquery), candidates = the MinHash
    * banding twin; counts exact, ratios 6-dp snapped, NULL on empty
    * denominators (mirrors the Spark `when` guards). */
  private val dedupRecallSql =
    s"""WITH truth AS (
  SELECT doc_a, doc_b FROM ($jaccardPairsSqlBase)
  WHERE jaccard >= ${Det.dblLit(RecallTau)}
), cand AS (
  SELECT doc_a, doc_b FROM ($dedupMinhashSql)
), tt AS (SELECT count(*) AS n_truth FROM truth),
cc AS (SELECT count(*) AS n_candidates FROM cand),
hh AS (SELECT count(*) AS n_hits FROM truth t JOIN cand c USING (doc_a, doc_b))
SELECT tt.n_truth, cc.n_candidates, hh.n_hits,
       CASE WHEN cc.n_candidates > 0
            THEN ${s6("CAST(hh.n_hits AS DOUBLE) / CAST(cc.n_candidates AS DOUBLE)")}
       END AS precision_lsh,
       CASE WHEN tt.n_truth > 0
            THEN ${s6("CAST(hh.n_hits AS DOUBLE) / CAST(tt.n_truth AS DOUBLE)")}
       END AS recall_lsh
FROM tt, cc, hh"""
}

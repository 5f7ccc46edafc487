package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge training (Sennrich et al. 2016) — the
  * tokenizer-vocabulary learner every LLM data pipeline runs over its
  * corpus. Character-level over the word dictionary: each distinct word
  * starts as its character sequence weighted by corpus frequency; each
  * round counts adjacent symbol pairs (weighted, overlaps counted),
  * picks the max-count pair with a (count DESC, left, right) tie-break,
  * and applies it greedily LEFT-TO-RIGHT in every sequence (in a run of
  * chained matches — "aaa" under (a,a) — the 1st, 3rd, 5th… positions
  * merge; the oracle twin reproduces exactly this with a run-parity
  * window). Output: the learned merge table (rank, pair, count) — the
  * artifact a tokenizer ships.
  *
  * Scale shape — this is how distributed BPE actually runs: state is
  * the WORD DICTIONARY (vocab-sized, not corpus-sized — the corpus
  * collapses to (word, freq) in one aggregate up front); per round one
  * map-side-combinable pair-count aggregate, a 1-row argmax collect,
  * and a compiled per-word merge pass (typed map — invariant 4), with
  * the sequence frame localCheckpoint'ed per round like every driver-
  * orchestrated loop here. Rounds are fixed so the oracle can unroll
  * the identical trajectory; training stops early only when no pair is
  * left (mirrored: the twin's empty best CTE emits no row either).
  *
  * Determinism: counts are exact Longs; the argmax ordering and the
  * greedy rewrite have no numeric content at all — both engines walk
  * the same merge trajectory bit for bit.
  */
object BpeTrain {

  /** Learn `rounds` merges from the corpus' text column. Output:
    * (merge_rank, left_sym, right_sym, pair_count). */
  def merges(docs: DataFrame, rounds: Int = 8): DataFrame =
    train(docs, rounds)._1

  /** Tokenization report after applying the learned merges: per document
    * the word count, the character total, the BPE symbol total (each
    * word costs its final-sequence length × its occurrences), and the
    * symbols-per-char compression ratio — the "how much does this
    * vocabulary actually compress my corpus" readout that accompanies
    * every tokenizer training run. The word→length table is vocab-sized
    * and broadcast onto the doc→word stream; one doc-keyed aggregate. */
  def tokenCounts(docs: DataFrame, rounds: Int = 8): DataFrame = {
    val seq = train(docs, rounds)._2
    val wordLens = seq.select(col("word"), size(col("syms")).cast("long").as("n_sym"),
      length(col("word")).cast("long").as("n_char"))
    docs.select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .join(broadcast(wordLens), Seq("word"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"),
        sum(col("n_char")).as("n_chars"),
        sum(col("n_sym")).as("n_bpe"))
      .select(col("doc_id"), col("n_words"), col("n_chars"), col("n_bpe"),
        Det.snap(col("n_bpe").cast("double") / col("n_chars").cast("double"), 6)
          .as("compression"))
  }

  /** Held-out tokenization report — the train→eval closure: merges are
    * learned on `trainDocs` ONLY, then applied in rank order to the
    * held-out `evalDocs`' word dictionary (standard BPE apply — unseen
    * words still receive every merge whose pair occurs in them), and the
    * same per-doc count aggregate as [[tokenCounts]] runs over the eval
    * split. The merge table is driver-held (≤ rounds rows) and enters
    * the apply pass as a closure constant; the eval dictionary is
    * vocab-sized. Sequential rank-order application reproduces the
    * training-time trajectory exactly for ANY word, which is what the
    * oracle's second unrolled chain (matching the TRAIN chain's best$r)
    * re-derives. */
  def tokenCountsHeldOut(trainDocs: DataFrame, evalDocs: DataFrame,
                         rounds: Int = 8): DataFrame = {
    val spark = trainDocs.sparkSession
    import spark.implicits._
    val learned = train(trainDocs, rounds)._1
      .as[(Long, String, String, Long)].collect().sortBy(_._1)
      .map { case (_, a, b, _) => (a, b) }
    val evalSeq = evalDocs.select(explode(split(col("text"), " ")).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("f"))
      .as[(String, Long)]
      .map { case (w, f) =>
        var syms: Array[String] = w.toCharArray.map(_.toString)
        learned.foreach { case (a, b) => syms = mergePass(syms, a, b) }
        (w, f, syms)
      }
      .toDF("word", "f", "syms")
    val wordLens = evalSeq.select(col("word"),
      size(col("syms")).cast("long").as("n_sym"),
      length(col("word")).cast("long").as("n_char"))
    evalDocs.select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .join(broadcast(wordLens), Seq("word"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"),
        sum(col("n_char")).as("n_chars"),
        sum(col("n_sym")).as("n_bpe"))
  }

  /** One greedy left-to-right merge pass (the right symbol of each match
    * is consumed) — shared by the training rewrite and the held-out
    * apply so the two can never diverge. */
  private def mergePass(syms: Array[String], a: String, b: String): Array[String] = {
    val buf = new scala.collection.mutable.ArrayBuffer[String](syms.length)
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
        buf += (a + b); i += 2
      } else { buf += syms(i); i += 1 }
    }
    buf.toArray
  }

  /** Vocabulary byte gate for the driver training replay: the word
    * dictionary at ~200 B/row of deserialized block ⇒ 32 MB ≈ 160k
    * distinct words — far past the fixtures, far under driver heap. */
  private[graft] val SmallVocabBytes = 1L << 25

  /** The training loop shared by [[merges]] and [[tokenCounts]]:
    * returns (merge table, final per-word symbol sequences).
    *
    * Size-adaptive (r17, the Bfs/KCore pattern): the state is the
    * VOCAB-sized dictionary, so under the byte gate the per-round
    * aggregate + argmax-collect + map-checkpoint jobs (2·rounds + 1
    * scheduled jobs on frames of a few thousand rows) are pure
    * scheduling overhead — collect the dictionary once and replay the
    * rounds on the driver. Exact trajectory: integer counts, the same
    * (count DESC, left, right) argmax where the string legs compare as
    * unsigned UTF-8 bytes (Spark's UTF8String binary order — Java
    * String.compareTo diverges on supplementary characters), and the
    * shared [[mergePass]]. Past the gate (or under
    * SPARK_GRAFT_FORCE_DISTRIBUTED) the distributed loop runs
    * unchanged; ThresholdForcingSpec pins branch equality through the
    * three bpe contract queries. */
  private def train(docs: DataFrame, rounds: Int,
                    smallBytes: Long = Adaptive.threshold(SmallVocabBytes)): (DataFrame, DataFrame) = {
    val spark = docs.sparkSession
    import spark.implicits._
    val seq0 = docs.select(explode(split(col("text"), " ")).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("f"))
      .as[(String, Long)]
      .map { case (w, f) => (w, f, w.toCharArray.map(_.toString)) }
      .toDF("word", "f", "syms")
      .localCheckpoint(true)
    if (Checkpoints.bytes(seq0) <= smallBytes) {
      val vocab = seq0.as[(String, Long, Seq[String])].collect()
        .map { case (w, f, syms) => (w, f, syms.toArray) }
      Checkpoints.release(seq0)
      return trainDriver(spark, vocab, rounds)
    }
    var seq = seq0
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    var r = 0
    var done = false
    while (r < rounds && !done) {
      val pairs = seq.as[(String, Long, Seq[String])]
        .flatMap { case (_, f, syms) =>
          (0 until syms.length - 1).iterator.map(i => (syms(i), syms(i + 1), f))
        }
        .toDF("a", "b", "f")
        .groupBy(col("a"), col("b")).agg(sum(col("f")).as("c"))
      val best = pairs.orderBy(col("c").desc, col("a"), col("b")).limit(1)
        .as[(String, String, Long)].collect()
      if (best.isEmpty) done = true
      else {
        val (a, b, c) = best(0)
        out += ((r + 1L, a, b, c))
        seq = seq.as[(String, Long, Seq[String])]
          .map { case (w, f, syms) => (w, f, mergePass(syms.toArray, a, b)) }
          .toDF("word", "f", "syms")
          .localCheckpoint(true)
      }
      r += 1
    }
    (spark.createDataset(out.toSeq)
      .toDF("merge_rank", "left_sym", "right_sym", "pair_count"), seq)
  }

  /** Spark's string sort order is UTF8String's: unsigned lexicographic
    * comparison of the UTF-8 bytes. */
  private def utf8Lt(x: String, y: String): Boolean = {
    val a = x.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val b = y.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      val d = (a(i) & 0xff) - (b(i) & 0xff)
      if (d != 0) return d < 0
      i += 1
    }
    a.length < b.length
  }

  /** Driver replay of the training rounds over the collected dictionary:
    * identical operations — weighted adjacent-pair census (exact long
    * sums, order-free), the (c DESC, a, b) argmax with UTF-8-byte
    * string legs, the shared [[mergePass]] rewrite. */
  private def trainDriver(spark: org.apache.spark.sql.SparkSession,
                          vocab0: Array[(String, Long, Array[String])],
                          rounds: Int): (DataFrame, DataFrame) = {
    import spark.implicits._
    var vocab = vocab0
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    var r = 0
    var done = false
    while (r < rounds && !done) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      vocab.foreach { case (_, f, syms) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + f)
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        var bestA: String = null; var bestB: String = null; var bestC = 0L
        counts.foreach { case ((a, b), c) =>
          val better =
            if (bestA == null) true
            else if (c != bestC) c > bestC
            else if (a != bestA) utf8Lt(a, bestA)
            else utf8Lt(b, bestB)
          if (better) { bestA = a; bestB = b; bestC = c }
        }
        out += ((r + 1L, bestA, bestB, bestC))
        vocab = vocab.map { case (w, f, syms) =>
          (w, f, mergePass(syms, bestA, bestB))
        }
      }
      r += 1
    }
    val seqDf = spark.createDataset(vocab.toIndexedSeq
        .map { case (w, f, syms) => (w, f, syms.toSeq) })
      .toDF("word", "f", "syms")
    (spark.createDataset(out.toSeq)
      .toDF("merge_rank", "left_sym", "right_sym", "pair_count"), seqDf)
  }
}

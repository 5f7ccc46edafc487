package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization stats, quality scoring, n-gram heuristic language ID,
  * and document fingerprinting. All pure narrow `select`s over the text
  * column — no shuffle, fully codegen'd, and embarrassingly parallel at
  * 100 TB (the scan dominates; every expression here runs inside one
  * WholeStageCodegen span over the parquet scan).
  *
  * Determinism: only integer arithmetic, md5 (identical hex in every
  * engine), and rational ops on exact integers — every output is
  * bit-reproducible (see Det's scaladoc for why that matters here).
  */
object TextOps {

  /** Language profiles for the n-gram/stopword heuristic classifier.
    * Order is the deterministic tie-break (first wins on equal score).
    * Shared constant with the oracle SQL via [[langProfiles]].
    */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "is"),
    "de" -> Seq("der", "die", "und", "das", "ist", "ein"),
    "fr" -> Seq("le", "la", "et", "les", "des", "une"),
    "es" -> Seq("el", "los", "las", "y", "por", "una")
  )

  /** Stopwords for the quality score (union of profile heads). */
  val stopwords: Seq[String] = langProfiles.flatMap(_._2).distinct

  private def words(text: Column): Column = split(text, " ")

  /** BPE-ish token pattern: letter runs, digit runs, single other marks —
    * the cheap proxy for subword token counting over a corpus. Identical
    * semantics in Java regex (Spark) and RE2 (DuckDB). */
  val subtokenPattern = "[a-z]+|[0-9]+|[^a-z0-9\\s]"

  private def countIn(text: Column, set: Seq[String]): Column =
    size(filter(words(text), w => w.isInCollection(set)))

  /** Token/char statistics + quality score per document.
    *
    * Quality model (deterministic rational arithmetic, each term in
    * [0,1]): length term min(tokens,100)/100, lexical diversity
    * distinct/total tokens, non-stopword ratio, vowel ratio ×5 capped.
    * This mirrors the length/punct/stopword-ratio family of quality
    * heuristics used for LLM corpus filtering.
    */
  def stats(docs: DataFrame): DataFrame = {
    val w = words(col("text"))
    val nTok = size(w).cast("long")
    val nDistinct = size(array_distinct(w)).cast("long")
    val nStop = countIn(col("text"), stopwords).cast("long")
    val chars = length(col("text")).cast("long")
    val vowels = (chars - length(regexp_replace(col("text"), "[aeiou]", ""))).cast("long")
    docs.select(
      col("doc_id"),
      chars.as("n_chars"),
      nTok.as("n_tokens"),
      nDistinct.as("n_distinct_tokens"),
      nStop.as("n_stopwords"),
      vowels.as("n_vowels"),
      // bytes > chars ⇔ multibyte (CJK etc.) content present.
      (octet_length(col("text")) - length(col("text"))).cast("long").as("n_multibyte"),
      regexp_count(col("text"), lit(subtokenPattern)).cast("long").as("n_subtokens"),
      // Snapped AT THE SOURCE (r15, caught by the 10× docs_zipf tier):
      // the oracle twin (DocQueries.statsSql) emits s6(quality_score),
      // and every Det aggregate is grid-immune to raw-vs-snapped inputs
      // (they quantize per row) — but ORDER-sensitive consumers are
      // not: quality_dup's ntile boundary fell inside a 37-doc tie
      // group where two docs' RAW sums differed by 1 ulp across the
      // snap boundary (…66 vs …67), so Spark (raw order) and DuckDB
      // (snapped order) ranked the group differently and one doc
      // swapped quintiles. Snapping here makes the frame column-equal
      // to statsSql, aligning every ordering, threshold compare, and
      // grouping downstream.
      Det.snap(
        (least(nTok, lit(100L)).cast("double") / 100d) * 0.3 +
          (nDistinct.cast("double") / nTok.cast("double")) * 0.3 +
          (lit(1.0) - nStop.cast("double") / nTok.cast("double")) * 0.2 +
          least(lit(1.0), vowels.cast("double") * 5d / chars.cast("double")) * 0.2,
        6).as("quality_score")
    )
  }

  /** Corpus-level vocabulary statistics: document/token totals, exact
    * distinct vocabulary size, and mean document length. The distinct
    * count is a real shuffle-dedup (the thing approx sketches replace at
    * 100 TB — kept exact here so the oracle can verify it; swap in
    * approx_count_distinct at crawl scale). */
  def vocab(docs: DataFrame): DataFrame = {
    val w = explode(words(col("text"))).as("word")
    docs.select(col("doc_id"), w)
      .agg(
        countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_tokens"),
        countDistinct(col("word")).as("vocab_size"),
        Det.avgD(length(col("word")).cast("double"), 6).as("avg_token_len"))
  }

  /** Heuristic language ID: per-language stopword hit counts, multibyte
    * bytes as the zh signal, deterministic argmax in [[langProfiles]]
    * order ("zh" wins only on multibyte presence; "en" is the fallback).
    */
  def langId(docs: DataFrame): DataFrame = {
    val scores = langProfiles.map { case (l, ws) => l -> countIn(col("text"), ws) }
    val multibyte = octet_length(col("text")) - length(col("text"))
    // argmax with fixed priority: a language wins iff its score strictly
    // beats every later one and is >= every earlier one.
    val best = scores.zipWithIndex.foldLeft(lit("en")) { case (acc, ((l, _), i)) =>
      val s = scores(i)._2
      val geLater = scores.drop(i + 1).map(o => s >= o._2).foldLeft(lit(true))(_ && _)
      val beatsEarlier = scores.take(i).map(o => s > o._2).foldLeft(lit(true))(_ && _)
      when(s > 0 && geLater && beatsEarlier, lit(l)).otherwise(acc)
    }
    docs.select(
      col("doc_id"),
      col("lang").as("label_lang"),
      when(multibyte > 0, lit("zh")).otherwise(best).as("predicted_lang"),
      scores.map(_._2).reduce(greatest(_, _)).cast("long").as("top_score")
    )
  }

  /** Document fingerprints: full-text md5, a winnowing-style min/max
    * shingle fingerprint (min & max md5 over word 3-grams — the rolling
    * hash family), and the shingle count. md5 hex compares are portable
    * across engines; min/max over strings are order-independent.
    *
    * Typed map, not `transform(sh, md5)`: higher-order Catalyst lambdas
    * run INTERPRETED per element (invariant 4), and hashing every shingle
    * of every document is the hot loop — per-record Scala with a reused
    * MessageDigest is ~3× faster and byte-identical (same md5 hex).
    */
  def fingerprint(docs: DataFrame, n: Int = 3): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val digest = java.security.MessageDigest.getInstance("MD5")
        def hex(s: String): String = {
          val b = digest.digest(s.getBytes("UTF-8"))
          val sb = new java.lang.StringBuilder(32)
          var i = 0
          while (i < b.length) {
            sb.append(Character.forDigit((b(i) >> 4) & 0xf, 16))
            sb.append(Character.forDigit(b(i) & 0xf, 16))
            i += 1
          }
          sb.toString
        }
        it.map { case (id, text) =>
          val ws = text.split(" ", -1) // limit -1: keep trailing empties like Catalyst split / DuckDB string_split
          var nSh = 0L
          var min: String = null
          var max: String = null
          if (ws.length >= n) {
            val seen = new scala.collection.mutable.HashSet[String]
            val sb = new java.lang.StringBuilder
            var i = 0
            while (i <= ws.length - n) {
              sb.setLength(0)
              var j = 0
              while (j < n) {
                if (j > 0) sb.append(' ')
                sb.append(ws(i + j)); j += 1
              }
              val sh = sb.toString
              if (seen.add(sh)) {
                nSh += 1L
                val h = hex(sh)
                if (min == null || h < min) min = h
                if (max == null || h > max) max = h
              }
              i += 1
            }
          }
          (id, hex(text), nSh, min, max)
        }
      }
      .toDF("doc_id", "text_md5", "n_shingles", "min_shingle_md5", "max_shingle_md5")
  }

  /** Heaps'-law vocabulary-growth curve: one row per document (in doc_id
    * order) with its token count, the number of words FIRST seen in it,
    * and the cumulative vocabulary / token totals up to it. The curve is
    * the standard corpus-curation diagnostic for "is more data still
    * adding new vocabulary" (Heaps' law: V(n) ≈ K·n^β) — exact integers
    * throughout, so it is bit-portable with no Det scaffolding.
    *
    * Scale shape: the word fan-out collapses in ONE map-side-combinable
    * aggregate to a row per distinct word (min first-doc — the same
    * shuffle as an inverted-index build); everything after is doc-count
    * sized. The two cumulative sums go through
    * [[Ranks.runningSumByRange]], whose stats-adaptive flip replaces the
    * single-task global window with two-pass range prefix sums above the
    * dimension threshold, so the curve assembly itself scales.
    */
  def vocabGrowth(docs: DataFrame): DataFrame = {
    val tokens = docs.select(col("doc_id"),
      explode(words(col("text"))).as("word"))
    val firstSeen = tokens.groupBy(col("word"))
      .agg(min(col("doc_id")).as("doc_id"))
    val newWords = firstSeen.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("new_words"))
    val perDoc = tokens.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"))
      .join(newWords, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("new_words"), lit(0L)).as("new_words"))
    val vocab = Ranks.runningSumByRange(
      perDoc, Seq(col("doc_id")), "new_words", "vocab_size")
    Ranks.runningSumByRange(
      vocab, Seq(col("doc_id")), "n_tokens", "cum_tokens")
      .select(col("doc_id"), col("n_tokens"), col("new_words"),
        col("vocab_size"), col("cum_tokens"))
  }

  /** Intra-document repetition signals (the Gopher/MassiveText repetition
    * filter family: a document whose mass concentrates in a few repeated
    * n-grams is boilerplate or spam, not prose — Rae et al. 2021 §A1.2
    * filter on exactly these "fraction of characters/tokens in duplicated
    * n-grams" statistics). Per document: bigram totals/distincts, the top
    * bigram's multiplicity and mass fraction, and the fraction of trigram
    * occurrences belonging to trigrams seen ≥ 2× within the document.
    *
    * Scale shape: repetition is DOC-LOCAL, so unlike the corpus-level
    * dedup family nothing ever shuffles — one typed mapPartitions pass
    * counts n-grams in a per-document hash map (O(doc) memory, reused
    * buffers) and emits one row per document. At 100 TB this is scan-bound
    * and embarrassingly parallel; an explode + groupBy(doc_id, ngram)
    * formulation would shuffle the entire corpus's n-gram stream to
    * recompute a quantity each task already holds locally. Typed Scala,
    * not higher-order Catalyst lambdas, per invariant 4 (interpreted
    * per-element lambdas are the known hot-loop trap).
    *
    * Fractions are ONE IEEE division of exactly-converted longs (snap at
    * the query edge per the Det contract); NULL when the document is too
    * short to have any n-gram of that order.
    */
  def repetition(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val counts = new java.util.HashMap[String, Long]()
        val sb = new java.lang.StringBuilder
        // multiplicity map of the n-grams of ws at order n
        def fill(ws: Array[String], n: Int): Unit = {
          counts.clear()
          var i = 0
          while (i <= ws.length - n) {
            sb.setLength(0)
            var j = 0
            while (j < n) {
              if (j > 0) sb.append(' ')
              sb.append(ws(i + j)); j += 1
            }
            counts.merge(sb.toString, 1L, (a, b) => a + b)
            i += 1
          }
        }
        it.map { case (id, text) =>
          val ws = text.split(" ", -1) // limit -1: Catalyst/DuckDB split semantics
          fill(ws, 2)
          val nBi = math.max(ws.length - 1, 0).toLong
          val nBiDistinct = counts.size.toLong
          var topBi = 0L
          val bit = counts.values.iterator
          while (bit.hasNext) { val c = bit.next(); if (c > topBi) topBi = c }
          fill(ws, 3)
          val nTri = math.max(ws.length - 2, 0).toLong
          var dupTri = 0L
          val tit = counts.values.iterator
          while (tit.hasNext) { val c = tit.next(); if (c >= 2L) dupTri += c }
          (id, nBi, nBiDistinct, topBi,
            if (nBi == 0L) None else Some(topBi.toDouble / nBi.toDouble),
            nTri, dupTri,
            if (nTri == 0L) None else Some(dupTri.toDouble / nTri.toDouble))
        }
      }
      .toDF("doc_id", "n_bigrams", "n_distinct_bigrams", "top_bigram_count",
        "top_bigram_frac", "n_trigrams", "dup_trigram_count", "dup_trigram_frac")
  }

  /** Lexical-diversity quality signals — the vocabulary-richness family
    * of corpus filters (low diversity ⇒ template/boilerplate text; used
    * alongside the repetition family): per document the type-token
    * ratio, the hapax-legomenon fraction (words occurring exactly once —
    * the classic productivity measure), and the Gini–Simpson diversity
    * index 1 − Σ cᵢ(cᵢ−1) / (n(n−1)) — the probability two token draws
    * without replacement are DIFFERENT words. Simpson is the log-free
    * stand-in for entropy: `ln` is not correctly rounded in either
    * engine, while Simpson is a ratio of exact integers (computed as one
    * division (D−Σcᵢ(cᵢ−1))/D with D = n(n−1), so a single IEEE op
    * separates the exact numerator and denominator).
    *
    * Scale shape: doc-local like [[repetition]] — ONE typed
    * mapPartitions pass with a per-document hash map, zero shuffle,
    * scan-bound and embarrassingly parallel at 100 TB. NULLs when a doc
    * is too short for the measure (n = 0 for TTR/hapax, n < 2 for
    * Simpson).
    */
  def lexicalDiversity(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val counts = new java.util.HashMap[String, Long]()
        it.map { case (id, text) =>
          val ws = text.split(" ", -1) // limit -1: Catalyst/DuckDB split semantics
          counts.clear()
          var i = 0
          while (i < ws.length) {
            counts.merge(ws(i), 1L, (a, b) => a + b); i += 1
          }
          val n = ws.length.toLong
          val types = counts.size.toLong
          var hapax = 0L
          var coll = 0L // Σ cᵢ(cᵢ−1)
          val cit = counts.values.iterator
          while (cit.hasNext) {
            val c = cit.next()
            if (c == 1L) hapax += 1L
            coll += c * (c - 1L)
          }
          (id, n, types, hapax,
            if (n == 0L) None else Some(types.toDouble / n.toDouble),
            if (n == 0L) None else Some(hapax.toDouble / n.toDouble),
            if (n < 2L) None
            else Some((n * (n - 1L) - coll).toDouble / (n * (n - 1L)).toDouble))
        }
      }
      .toDF("doc_id", "n_tokens", "n_types", "n_hapax",
        "ttr", "hapax_frac", "simpson")
  }

  /** DSIR-flavored importance weighting for domain-targeted resampling
    * (Xie et al., "Data Selection for Language Models via Importance
    * Resampling", 2023: upweight documents whose unigram mass looks like
    * a target domain). Exact-integer surrogate of the log-likelihood
    * ratio so the verification gate stays bit-exact: per word w with
    * target count t_w (docs from `targetSource`), proposal count p_w
    * (all docs) and totals T, P, the word weight is t_w·P − p_w·T —
    * positive iff w is over-represented in the target (same sign as
    * log((t_w/T)/(p_w/P))); a document's score sums the weight over its
    * token occurrences.
    *
    * Scale shape: one map-side-combinable aggregate per word (the
    * inverted-index shuffle), a broadcast of the two scalar totals, one
    * hash re-aggregation keyed by doc — no window, no self-join; every
    * sum is exact Long (|score| ≤ n_tok·T·P ≈ 2^47 at sf0.1; the SQL
    * twin's algebra stays HUGEINT per the working rules). The totals
    * deliberately do NOT reuse the word aggregate: Σ_w p_w is just the
    * corpus token count, so one scalar scan of `size(split(...))` (no
    * explode, no shuffle) replaces a second full word-count computation
    * — the plan-audit catch that re-deriving `tot` from `wc`'s lineage
    * re-ran the inverted-index aggregate twice.
    */
  def importanceWeights(docs: DataFrame, targetSource: String): DataFrame = {
    val tok = docs.select(col("doc_id"), col("source"),
      explode(words(col("text"))).as("w"))
    val wc = tok.groupBy(col("w")).agg(
      count(lit(1)).as("p_w"),
      count(when(col("source") === targetSource, 1)).as("t_w"))
    val nTok = size(words(col("text"))).cast("long")
    val tot = docs.agg(
      sum(nTok).as("p_total"),
      sum(when(col("source") === targetSource, nTok).otherwise(0L)).as("t_total"))
    tok.join(wc, Seq("w"))
      .crossJoin(broadcast(tot))
      .groupBy(col("doc_id"), col("source"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("t_w") * col("p_total") - col("p_w") * col("t_total")).as("score"))
      .select(col("doc_id"), col("source"), col("n_tokens"), col("score"),
        (col("score") > 0L).as("upweight"))
  }

  /** PII regexes shared verbatim with the oracle SQL twin: conservative
    * character-class-only patterns (no lookaround, no backreferences, no
    * `\d`/`\b` shorthand inside classes) so Java regex (Spark codegen) and
    * RE2 (DuckDB) produce the SAME leftmost, non-overlapping match set —
    * the two engines differ on alternation preference (leftmost-first vs
    * leftmost-longest), which these patterns never exercise. */
  val emailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val ipRe = "([0-9]{1,3}\\.){3}[0-9]{1,3}"
  val phoneRe = "[0-9]{3}-[0-9]{3}-[0-9]{4}"

  /** PII detection + redaction — the scrubbing pass every training-data
    * pipeline runs before text leaves curation. Counts and replaces
    * emails, IPv4 literals, and NANP-style phone numbers with typed
    * placeholder tokens, in a FIXED sequence (emails first so an address
    * is never double-counted as its embedded digit runs; phones last).
    * Counts are taken on the stage each pattern actually scans, so
    * n_emails + n_ips + n_phones is exactly the number of replacements
    * inside `redacted_md5`'s preimage.
    *
    * Pure narrow select — regexp_count/regexp_replace are codegen'd
    * expressions inside the scan's WholeStageCodegen span; zero shuffle,
    * scan-bound at 100 TB like the rest of this file.
    */
  def piiScrub(df: DataFrame, textCol: String = "text",
               idCol: String = "doc_id"): DataFrame = {
    val afterEmail = regexp_replace(col(textCol), emailRe, "[EMAIL]")
    val afterIp = regexp_replace(afterEmail, ipRe, "[IP]")
    val afterPhone = regexp_replace(afterIp, phoneRe, "[PHONE]")
    df.select(
      col(idCol),
      regexp_count(col(textCol), lit(emailRe)).cast("long").as("n_emails"),
      regexp_count(afterEmail, lit(ipRe)).cast("long").as("n_ips"),
      regexp_count(afterIp, lit(phoneRe)).cast("long").as("n_phones"),
      length(afterPhone).cast("long").as("redacted_len"),
      md5(afterPhone).as("redacted_md5"))
  }
}

/** Word n-gram shingling shared by fingerprinting and dedup. */
object Shingles {
  /** Distinct word n-grams of `text` as an array column (empty when the
    * document has fewer than n words). */
  def of(text: Column, n: Int): Column = {
    val ws = split(text, " ")
    array_distinct(
      when(size(ws) >= n,
        transform(sequence(lit(0), size(ws) - n),
          i => concat_ws(" ", slice(ws, i + 1, lit(n)))))
        .otherwise(array().cast("array<string>")))
  }

  /** Exploded distinct shingles as (doc_id, sz, shingle) rows via a typed
    * flatMap. Same semantics as `explode(of(text, n))` + the distinct
    * count, but JIT-compiled: higher-order Catalyst expressions run
    * interpreted per element, which dominates wall-clock on string-heavy
    * corpora — per-record Scala is the idiomatic escape hatch (codegen
    * can't enter lambdas anyway). */
  def exploded(docs: DataFrame, n: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        val ws = text.split(" ", -1) // limit -1: keep trailing empties like Catalyst split / DuckDB string_split
        if (ws.length < n) Iterator.empty
        else {
          val distinct = new scala.collection.mutable.LinkedHashSet[String]
          var i = 0
          val sb = new java.lang.StringBuilder
          while (i <= ws.length - n) {
            sb.setLength(0)
            var j = 0
            while (j < n) {
              if (j > 0) sb.append(' ')
              sb.append(ws(i + j)); j += 1
            }
            distinct += sb.toString; i += 1
          }
          val sz = distinct.size.toLong
          distinct.iterator.map(s => (id, sz, s))
        }
      }
      .toDF("doc_id", "sz", "shingle")
  }

  /** DuckDB twin of [[of]] (1-based list slicing). */
  def ofSql(text: String, n: Int): String =
    s"""list_distinct(CASE WHEN len(string_split($text, ' ')) >= $n
       THEN [array_to_string(string_split($text, ' ')[i+1:i+$n], ' ')
             for i in range(0, len(string_split($text, ' ')) - ${n - 1})]
       ELSE [] END)"""
}

package graft.ops

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class TextOpsSpec extends AnyFunSuite {
  import TestSpark._

  test("stats: token/distinct/stopword/vowel counts and quality in [0,1]") {
    val out = TextOps.stats(docs(Seq(
      (0L, "the cat sat on the mat", "en")))).head()
    assert(out.getAs[Long]("n_tokens") == 6L)
    assert(out.getAs[Long]("n_distinct_tokens") == 5L)
    assert(out.getAs[Long]("n_stopwords") == 2L) // 'the' twice
    assert(out.getAs[Long]("n_multibyte") == 0L)
    val q = out.getAs[Double]("quality_score")
    assert(q >= 0.0 && q <= 1.0)
  }

  test("language ID picks the profile with most stopword hits; zh on multibyte") {
    val out = TextOps.langId(docs(Seq(
      (0L, "the cat and the dog of it", "en"),
      (1L, "der hund und die katze ist hier", "de"),
      (2L, "le chien et la vache les aime", "fr"),
      (3L, "el perro y los gatos una casa", "es"),
      (4L, "中文文本", "zh"),
      (5L, "xyzzy qwerty asdf", "en")))) // no hits → fallback en
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("predicted_lang")).toMap
    assert(out(0L) == "en")
    assert(out(1L) == "de")
    assert(out(2L) == "fr")
    assert(out(3L) == "es")
    assert(out(4L) == "zh")
    assert(out(5L) == "en")
  }

  test("fingerprint: identical texts share all fingerprint fields") {
    val out = TextOps.fingerprint(docs(Seq(
      (0L, "alpha beta gamma delta epsilon", "en"),
      (1L, "alpha beta gamma delta epsilon", "en"),
      (2L, "totally other words here now", "en")))).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("text_md5"), r.getAs[String]("min_shingle_md5"))).toMap
    assert(out(0L) == out(1L))
    assert(out(0L) != out(2L))
  }

  test("typed shingling matches Catalyst split semantics on trailing spaces") {
    import org.apache.spark.sql.functions._
    // "a b c  " splits to ["a","b","c","",""] under Catalyst split / DuckDB
    // string_split; the typed flatMap path must keep those trailing empties
    // (round-2 ADVICE: split(' ') silently dropped them).
    val d = docs(Seq((0L, "a b c  ", "en"), (1L, "x y ", "en")))
    val catalyst = d
      .select(col("doc_id"), explode(Shingles.of(col("text"), 3)).as("shingle"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val typed = Shingles.exploded(d, 3)
      .select(col("doc_id"), col("shingle"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(catalyst == typed)
    assert(catalyst.contains((0L, "c  "))) // shingle built from trailing empties
  }

  test("shingles: word 3-grams, distinct, empty below 3 words") {
    import org.apache.spark.sql.functions._
    val df = docs(Seq((0L, "a b c d", "en"), (1L, "a b", "en")))
      .select(col("doc_id"), Shingles.of(col("text"), 3).as("sh"))
    val m = df.collect().map(r =>
      r.getAs[Long]("doc_id") -> r.getSeq[String](1)).toMap
    assert(m(0L).toSet == Set("a b c", "b c d"))
    assert(m(1L).isEmpty)
  }

  test("vocabGrowth: cumulative vocabulary matches a hand computation") {
    val out = TextOps.vocabGrowth(docs(Seq(
      (0L, "a b b c", "en"),
      (1L, "b c d", "en"),
      (2L, "a e", "en"),
      (3L, "b c", "en")))) // all words already seen → new_words 0
      .orderBy("doc_id").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("new_words"), r.getAs[Long]("vocab_size"),
        r.getAs[Long]("cum_tokens"))).toSeq
    assert(out == Seq(
      (0L, 4L, 3L, 3L, 4L), // a,b,c first seen
      (1L, 3L, 1L, 4L, 7L), // d
      (2L, 2L, 1L, 5L, 9L), // e (a already seen)
      (3L, 2L, 0L, 5L, 11L)))
  }

  test("repetition: n-gram multiplicities match a hand computation") {
    val out = TextOps.repetition(docs(Seq(
      (0L, "a b a b a", "en"), // bigrams: ab,ba,ab,ba  trigrams: aba,bab,aba
      (1L, "x y z w", "en"),   // no repeats at all
      (2L, "solo", "en"))))    // too short for any n-gram
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    val r0 = out(0L)
    assert(r0.getAs[Long]("n_bigrams") == 4L)
    assert(r0.getAs[Long]("n_distinct_bigrams") == 2L)
    assert(r0.getAs[Long]("top_bigram_count") == 2L)
    assert(r0.getAs[Double]("top_bigram_frac") == 0.5)
    assert(r0.getAs[Long]("n_trigrams") == 3L)
    assert(r0.getAs[Long]("dup_trigram_count") == 2L) // "a b a" twice
    val r1 = out(1L)
    assert(r1.getAs[Long]("n_bigrams") == 3L)
    assert(r1.getAs[Long]("n_distinct_bigrams") == 3L)
    assert(r1.getAs[Long]("top_bigram_count") == 1L)
    assert(r1.getAs[Long]("dup_trigram_count") == 0L)
    val r2 = out(2L)
    assert(r2.getAs[Long]("n_bigrams") == 0L)
    assert(r2.isNullAt(r2.fieldIndex("top_bigram_frac")))
    assert(r2.isNullAt(r2.fieldIndex("dup_trigram_frac")))
  }

  test("piiScrub: counts each class once, redacted text has no residue") {
    val out = TextOps.piiScrub(docs(Seq(
      (0L, "mail me at jane.doe+x@sub.example.org or 10.0.113.7 call 555-013-4422", "en"),
      (1L, "clean text with no identifiers at all", "en"))))
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    val r0 = out(0L)
    assert(r0.getAs[Long]("n_emails") == 1L)
    assert(r0.getAs[Long]("n_ips") == 1L)
    assert(r0.getAs[Long]("n_phones") == 1L)
    val r1 = out(1L)
    assert(r1.getAs[Long]("n_emails") == 0L)
    assert(r1.getAs[Long]("n_ips") == 0L)
    assert(r1.getAs[Long]("n_phones") == 0L)
    // a second scrub over the redacted text finds nothing: no residue
    val redacted = TextOps.piiScrub(docs(Seq(
      (0L, "mail me at jane.doe+x@sub.example.org or 10.0.113.7 call 555-013-4422", "en")))
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.lit(
          "mail me at [EMAIL] or [IP] call [PHONE]").as("text"))).head()
    assert(redacted.getAs[Long]("n_emails") == 0L)
    assert(redacted.getAs[Long]("n_ips") == 0L)
    assert(redacted.getAs[Long]("n_phones") == 0L)
  }

  test("importanceWeights: hand-computed cross-scaled LLR surrogate") {
    val s = spark
    import s.implicits._
    // target srcA: t = {a:2, b:1}, T=3; proposal: p = {a:3, b:1, c:1}, P=5
    // word weights t_w*P - p_w*T: a -> 10-9=1, b -> 5-3=2, c -> 0-3=-3
    val df = Seq(
      (0L, "a a b", "srcA"),  // score 1+1+2 = 4  -> upweight
      (1L, "a c", "srcB"))    // score 1-3  = -2 -> downweight
      .toDF("doc_id", "text", "source")
    val out = TextOps.importanceWeights(df, "srcA")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(0L).getAs[Long]("score") == 4L)
    assert(out(0L).getAs[Long]("n_tokens") == 3L)
    assert(out(0L).getAs[Boolean]("upweight"))
    assert(out(1L).getAs[Long]("score") == -2L)
    assert(!out(1L).getAs[Boolean]("upweight"))
  }

  test("lexicalDiversity: hand-computed TTR/hapax/Simpson, NULL below 2 tokens") {
    val out = TextOps.lexicalDiversity(docs(Seq(
      (0L, "a a b c", "en"), // n=4 types=3 hapax=2 coll=2 D=12
      (1L, "solo", "en")))) // single token: Simpson undefined
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    val d0 = out(0L)
    assert(d0.getAs[Long]("n_tokens") == 4L)
    assert(d0.getAs[Long]("n_types") == 3L)
    assert(d0.getAs[Long]("n_hapax") == 2L)
    assert(d0.getAs[Double]("ttr") == 0.75)
    assert(d0.getAs[Double]("hapax_frac") == 0.5)
    assert(d0.getAs[Double]("simpson") == 10.0 / 12.0)
    val d1 = out(1L)
    assert(d1.getAs[Long]("n_tokens") == 1L)
    assert(d1.getAs[Double]("ttr") == 1.0)
    assert(d1.isNullAt(d1.fieldIndex("simpson")))
  }

  test("piiScrub: sequencing — email digits are never recounted as phone/ip") {
    // an address whose local part and domain are digit-heavy: after the
    // email pass nothing digit-bearing survives for the later passes
    val r = TextOps.piiScrub(docs(Seq(
      (0L, "x 555-013-4422@10.mail-99.com y", "en")))).head()
    assert(r.getAs[Long]("n_emails") == 1L)
    assert(r.getAs[Long]("n_ips") == 0L)
    assert(r.getAs[Long]("n_phones") == 0L)
  }
}

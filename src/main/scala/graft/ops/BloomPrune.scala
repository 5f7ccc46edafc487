package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bloom-filter semi-join pruning with ENGINE-PORTABLE bits — the
  * runtime-filter pushdown a 100 TB join plans: build a tiny bit array
  * from the small side's keys and drop big-side rows whose probes miss,
  * so the shuffle/join only ever sees survivors. Spark has a built-in
  * runtime Bloom rewrite, but its bits are engine-internal; this one
  * derives every bit position from md5 (`hv48(h ":" key) mod bits`), so
  * the DuckDB twin reconstructs the EXACT filter and the whole pruning
  * decision is verifiable bit-for-bit — fp behavior included.
  *
  * [[audit]] reports the pruning quality: total rows, true member rows,
  * rows passing the filter, false-positive rows (pass but no match) and
  * the per-non-member-row fp rate. No false NEGATIVE is possible by
  * construction — the audit's `n_match ≤ n_pass` is the proof the gate
  * re-checks on live data.
  *
  * Scale shape: the small side collapses to distinct keys (collected —
  * it is the broadcast side by definition), the bit array ships as an
  * ARRAY LITERAL in the plan (bits/64 longs), and the big side is ONE
  * codegen'd scan — probe positions, word indexing, and the shift-mask
  * test are all native expressions; no join, no shuffle, no UDF. The
  * truth column (`isin` over the collected keys) exists only for the
  * audit; a production prune would keep just the membership filter.
  */
object BloomPrune {

  /** md5-derived bit position of hash round `h` for key `k` — the shared
    * kernel of the batch build, the SQL twin, and the streaming
    * [[graft.streaming.StatefulBloom]] build. */
  def bitPos(h: Int, k: Long, bits: Int): Int =
    (graft.streaming.StatefulKmv.hv48(s"$h:$k") % bits).toInt

  /** The packed word array of the Bloom filter over `keys`. Bit-ORs are
    * idempotent, associative and commutative, so this is exactly the
    * mergeable state a streaming ingest maintains incrementally
    * (StatefulBloom; its spec pins latest-emission ≡ these words). */
  def buildWords(keys: Iterable[Long], bits: Int, hashes: Int): Array[Long] = {
    require(bits % 64 == 0, "bits must pack into 64-bit words")
    val words = new Array[Long](bits / 64)
    for (k <- keys; h <- 0 until hashes) {
      val bp = bitPos(h, k, bits)
      words(bp >> 6) |= 1L << (bp & 63)
    }
    words
  }

  /** Audit the Bloom prune of `big`'s `k` column against `small`'s `k`
    * column. One summary row. */
  def audit(small: DataFrame, big: DataFrame,
            bits: Int = 4096, hashes: Int = 3): DataFrame = {
    val spark = small.sparkSession
    import spark.implicits._
    val keys: Array[Long] =
      small.select(col("k").cast("long")).distinct().as[Long].collect().sorted
    val words = buildWords(keys, bits, hashes)
    def probe(h: Int): String =
      s"(cast(conv(substring(md5(concat('$h:', cast(k as string))), 1, 12), 16, 10) as bigint) % $bits)"
    def test(h: Int): String =
      s"((shiftright(element_at(bloom_words, cast(${probe(h)} div 64 as int) + 1), " +
        s"cast(${probe(h)} % 64 as int)) & 1) = 1)"
    val membership = (0 until hashes).map(test).mkString(" AND ")
    // r17: the probe kernel is `hashes` md5s per row BEFORE any
    // Exchange — on the contract's single-file big side that stage ran
    // single-threaded (the Par.spread case, guide §2.5; ~1.8M md5 calls
    // serial at sf0.1). Spread the raw keys to session parallelism;
    // identity on any input already at least that wide or under
    // forcing. The downstream one-row aggregate is order-free.
    val flagged = Par.spread(big
      .select(col("k").cast("long").as("k")))
      .withColumn("bloom_words", array(words.toIndexedSeq.map(lit): _*))
      .withColumn("bloom_pass", expr(membership))
      .withColumn("is_match",
        if (keys.isEmpty) lit(false) else col("k").isin(keys.toIndexedSeq: _*))
    flagged.agg(
      count(lit(1)).as("n_rows"),
      count(when(col("is_match"), 1)).as("n_match"),
      count(when(col("bloom_pass"), 1)).as("n_pass"),
      count(when(col("bloom_pass") && !col("is_match"), 1)).as("n_false_pos"))
      .withColumn("n_small", lit(keys.length.toLong))
      .select(col("n_small"), col("n_rows"), col("n_match"), col("n_pass"),
        col("n_false_pos"),
        when(col("n_rows") > col("n_match"), Det.snap(
          col("n_false_pos").cast("double") /
            (col("n_rows") - col("n_match")).cast("double"), 6))
          .as("fp_rate"))
  }

  /** Oracle twin fragment builder: the bit-position set reconstructed in
    * SQL (`bset(bp)`), membership = every probe position IN bset —
    * set-membership over set bits is exactly the bit-array test. */
  def auditSql(smallSql: String, bigSql: String,
               bits: Int = 4096, hashes: Int = 3): String = {
    def hv(h: String, k: String): String =
      CorpusHex.hv48Sql(s"md5($h || ':' || CAST($k AS VARCHAR))")
    val probes = (0 until hashes).map(h =>
      s"(CAST(${hv(s"'$h'", "k")} % $bits AS BIGINT) IN (SELECT bp FROM bset))")
      .mkString(" AND ")
    s"""WITH small AS MATERIALIZED ($smallSql),
bset AS MATERIALIZED (
  SELECT DISTINCT CAST(${hv("CAST(h AS VARCHAR)", "k")} % $bits AS BIGINT) AS bp
  FROM small, (SELECT unnest(range(0, $hashes)) AS h)),
big AS ($bigSql),
flags AS (
  SELECT k,
         ($probes) AS bloom_pass,
         (k IN (SELECT k FROM small)) AS is_match
  FROM big),
agg AS (
  SELECT count(*) AS n_rows,
         CAST(count(CASE WHEN is_match THEN 1 END) AS BIGINT) AS n_match,
         CAST(count(CASE WHEN bloom_pass THEN 1 END) AS BIGINT) AS n_pass,
         CAST(count(CASE WHEN bloom_pass AND NOT is_match THEN 1 END) AS BIGINT) AS n_false_pos
  FROM flags)
SELECT (SELECT count(*) FROM small) AS n_small, n_rows, n_match, n_pass, n_false_pos,
       CASE WHEN n_rows > n_match THEN
         ${Det.snapSql("CAST(n_false_pos AS DOUBLE) / CAST(n_rows - n_match AS DOUBLE)", 6)}
       END AS fp_rate
FROM agg"""
  }
}

/** Shared 48-bit md5 hex parse for oracle SQL (also used by the query
  * layer's hv48Sql — kept here so ops-level twins can reference it
  * without a queries dependency). */
object CorpusHex {
  def hv48Sql(h: String): String =
    (1 to 12).map(i =>
      s"(strpos('0123456789abcdef', substring($h, $i, 1)) - 1) * ${1L << ((12 - i) * 4)}")
      .mkString("(", " + ", ")")
}

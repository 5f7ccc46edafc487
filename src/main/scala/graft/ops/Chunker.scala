package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-size overlapping token-window chunking — the step that turns a
  * cleaned corpus into training examples (context windows with stride
  * overlap). The reference has no corpus surface (SURVEY §2.9 is empty);
  * this is part of the LLM-data-pipeline family the engine adds on top.
  *
  * Chunk i of a document covers tokens [i·stride, min(i·stride+window, n))
  * for i·stride < n, tokens = `split(text, " ")` with trailing empties
  * kept (the same token rule as TextOps/Shingles, matching DuckDB
  * `string_split`). Emitted per chunk: index, token count, md5 of the
  * space-joined chunk text (the hash keeps verify output narrow — real
  * pipelines would carry the text column itself).
  *
  * Scale shape: embarrassingly parallel map-side flatMap — no shuffle at
  * all; output partitioning inherits the scan. The hot loop (split, join,
  * md5) is compiled Scala per record, not an interpreted higher-order
  * Catalyst lambda (CLAUDE.md invariant 4); one MessageDigest per
  * partition, zero per-row allocation beyond the chunk string itself.
  */
object Chunker {

  /** @param window chunk length in tokens
    * @param stride  distance between chunk starts (window−stride = overlap)
    */
  def chunks(docs: DataFrame, window: Int, stride: Int): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      "need 0 < stride <= window")
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
        it.flatMap { case (id, text) =>
          val ws = text.split(" ", -1) // keep trailing empties (Catalyst/DuckDB rule)
          val n = ws.length
          Iterator.range(0, n, stride).map { o =>
            val end = math.min(o + window, n)
            val sb = new java.lang.StringBuilder
            var j = o
            while (j < end) {
              if (j > o) sb.append(' ')
              sb.append(ws(j)); j += 1
            }
            (id, (o / stride).toLong, (end - o).toLong, hex(sb.toString))
          }
        }
      }
      .toDF("doc_id", "chunk_idx", "n_chunk_tokens", "chunk_md5")
  }

  /** DuckDB twin: same offsets via range(), same 1-based inclusive list
    * slice (clamped at the list end like the Scala `min(o+window, n)`). */
  def chunksSql(table: String, window: Int, stride: Int): String =
    s"""SELECT doc_id,
       CAST(o // $stride AS BIGINT) AS chunk_idx,
       CAST(least(o + $window, n) - o AS BIGINT) AS n_chunk_tokens,
       md5(array_to_string(ws[o + 1 : least(o + $window, n)], ' ')) AS chunk_md5
FROM (
  SELECT doc_id, ws, len(ws) AS n, unnest(range(0, len(ws), $stride)) AS o
  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM $table) t)"""
}

package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming exact deduplication — the ingest-time twin of
  * [[graft.ops.Dedup.exact]]: documents arrive on a stream and each
  * content-hash group's membership (canonical id = min doc_id, group
  * size, duplicate flags) refines as members show up, so a curation
  * pipeline can drop duplicates AT INGEST instead of re-scanning the
  * corpus per batch.
  *
  * Semantics contract: after any prefix of the stream, the latest
  * emission per doc_id equals batch `Dedup.exact` over exactly the
  * documents seen so far. A group re-emits all member rows whenever its
  * canonical id or size changes (the upsert pattern StatefulTopK uses),
  * so late arrival of a smaller doc_id re-canonicalizes its group —
  * convergence needs no ordering assumption at all. Replays are
  * idempotent (membership is a set).
  *
  * State: one entry per DISTINCT content hash, carrying the member-id
  * set — the streaming dedup table. Duplicate groups are tiny in real
  * corpora (the sf0.1 fixture's largest is <20), so state is O(distinct
  * texts)·O(1); at 100 TB the keyed state is hash-partitioned across
  * executors exactly like the batch Exchange on text_md5. Production
  * feeds with unbounded key churn would add a state TTL
  * (ProcessingTimeTimeout) and accept re-admitting a duplicate after
  * the window — the same trade every streaming dedup makes.
  *
  * The md5 here is `java.security.MessageDigest` over UTF-8 bytes —
  * bit-identical to Spark's `md5()` column and DuckDB's `md5()`
  * (StatefulDedupSpec pins the streaming≡batch equality).
  */
object StatefulDedup {

  final case class DocIn(doc_id: Long, text: String)
  final case class DedupOut(doc_id: Long, text_md5: String,
                            canonical_id: Long, group_size: Long,
                            is_duplicate: Boolean)
  final case class GState(ids: Seq[Long])

  /** Lowercase md5 hex of the UTF-8 text — Spark md5() replayed. */
  def md5Hex(text: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(text.getBytes("UTF-8"))
    val sb = new StringBuilder(32)
    d.foreach(b => sb.append(f"${b & 0xff}%02x"))
    sb.toString
  }

  def dedup(stream: Dataset[DocIn]): Dataset[DedupOut] = {
    val spark = stream.sparkSession
    import spark.implicits._
    stream
      .map(doc => (md5Hex(doc.text), doc.doc_id))
      .groupByKey(_._1)
      .flatMapGroupsWithState[GState, DedupOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (hash: String, rows: Iterator[(String, Long)], state: GroupState[GState]) =>
          val before = state.getOption.map(_.ids).getOrElse(Seq.empty)
          val ids = (before.toSet ++ rows.map(_._2)).toSeq.sorted
          state.update(GState(ids))
          if (ids != before) {
            val canonical = ids.head
            val size = ids.length.toLong
            ids.iterator.map(id =>
              DedupOut(id, hash, canonical, size, id != canonical))
          } else Iterator.empty
      }
  }
}

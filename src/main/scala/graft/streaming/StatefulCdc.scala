package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Live CDC MERGE-apply — the ingest-time twin of the batch
  * `cdc_upsert` query (AnalyticsQueries.cdcUpsert) and the streaming
  * shape of `MERGE INTO current USING log` / Delta's APPLY CHANGES
  * INTO: per key the current SCD1 row lives in keyed state, every
  * arriving change (upsert or DELETE tombstone) folds into it, and the
  * updated row is emitted as a CHANGELOG — the latest emission per key
  * IS the current snapshot row, with `alive = false` marking a
  * tombstoned key (a downstream sink deletes it; the batch query simply
  * omits it).
  *
  * Semantics contract (StatefulCdcSpec): after any stream prefix, the
  * latest emission per key with `alive = true` equals the batch
  * cdc_upsert row over the changes seen so far, column for column
  * (value/props picks, change/delete/resurrection counts), and keys
  * whose latest emission has `alive = false` are exactly the keys the
  * batch output omits. Works because the batch fold is a per-key
  * LEFT-TO-RIGHT pass in (ts, event_id) order — the same fold the
  * state performs incrementally; the resurrection counter needs only
  * the previous change's tombstone flag, which is part of the state.
  * Replays are dropped by the (ts, event_id) high-water mark (in-order
  * feed, the shared twin convention).
  *
  * State is O(1) per key — the current row plus four counters: the
  * 100 TB shape (state partitions like the batch Exchange; emission
  * volume is changes, and each emission is a complete current row, so
  * any keyed sink can upsert it idempotently).
  */
object StatefulCdc {

  final case class ChangeIn(user_id: Long, ts: java.sql.Timestamp,
                            event_id: Long, event_type: String,
                            value: Double, props: String)
  /** One changelog row: the complete current row for the key. */
  final case class RowOut(user_id: Long, alive: Boolean, value: Double,
                          props: String, updated_at: java.sql.Timestamp,
                          n_changes: Long, n_deletes: Long,
                          n_resurrections: Long)
  final case class CdcState(del: Boolean, value: Double, props: String,
                            lastUs: Long, lastId: Long, n: Long,
                            nDel: Long, nRes: Long)

  def apply(stream: Dataset[ChangeIn]): Dataset[RowOut] = {
    val spark = stream.sparkSession
    import spark.implicits._
    stream
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[CdcState, RowOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: Long, rows: Iterator[ChangeIn], state: GroupState[CdcState]) =>
          var st = state.getOption.orNull
          var changed = false
          val sorted = rows.toVector
            .sortBy(c => (EventTime.micros(c.ts), c.event_id))
          for (c <- sorted) {
            val us = EventTime.micros(c.ts)
            val fresh = st == null || us > st.lastUs ||
              (us == st.lastUs && c.event_id > st.lastId)
            if (fresh) {
              val del = c.event_type == "error"
              val wasDel = st != null && st.del
              st = CdcState(del,
                c.value, c.props, us, c.event_id,
                (if (st == null) 0L else st.n) + 1L,
                (if (st == null) 0L else st.nDel) + (if (del) 1L else 0L),
                (if (st == null) 0L else st.nRes) +
                  (if (wasDel && !del) 1L else 0L))
              changed = true
            } // else: stale/replayed change below the high-water mark
          }
          if (!changed) Iterator.empty
          else {
            state.update(st)
            Iterator.single(RowOut(key, !st.del, st.value, st.props,
              EventTime.toTimestamp(st.lastUs), st.n, st.nDel, st.nRes))
          }
      }
  }
}

package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming FIFO lot matching — the live twin of the batch `fifo_pnl`
  * query (AnalyticsQueries.fifoPnl): per key, unit-lot buys enqueue
  * their exact cent-grid price, sells match the queue head (skipped when
  * flat), and the running summary (realized P&L grid units, counts, open
  * inventory) re-emits at every invocation that touches the key — each
  * snapshot superseding the last, so the latest row per key equals the
  * batch fold over the prefix bit for bit (StatefulFifoSpec).
  *
  * State is O(open lots) per key — the open inventory, not the history;
  * realized P&L stays an exact Long on the cent grid so replay of the
  * emission (not the input) is side-effect free. Ordering contract:
  * same as [[StatefulVpin]]/[[StatefulImbalance]] — rows sort
  * (ts, event_id) within a micro-batch and a cross-batch straggler is
  * dropped by the monotone guard; streaming≡batch holds for feeds
  * ordered at micro-batch granularity. Sequential queue state is NOT
  * replay-idempotent: exactly-once delivery required, like the counting
  * sketches.
  */
object StatefulFifo {

  final case class FifoIn(user_id: Long, ts: java.sql.Timestamp,
                          event_id: Long, kind: Int, px: Long)
  final case class FifoState(lastUs: Long, lastSeq: Long, realized: Long,
                             nb: Long, ns: Long, nk: Long, lots: Seq[Long])
  final case class FifoOut(user_id: Long, n_buys: Long, n_sells: Long,
                           n_skipped: Long, realized_k: Long,
                           open_qty: Long, open_cost_k: Long)

  def summaries(stream: Dataset[FifoIn]): Dataset[FifoOut] = {
    val spark = stream.sparkSession
    import spark.implicits._
    stream
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FifoState, FifoOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: Long, rows: Iterator[FifoIn], state: GroupState[FifoState]) =>
          var st = state.getOption.getOrElse(
            FifoState(Long.MinValue, Long.MinValue, 0L, 0L, 0L, 0L, Vector.empty))
          val q = scala.collection.mutable.Queue.empty[Long]
          q ++= st.lots
          var realized = st.realized
          var nb = st.nb; var ns = st.ns; var nk = st.nk
          var lastUs = st.lastUs; var lastSeq = st.lastSeq
          val sorted = rows.toVector
            .sortBy(r => (EventTime.micros(r.ts), r.event_id))
          var touched = false
          for (r <- sorted) {
            val us = EventTime.micros(r.ts)
            if (us > lastUs || (us == lastUs && r.event_id > lastSeq)) {
              if (r.kind == 1) { q.enqueue(r.px); nb += 1L }
              else if (q.nonEmpty) { realized += r.px - q.dequeue(); ns += 1L }
              else nk += 1L
              lastUs = us; lastSeq = r.event_id; touched = true
            }
          }
          if (!touched) Iterator.empty
          else {
            state.update(FifoState(lastUs, lastSeq, realized, nb, ns, nk, q.toVector))
            Iterator.single(FifoOut(key, nb, ns, nk, realized, q.size.toLong, q.sum))
          }
      }
  }
}

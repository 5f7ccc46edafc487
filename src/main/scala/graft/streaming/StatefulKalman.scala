package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming local-level Kalman filter — the incremental form of
  * [[graft.ops.Indicators.kalmanPerKey]]: per key, O(1) state
  * (level, error variance, gain, high-water mark) advanced tick-by-tick
  * in event-time order, emitting the refreshed estimate whenever the
  * state moves (upsert semantics downstream). The predict/update body is
  * copied operand-for-operand from the batch fold, so the final upserts
  * equal the batch bits (StatefulKalmanSpec) — a live adaptive-gain
  * price tracker with zero batch/stream divergence, the serving half of
  * the kalman_level contract query. */
object StatefulKalman {

  final case class TickIn(product_id: String, event_time: java.sql.Timestamp,
                          sequence: Long, price: Double)
  final case class KState(lastUs: Long, lastSeq: Long, x: Double,
                          p: Double, k: Double, n: Long)
  final case class KOut(product_id: String, n_ticks: Long, level: Double,
                        gain: Double, p_var: Double)

  def filter(ticks: Dataset[TickIn], q: Double, r: Double,
             p0: Double): Dataset[KOut] = {
    val spark = ticks.sparkSession
    import spark.implicits._
    ticks
      .groupByKey(_.product_id)
      .flatMapGroupsWithState[KState, KOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[TickIn], state: GroupState[KState]) =>
          var st = state.getOption.getOrElse(
            KState(Long.MinValue, Long.MinValue, 0.0, 0.0, 0.0, 0L))
          val before = st
          val sorted = rows.toVector
            .sortBy(t => (EventTime.micros(t.event_time), t.sequence))
          for (t <- sorted) {
            val us = EventTime.micros(t.event_time)
            if (us > st.lastUs || (us == st.lastUs && t.sequence > st.lastSeq) || st.n == 0L) {
              if (st.n == 0L) st = KState(us, t.sequence, t.price, p0, 0.0, 1L)
              else {
                // identical operand order to Indicators.kalmanPerKey
                val p1 = st.p + q
                val k = p1 / (p1 + r)
                val x = st.x + k * (t.price - st.x)
                val p = (1.0 - k) * p1
                st = KState(us, t.sequence, x, p, k, st.n + 1L)
              }
            }
          }
          state.update(st)
          if (st != before)
            Iterator.single(KOut(key, st.n, st.x, st.k, st.p))
          else Iterator.empty
      }
  }
}

package graft.streaming

/** Exact event-time arithmetic for the stateful streaming operators.
  *
  * `java.sql.Timestamp.getTime` truncates to millisecond precision, but the
  * batch pipeline runs on `unix_micros` and the real tick/event data carries
  * sub-millisecond microseconds — sorting or comparing on `getTime` would
  * silently diverge from batch ordering (invariant 5 in CLAUDE.md). These
  * helpers derive the full microsecond value from the Timestamp's
  * second+nano decomposition, matching Spark's internal micros exactly.
  */
private[streaming] object EventTime {

  /** Exact micros-since-epoch of `ts` (identical to Spark's `unix_micros`). */
  def micros(ts: java.sql.Timestamp): Long = {
    val i = ts.toInstant
    i.getEpochSecond * 1000000L + i.getNano / 1000L
  }

  /** Timestamp carrying exactly `us` micros-since-epoch (inverse of
    * [[micros]]; preserves sub-millisecond precision that
    * `new Timestamp(ms)` would drop). */
  def toTimestamp(us: Long): java.sql.Timestamp =
    java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
      Math.floorDiv(us, 1000000L), Math.floorMod(us, 1000000L) * 1000L))

  /** "6 hours" / "30 seconds" → milliseconds (the StreamingJob duration
    * grammar, shared by the TTL twins). */
  def durationMs(d: String): Long = {
    val Array(n, unit) = d.trim.split("\\s+")
    val per = unit.toLowerCase match {
      case "millisecond" | "milliseconds" => 1L
      case "second" | "seconds" => 1000L
      case "minute" | "minutes" => 60000L
      case "hour" | "hours" => 3600000L
      case u => throw new IllegalArgumentException(s"unsupported duration unit $u")
    }
    n.toLong * per
  }
}

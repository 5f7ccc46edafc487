package graft.ops

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class SessionizeSpec extends AnyFunSuite {
  import TestSpark._

  test("an event EXACTLY gap after the previous one still merges (closed-interval boundary)") {
    // session_window's merge treats [t, t+gap] as closed: a successor at
    // exactly t+gap extends the session (pinned by the zipf 100× tier,
    // where replica shifts manufacture exact-gap successors — round 13).
    // 1800s gap: events at 0s and 1800s merge; 3601s starts a new one.
    val df = ticks(Seq(
      ("A", 0, 0, 10.0, None, None),
      ("A", 1800, 1, 11.0, None, None),
      ("A", 1800 + 1801, 2, 12.0, None, None)))
    val out = Sessionize(df, "product_id", "event_time", "price", "30 minutes")
      .orderBy("product_id", "session_start").collect()
    assert(out.length == 2, "exact-gap successor must merge; gap+1s must split")
    assert(out(0).getAs[Long]("n_events") == 2L)
    assert(out(0).getAs[java.sql.Timestamp]("session_end") == ts(1800 + 1800))
  }

  test("sessions split on > gap inactivity; end = last event + gap") {
    // key A: events at 0s, 60s, 120s (one session), then 4000s (new session)
    val df = ticks(Seq(
      ("A", 0, 0, 10.0, None, None),
      ("A", 60, 1, 11.0, None, None),
      ("A", 120, 2, 12.0, None, None),
      ("A", 4000, 3, 13.0, None, None),
      ("B", 50, 4, 20.0, None, None)))
    val out = Sessionize(df, "product_id", "event_time", "price", "30 minutes")
      .orderBy("product_id", "session_start").collect()
    assert(out.length == 3)
    val s1 = out(0)
    assert(s1.getAs[Long]("n_events") == 3L)
    assert(s1.getAs[java.sql.Timestamp]("session_start") == ts(0))
    assert(s1.getAs[java.sql.Timestamp]("session_end") == ts(120 + 1800))
    assert(math.abs(s1.getAs[Double]("total_value") - 33.0) < 1e-9)
    assert(out(1).getAs[Long]("n_events") == 1L)
    assert(out(2).getAs[String]("product_id") == "B")
  }
}

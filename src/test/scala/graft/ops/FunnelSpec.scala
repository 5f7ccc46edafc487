package graft.ops

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class FunnelSpec extends AnyFunSuite {
  import TestSpark._

  private def ev(rows: Seq[(Long, Long, String)]) = {
    val s = spark
    import s.implicits._
    rows.map { case (u, t, ty) => (u, ts(t), ty) }.toDF("user_id", "ts", "event_type")
  }

  test("funnel orders steps, ignores out-of-order events, applies horizon") {
    val df = ev(Seq(
      // user 1: full chain in order → reached 3, duration 20s
      (1L, 0L, "view"), (1L, 10L, "click"), (1L, 20L, "purchase"),
      // user 2: purchase BEFORE click → only reaches 2
      (2L, 0L, "view"), (2L, 30L, "click"), (2L, 5L, "purchase"),
      // user 3: click before view → never enters step 2; reaches 1
      (3L, 10L, "view"), (3L, 5L, "click"),
      // user 4: no view at all → excluded
      (4L, 0L, "click"), (4L, 1L, "purchase"),
      // user 5: purchase past the horizon → reaches 2
      (5L, 0L, "view"), (5L, 10L, "click"), (5L, 200L, "purchase")))
    val out = Funnel.threeStep(df, "user_id", "ts", "event_type",
        "view", "click", "purchase", horizonSec = 100L)
      .orderBy("user_id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 5L))
    assert(out.map(_.getInt(1)).toSeq == Seq(3, 2, 1, 2))
    assert(out(0).getAs[Long]("conversion_us") == 20000000L)
    assert(out(1).isNullAt(out(1).fieldIndex("t_purchase")))
  }

  test("same-timestamp steps chain (>= comparisons)") {
    val df = ev(Seq((1L, 0L, "view"), (1L, 0L, "click"), (1L, 0L, "purchase")))
    val out = Funnel.threeStep(df, "user_id", "ts", "event_type",
      "view", "click", "purchase", horizonSec = 10L).collect()
    assert(out.length == 1 && out(0).getInt(1) == 3)
    assert(out(0).getAs[Long]("conversion_us") == 0L)
  }
}

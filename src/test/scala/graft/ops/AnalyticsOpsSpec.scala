package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

/** AsofJoin / RangeJoin / Sample — hand-checkable fixtures. */
class AnalyticsOpsSpec extends AnyFunSuite {
  import TestSpark._

  private def tdf(rows: Seq[(String, Long, Double)], timeName: String, valName: String) = {
    val s = spark
    import s.implicits._
    rows.map { case (k, t, v) => (k, ts(t), v) }.toDF("k", timeName, valName)
  }

  test("asof join picks latest right row at-or-before, per key") {
    val left = tdf(Seq(("A", 10, 1.0), ("A", 25, 2.0), ("A", 5, 3.0), ("B", 10, 4.0)), "lt", "lv")
    val right = tdf(Seq(("A", 10, 100.0), ("A", 20, 200.0), ("B", 50, 300.0)), "rt", "rv")
    val out = AsofJoin(left, right, Seq("k"), "lt", "rt", Seq("rt" -> "mt", "rv" -> "mv"))
      .orderBy("k", "lt").collect()
    // A@5 → no match; A@10 → right@10 (tie matches); A@25 → right@20; B@10 → none
    assert(out.length == 4)
    assert(out(0).isNullAt(out(0).fieldIndex("mv")))                  // A@5
    assert(out(1).getAs[Double]("mv") == 100.0)                       // A@10 tie
    assert(out(2).getAs[Double]("mv") == 200.0)                       // A@25
    assert(out(3).isNullAt(out(3).fieldIndex("mv")))                  // B@10
    assert(out(1).getAs[Timestamp]("mt") == ts(10))
  }

  test("forward asof join picks earliest right row at-or-after, per key") {
    val left = tdf(Seq(("A", 10, 1.0), ("A", 25, 2.0), ("A", 50, 3.0), ("B", 10, 4.0)), "lt", "lv")
    val right = tdf(Seq(("A", 10, 100.0), ("A", 30, 200.0), ("B", 5, 300.0)), "rt", "rv")
    val out = AsofJoin.forward(left, right, Seq("k"), "lt", "rt",
        Seq("rt" -> "mt", "rv" -> "mv"))
      .orderBy("k", "lt").collect()
    // A@10 → right@10 (tie matches forward too); A@25 → right@30;
    // A@50 → none (series over); B@10 → none (B's only right is in the past)
    assert(out.length == 4)
    assert(out(0).getAs[Double]("mv") == 100.0)                       // A@10 tie
    assert(out(0).getAs[Timestamp]("mt") == ts(10))
    assert(out(1).getAs[Double]("mv") == 200.0)                       // A@25
    assert(out(2).isNullAt(out(2).fieldIndex("mv")))                  // A@50
    assert(out(3).isNullAt(out(3).fieldIndex("mv")))                  // B@10
  }

  test("forward asof join preserves left columns and row count") {
    val left = tdf(Seq(("A", 1, 1.0), ("A", 2, 2.0), ("C", 3, 3.0)), "lt", "lv")
    val right = tdf(Seq(("A", 5, 9.0)), "rt", "rv")
    val out = AsofJoin.forward(left, right, Seq("k"), "lt", "rt", Seq("rv" -> "mv"))
    assert(out.count() == 3)
    assert(out.columns.toSeq == Seq("k", "lt", "lv", "mv"))
  }

  test("asof join preserves every left column and row count") {
    val left = tdf(Seq(("A", 1, 1.0), ("A", 2, 2.0), ("C", 3, 3.0)), "lt", "lv")
    val right = tdf(Seq(("A", 1, 9.0)), "rt", "rv")
    val out = AsofJoin(left, right, Seq("k"), "lt", "rt", Seq("rv" -> "mv"))
    assert(out.count() == 3)
    assert(out.columns.toSeq == Seq("k", "lt", "lv", "mv"))
  }

  test("range join matches exactly the naive inequality join") {
    // interval [-60s, 0s): strictly-before within a minute
    val probe = tdf(Seq(("A", 100, 0.0), ("A", 200, 0.0), ("B", 100, 0.0)), "pt", "pv")
    val build = tdf(
      Seq(("A", 40, 1.0), ("A", 41, 2.0), ("A", 99, 3.0), ("A", 100, 4.0),
          ("A", 150, 5.0), ("B", 99, 6.0), ("B", 45, 7.0)), "bt", "bv")
    val fast = RangeJoin.pairs(probe, build, Seq("k"), "pt", "bt",
        lowerSec = -60L, upperSec = 0L, Seq("bv" -> "mv"))
      .select("k", "pt", "mv")
    val naive = probe.as("p").join(build.as("b"),
        col("p.k") === col("b.k") &&
          col("b.bt") >= col("p.pt") - expr("INTERVAL 60 seconds") &&
          col("b.bt") < col("p.pt"))
      .select(col("p.k").as("k"), col("p.pt").as("pt"), col("b.bv").as("mv"))
    assert(fast.exceptAll(naive).isEmpty && naive.exceptAll(fast).isEmpty)
    // A@100 sees 40,41,99 (not 100: exclusive; not 150: future); A@200 sees 150; B@100 sees 45,99
    assert(fast.count() == 6)
  }

  test("range join with positive-offset interval (future window)") {
    val probe = tdf(Seq(("A", 100, 0.0)), "pt", "pv")
    val build = tdf(Seq(("A", 100, 1.0), ("A", 160, 2.0), ("A", 40, 3.0)), "bt", "bv")
    val out = RangeJoin.pairs(probe, build, Seq("k"), "pt", "bt",
        lowerSec = 0L, upperSec = 61L, Seq("bv" -> "mv"))
      .select("mv").collect().map(_.getDouble(0)).sorted
    assert(out.toSeq == Seq(1.0, 2.0))    // [100, 161): 100 and 160, not 40
  }

  test("hash sample is deterministic and rate-accurate") {
    val s = spark
    import s.implicits._
    val df = (1L to 20000L).toDF("id")
    val kept = df.filter(Sample.hashFilter(col("id"), 0.25))
    val n1 = kept.count(); val n2 = kept.count()
    assert(n1 == n2)
    assert(math.abs(n1 / 20000.0 - 0.25) < 0.02)          // binomial ±3σ
    // edge rates
    assert(df.filter(Sample.hashFilter(col("id"), 0.0)).count() == 0)
    assert(df.filter(Sample.hashFilter(col("id"), 1.0)).count() == 20000)
  }

  test("stratified sample applies per-stratum rates") {
    val s = spark
    import s.implicits._
    val df = (1L to 10000L).map(i => (i, if (i % 2 == 0) "en" else "fr"))
      .toDF("id", "lang")
    val kept = Sample.stratified(df, col("id"), col("lang"), Map("en" -> 0.8), 0.1)
    val by = kept.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(by("en") / 5000.0 - 0.8) < 0.03)
    assert(math.abs(by("fr") / 5000.0 - 0.1) < 0.03)
  }
}

package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Knight-style distributed Kendall vs the brute-force all-pairs count.
  * The operator's claim is COUNT equality (exact longs) — τ bits follow
  * for free because both forms divide the same integers. Random data
  * includes heavy ties in a, b, and (a, b) jointly so every tie branch
  * (within-partition sort exclusion, equal-b run buffering, the
  * a-tie-across-partitions impossibility argument) is exercised, and
  * partition counts far exceeding the data force the cross-partition
  * machinery onto many tiny partitions.
  */
class KendallSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def brute(rows: Seq[(Double, Double)]): (Long, Long, Long, Long) = {
    var c = 0L; var d = 0L; var t = 0L
    val a = rows.toIndexedSeq
    for (i <- a.indices; j <- (i + 1) until a.size) {
      val s = math.signum(a(j)._1 - a(i)._1) * math.signum(a(j)._2 - a(i)._2)
      if (s > 0) c += 1 else if (s < 0) d += 1 else t += 1
    }
    (a.size.toLong * (a.size - 1) / 2, c, d, t)
  }

  private def run(rows: Seq[(Double, Double)], nPart: Int): (Long, Long, Long, Long) = {
    val df = rows.zipWithIndex
      .map { case ((a, b), i) => (a, b, i.toLong) }
      .toDF("a", "b", "t")
      .repartition(4) // arbitrary incoming layout
    val r = Kendall.counts(df, "a", "b", "t", Some(nPart)).head()
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
  }

  test("strictInversions: merge count equals quadratic on tied data") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 20) {
      val arr = Array.fill(rnd.nextInt(50) + 1)(rnd.nextInt(8).toDouble)
      val want = (for (i <- arr.indices; j <- (i + 1) until arr.length
                       if arr(i) > arr(j)) yield 1L).sum
      assert(Kendall.strictInversions(arr.clone()) == want)
    }
  }

  private def forcedDist[A](body: => A): A = {
    sys.props("graft.force.distributed") = "1"
    try body finally sys.props -= "graft.force.distributed"
  }

  test("counts equal brute force on random tied data, many partitionings") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 6) {
      val n = 40 + rnd.nextInt(120)
      // coarse value grids => many ties in a, b, and (a, b)
      val rows = Seq.fill(n)((rnd.nextInt(12).toDouble / 2.0,
        rnd.nextInt(12).toDouble / 2.0))
      val want = brute(rows)
      // driver fast path (under the gate) AND the forced two-pass
      // distributed split, across partitionings
      assert(run(rows, 8) == want, s"trial $trial driver path")
      for (nPart <- Seq(1, 3, 8, 32)) {
        assert(forcedDist(run(rows, nPart)) == want,
          s"trial $trial nPart $nPart distributed")
      }
    }
  }

  test("monotone and anti-monotone extremes, both branches") {
    val inc = (1 to 50).map(i => (i.toDouble, i.toDouble))
    val (p1, c1, d1, t1) = run(inc, 8)
    assert((c1, d1, t1) == (p1, 0L, 0L))
    assert(forcedDist(run(inc, 8)) == ((p1, c1, d1, t1)))
    val dec = (1 to 50).map(i => (i.toDouble, -i.toDouble))
    val (p2, c2, d2, t2) = run(dec, 8)
    assert((c2, d2, t2) == (0L, p2, 0L))
    assert(forcedDist(run(dec, 8)) == ((p2, c2, d2, t2)))
  }

  test("all-tied input: every pair tied, tau computed over full n_pairs") {
    val flat = Seq.fill(30)((1.0, 2.0))
    val (p, c, d, t) = run(flat, 8)
    assert((c, d, t) == (0L, 0L, p))
    assert(forcedDist(run(flat, 8)) == ((p, c, d, t)))
  }

  test("degenerate inputs: empty and single row, both branches") {
    assert(run(Seq.empty, 4) == (0L, 0L, 0L, 0L))
    assert(run(Seq((1.0, 1.0)), 4) == (0L, 0L, 0L, 0L))
    assert(forcedDist(run(Seq.empty, 4)) == (0L, 0L, 0L, 0L))
    assert(forcedDist(run(Seq((1.0, 1.0)), 4)) == (0L, 0L, 0L, 0L))
  }

  private def bruteByKey(rows: Seq[(String, Double, Double)])
      : Map[String, (Long, Long, Long, Long, Long)] =
    rows.groupBy(_._1).map { case (k, rs) =>
      val a = rs.toIndexedSeq
      var c = 0L; var d = 0L; var ta = 0L; var tb = 0L
      for (i <- a.indices; j <- (i + 1) until a.size) {
        val sa = math.signum(a(j)._2 - a(i)._2)
        val sb = math.signum(a(j)._3 - a(i)._3)
        if (sa * sb > 0) c += 1 else if (sa * sb < 0) d += 1
        if (sa == 0) ta += 1
        if (sb == 0) tb += 1
      }
      k -> (c, d, ta, tb, a.size.toLong)
    }

  test("countsByKey equals per-key brute force, ties and multi-key") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(11)
    val rows = for {
      k <- Seq("A", "B", "C", "D")
      i <- 0 until (30 + rnd.nextInt(60))
    } yield (k, rnd.nextInt(9).toDouble, rnd.nextInt(9).toDouble)
    val df = rows.zipWithIndex
      .map { case ((k, a, b), i) => (k, a, b, i.toLong) }
      .toDF("k", "a", "b", "t").repartition(7)
    val got = Kendall.countsByKey(df, "k", "a", "b", "t", Some(5))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(3), r.getLong(4), r.getLong(5),
        r.getLong(6), r.getLong(1)))
      .toMap
    assert(got == bruteByKey(rows))
  }

  test("countsByKey tau_b matches scipy-style formula on exact counts") {
    val s = spark
    import s.implicits._
    val rows = Seq.tabulate(60)(i =>
      ("K", (i % 7).toDouble, ((i * 3) % 5).toDouble, i.toLong))
    val df = rows.toDF("k", "a", "b", "t")
    val r = Kendall.countsByKey(df, "k", "a", "b", "t", Some(3)).head()
    val (np, c, d, ta, tb) = (r.getLong(2), r.getLong(3), r.getLong(4),
      r.getLong(5), r.getLong(6))
    val want = math.floor((c - d).toDouble /
      math.sqrt(java.lang.Double.parseDouble(
        (java.math.BigInteger.valueOf(np - ta)
          .multiply(java.math.BigInteger.valueOf(np - tb))).toString))
      * 1e6 + 0.5) / 1e6
    assert(java.lang.Double.doubleToLongBits(r.getDouble(7)) ==
      java.lang.Double.doubleToLongBits(want))
  }

  test("countsByKey: all-tied a yields null tau_b") {
    val s = spark
    import s.implicits._
    val df = Seq.tabulate(10)(i => ("K", 1.0, i.toDouble, i.toLong))
      .toDF("k", "a", "b", "t")
    val r = Kendall.countsByKey(df, "k", "a", "b", "t", Some(2)).head()
    assert(r.isNullAt(7))
  }

  test("tau_a matches the direct snap of (C-D)/P") {
    val rnd = new scala.util.Random(9)
    val rows = Seq.fill(80)((rnd.nextInt(10).toDouble, rnd.nextInt(10).toDouble))
    val df = rows.zipWithIndex.map { case ((a, b), i) => (a, b, i.toLong) }
      .toDF("a", "b", "t")
    val r = Kendall.counts(df, "a", "b", "t", Some(8))
      .select(col("tau_a"),
        Det.snap((col("concordant") - col("discordant")).cast("double") /
          col("n_pairs").cast("double"), 6).as("direct"))
      .head()
    assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
      java.lang.Double.doubleToLongBits(r.getDouble(1)))
  }
}

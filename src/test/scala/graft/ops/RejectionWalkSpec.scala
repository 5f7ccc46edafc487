package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.scalatest.funsuite.AnyFunSuite

/** Proofs for [[RandomWalk.rejectionWalks]] — the hub-scale node2vec
  * walker (r14 verdict stretch). It is NOT bit-equivalent to
  * [[RandomWalk.biasedWalks]] (different draw streams, and a bounded
  * 1−(1−wMin/wMax)^rounds fallback tail); what the scaladoc promises and
  * this spec measures instead:
  *
  *  1. per-transition DISTRIBUTIONAL equivalence — over many independent
  *     walk streams in one fixed (prev, cur) state, the empirical
  *     next-node frequencies match the analytic node2vec law
  *     (1−q)·(w/Σw) + q·uniform, q = (1 − E[w]/wMax)^(rounds−1), within
  *     4σ, and match the EXACT walker's empirical draw to the same
  *     tolerance;
  *  2. the realized last-round rate matches the geometric tail bound;
  *  3. determinism — two evaluations produce identical walks;
  *  4. the Θ(1)-per-step shape: each walk emits exactly one row per
  *     step, and the per-walk work is `rounds` proposal rows regardless
  *     of degree — checked on a 5,000-degree hub star where the exact
  *     walker's candidate expansion would be 100× larger per step.
  */
class RejectionWalkSpec extends AnyFunSuite {
  import TestSpark._

  // weighted test state: from (prev=1, cur=2), node 2's neighbors are
  //   1 → return (w=4), 3 → common (edge 1-3 exists, w=2), 4,5 → out (w=1)
  private val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (2L, 5L))
    .flatMap { case (a, b) => Seq((a, b), (b, a)) }

  private def frames = {
    val s = spark
    import s.implicits._
    val nbr = edges.toDF("nx", "ny")
      .withColumn("idx", row_number().over(
        Window.partitionBy(col("nx")).orderBy(col("ny"))).cast("long") - 1L)
    val deg = nbr.groupBy(col("nx").as("dx")).agg(count(lit(1)).as("deg"))
    (nbr.localCheckpoint(true), deg)
  }

  private val N = 20000
  private def curState = {
    val s = spark
    import s.implicits._
    (1 to N).map(i => (i.toLong, 2L, 1L)).toDF("walk_id", "node", "prev")
  }

  private def freqs(df: org.apache.spark.sql.DataFrame): Map[Long, Double] =
    df.groupBy(col("node")).agg(count(lit(1)).as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1).toDouble / N).toMap

  test("transition law matches the analytic node2vec target and the exact walker") {
    val (nbr, deg) = frames
    val got = freqs(RandomWalk.rejectionStepFrame(curState, nbr, deg, t = 2,
      wReturn = 4L, wCommon = 2L, wOut = 1L, wMax = 4L, rounds = 8,
      seedPrefix = "spec"))
    // analytic law: mixture of the target (∝ w) and the uniform
    // fallback, q = P(7 straight rejections), P(reject) = 1 − E[w]/wMax
    val w = Map(1L -> 4.0, 3L -> 2.0, 4L -> 1.0, 5L -> 1.0)
    val q = math.pow(1.0 - w.values.sum / 4 / 4.0, 7) // (1 − (8/4)/4)^7
    val law = w.map { case (x, wx) =>
      x -> ((1 - q) * wx / w.values.sum + q * 0.25) }
    // 4σ at the least certain outcome (p≈0.5, N=20000) ≈ 0.014
    law.foreach { case (x, p) =>
      assert(math.abs(got(x) - p) < 4 * math.sqrt(p * (1 - p) / N) + 1e-9,
        s"node $x: got ${got(x)}, law $p")
    }
    // and the EXACT walker's empirical draw agrees within the combined
    // tolerance (both estimate the same law up to the q-tail)
    val exact = freqs(RandomWalk.biasedStepFrame(curState, nbr, t = 2,
      wReturn = 4L, wCommon = 2L, wOut = 1L, seedPrefix = "spec",
      broadcastProbe = true))
    w.keys.foreach { x =>
      assert(math.abs(got(x) - exact(x)) <
        8 * math.sqrt(0.5 * 0.5 / N) + q,
        s"node $x: rejection ${got(x)} vs exact ${exact(x)}")
    }
  }

  test("the realized last-round rate matches the geometric tail bound") {
    val (nbr, deg) = frames
    val diag = RandomWalk.rejectionStepFrame(curState, nbr, deg, t = 2,
      wReturn = 4L, wCommon = 2L, wOut = 1L, wMax = 4L, rounds = 8,
      seedPrefix = "spec", keepDiagnostics = true)
    val lastRound = diag.filter(col("r") === 7).count().toDouble / N
    // P(reach round 7) = 0.5^7 ≈ 0.0078 in this state; allow 3× slack
    assert(lastRound < 0.025, s"last-round rate $lastRound too high")
    assert(lastRound > 0.0, "fixture too small to exercise the fallback tail")
    // exactly one emission per walk (the step contract)
    assert(diag.count() == N)
    assert(diag.select(col("walk_id")).distinct().count() == N)
  }

  test("deterministic: two evaluations produce identical walks") {
    val s = spark
    import s.implicits._
    val dir = edges.toDF("x", "y")
    val nodes = (1L to 5L).toDF("node")
    def run() = RandomWalk.rejectionWalks(dir, nodes, steps = 6)
      .collect().map(_.toSeq).toSeq.sortBy(_.toString)
    val a = run(); val b = run()
    assert(a == b)
    assert(a.size == 5 * 7) // every walk runs the full length
  }

  test("hub star: full-length walks, one row per (walk, step), Θ(rounds) work per step") {
    val s = spark
    import s.implicits._
    // hub 0 connected to leaves 1..5000: the exact walker's step from
    // the hub expands 5000 candidate rows per walk; rejection proposes 8
    val hubEdges = (1L to 5000L).flatMap(l => Seq((0L, l), (l, 0L)))
    val dir = hubEdges.toDF("x", "y")
    val nodes = (0L to 49L).toDF("node") // hub + 49 leaves
    val walks = RandomWalk.rejectionWalks(dir, nodes, steps = 10,
      seedPrefix = "hub")
    assert(walks.count() == 50 * 11)
    assert(walks.groupBy(col("walk_id"), col("step")).count()
      .filter(col("count") > 1).count() == 0)
    // every odd step from a leaf returns to the hub (leaves have deg 1);
    // even steps sit on some leaf — the walk alternates correctly
    val hubAtOdd = walks.filter(col("step") % 2 === 1 && col("walk_id") > 0)
    assert(hubAtOdd.filter(col("node") =!= 0L).count() == 0)
  }
}

package graft.ops

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class RandomWalkSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def dir(es: (Long, Long)*) =
    (es ++ es.map(_.swap)).toDF("x", "y")

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def draw(walkId: Long, t: Int): Long =
    java.lang.Long.parseLong(md5hex(s"walk:$walkId:$t").take(12), 16)

  /** Driver reference walk with the same seeded draws. */
  private def reference(es: Seq[(Long, Long)], starts: Seq[Long],
                        steps: Int): Set[(Long, Long, Long)] = {
    val adj = (es ++ es.map(_.swap)).groupBy(_._1)
      .map { case (k, v) => k -> v.map(_._2).sorted }
    starts.flatMap { w =>
      var cur = w
      (0L, w) +: (1 to steps).flatMap { t =>
        adj.get(cur) match {
          case Some(ns) =>
            cur = ns((draw(w, t) % ns.size).toInt)
            Some((t.toLong, cur))
          case None => None
        }
      } map { case (t, n) => (w, t, n) }
    }.toSet
  }

  private def run(d: org.apache.spark.sql.DataFrame, starts: Seq[Long],
                  steps: Int): Set[(Long, Long, Long)] =
    RandomWalk.walks(d, starts.toDF("node"), steps).collect()
      .map(r => (r.getAs[Long]("walk_id"), r.getAs[Long]("step"),
        r.getAs[Long]("node"))).toSet

  private val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))

  test("walks equal the seeded driver reference") {
    val got = run(dir(tri: _*), Seq(1L, 2L, 3L, 4L, 5L), steps = 4)
    assert(got == reference(tri, Seq(1L, 2L, 3L, 4L, 5L), 4))
    assert(got.count(_._2 == 0L) == 5)
    // full-length walks: every start emits steps 0..4 (no sinks here)
    assert(got.size == 5 * 5)
  }

  test("walks are deterministic across runs") {
    val a = run(dir(tri: _*), Seq(1L, 3L), steps = 3)
    val b = run(dir(tri: _*), Seq(1L, 3L), steps = 3)
    assert(a == b)
  }

  test("every consecutive pair is an edge (walks follow the graph)") {
    val got = run(dir(tri: _*), Seq(1L, 2L, 3L, 4L, 5L), steps = 4)
    val eset = (tri ++ tri.map(_.swap)).toSet
    val byWalk = got.groupBy(_._1)
    byWalk.values.foreach { rows =>
      rows.toSeq.sortBy(_._2).map(_._3).sliding(2).foreach {
        case Seq(a, b) => assert(eset.contains((a, b)))
        case _ =>
      }
    }
  }

  test("isolated start emits only its step-0 row") {
    val got = run(dir(tri: _*), Seq(99L), steps = 3)
    assert(got == Set((99L, 0L, 99L)))
  }

  test("a degree-1 node bounces back deterministically") {
    val got = run(dir((7L, 8L)), Seq(7L), steps = 2)
    assert(got == Set((7L, 0L, 7L), (7L, 1L, 8L), (7L, 2L, 7L)))
  }

  // ------------------------------------------------ node2vec biased

  private def drawN2v(walkId: Long, t: Int): Long =
    java.lang.Long.parseLong(md5hex(s"n2v:$walkId:$t").take(12), 16)

  /** Driver reference for the biased walk: same weighted cumulative
    * pick as [[RandomWalk.biasedWalks]], replayed imperatively. */
  private def referenceBiased(es: Seq[(Long, Long)], starts: Seq[Long],
                              steps: Int, wr: Long, wc: Long, wo: Long)
      : Set[(Long, Long, Long)] = {
    val dirEdges = (es ++ es.map(_.swap)).distinct
    val adj = dirEdges.groupBy(_._1)
      .map { case (k, v) => k -> v.map(_._2).sorted }
    val eset = dirEdges.toSet
    starts.flatMap { w =>
      var cur = w
      var prev: Option[Long] = None
      (0L, w) +: (1 to steps).flatMap { t =>
        adj.get(cur) match {
          case Some(ns) =>
            val wts = ns.map { x =>
              if (prev.contains(x)) wr
              else if (prev.exists(p => eset.contains((p, x)))) wc
              else wo
            }
            val r = drawN2v(w, t) % wts.sum
            var acc = 0L
            var pick = -1
            wts.zipWithIndex.foreach { case (wt, i) =>
              if (pick < 0) { acc += wt; if (r < acc) pick = i }
            }
            prev = Some(cur); cur = ns(pick)
            Some((t.toLong, cur))
          case None => None
        }
      } map { case (t, n) => (w, t, n) }
    }.toSet
  }

  private def runBiased(d: org.apache.spark.sql.DataFrame,
                        starts: Seq[Long], steps: Int,
                        wr: Long, wc: Long, wo: Long)
      : Set[(Long, Long, Long)] =
    RandomWalk.biasedWalks(d, starts.toDF("node"), steps, wr, wc, wo)
      .collect()
      .map(r => (r.getAs[Long]("walk_id"), r.getAs[Long]("step"),
        r.getAs[Long]("node"))).toSet

  test("biased walks equal the seeded driver reference") {
    val got = runBiased(dir(tri: _*), Seq(1L, 2L, 3L, 4L, 5L), 4,
      4L, 2L, 1L)
    assert(got == referenceBiased(tri, Seq(1L, 2L, 3L, 4L, 5L), 4,
      4L, 2L, 1L))
    assert(got.count(_._2 == 0L) == 5)
    assert(got.size == 5 * 5)
  }

  test("uniform weights reduce the biased walk to the uniform law") {
    // wr = wc = wo = 1: the weighted pick degenerates to idx selection
    // under the same mod-deg draw, so the corpus must equal a uniform
    // replay seeded with the n2v prefix.
    val starts = Seq(1L, 2L, 3L, 4L, 5L)
    val got = runBiased(dir(tri: _*), starts, 4, 1L, 1L, 1L)
    val adj = (tri ++ tri.map(_.swap)).groupBy(_._1)
      .map { case (k, v) => k -> v.map(_._2).sorted }
    val want = starts.flatMap { w =>
      var cur = w
      (0L, w) +: (1 to 4).map { t =>
        cur = adj(cur)((drawN2v(w, t) % adj(cur).size).toInt)
        (t.toLong, cur)
      } map { case (t, n) => (w, t, n) }
    }.toSet
    assert(got == want)
  }

  test("forced-distributed probe (no broadcast hint) is bit-identical") {
    // biasedWalks broadcast-hints the distance-1 probe side under the
    // BroadcastEdgeRows gate; forcing drops the hint (the 100 TB shuffled
    // shape). Both branches must produce the same bits.
    val starts = Seq(1L, 2L, 3L, 4L, 5L)
    val want = runBiased(dir(tri: _*), starts, 4, 4L, 2L, 1L)
    sys.props("graft.force.distributed") = "1"
    try {
      val got = runBiased(dir(tri: _*), starts, 4, 4L, 2L, 1L)
      assert(got == want)
    } finally sys.props.remove("graft.force.distributed")
  }

  test("walks and biased walks leave exactly one surviving checkpoint") {
    val sc = spark.sparkContext
    for (go <- Seq(
        () => RandomWalk.walks(dir(tri: _*), Seq(1L, 2L).toDF("node"), 3),
        () => RandomWalk.biasedWalks(dir(tri: _*), Seq(1L, 2L).toDF("node"), 3))) {
      val before = sc.getPersistentRDDs.keySet.toSet
      val res = go()
      res.collect()
      val after = sc.getPersistentRDDs.keySet.toSet -- before
      assert(after.size == 1,
        s"walker must keep only its corpus checkpoint, left: $after")
      graft.ops.Checkpoints.release(res)
      assert((sc.getPersistentRDDs.keySet.toSet -- before).isEmpty)
    }
  }

  test("biased walks are deterministic across runs and follow edges") {
    val a = runBiased(dir(tri: _*), Seq(1L, 3L), 3, 4L, 2L, 1L)
    val b = runBiased(dir(tri: _*), Seq(1L, 3L), 3, 4L, 2L, 1L)
    assert(a == b)
    val eset = (tri ++ tri.map(_.swap)).toSet
    a.groupBy(_._1).values.foreach { rows =>
      rows.toSeq.sortBy(_._2).map(_._3).sliding(2).foreach {
        case Seq(x, y) => assert(eset.contains((x, y)))
        case _ =>
      }
    }
  }
}

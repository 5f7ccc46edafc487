package graft.ops

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class BfsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Both orientations of an undirected edge list. */
  private def dir(es: (Long, Long)*) =
    (es ++ es.map(_.swap)).toDF("x", "y")

  private def seeds(ns: Long*) = ns.toDF("node")

  private def run(d: org.apache.spark.sql.DataFrame,
                  s: org.apache.spark.sql.DataFrame,
                  rounds: Int): Map[Long, (Long, Long)] =
    Bfs.seededHops(d, s, rounds).collect()
      .map(r => r.getAs[Long]("node") ->
        (r.getAs[Long]("hops"), r.getAs[Long]("nearest_seed"))).toMap

  /** Driver reference: multi-source BFS with (hops, seed) lexicographic
    * tie-break. */
  private def reference(es: Seq[(Long, Long)], ss: Seq[Long],
                        rounds: Int): Map[Long, (Long, Long)] = {
    val adj = (es ++ es.map(_.swap)).groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    var best = ss.map(n => n -> (0L, n)).groupBy(_._1)
      .map { case (k, v) => k -> v.map(_._2).min }
    for (_ <- 1 to rounds) {
      val cand = best.toSeq.flatMap { case (n, (h, s)) =>
        adj.getOrElse(n, Seq.empty).map(m => m -> (h + 1, s)) }
      best = (best.toSeq ++ cand).groupBy(_._1)
        .map { case (k, v) => k -> v.map(_._2).min }
    }
    best
  }

  // path 1-2-3-4-5 with a branch 3-6, seeds at both ends
  private val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (3L, 6L))

  test("hops and nearest-seed match the driver reference on a path") {
    val got = run(dir(path: _*), seeds(1L, 5L), rounds = 4)
    assert(got == reference(path, Seq(1L, 5L), 4))
    assert(got(3L) == (2L, 1L)) // equidistant from both seeds -> min seed id
    assert(got(6L) == (3L, 1L))
  }

  test("bounded rounds label only the reachable ball") {
    val got = run(dir(path: _*), seeds(1L), rounds = 2)
    assert(got == Map(1L -> (0L, 1L), 2L -> (1L, 1L), 3L -> (2L, 1L)))
  }

  test("extra rounds past the eccentricity are fixpoint no-ops") {
    val a = run(dir(path: _*), seeds(1L, 5L), rounds = 4)
    val b = run(dir(path: _*), seeds(1L, 5L), rounds = 9)
    assert(a == b)
  }

  test("disconnected component stays unlabeled; its own seed labels it") {
    val es = path ++ Seq((10L, 11L))
    val one = run(dir(es: _*), seeds(1L), rounds = 6)
    assert(!one.contains(10L) && !one.contains(11L))
    val two = run(dir(es: _*), seeds(1L, 11L), rounds = 6)
    assert(two(10L) == (1L, 11L) && two(11L) == (0L, 11L))
  }

  test("empty edge list leaves the seeds at distance 0") {
    val got = run(dir(), seeds(7L, 9L), rounds = 3)
    assert(got == Map(7L -> (0L, 7L), 9L -> (0L, 9L)))
  }

  test("a seed adjacent to another seed keeps its own 0-hop label") {
    val got = run(dir((1L, 2L)), seeds(1L, 2L), rounds = 3)
    assert(got == Map(1L -> (0L, 1L), 2L -> (0L, 2L)))
  }
}

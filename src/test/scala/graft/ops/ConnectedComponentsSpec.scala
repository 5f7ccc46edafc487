package graft.ops

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class ConnectedComponentsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def cc(pairs: Seq[(Long, Long)]): Map[Long, Long] =
    ConnectedComponents.clusters(pairs.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("components get the min id as canonical label") {
    // {1,2,3} via chain, {10,11}, {20} isolated-pair self edge
    val m = cc(Seq((2L, 1L), (2L, 3L), (11L, 10L), (20L, 20L)))
    assert(m == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L, 20L -> 20L))
  }

  test("long chain converges (propagation crosses the whole path)") {
    // path 0-1-2-...-12: diameter 12
    val m = cc((0L until 12L).map(i => (i, i + 1)))
    assert(m.values.toSet == Set(0L))
    assert(m.size == 13)
  }

  test("two cliques joined by one bridge merge") {
    val c1 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val c2 = for (a <- 10L to 13L; b <- (a + 1) to 13L) yield (a, b)
    val m = cc(c1 ++ c2 :+ (4L, 10L))
    assert(m.values.toSet == Set(1L))
  }

  test("driver union-find and distributed propagation are bit-identical") {
    // deterministic pseudo-random graph: chains, cliques, bridges, self
    // edges, isolated pairs — every structural case in one fixture
    val rnd = new scala.util.Random(42)
    val pairs = (
      (0L until 20L).map(i => (i, i + 1)) ++                  // long chain
      (for (a <- 100L to 106L; b <- (a + 1) to 106L) yield (a, b)) ++ // clique
      Seq((20L, 100L)) ++                                     // bridge
      Seq((500L, 500L), (601L, 600L)) ++                      // self + pair
      (0 until 60).map(_ => (rnd.nextInt(50).toLong + 200L,
        rnd.nextInt(50).toLong + 200L))                       // random blob
    )
    val df = pairs.toDF("a", "b")
    val small = ConnectedComponents.clusters(df, "a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    val looped = ConnectedComponents.clusters(df, "a", "b", smallEdges = -1L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(small == looped)
    assert(small.nonEmpty)
  }

  test("forced-loop path on an empty edge list matches the driver path") {
    val empty = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(ConnectedComponents.clusters(empty, "a", "b").isEmpty)
    assert(ConnectedComponents.clusters(empty, "a", "b", smallEdges = -1L).isEmpty)
  }
}

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
}

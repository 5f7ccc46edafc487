package graft

import org.scalatest.funsuite.AnyFunSuite

/** The size-adaptive pagerank flip: the driver replay of the long-grid
  * walk must be BIT-identical to the distributed iteration loop — every
  * quantity in the walk is an exact long (floor divisions, damped
  * integer update), so the only difference between the paths is
  * summation order, which exact longs make irrelevant.
  */
class GraphAdaptiveSpec extends AnyFunSuite {
  import TestSpark._

  private val dir = "/root/testdata/sf0.001"

  test("pagerank driver path and distributed loop are bit-identical") {
    def rows(smallEdges: Long) =
      queries.GraphQueries.pagerank(spark, dir, smallEdges)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .sortBy(_._1).toSeq
    val driver = rows(1L << 20)
    val looped = rows(-1L)
    assert(driver.nonEmpty, "fixture graph must be non-empty")
    // exact tuple equality: longs AND the double pr bits
    assert(driver == looped)
  }
}

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

  // Deterministic synthetic graph with structure worth testing: a dense
  // clustered core (peel survivors, short hops) plus chain tails (peel
  // cascades over multiple rounds; hops past the BFS radius).
  private def syntheticEdges(): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(42)
    val core = for (_ <- 1 to 300) yield {
      val a = rnd.nextInt(60).toLong; val b = rnd.nextInt(60).toLong
      if (a < b) (a, b) else (b, a)
    }
    val tails = for (t <- 0 until 8; i <- 0 until 10) yield {
      val base = 100L + t * 20
      if (i == 0) (t.toLong, base) else (base + i - 1, base + i)
    }
    (core.filter { case (a, b) => a != b } ++ tails).distinct
  }

  test("Bfs.seededHops driver replay and distributed loop are bit-identical") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val pairs = syntheticEdges().toDF("x", "y")
    val dirE = pairs.unionByName(
      pairs.select(col("y").as("x"), col("x").as("y"))).cache()
    val seeds = Seq(3L, 17L, 105L).toDF("node")
    def rows(smallEdges: Long) =
      ops.Bfs.seededHops(dirE, seeds, rounds = 4, smallEdges = smallEdges)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._1).toSeq
    val driver = rows(1L << 20)
    val looped = rows(-1L)
    assert(driver.nonEmpty && driver.exists(_._2 > 1),
      "fixture must exercise multi-hop relaxation")
    assert(driver == looped)
    dirE.unpersist()
  }

  test("KCore.peel driver replay and distributed loop are bit-identical") {
    import spark.implicits._
    val pairs = syntheticEdges().toDF("x", "y")
    def rows(smallBytes: Long) =
      ops.KCore.peel(pairs, k = 3, rounds = 6, smallBytes = smallBytes)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
        .sortBy(_._1).toSeq
    val driver = rows(1L << 30)
    val looped = rows(-1L)
    assert(driver.nonEmpty, "peel must leave a core at k=3")
    assert(driver == looped)
  }
}

package graft.ops

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** CoOccur.triangleStats: the degree-oriented census must match a
  * brute-force triangle/wedge count on arbitrary graphs, give identical
  * results on the broadcast and sort-merge paths, and actually produce
  * the sort-merge plan when the edge list is declared over-threshold. */
class CoOccurSpec extends AnyFunSuite {
  import TestSpark._

  private def edgeDf(es: Seq[(Long, Long)]) = {
    val s = spark
    import s.implicits._
    es.toDF("x", "y")
  }

  /** reference counts: ordered wedges x<y<z centered at y; triangles by
    * brute force over the edge set */
  private def reference(es: Seq[(Long, Long)]): (Long, Long) = {
    val set = es.toSet
    val nodes = es.flatMap(e => Seq(e._1, e._2)).distinct
    val wedges = nodes.map { y =>
      es.count(_._2 == y).toLong * es.count(_._1 == y).toLong
    }.sum
    val tris = (for {
      (x, y) <- es; z <- nodes if y < z && set.contains((y, z)) && set.contains((x, z))
    } yield 1).size.toLong
    (wedges, tris)
  }

  private val graphs = Seq(
    // K5: 10 edges, C(5,3)=10 triangles
    "K5" -> (for { i <- 0L until 5L; j <- (i + 1) until 5L } yield (i, j)),
    // star from hub 0 (hub has max degree; orientation must not explode)
    "star" -> (1L to 8L).map(i => (0L, i)),
    // star + one rim edge → exactly 1 triangle
    "star+rim" -> ((1L to 8L).map(i => (0L, i)) :+ (1L, 2L)),
    // hub with HIGH id (id-orientation would emit deg² wedges at the hub)
    "hiHub" -> (0L to 7L).map(i => (i, 99L)),
    // pseudo-random graph, ~30 edges
    "rand" -> (for {
      i <- 0L until 15L; j <- (i + 1) until 15L
      if (i * 7919 + j * 104729) % 5 == 0
    } yield (i, j)))

  test("matches brute force on assorted graphs (broadcast path)") {
    for ((name, es) <- graphs) {
      val (wedges, tris) = reference(es)
      val row = CoOccur.triangleStats(edgeDf(es)).head
      assert(row.getAs[Long]("n_edges") == es.size.toLong, s"$name edges")
      assert(row.getAs[Long]("n_wedges") == wedges, s"$name wedges")
      assert(row.getAs[Long]("n_triangles") == tris, s"$name triangles")
    }
  }

  test("sort-merge path (threshold 0) returns identical rows") {
    for ((name, es) <- graphs) {
      val b = CoOccur.triangleStats(edgeDf(es), broadcastThreshold = Long.MaxValue).head
      val m = CoOccur.triangleStats(edgeDf(es), broadcastThreshold = 0L).head
      assert(b == m, s"$name: broadcast row $b != sort-merge row $m")
    }
  }

  test("over-threshold edge list plans non-broadcast joins") {
    // kill Catalyst's size-based auto-broadcast too — at 100 TB the edge
    // list is over both thresholds; the plan must degrade to shuffled joins
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "-1")
      val df = CoOccur.triangleStats(edgeDf(graphs.head._2), broadcastThreshold = 0L)
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
        s"expected a shuffled wedge join in the large-graph plan:\n$p")
      // and the census is still correct on that plan
      val (wedges, tris) = reference(graphs.head._2)
      val row = df.head
      assert(row.getAs[Long]("n_wedges") == wedges
        && row.getAs[Long]("n_triangles") == tris)
    } finally spark.conf.set(key, prev)
  }

  test("empty edge list yields a zero census row") {
    val row = CoOccur.triangleStats(edgeDf(Nil)).head
    assert(row.getAs[Long]("n_edges") == 0L && row.getAs[Long]("n_wedges") == 0L
      && row.getAs[Long]("n_triangles") == 0L)
    assert(row.isNullAt(row.fieldIndex("wedge_closure")))
  }
}

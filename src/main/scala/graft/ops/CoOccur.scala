package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Co-occurrence graph building blocks shared by the graph analytics
  * family (triangle census, PageRank, degree distribution — one edge
  * definition, one implementation, reference: flink-signals has no graph
  * surface; this is part of the pipeline-analytics breadth).
  *
  * Scale shape: pair generation is ONE shuffle on the group key — a typed
  * flatMapGroups dedupes each group's item set and emits its O(k²) pairs
  * (k bounded by group size; a per-record hot loop, CLAUDE.md invariant 4
  * — higher-order array lambdas would run interpreted). Edge aggregation
  * shuffles the pair table once on (x, y). Everything downstream of
  * [[edges]] is edge-list-sized, never fact-sized.
  */
object CoOccur {

  /** Undirected co-occurrence pairs with their shared-group counts:
    * (x, y, c), x < y, c = number of groups both items appear in. Both
    * id columns Long, c Long. The unthresholded base under [[edges]]
    * and the percentile edge rule (GraphQueries.linkPrediction). */
  def pairCounts(fact: DataFrame, groupCol: String,
                 itemCol: String): DataFrame = {
    val spark = fact.sparkSession
    import spark.implicits._
    fact
      .select(col(groupCol).cast("long"), col(itemCol).cast("long"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (_, it) =>
        val items = it.map(_._2).toArray.distinct.sorted
        for { i <- items.indices.iterator; j <- (i + 1 until items.length).iterator }
          yield (items(i), items(j))
      }
      .toDF("x", "y")
      .groupBy(col("x"), col("y"))
      .agg(count(lit(1)).as("c"))
  }

  /** Thresholded co-occurrence edge list: undirected edges (x, y), x < y,
    * between items sharing ≥ `minCo` groups. Both columns Long. */
  def edges(fact: DataFrame, groupCol: String, itemCol: String,
            minCo: Int): DataFrame =
    pairCounts(fact, groupCol, itemCol)
      .filter(col("c") >= minCo)
      .select(col("x"), col("y"))

  /** Triangle / wedge census over an undirected edge list (x < y): one
    * row (n_edges, n_wedges, n_triangles, wedge_closure). Two plans off
    * the MEASURED edge count (not hoped-for size), identical results
    * (CoOccurSpec proves path equality against brute force):
    *
    * - `n_edges ≤ broadcastThreshold`: id-oriented wedge join with the
    *   edge list broadcast — 2 broadcast joins, the cheapest plan while
    *   the edge list fits an executor.
    * - beyond the threshold: the ordered-wedge count drops its join
    *   entirely (Σ_y lo(y)·hi(y), lo = #edges (·,y), hi = #edges (y,·)
    *   — one hash aggregate), and the closure is degree-oriented
    *   (Schank–Wagner): each edge directed from its (degree, id)-smaller
    *   endpoint caps out-degree at O(√m), so the shuffled wedge
    *   self-join generates Σ outdeg² = O(m^1.5) candidates — the bound
    *   that survives 100×, unlike id-orientation where one small-id hub
    *   emits deg² pairs. The triangle count is orientation-independent
    *   (every triangle has exactly one node with two out-edges under a
    *   consistent orientation), hence bit-identical across paths.
    *
    * `edges` is evaluated more than once (count + census); pass a
    * cached frame.
    */
  def triangleStats(edges: DataFrame, broadcastThreshold: Long = 1000000L): DataFrame = {
    val nEdges = edges.agg(count(lit(1)).as("n_edges"))
    val small = nEdges.head.getLong(0) <= broadcastThreshold

    val counts =
      if (small) {
        // small-graph fast path: the id-oriented wedge join with the edge
        // list broadcast — 2 joins, both counts from one pipeline. x<y and
        // y<z by construction → each wedge/triangle counted exactly once.
        val wedges = edges.as("e1").join(broadcast(edges).as("e2"),
            col("e1.y") === col("e2.x"))
          .select(col("e1.x").as("x"), col("e1.y").as("y"), col("e2.y").as("z"))
        wedges.as("w").join(broadcast(edges).as("e3"),
            col("w.x") === col("e3.x") && col("w.z") === col("e3.y"), "left")
          .agg(count(lit(1)).as("n_wedges"), count(col("e3.x")).as("n_triangles"))
      } else {
        // at scale the edge list outgrows broadcast AND id-orientation's
        // deg² hub blowup; both counts restructure:
        // ordered-wedge census needs NO join — Σ_y lo(y)·hi(y) where
        // lo(y) = #edges (·,y), hi(y) = #edges (y,·), one hash aggregate
        val loHi = edges.select(col("x").as("v"), lit(1L).as("hi"), lit(0L).as("lo"))
          .unionByName(edges.select(col("y").as("v"), lit(0L).as("hi"), lit(1L).as("lo")))
          .groupBy(col("v"))
          .agg(sum(col("hi")).as("hi"), sum(col("lo")).as("lo"))
        val wedgeCount = loHi.agg(
          coalesce(sum(col("lo") * col("hi")), lit(0L)).as("n_wedges"))
        // degree-oriented closure (Schank–Wagner): orient every edge from
        // its (deg, id)-smaller endpoint → out-degree capped at O(√m),
        // candidate volume Σ outdeg² = O(m^1.5); deg(v) = lo(v) + hi(v)
        val deg = loHi.select(col("v"), (col("lo") + col("hi")).as("deg"))
        val withDeg = edges
          .join(deg.select(col("v").as("x"), col("deg").as("dx")), "x")
          .join(deg.select(col("v").as("y"), col("deg").as("dy")), "y")
        val oriented = withDeg.select(
          when(col("dx") < col("dy") || (col("dx") === col("dy") && col("x") < col("y")),
            struct(col("x").as("src"), col("y").as("dst"), col("dy").as("ddst")))
            .otherwise(
              struct(col("y").as("src"), col("x").as("dst"), col("dx").as("ddst")))
            .as("e"))
          .select(col("e.src"), col("e.dst"), col("e.ddst"))
        val candidates = oriented.as("a1")
          .join(oriented.as("a2"),
            col("a1.src") === col("a2.src") &&
              (col("a1.ddst") < col("a2.ddst") ||
                (col("a1.ddst") === col("a2.ddst") && col("a1.dst") < col("a2.dst"))))
          // the closing edge is oriented from the (deg,id)-smaller of
          // (u, w), which by candidate construction is u = a1.dst
          .select(col("a1.dst").as("u"), col("a2.dst").as("w"))
        val triCount = candidates
          .join(oriented.select(col("src").as("u"), col("dst").as("w")), Seq("u", "w"),
            "left_semi")
          .agg(count(lit(1)).as("n_triangles"))
        wedgeCount.crossJoin(triCount)
      }

    nEdges.crossJoin(counts)
      .select(col("n_edges"), col("n_wedges"), col("n_triangles"))
      .withColumn("wedge_closure",
        when(col("n_wedges") > 0, Det.snap(
          col("n_triangles").cast("double") / col("n_wedges").cast("double"), 6)))
  }
}

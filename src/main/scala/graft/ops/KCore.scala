package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core decomposition by fixed-round peeling — the graph-cohesion
  * filter (drop low-degree periphery until only the dense core remains)
  * used on co-occurrence graphs to isolate the stable backbone.
  *
  * Semantics per round r over the surviving edge set E_{r−1}:
  * deg_r = degrees in E_{r−1}; survivors_r = {v : deg_r(v) ≥ k};
  * E_r = E_{r−1} restricted to survivor endpoints. After `rounds`
  * rounds the output is every survivor of the LAST round with its
  * residual degree in E_rounds (0 when all its edges left with peeled
  * neighbors — the signal the peel had not yet converged there).
  * Rounds are FIXED, not convergence-tested, so the oracle twin can
  * unroll the identical trajectory; once the true fixpoint is reached,
  * further rounds are no-ops (the peel is idempotent), so `rounds` just
  * has to cover the deepest cascade of the data.
  *
  * Scale shape: each round is ONE map-side-combinable degree aggregate
  * plus two semi joins keyed on the node — never a node×node product —
  * and the edge frame is eagerly localCheckpoint'ed per round exactly
  * like the ConnectedComponents loop, so the driver-orchestrated
  * iteration never grows a lineage. All quantities are exact integers:
  * nothing to snap, bit-identical in any engine.
  */
object KCore {

  /** Peel an undirected edge list (x < y, Long endpoints) for `rounds`
    * rounds at threshold `k`. Output: (node, degree) — last-round
    * survivors with their residual degree. */
  def peel(edges0: DataFrame, k: Int = 2, rounds: Int = 6): DataFrame = {
    require(rounds >= 1, "at least one peel round")
    var edges = edges0
      .select(col("x").cast("long"), col("y").cast("long"))
      .localCheckpoint(true)
    var survivors: DataFrame = null
    var r = 0
    while (r < rounds) {
      val deg = edges.select(col("x").as("node"))
        .unionByName(edges.select(col("y").as("node")))
        .groupBy(col("node")).agg(count(lit(1)).as("deg"))
      survivors = deg.filter(col("deg") >= k).select(col("node"))
        .localCheckpoint(true)
      edges = edges
        .join(survivors.select(col("node").as("x")), Seq("x"), "left_semi")
        .join(survivors.select(col("node").as("y")), Seq("y"), "left_semi")
        .select(col("x"), col("y"))
        .localCheckpoint(true)
      r += 1
    }
    val finDeg = edges.select(col("x").as("node"))
      .unionByName(edges.select(col("y").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("degree"))
    survivors.join(finDeg, Seq("node"), "left")
      .select(col("node"), coalesce(col("degree"), lit(0L)).as("degree"))
  }
}

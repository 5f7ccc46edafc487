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
    * survivors with their residual degree.
    *
    * Size-adaptive (r17, the ConnectedComponents/Bfs pattern): the peel
    * is EXACT INTEGER set arithmetic (counts, ≥ k filters, semi joins),
    * so a driver replay of the same trajectory is bit-identical by
    * construction (GraphAdaptiveSpec). Under the byte gate — read O(1)
    * from the initial checkpoint's BlockManager info, no job — the
    * rounds×(agg + 2 semi joins + 2 checkpoint jobs) scheduling is pure
    * overhead on a graph that fits one task; collect once and replay.
    * Past the gate (or SPARK_GRAFT_FORCE_DISTRIBUTED) the distributed
    * loop runs unchanged — the 100 TB shape. */
  def peel(edges0: DataFrame, k: Int = 2, rounds: Int = 6,
           smallBytes: Long = Adaptive.threshold(SmallEdgeBytes)): DataFrame = {
    require(rounds >= 1, "at least one peel round")
    var edges = edges0
      .select(col("x").cast("long"), col("y").cast("long"))
      .localCheckpoint(true)
    if (Checkpoints.bytes(edges) <= smallBytes) {
      val pe = edges.collect().map(r => (r.getLong(0), r.getLong(1)))
      val spark = edges.sparkSession
      Checkpoints.release(edges)
      return peelDriver(spark, pe, k, rounds)
    }
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

  /** Edge-frame byte gate for the driver replay: 2-long rows store at
    * ≈48 B of deserialized block per row, so 48 MB ≈ 2²⁰ edges — the
    * same envelope as ConnectedComponents' 1M-row collect gate. */
  private[graft] val SmallEdgeBytes = 48L << 20

  /** Driver replay of the peel over a collected edge list: identical
    * per-round operations — degree census over surviving edges, ≥ k
    * survivor filter, edge restriction to survivor endpoints — in exact
    * integer arithmetic (order-irrelevant counts), then survivors with
    * their residual degree (0 when all edges left with peeled
    * neighbors). */
  private def peelDriver(spark: org.apache.spark.sql.SparkSession,
                         edges0: Array[(Long, Long)],
                         k: Int, rounds: Int): DataFrame = {
    import spark.implicits._
    import scala.collection.mutable
    var edges = edges0
    var survivors: mutable.LongMap[Unit] = null
    for (_ <- 1 to rounds) {
      val deg = mutable.LongMap.empty[Long]
      edges.foreach { case (x, y) =>
        deg.update(x, deg.getOrElse(x, 0L) + 1L)
        deg.update(y, deg.getOrElse(y, 0L) + 1L)
      }
      val surv = mutable.LongMap.empty[Unit]
      deg.foreach { case (n, d) => if (d >= k) surv.update(n, ()) }
      survivors = surv
      edges = edges.filter { case (x, y) =>
        surv.contains(x) && surv.contains(y)
      }
    }
    val finDeg = mutable.LongMap.empty[Long]
    edges.foreach { case (x, y) =>
      finDeg.update(x, finDeg.getOrElse(x, 0L) + 1L)
      finDeg.update(y, finDeg.getOrElse(y, 0L) + 1L)
    }
    val rows = survivors.keys.toArray.sorted
      .map(n => (n, finDeg.getOrElse(n, 0L))).toIndexedSeq
    spark.createDataset(rows).toDF("node", "degree")
  }
}

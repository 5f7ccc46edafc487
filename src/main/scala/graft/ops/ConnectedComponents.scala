package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Connected components over near-duplicate pairs — the step that turns
  * pairwise dedup output into canonical clusters (keep one doc per
  * component, drop the rest): iterative min-label propagation, the
  * standard cluster-scale algorithm (each vertex repeatedly adopts the
  * smallest label among itself and its neighbors until fixpoint; the
  * final label is the component's minimum id, a deterministic canonical
  * representative).
  *
  * Each iteration is one distributed join + aggregate — O(diameter)
  * iterations total. Near-dup components are near-cliques (diameter ≤
  * ~3), so the loop terminates in a handful of rounds; `maxIter` caps
  * pathological chains and convergence is asserted (a silent cap would
  * return wrong clusters). The driver loop only orchestrates; all data
  * stays distributed, and each iteration CHECKPOINTS its labels —
  * iterative self-referencing DataFrames otherwise grow their logical
  * plan every round until analysis itself OOMs (persist alone does not
  * truncate lineage). Locally that's `localCheckpoint`; on a cluster,
  * set a reliable checkpoint dir and swap to `checkpoint` for fault
  * tolerance.
  */
object ConnectedComponents {

  /** @return (id, cluster_id = min id in component) for every vertex
    *         appearing in `pairs`. */
  def clusters(pairs: DataFrame, aCol: String, bCol: String,
               maxIter: Int = 25): DataFrame = {
    val edges = pairs.select(col(aCol).cast("long").as("src"),
      col(bCol).cast("long").as("dst"))
    val sym = edges
      .unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    // Fuse round 1 into initialization: label₀ = min(id, min neighbor) is
    // exactly what the first propagation round would compute from lbl=id,
    // at the cost of one aggregate instead of a join — one fewer
    // join+checkpoint+count round on the driver-orchestrated loop.
    var labels = sym.groupBy(col("src"))
      .agg(min(col("dst")).as("mn"))
      .select(col("src").as("id"), least(col("src"), col("mn")).as("lbl"))
      .localCheckpoint(true)
    var changed = 1L
    var it = 0
    while (changed > 0 && it < maxIter) {
      val nbrMin = sym.join(labels, sym("dst") === labels("id"))
        .groupBy(sym("src")).agg(min(col("lbl")).as("nbr_lbl"))
      // The change flag rides in the checkpointed frame, so the
      // convergence count scans materialized rows instead of re-running
      // the join as a second job per iteration.
      val newLbl = least(labels("lbl"), coalesce(col("nbr_lbl"), labels("lbl")))
      val next = labels.join(nbrMin, labels("id") === nbrMin("src"), "left")
        .select(labels("id"), newLbl.as("lbl"),
          (newLbl =!= labels("lbl")).as("__chg"))
        .localCheckpoint(true)
      changed = next.filter(col("__chg")).count()
      labels = next.drop("__chg")
      it += 1
    }
    require(changed == 0, s"label propagation did not converge in $maxIter iterations")
    sym.unpersist()
    labels.select(col("id"), col("lbl").as("cluster_id"))
  }

  /** DuckDB twin: recursive transitive closure + per-vertex min. Fine at
    * oracle scale; the Spark side is the 100 TB path. */
  def clustersSql(pairsSubquery: String, aCol: String, bCol: String): String =
    s"""WITH RECURSIVE mh AS (
  SELECT * FROM ($pairsSubquery) q
), sym AS (
  SELECT $aCol AS src, $bCol AS dst FROM mh
  UNION
  SELECT $bCol AS src, $aCol AS dst FROM mh
), reach(id, r) AS (
  SELECT src, src FROM sym
  UNION
  SELECT sym.src, reach.r FROM sym JOIN reach ON sym.dst = reach.id
)
SELECT id, min(r) AS cluster_id FROM reach GROUP BY id"""
}

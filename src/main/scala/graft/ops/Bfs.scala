package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-source bounded-hop BFS (seed Voronoi) over a directed edge
  * list — every node reachable within `rounds` hops gets its hop count
  * to the NEAREST seed and, among equally-near seeds, the smallest seed
  * id. The classic "assign each node to its closest hub" primitive
  * (graph partition seeding, landmark distance labeling, blast-radius /
  * contagion probes) that the component and pagerank family doesn't
  * answer: components say WHETHER nodes touch, BFS says HOW FAR.
  *
  * Determinism: a label is the single long `hops·step + seed`, so the
  * per-round combine is `min(code)` — an exact-integer, fully
  * associative aggregate whose lexicographic (hops, seed) order is the
  * tie-break. Both engines fold identical longs; no floats anywhere.
  * The multi-source BFS invariant makes fixed-round unrolling exact:
  * every (node, seed) pair at hop distance d is discovered at round d
  * (all length-d paths relax in round d), so after R rounds the label
  * set equals the true ≤R-hop distance map — extra rounds past the
  * eccentricity are no-ops at fixpoint, exactly like KCore's rounds.
  *
  * Scale shape: per round ONE shuffled equi-join of the label frame
  * against the directed edge list plus one min-aggregate — the
  * Bellman-Ford relaxation step, Pregel's DataFrame form. State is 16
  * bytes per labeled node; the edge list is the dominant operand and
  * the caller caches it across rounds. `localCheckpoint` per round
  * truncates the 2×-per-round lineage fan-out (the ConnectedComponents
  * pattern). Rounds are a small constant, so the whole op is
  * `rounds` × (join + agg) — no driver state, no collect.
  *
  * Reference parity: the reference has no graph stage at all
  * (flink-signals/sql/views.sql is windows + joins); this extends the
  * co-occurrence-graph family (SURVEY §2 beyond-reference breadth).
  */
object Bfs {

  /** `dir`: DIRECTED edges (x, y) — pass both orientations for an
    * undirected graph (and cache it; counted once and, past the small
    * gate, evaluated `rounds` times). `seeds`: (node). Output:
    * (node, hops, nearest_seed), one row per node within `rounds` hops
    * of any seed. `step` must exceed every node id (default 2^40) so
    * the packed code never collides.
    *
    * Size-adaptive (r17, the ConnectedComponents/pagerank pattern): the
    * relaxation is EXACT LONG min-arithmetic throughout, so a driver
    * replay of the same operations is bit-identical to the distributed
    * loop by construction (GraphAdaptiveSpec). The per-round eager
    * checkpoint is REQUIRED by the recurrence's double self-reference
    * (dist feeds both the union and the join — lazy chaining is a
    * 2^rounds subtree blowup, r16 probe), so under `smallEdges` the
    * rounds×(join+agg+checkpoint-job) scheduling is pure overhead:
    * collect the edge list once and replay. Past the gate (or under
    * SPARK_GRAFT_FORCE_DISTRIBUTED) the distributed loop runs
    * unchanged — the 100 TB shape. */
  def seededHops(dir: DataFrame, seeds: DataFrame, rounds: Int,
                 step: Long = 1L << 40,
                 smallEdges: Long = Adaptive.threshold(1L << 20)): DataFrame = {
    // Packing envelope: code = hops·step + seed_id, min-reduced as one
    // long. Requires every seed id < step AND the max code
    // rounds·step + step to stay under 2^63, else codes collide or wrap.
    require(step > 0 && rounds.toLong + 1L <= Long.MaxValue / step,
      s"rounds=$rounds overflows the hops*step packing for step=$step")
    if (dir.count() <= smallEdges) {
      val edges = dir.select(col("x").cast("long"), col("y").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      val seedIds = seeds.select(col("node").cast("long"))
        .collect().map(_.getLong(0))
      return seededHopsDriver(dir.sparkSession, edges, seedIds, rounds, step)
    }
    // seed-sized eager checkpoint: gives the label frame fresh attribute
    // ids (callers routinely derive seeds FROM the edge list — top-degree
    // hubs — which would otherwise trip the ambiguous-self-join check on
    // the round-1 join) and truncates lineage like every later round
    var dist = seeds.select(col("node").cast("long").as("node"))
      // data-side guard for the same envelope: a seed id >= step would
      // silently alias as extra hops. assert_true is NULL on success;
      // the isNull filter keeps every row and can't be pruned away. The
      // eager checkpoint below forces the check to run now.
      .filter(assert_true(col("node") >= 0L && col("node") < lit(step),
        lit(s"Bfs.seededHops: seed id out of [0, $step) packing range"))
        .isNull)
      .withColumn("code", col("node"))
      .localCheckpoint(true)
    for (_ <- 1 to rounds) {
      val cand = dist.join(dir, dist("node") === dir("x"))
        .select(dir("y").cast("long").as("node"),
          (dist("code") + lit(step)).as("code"))
      dist = dist.unionByName(cand)
        .groupBy(col("node")).agg(min(col("code")).as("code"))
        .localCheckpoint(true)
    }
    dist.select(col("node"),
      expr(s"code div $step").as("hops"),
      (col("code") % step).as("nearest_seed"))
  }

  /** Driver replay of the min-code relaxation over a collected edge
    * list: identical operations — per round, every labeled node offers
    * `code + step` to each out-neighbor and each node keeps the MIN
    * code (exact longs; min is order-independent, so the different
    * combine order is irrelevant). The final `div/%` unpacking matches
    * the distributed select (non-negative operands: Scala `/`/`%` ≡
    * SQL div/%). */
  private def seededHopsDriver(spark: org.apache.spark.sql.SparkSession,
                               edges: Array[(Long, Long)],
                               seedIds: Array[Long],
                               rounds: Int, step: Long): DataFrame = {
    import spark.implicits._
    import scala.collection.mutable
    seedIds.foreach(sd => require(sd >= 0L && sd < step,
      s"Bfs.seededHops: seed id out of [0, $step) packing range"))
    val adj = mutable.LongMap.empty[mutable.ArrayBuffer[Long]]
    edges.foreach { case (x, y) =>
      adj.getOrElseUpdate(x, mutable.ArrayBuffer.empty[Long]) += y
    }
    val dist = mutable.LongMap.empty[Long]
    seedIds.foreach(sd => dist.update(sd, math.min(dist.getOrElse(sd, Long.MaxValue), sd)))
    for (_ <- 1 to rounds) {
      val upd = mutable.LongMap.empty[Long]
      dist.foreach { case (node, code) =>
        adj.get(node).foreach(_.foreach { y =>
          val c = code + step
          if (c < upd.getOrElse(y, Long.MaxValue)) upd.update(y, c)
        })
      }
      upd.foreach { case (n, c) =>
        if (c < dist.getOrElse(n, Long.MaxValue)) dist.update(n, c)
      }
    }
    val rows = dist.toArray.sortBy(_._1)
      .map { case (n, c) => (n, c / step, c % step) }.toIndexedSeq
    spark.createDataset(rows).toDF("node", "hops", "nearest_seed")
  }
}

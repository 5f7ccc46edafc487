package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic uniform random walks over a directed edge list — the
  * DeepWalk/node2vec corpus generator (Perozzi KDD'14): one fixed-length
  * walk per start node, each step choosing a neighbor uniformly by a
  * seeded 48-bit md5 draw instead of an RNG, so the SAME walks come out
  * of every engine, run, and retry (the md5-portable determinism used by
  * the sketch family / salted splits). Step t from node c picks neighbor
  * index `md5("<prefix>:<walk_id>:<t>")₄₈ mod deg(c)` against the
  * node's (y-ascending) neighbor ranking — draw independent of c, so a
  * revisited node redraws rather than loops.
  *
  * Scale shape: the neighbor index is ONE ranking window partitioned by
  * source node (per-partition work bounded by max degree); each step is
  * one equi-join of the walk frontier (|nodes| rows, 16 bytes each)
  * against degree + indexed-neighbor frames keyed on the current node —
  * hub skew is bounded by the walk count, not degree². `steps` is a
  * small constant; per-step `localCheckpoint` truncates lineage (the
  * BFS/CC pattern). No driver state, no collect; output is
  * (steps+1)·|nodes| rows, the shuffle-ready sentence corpus a
  * skip-gram trainer consumes.
  *
  * Checkpoint hygiene (round-10 verdict): the returned corpus is itself
  * an eager checkpoint, and every intermediate block set — the indexed
  * neighbor/degree frames and each step's frontier — is released via
  * [[Checkpoints.release]] before returning, so a walk query leaves
  * exactly ONE result-sized checkpoint behind (CacheHygieneSpec).
  *
  * Walks terminate early only at sinks (no outgoing edge); over a
  * symmetrized undirected graph every walked-to node has deg ≥ 1, so
  * walks always run the full length. Isolated start nodes emit only
  * their step-0 row.
  */
object RandomWalk {

  private def draw48(seedPrefix: String, t: Int): Column =
    conv(substring(md5(concat(lit(seedPrefix + ":"),
      col("walk_id").cast("string"), lit(s":$t"))), 1, 12), 16, 10)
      .cast("long")

  /** One LAZY uniform step: the frontier joins degree for the modular
    * pick, then the indexed neighbor ranking for the chosen edge. Seam
    * for the walk-family plan pins (the eager checkpoints hide the
    * per-step join shape from the full-query plan). */
  private[graft] def stepFrame(cur: DataFrame, nbr: DataFrame,
                               deg: DataFrame, t: Int,
                               seedPrefix: String): DataFrame =
    cur.join(deg, col("node") === col("dx"))
      .withColumn("pick", draw48(seedPrefix, t) % col("deg"))
      .join(nbr, col("node") === col("nx") && col("pick") === col("idx"))
      .select(col("walk_id"), col("ny").as("node"))

  /** `dir`: DIRECTED edges (x, y) — pass both orientations for an
    * undirected graph (and cache it; evaluated twice, once per
    * checkpointed derived frame). `nodes`:
    * (node) walk starts, one walk each (walk_id = start node; lineage
    * may share `dir`, the checkpoint refreshes attribute ids). Output:
    * (walk_id, step, node), step 0..steps — an eager checkpoint, all
    * intermediates released. */
  def walks(dir: DataFrame, nodes: DataFrame, steps: Int,
            seedPrefix: String = "walk"): DataFrame =
    walksImpl(dir, Some(nodes), steps, seedPrefix)

  /** [[walks]] with EVERY graph node as a start — the corpus queries'
    * shape (r16). The start set derives from the checkpointed neighbor
    * index's idx = 0 slice: the same node set as
    * `dir.select(x).distinct()` (one row per source node; symmetrized
    * graphs have every node as a source), WITHOUT paying that
    * distinct's Exchange plus a separate start-frame checkpoint job —
    * in the small-graph branch the start frame is a narrow filter over
    * already-materialized checkpoint blocks, so it needs no blocks of
    * its own. */
  def walksAll(dir: DataFrame, steps: Int,
               seedPrefix: String = "walk"): DataFrame =
    walksImpl(dir, None, steps, seedPrefix)

  private def walksImpl(dir: DataFrame, nodesOpt: Option[DataFrame],
                        steps: Int, seedPrefix: String): DataFrame = {
    // Step-invariant frames: materialize ONCE before the step loop.
    // Without the checkpoint each per-step join re-executes the ranking
    // window's shuffle+sort over the full edge list — a steps× redundant
    // shuffle of the query's largest input. Degree rides the SAME window
    // pass as the neighbor ranking (count over the same partitioning —
    // one Exchange for both, where a separate groupBy would shuffle the
    // edge list a second time); the degree frame is then the idx = 0
    // slice of the one checkpoint. Bits cannot move: exact longs.
    val nbrFull = dir.select(col("x").cast("long").as("nx"),
        col("y").cast("long").as("ny"))
      .withColumn("idx",
        row_number().over(Window.partitionBy(col("nx")).orderBy(col("ny")))
          .cast("long") - 1L)
      .withColumn("deg",
        count(lit(1)).over(Window.partitionBy(col("nx"))))
      .localCheckpoint(true)
    val nbr = nbrFull.select(col("nx"), col("ny"), col("idx"))
    val deg = nbrFull.filter(col("idx") === 0L)
      .select(col("nx").as("dx"), col("deg"))
    // Small-graph gate: block bytes of the just-materialized checkpoint
    // (no job), driver replay under it (see the driver-replay block
    // below), per-step checkpoints past it / under forcing.
    val small = checkpointBytes(nbrFull) <= Adaptive.threshold(BroadcastEdgeBytes)
    if (small) {
      val adj = adjacency(nbrFull.select(col("nx"), col("ny"))
        .collect().map(r => (r.getLong(0), r.getLong(1))))
      val ids = startIds(nodesOpt, adj)
      val spark = nbrFull.sparkSession
      Checkpoints.release(nbrFull)
      return walksDriver(spark, adj, ids, steps, seedPrefix)
    }
    val starts = nodesOpt
      .map(_.select(col("node").cast("long").as("walk_id")))
      .getOrElse(nbrFull.filter(col("idx") === 0L)
        .select(col("nx").as("walk_id")))
      .withColumn("node", col("walk_id"))
    var cur = starts.localCheckpoint(true)
    val inter = scala.collection.mutable.ArrayBuffer(nbrFull, cur)
    var out = cur.withColumn("step", lit(0L))
    for (t <- 1 to steps) {
      cur = stepFrame(cur, nbr, deg, t, seedPrefix).localCheckpoint(true)
      inter += cur
      out = out.unionByName(cur.withColumn("step", lit(t.toLong)))
    }
    // Materialize the corpus once (a cheap copy of already-materialized
    // step frames), then drop the steps+3 intermediate block sets.
    val res = out.select(col("walk_id"), col("step"), col("node"))
      .localCheckpoint(true)
    Checkpoints.release(inter.toSeq: _*)
    res
  }

  /** One LAZY node2vec step over the candidate expansion: frontier ×
    * neighbors, the distance-1 LEFT probe against the edge frame, the
    * integer weights, and the cumulative-weight pick (two window sums
    * sharing one walk_id Exchange). `broadcastProbe` pins the probe's
    * join strategy — see [[biasedWalks]] for the decision rule; passing
    * it explicitly keeps this seam deterministic for the plan pins. */
  private[graft] def biasedStepFrame(cur: DataFrame, nbr: DataFrame,
                                     t: Int, wReturn: Long, wCommon: Long,
                                     wOut: Long, seedPrefix: String,
                                     broadcastProbe: Boolean): DataFrame = {
    // distance-1 probe side: fresh aliases so the per-step self-join
    // of the checkpointed edge frame resolves unambiguously
    val edge0 = nbr.select(col("nx").as("px"), col("ny").as("py"))
    val edge = if (broadcastProbe) broadcast(edge0) else edge0
    val wOrd = Window.partitionBy(col("walk_id")).orderBy(col("idx"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("walk_id"))
    cur.join(nbr, col("node") === col("nx"))
      .join(edge,
        col("px") === col("prev") && col("py") === col("ny"), "left")
      .withColumn("wt",
        when(col("ny") === col("prev"), lit(wReturn))
          .when(col("py").isNotNull, lit(wCommon))
          .otherwise(lit(wOut)))
      .withColumn("cum", sum(col("wt")).over(wOrd))
      .withColumn("tot", sum(col("wt")).over(wAll))
      .withColumn("r", draw48(seedPrefix, t) % col("tot"))
      .filter(col("r") >= col("cum") - col("wt") && col("r") < col("cum"))
      .select(col("walk_id"), col("ny").as("node"),
        col("nx").as("prev"))
  }

  /** Row-count gate for broadcasting the distance-1 probe side: 3-long
    * edge rows hash to ≈40 B each in a broadcast relation, so 2²⁰ rows
    * ≈ 40 MB — comfortably executor-resident, far past any fixture. */
  private[graft] val BroadcastEdgeRows = 1L << 20

  /** See [[Checkpoints.bytes]] (moved there in r17 so Bfs/KCore share
    * the O(1) no-job byte gate). */
  private def checkpointBytes(df: DataFrame): Long = Checkpoints.bytes(df)

  /** Byte gate for the small-graph lazy branch: 2²⁰ edge rows at ≈48 B
    * of deserialized block per row. The gate only picks between
    * bit-identical branches (RandomWalkSpec pins equality), so its
    * exact cut is a performance heuristic, not a semantics knob. */
  private[graft] val BroadcastEdgeBytes = 48L << 20

  // -------------------------------------------------------------------
  // Driver replay of the walkers (r17, the Bfs/KCore/BPE pattern).
  //
  // r16 composed the small-graph steps LAZILY over broadcast-hinted
  // frames; that removed the per-step checkpoint jobs but still paid a
  // union plan whose branch t re-derives steps 1..t (Σt step-join
  // evaluations), whole-stage codegen per branch, and one scheduled
  // job — measured ~0.9 s of graph_walks' 1.8 s and ~2.2 s of
  // graph_walks_biased's 3.1 s beyond the shared kernel. Every draw,
  // weight, and pick is EXACT integer/md5 arithmetic over the already-
  // materialized (and byte-gated ≤ ~48 MB) neighbor index, so under the
  // gate the walks replay on the driver: same md5 streams (MessageDigest
  // MD5 over the identical concat strings — what Spark's md5() calls),
  // same 48-bit draws, same y-ascending neighbor ranking, same
  // cumulative-weight / rejection picks. Past the gate (or under
  // SPARK_GRAFT_FORCE_DISTRIBUTED) the per-step-checkpoint distributed
  // loop runs unchanged — the 100 TB shape. Branch bit-equality is
  // pinned by RandomWalkSpec / RejectionWalkSpec (forced runs) and the
  // 7 walk contract queries' forced-distributed oracle pass.
  // -------------------------------------------------------------------

  /** Adjacency in neighbor-ranking order from the collected checkpoint:
    * node → ys ascending (exactly row_number over (nx ORDER BY ny)). */
  private def adjacency(rows: Array[(Long, Long)]): scala.collection.mutable.LongMap[Array[Long]] = {
    val m = scala.collection.mutable.LongMap.empty[scala.collection.mutable.ArrayBuffer[Long]]
    rows.foreach { case (x, y) =>
      m.getOrElseUpdate(x, scala.collection.mutable.ArrayBuffer.empty[Long]) += y
    }
    val out = scala.collection.mutable.LongMap.empty[Array[Long]]
    m.foreach { case (x, ys) => out.update(x, ys.toArray.sorted) }
    out
  }

  /** `md5(s)₄₈` — first 12 lowercase-hex chars of the MD5 parsed base
    * 16: what `conv(substring(md5(s), 1, 12), 16, 10) :: long` computes
    * (< 2^48, so the decimal round-trip is exact). */
  private def md548(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // first 6 bytes = first 12 hex chars
    var v = 0L
    var i = 0
    while (i < 6) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v
  }

  /** Collected start set: caller-provided nodes verbatim, else the
    * neighbor index's source nodes (the idx = 0 slice) — same set as
    * the distributed derivation. */
  private def startIds(nodesOpt: Option[DataFrame],
                       adj: scala.collection.mutable.LongMap[Array[Long]]): Array[Long] =
    nodesOpt match {
      case Some(n) =>
        n.select(col("node").cast("long")).collect().map(_.getLong(0))
      case None => adj.keys.toArray.sorted
    }

  private def corpusFrame(spark: org.apache.spark.sql.SparkSession,
                          rows: Seq[(Long, Long, Long)]): DataFrame = {
    import spark.implicits._
    spark.createDataset(rows).toDF("walk_id", "step", "node")
      .localCheckpoint(true)
  }

  /** Driver replay of [[walks]]: per step the uniform indexed draw
    * `md5(prefix:walk:t)₄₈ mod deg`, walks die at sinks. */
  private def walksDriver(spark: org.apache.spark.sql.SparkSession,
                          adj: scala.collection.mutable.LongMap[Array[Long]],
                          starts: Array[Long], steps: Int,
                          seedPrefix: String): DataFrame = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    var cur = starts.map(w => (w, w))
    cur.foreach { case (w, n) => out += ((w, 0L, n)) }
    for (t <- 1 to steps) {
      cur = cur.flatMap { case (w, n) =>
        adj.get(n) match {
          case Some(ys) =>
            val pick = md548(s"$seedPrefix:$w:$t") % ys.length
            Some((w, ys(pick.toInt)))
          case None => None
        }
      }
      cur.foreach { case (w, n) => out += ((w, t.toLong, n)) }
    }
    corpusFrame(spark, out.toSeq)
  }

  /** node2vec weight of stepping to neighbor `y` given previous node
    * `prev` — the shared wReturn / wCommon / wOut rule (step 1 has no
    * prev ⇒ wOut, matching the null-prev column semantics). */
  private def n2vWeight(prev: Long, hasPrev: Boolean, y: Long,
                        edge: Long => Array[Long],
                        wReturn: Long, wCommon: Long, wOut: Long): Long =
    if (hasPrev && y == prev) wReturn
    else if (hasPrev && java.util.Arrays.binarySearch(edge(prev), y) >= 0) wCommon
    else wOut

  /** Driver replay of [[biasedWalks]]: exact cumulative-weight pick over
    * the y-ascending neighbor order. */
  private def biasedWalksDriver(spark: org.apache.spark.sql.SparkSession,
                                adj: scala.collection.mutable.LongMap[Array[Long]],
                                starts: Array[Long], steps: Int,
                                wReturn: Long, wCommon: Long, wOut: Long,
                                seedPrefix: String): DataFrame = {
    val empty = Array.empty[Long]
    val edge = (p: Long) => adj.getOrElse(p, empty)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    var cur: Array[(Long, Long, Long, Boolean)] =
      starts.map(w => (w, w, 0L, false)) // (walk, node, prev, hasPrev)
    cur.foreach { case (w, n, _, _) => out += ((w, 0L, n)) }
    for (t <- 1 to steps) {
      cur = cur.flatMap { case (w, n, prev, hasPrev) =>
        adj.get(n) match {
          case Some(ys) =>
            val wts = ys.map(y =>
              n2vWeight(prev, hasPrev, y, edge, wReturn, wCommon, wOut))
            val tot = wts.sum
            val r = md548(s"$seedPrefix:$w:$t") % tot
            var cum = 0L; var i = 0; var picked = -1
            while (picked < 0 && i < ys.length) {
              cum += wts(i)
              if (r < cum) picked = i
              i += 1
            }
            Some((w, ys(picked), n, true))
          case None => None
        }
      }
      cur.foreach { case (w, n, _, _) => out += ((w, t.toLong, n)) }
    }
    corpusFrame(spark, out.toSeq)
  }

  /** Driver replay of [[rejectionWalks]]: `rounds` independent md5
    * proposal/accept streams per (walk, step), first accept wins, last
    * round unconditional. */
  private def rejectionWalksDriver(spark: org.apache.spark.sql.SparkSession,
                                   adj: scala.collection.mutable.LongMap[Array[Long]],
                                   starts: Array[Long], steps: Int,
                                   wReturn: Long, wCommon: Long, wOut: Long,
                                   wMax: Long, rounds: Int,
                                   seedPrefix: String): DataFrame = {
    val empty = Array.empty[Long]
    val edge = (p: Long) => adj.getOrElse(p, empty)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    var cur: Array[(Long, Long, Long, Boolean)] =
      starts.map(w => (w, w, 0L, false))
    cur.foreach { case (w, n, _, _) => out += ((w, 0L, n)) }
    for (t <- 1 to steps) {
      cur = cur.flatMap { case (w, n, prev, hasPrev) =>
        adj.get(n) match {
          case Some(ys) =>
            var picked = 0L
            var found = false
            var r = 0
            while (!found && r < rounds) {
              val pick = md548(s"$seedPrefix:$w:$t:$r:p") % ys.length
              val y = ys(pick.toInt)
              val wt = n2vWeight(prev, hasPrev, y, edge, wReturn, wCommon, wOut)
              val accept =
                md548(s"$seedPrefix:$w:$t:$r:a") % wMax < wt || r == rounds - 1
              if (accept) { picked = y; found = true }
              r += 1
            }
            Some((w, picked, n, true))
          case None => None
        }
      }
      cur.foreach { case (w, n, _, _) => out += ((w, t.toLong, n)) }
    }
    corpusFrame(spark, out.toSeq)
  }

  /** node2vec biased walks (Grover–Leskovec KDD'16): stepping from
    * previous node t through current node v, each neighbor x of v gets
    * an integer weight — `wReturn` if x == t (the 1/p return case),
    * `wCommon` if (t, x) is an edge (distance-1 from t), `wOut`
    * otherwise (the 1/q in-out case) — and the seeded 48-bit draw
    * selects by cumulative weight: pick the neighbor whose
    * [cum−w, cum) interval (y-ascending neighbor order) contains
    * `draw mod Σw`. Integer weights keep the draw exact in every
    * engine; step 1 has no previous node, so all weights collapse to
    * `wOut` and the step is the uniform draw.
    *
    * Scale shape: per step ONE frontier×neighbors expansion join
    * (Σ deg(v) candidate rows — the inherent node2vec cost), one
    * LEFT join against the indexed edge frame for the distance-1
    * test, and two walk-keyed window sums (cumulative + total weight)
    * that share one Exchange on walk_id. Candidates per walk are
    * bounded by max degree; nothing is all-pairs. Step-invariant
    * `nbr` is checkpointed once, the frontier per step (the
    * BFS/walks pattern).
    *
    * Probe strategy is DECIDED HERE, not left to planner weather
    * (round-10 verdict: the probe side is borderline-broadcast at
    * sf0.1 and an AQE flip would swing per-step cost ~2×): the edge
    * frame is counted once off its checkpoint and broadcast-hinted at
    * or under [[BroadcastEdgeRows]] rows; past the gate (or under
    * SPARK_GRAFT_FORCE_DISTRIBUTED) the probe stays a shuffled join —
    * the 100 TB choice, since an edge frame that large cannot ship to
    * every executor. Both shapes are bit-identical (RandomWalkSpec
    * forces the distributed branch). */
  def biasedWalks(dir: DataFrame, nodes: DataFrame, steps: Int,
                  wReturn: Long = 4L, wCommon: Long = 2L, wOut: Long = 1L,
                  seedPrefix: String = "n2v"): DataFrame =
    biasedWalksImpl(dir, Some(nodes), steps, wReturn, wCommon, wOut, seedPrefix)

  /** [[biasedWalks]] with every graph node as a start — derived from
    * the checkpointed neighbor index (see [[walksAll]]). */
  def biasedWalksAll(dir: DataFrame, steps: Int,
                     wReturn: Long = 4L, wCommon: Long = 2L, wOut: Long = 1L,
                     seedPrefix: String = "n2v"): DataFrame =
    biasedWalksImpl(dir, None, steps, wReturn, wCommon, wOut, seedPrefix)

  private def biasedWalksImpl(dir: DataFrame, nodesOpt: Option[DataFrame],
                              steps: Int, wReturn: Long, wCommon: Long,
                              wOut: Long, seedPrefix: String): DataFrame = {
    require(wReturn > 0 && wCommon > 0 && wOut > 0,
      "node2vec weights must be positive")
    val nbr = dir.select(col("x").cast("long").as("nx"),
        col("y").cast("long").as("ny"))
      .withColumn("idx",
        row_number().over(Window.partitionBy(col("nx")).orderBy(col("ny")))
          .cast("long") - 1L)
      .localCheckpoint(true)
    val bcProbe =
      checkpointBytes(nbr) <= Adaptive.threshold(BroadcastEdgeBytes)
    // Under the gate: driver replay (r17 — see the driver-replay block;
    // the exact cumulative-weight pick over the same y-ascending order).
    if (bcProbe) {
      val adj = adjacency(nbr.select(col("nx"), col("ny"))
        .collect().map(r => (r.getLong(0), r.getLong(1))))
      val ids = startIds(nodesOpt, adj)
      val spark = nbr.sparkSession
      Checkpoints.release(nbr)
      return biasedWalksDriver(spark, adj, ids, steps,
        wReturn, wCommon, wOut, seedPrefix)
    }
    val starts = nodesOpt
      .map(_.select(col("node").cast("long").as("walk_id")))
      .getOrElse(nbr.filter(col("idx") === 0L)
        .select(col("nx").as("walk_id")))
      .withColumn("node", col("walk_id"))
      .withColumn("prev", lit(null).cast("long"))
    var cur = starts.localCheckpoint(true)
    val inter = scala.collection.mutable.ArrayBuffer(nbr, cur)
    var out = cur.select(col("walk_id"), col("node"))
      .withColumn("step", lit(0L))
    for (t <- 1 to steps) {
      cur = biasedStepFrame(cur, nbr, t, wReturn, wCommon, wOut,
        seedPrefix, bcProbe).localCheckpoint(true)
      inter += cur
      out = out.unionByName(cur.select(col("walk_id"), col("node"))
        .withColumn("step", lit(t.toLong)))
    }
    val res = out.select(col("walk_id"), col("step"), col("node"))
      .localCheckpoint(true)
    Checkpoints.release(inter.toSeq: _*)
    res
  }

  /** Rejection-sampled node2vec walks — the HUB-SCALE walker (r14
    * verdict stretch): [[biasedWalks]]' exact cumulative-weight draw
    * must materialize ALL of Σ deg(visited) candidate rows per step
    * (the inherent node2vec expansion — at the 100×-hub tier every hub
    * visit expands ~100k candidates, and the single-process oracle twin
    * is capacity-bound there). This walker replaces the scan with the
    * standard Θ(1)-per-step rejection scheme (the alias-method
    * alternative precomputes per-EDGE tables — O(Σ deg²) state, which a
    * hub makes infeasible; rejection needs none): per (walk, step) it
    * PROPOSES a uniform neighbor x via the indexed draw (one
    * (node, idx) equi-join row — the uniform walker's hub-safe shape),
    * then ACCEPTS with probability w(x)/wMax, where w is the exact
    * node2vec weight (wReturn / wCommon / wOut via one Θ(1) edge-probe
    * join) and wMax = max of the three. Conditioned on acceptance the
    * proposal is distributed EXACTLY ∝ w — the rejection identity
    * P(pick x) = (1/deg)·(w(x)/wMax) / Σ_y (1/deg)·(w(y)/wMax)
    * = w(x)/Σw — so the walker targets the same chain as biasedWalks,
    * with per-step cost `rounds`·|walks| rows INDEPENDENT of degree.
    * (Draw granularity, r15 ADVICE: both `% deg` and `% wMax` carry the
    * usual modulo bias of O(divisor/2^48) when the divisor does not
    * divide 2^48 — exact for the default wMax = 4, and vanishing at
    * ~deg·2^-48 per transition otherwise, i.e. ~10^-9 even at a
    * 100k-degree hub; "EXACTLY ∝ w" above means exact up to that
    * granularity, the same caveat every 48-bit seeded `mod` draw in
    * this repo carries.)
    *
    * Determinism + the bounded-redraw tail: true rejection loops an
    * unbounded geometric number of rounds; a Spark plan needs a static
    * shape, so `rounds` fixed proposals are drawn per step (distinct
    * md5 streams per round) and the FIRST accepted one is taken. If all
    * reject — probability ≤ (1 − wMin/wMax)^rounds ≤ 0.75⁸ ≈ 0.100 per
    * step at the default weights (4,2,1)/rounds=8, and that is the
    * worst case where EVERY neighbor has weight wMin — the LAST
    * proposal is kept unconditionally (a uniform fallback draw). The
    * walker is therefore exactly-∝-w with probability ≥ 1 − 0.75^rounds
    * per step and uniform otherwise: a documented, tunable bias bound,
    * NOT bit-equivalence to [[biasedWalks]] (RejectionWalkSpec measures
    * both the per-transition distribution against the analytic target
    * and the realized fallback rate; the trade is the scaladoc'd
    * exactness-vs-throughput one, cf. theil_sen's capped pair window).
    *
    * Scale shape: per step ONE explode to rounds·|walks| proposal rows,
    * one join against the degree frame (walk-keyed), one (node, idx)
    * equi-join for the proposal, one LEFT edge-probe join for the
    * distance-1 weight, one walk-keyed min-round pick that shares the
    * frontier's partitioning. No frame is ever Σ deg-sized — the hub
    * contributes exactly as many rows as any other node. */
  def rejectionWalks(dir: DataFrame, nodes: DataFrame, steps: Int,
                     wReturn: Long = 4L, wCommon: Long = 2L, wOut: Long = 1L,
                     rounds: Int = 8,
                     seedPrefix: String = "n2vr"): DataFrame =
    rejectionWalksImpl(dir, Some(nodes), steps, wReturn, wCommon, wOut,
      rounds, seedPrefix)

  /** [[rejectionWalks]] with every graph node as a start — derived from
    * the checkpointed neighbor index (see [[walksAll]]). */
  def rejectionWalksAll(dir: DataFrame, steps: Int,
                        wReturn: Long = 4L, wCommon: Long = 2L,
                        wOut: Long = 1L, rounds: Int = 8,
                        seedPrefix: String = "n2vr"): DataFrame =
    rejectionWalksImpl(dir, None, steps, wReturn, wCommon, wOut,
      rounds, seedPrefix)

  private def rejectionWalksImpl(dir: DataFrame, nodesOpt: Option[DataFrame],
                                 steps: Int, wReturn: Long, wCommon: Long,
                                 wOut: Long, rounds: Int,
                                 seedPrefix: String): DataFrame = {
    require(wReturn > 0 && wCommon > 0 && wOut > 0,
      "node2vec weights must be positive")
    require(rounds >= 1, "need at least one proposal round")
    val wMax = math.max(wReturn, math.max(wCommon, wOut))
    val nbrFull = dir.select(col("x").cast("long").as("nx"),
        col("y").cast("long").as("ny"))
      .withColumn("idx",
        row_number().over(Window.partitionBy(col("nx")).orderBy(col("ny")))
          .cast("long") - 1L)
      .withColumn("deg",
        count(lit(1)).over(Window.partitionBy(col("nx"))))
      .localCheckpoint(true)
    val nbr = nbrFull.select(col("nx"), col("ny"), col("idx"))
    val deg = nbrFull.filter(col("idx") === 0L)
      .select(col("nx").as("dx"), col("deg"))
    // Same small-graph gate as the other walkers: driver replay of the
    // rounds-proposal rejection scheme (r17 — see driver-replay block).
    val small =
      checkpointBytes(nbrFull) <= Adaptive.threshold(BroadcastEdgeBytes)
    if (small) {
      val adj = adjacency(nbrFull.select(col("nx"), col("ny"))
        .collect().map(r => (r.getLong(0), r.getLong(1))))
      val ids = startIds(nodesOpt, adj)
      val spark = nbrFull.sparkSession
      Checkpoints.release(nbrFull)
      return rejectionWalksDriver(spark, adj, ids, steps,
        wReturn, wCommon, wOut, wMax, rounds, seedPrefix)
    }
    val starts = nodesOpt
      .map(_.select(col("node").cast("long").as("walk_id")))
      .getOrElse(nbrFull.filter(col("idx") === 0L)
        .select(col("nx").as("walk_id")))
      .withColumn("node", col("walk_id"))
      .withColumn("prev", lit(null).cast("long"))
    var cur = starts.localCheckpoint(true)
    val inter = scala.collection.mutable.ArrayBuffer(nbrFull, cur)
    var out = cur.select(col("walk_id"), col("node"))
      .withColumn("step", lit(0L))
    for (t <- 1 to steps) {
      cur = rejectionStepFrame(cur, nbr, deg, t, wReturn, wCommon, wOut,
        wMax, rounds, seedPrefix).localCheckpoint(true)
      inter += cur
      out = out.unionByName(cur.select(col("walk_id"), col("node"))
        .withColumn("step", lit(t.toLong)))
    }
    val res = out.select(col("walk_id"), col("step"), col("node"))
      .localCheckpoint(true)
    Checkpoints.release(inter.toSeq: _*)
    res
  }

  /** One LAZY rejection step (the [[rejectionWalks]] inner shape, a
    * seam for specs/plan audits): rounds proposals per walk, first
    * accepted wins, last round unconditional. Exposes `accepted` when
    * `keepDiagnostics` so the spec can measure the realized fallback
    * rate. */
  private[graft] def rejectionStepFrame(cur: DataFrame, nbr: DataFrame,
                                        deg: DataFrame, t: Int,
                                        wReturn: Long, wCommon: Long,
                                        wOut: Long, wMax: Long, rounds: Int,
                                        seedPrefix: String,
                                        keepDiagnostics: Boolean = false): DataFrame = {
    // per-(walk, step, ROUND) md5 streams — the round index is a column
    // (exploded), so both draws must read it
    def drawCol(tag: String): Column =
      conv(substring(md5(concat(lit(s"$seedPrefix:"),
        col("walk_id").cast("string"), lit(s":$t:"), col("r").cast("string"),
        lit(s":$tag"))), 1, 12), 16, 10).cast("long")
    val edge = nbr.select(col("nx").as("px"), col("ny").as("py"))
    val wOrd = Window.partitionBy(col("walk_id")).orderBy(col("r"))
    val proposals = cur
      .join(deg, col("node") === col("dx"))
      .select(col("walk_id"), col("node"), col("prev"), col("deg"),
        explode(array((0 until rounds).map(lit(_)): _*)).as("r"))
      .withColumn("pick", draw48Round(seedPrefix, t) % col("deg"))
      .join(nbr, col("node") === col("nx") && col("pick") === col("idx"))
      .join(edge,
        col("px") === col("prev") && col("py") === col("ny"), "left")
      .withColumn("wt",
        when(col("ny") === col("prev"), lit(wReturn))
          .when(col("py").isNotNull, lit(wCommon))
          .otherwise(lit(wOut)))
      .withColumn("accepted",
        drawCol("a") % lit(wMax) < col("wt") || col("r") === lit(rounds - 1))
    val picked = proposals
      .filter(col("accepted"))
      .withColumn("first", row_number().over(wOrd))
      .filter(col("first") === 1)
    if (keepDiagnostics)
      picked.select(col("walk_id"), col("ny").as("node"),
        col("nx").as("prev"), col("r"), col("wt"))
    else picked.select(col("walk_id"), col("ny").as("node"),
      col("nx").as("prev"))
  }

  /** Per-round uniform proposal draw: an independent md5 stream per
    * (walk, step, round). Reads the exploded `r` column. */
  private def draw48Round(seedPrefix: String, t: Int): Column =
    conv(substring(md5(concat(lit(s"$seedPrefix:"),
      col("walk_id").cast("string"), lit(s":$t:"), col("r").cast("string"),
      lit(":p"))), 1, 12), 16, 10).cast("long")
}

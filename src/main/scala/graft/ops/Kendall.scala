package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Exact Kendall concordance counts WITHOUT the all-pairs self-join —
  * the distributed form of Knight's O(n log n) algorithm (W. R. Knight,
  * JASA 1966: τ via merge-sort inversion counting).
  *
  * For n observations (a, b) the τ_a ingredients are exact integers:
  *   P = n(n−1)/2 total pairs,
  *   T = pairs tied in a OR b      (T_a + T_b − T_ab, each Σ g(g−1)/2),
  *   D = discordant pairs          (a_x < a_y ∧ b_x > b_y, both strict),
  *   C = P − D − T concordant.
  *
  * D is the number of strict inversions of the b sequence once rows are
  * sorted by (a asc, b asc, t asc): an a-tied pair sorts b-ascending so
  * it can never count, and a b-tied pair is never a STRICT inversion —
  * so the sort order handles all tie exclusions structurally. The
  * distributed split:
  *
  *   - WITHIN a range partition of the (a, b, t) sort: a per-partition
  *     merge-sort inversion count (each partition counts its own pairs
  *     sequentially — O(p log p) per partition, no shuffle).
  *   - ACROSS partitions: a pair (x ∈ earlier partition, y ∈ later)
  *     inverts iff b_x > b_y (a_x ≤ a_y holds by the range sort, and
  *     equality would force b_x ≤ b_y — impossible with b_x > b_y). So
  *     the cross count is a 2-D dominance count, done with ONE more
  *     range pass keyed on b alone (ties co-locate): a tiny
  *     (b-partition × a-partition) count-matrix job gives each scan its
  *     starting "rows with smaller b per a-partition" offsets, then a
  *     single sequential sweep per b-partition accumulates, for every
  *     row, how many rows of STRICTLY greater b sit in STRICTLY earlier
  *     a-partitions (equal-b runs are buffered so ties never count).
  *
  * Driver state is bounded by partitions² longs (the count matrix) —
  * never by n — and every job is a shuffle Spark already had to do to
  * sort. Counts are exact longs, so τ_a = (C−D)/P has identical bits to
  * the all-pairs form (KendallSpec proves count equality against the
  * brute force on random tied data; the contract oracle keeps the
  * quadratic SQL as the cross-engine check).
  */
object Kendall {

  /** Exact (d, ta, tb, tab) for one series, rows pre-sorted by (a, b):
    * discordant via merge inversion count (a-/b-tie exclusion is
    * structural — see the object scaladoc), tie pairs via run scans.
    * THE counting kernel, shared by the driver fast path of [[counts]],
    * the per-group path of [[countsByKey]], and (for D) the distributed
    * within-partition pass. */
  private[ops] def groupCounts(a: Array[Double], b: Array[Double])
      : (Long, Long, Long, Long) = {
    val d = strictInversions(b.clone())
    var ta = 0L; var tab = 0L
    var i = 0
    while (i < a.length) {
      var j = i + 1
      while (j < a.length && a(j) == a(i)) j += 1
      val g = (j - i).toLong
      ta += g * (g - 1) / 2
      var p = i
      while (p < j) {
        var q = p + 1
        while (q < j && b(q) == b(p)) q += 1
        val gg = (q - p).toLong
        tab += gg * (gg - 1) / 2
        p = q
      }
      i = j
    }
    val bs = b.clone()
    java.util.Arrays.sort(bs)
    var tb = 0L; var u = 0
    while (u < bs.length) {
      var v = u + 1
      while (v < bs.length && bs(v) == bs(u)) v += 1
      val g = (v - u).toLong
      tb += g * (g - 1) / 2
      u = v
    }
    (d, ta, tb, tab)
  }

  /** One-row frame (n_pairs, concordant, discordant, tied, tau_a) for
    * the numeric columns `aCol`/`bCol` with tie-break column `tCol`
    * (any ordered type; only used to fix the sort, never compared).
    *
    * Size-adaptive ([[Adaptive]] pattern): under the driver gate the
    * whole series is collected and counted with [[groupCounts]] in one
    * job (the frame is a single time-bounded grid — kendall_tau's
    * contract shape); above it, or under SPARK_GRAFT_FORCE_DISTRIBUTED,
    * the two-pass range form runs. Counts are exact integers either
    * way, so the branches are bit-identical (ThresholdForcingSpec). */
  def counts(df: DataFrame, aCol: String, bCol: String, tCol: String,
             partitions: Option[Int] = None): DataFrame = {
    val spark = df.sparkSession
    val nPart = math.max(1, partitions.getOrElse(
      spark.sessionState.conf.numShufflePartitions))
    val base = df.select(col(aCol).cast("double").as("a"),
      col(bCol).cast("double").as("b"), col(tCol).as("t"))

    val nEst = base.count()
    // Budget note (round-13 verdict #4): 500k is 25× the repo's usual
    // 20k Adaptive gate, deliberately. The collect is two doubles per
    // row — 500k rows ≈ 8 MB payload (~24 MB with tuple headers),
    // far under driver headroom — and the driver fast path replaces a
    // TWO-PASS distributed form (an extra full shuffle + range join),
    // so the break-even sits much higher than for the single-pass
    // collects the 20k convention guards. Above the gate the range
    // form runs and is bit-identical (ThresholdForcingSpec).
    if (nEst <= Adaptive.threshold(500000L)) {
      if (nEst < 2) return resultFrame(spark, 0L, 0L, 0L, 0L)
      val rows = base.select(col("a"), col("b")).collect()
        .map(r => (r.getDouble(0), r.getDouble(1)))
      // Spark sorts floats NORMALIZED (−0.0 == 0.0); mirror that here so
      // an IEEE-equal a-class is contiguous and fully b-sorted — the
      // property groupCounts' structural tie exclusion relies on.
      def nrm(v: Double): Double = if (v == 0.0) 0.0 else v
      val cmp = new java.util.Comparator[(Double, Double)] {
        def compare(x: (Double, Double), y: (Double, Double)): Int = {
          val c = java.lang.Double.compare(nrm(x._1), nrm(y._1))
          if (c != 0) c else java.lang.Double.compare(nrm(x._2), nrm(y._2))
        }
      }
      java.util.Arrays.sort(rows, cmp)
      val (d, ta, tb, tab) = groupCounts(rows.map(_._1), rows.map(_._2))
      val nPairs = nEst * (nEst - 1) / 2
      val tied0 = ta + tb - tab
      return resultFrame(spark, nPairs, nPairs - d - tied0, d, tied0)
    }

    // Tie counts: Σ g(g−1) div 2 per equal-value group. ONE corpus pass
    // builds the (a, b) count table; ta/tb/tab all derive from it (its
    // row count is |distinct (a,b)| ≤ n, and the three reductions over
    // it are cheap re-aggregations of an already-shuffled frame).
    val ab = base.groupBy(col("a"), col("b")).agg(count(lit(1)).as("g"))
      .localCheckpoint(true)
    def tieOver(ks: Seq[String]): Long = {
      val grouped =
        if (ks == Seq("a", "b")) ab
        else ab.groupBy(ks.map(col): _*).agg(sum(col("g")).as("g"))
      grouped.agg(coalesce(sum(expr("(g * (g - 1)) div 2")), lit(0L)))
        .head().getLong(0)
    }
    val ta = tieOver(Seq("a"))
    val tb = tieOver(Seq("b"))
    val tab = tieOver(Seq("a", "b"))
    ab.unpersist()
    val tied = ta + tb - tab

    // Pass 1: range sort by (a, b, t); tag rows with their physical
    // partition id (range order == id order) and keep only (apid, b).
    val tagged = base
      .repartitionByRange(nPart, col("a"), col("b"), col("t"))
      .sortWithinPartitions(col("a"), col("b"), col("t"))
      .select(spark_partition_id().as("apid"), col("b"))
      .localCheckpoint(true)

    val n = tagged.count()
    if (n < 2) {
      tagged.unpersist()
      return resultFrame(spark, 0L, 0L, 0L, 0L)
    }

    // Within-partition strict inversions, sequential merge count per
    // partition (checkpointed rows keep their sorted order).
    val bIdx = tagged.schema.fieldIndex("b")
    val withinD = tagged.queryExecution.toRdd.mapPartitions { it =>
      val arr = scala.collection.mutable.ArrayBuilder.make[Double]
      while (it.hasNext) arr += it.next().getDouble(bIdx)
      Iterator.single(strictInversions(arr.result()))
    }.fold(0L)(_ + _)

    // Pass 2: range partition by b ALONE (equal b co-locate, so an
    // equal-b run never spans partitions), sorted by b within.
    val bSorted = tagged
      .repartitionByRange(nPart, col("b"))
      .sortWithinPartitions(col("b"))
      .select(spark_partition_id().as("bpid"), col("apid"), col("b"))
      .localCheckpoint(true)
    tagged.unpersist()

    // Tiny count-matrix job: rows per (b-partition, a-partition).
    val cells = bSorted.groupBy(col("bpid"), col("apid"))
      .agg(count(lit(1)).as("c")).collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
    val bp = if (cells.isEmpty) 1 else cells.keys.map(_._1).max + 1
    val ap = if (cells.isEmpty) 1 else cells.keys.map(_._2).max + 1
    // smaller(bq)(p) = rows of a-partition p in b-partitions before bq
    // (strictly smaller b than anything in bq) — cumulative build, so
    // the driver cost is O(bp·ap), bounded by partitions², never by n.
    val smaller = Array.ofDim[Long](bp + 1, ap)
    var bq = 1
    while (bq <= bp) {
      var p = 0
      while (p < ap) {
        smaller(bq)(p) = smaller(bq - 1)(p) + cells.getOrElse((bq - 1, p), 0L)
        p += 1
      }
      bq += 1
    }
    val totals = smaller(bp)

    val apIdx = bSorted.schema.fieldIndex("apid")
    val bIdx2 = bSorted.schema.fieldIndex("b")
    val totB = spark.sparkContext.broadcast(totals)
    val smallB = spark.sparkContext.broadcast(smaller)
    // Sweep each b-partition in ascending-b order: `seen(p)` = rows of
    // a-partition p with b strictly below the current run; a row y in
    // a-partition q gains Σ_{p<q} (total(p) − seen(p) − run(p)) — the
    // rows with strictly greater b in strictly earlier a-partitions.
    val crossD = bSorted.queryExecution.toRdd.mapPartitionsWithIndex { (bq, it) =>
      val total = totB.value
      val seen = smallB.value(bq).clone()
      val nA = total.length
      var acc = 0L
      val runAp = scala.collection.mutable.ArrayBuffer.empty[Int]
      var runB = 0.0
      var runOpen = false
      def flushRun(): Unit = {
        if (runOpen) {
          val runCnt = new Array[Long](nA)
          runAp.foreach(p => runCnt(p) += 1L)
          // prefix(q) = Σ_{p<q} (total(p) − seen(p) − runCnt(p))
          val prefix = new Array[Long](nA + 1)
          var p = 0
          while (p < nA) {
            prefix(p + 1) = prefix(p) + (total(p) - seen(p) - runCnt(p))
            p += 1
          }
          runAp.foreach(q => acc += prefix(q))
          var i = 0
          while (i < nA) { seen(i) += runCnt(i); i += 1 }
          runAp.clear()
        }
      }
      while (it.hasNext) {
        val r = it.next()
        val b = r.getDouble(bIdx2)
        val p = r.getInt(apIdx)
        if (!runOpen || b != runB) { flushRun(); runB = b; runOpen = true }
        runAp += p
      }
      flushRun()
      Iterator.single(acc)
    }.fold(0L)(_ + _)
    bSorted.unpersist()

    val nPairs = n * (n - 1) / 2
    val discordant = withinD + crossD
    val concordant = nPairs - discordant - tied
    resultFrame(spark, nPairs, concordant, discordant, tied)
  }

  /** Per-key exact Kendall counts + τ_b — the grouped companion of
    * [[counts]] for the "every instrument vs the market" shape
    * (spearman_corr's frame). One hash Exchange on the key, then each
    * group is counted SEQUENTIALLY inside its partition with the same
    * merge-sort inversion kernel (per-group memory = the group's rows —
    * the per-instrument series is time-bounded, the same justification
    * as every keyed window in the repo; the KEY dimension is what
    * scales, and that is the partitioned axis). Tie corrections are
    * exact run counts; τ_b = (C−D)/√((P−T_a)(P−T_b)) with the product
    * routed through the exact decimal-string cast (it can pass 2⁵³). */
  def countsByKey(df: DataFrame, keyCol: String, aCol: String, bCol: String,
                  tCol: String, partitions: Option[Int] = None): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.types.DecimalType
    val nPart = math.max(1, partitions.getOrElse(
      spark.sessionState.conf.numShufflePartitions))
    val sorted = df.select(col(keyCol).cast("string").as("k"),
        col(aCol).cast("double").as("a"), col(bCol).cast("double").as("b"),
        col(tCol).as("t"))
      .repartition(nPart, col("k"))
      .sortWithinPartitions(col("k"), col("a"), col("b"), col("t"))
    val perKey = sorted.queryExecution.toRdd.mapPartitions { it =>
      val out = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long, Long, Long, Long)]
      var key: String = null
      val as = scala.collection.mutable.ArrayBuilder.make[Double]
      val bs = scala.collection.mutable.ArrayBuilder.make[Double]
      def closeGroup(): Unit = if (key != null) {
        val aArr = as.result(); val bArr = bs.result()
        val (d, ta, tb, tab) = groupCounts(aArr, bArr)
        out += ((key, aArr.length.toLong, d, ta, tb, tab))
        as.clear(); bs.clear()
      }
      while (it.hasNext) {
        val r = it.next()
        val k = r.getUTF8String(0).toString
        if (key == null || k != key) { closeGroup(); key = k }
        as += r.getDouble(1); bs += r.getDouble(2)
      }
      closeGroup()
      out.iterator
    }
    val agg = spark.createDataset(perKey)(
      org.apache.spark.sql.Encoders.product[(String, Long, Long, Long, Long, Long)])
      .toDF("product_key", "n_obs", "discordant", "tied_a", "tied_b", "tied_ab")
    def dec(c: Column) = c.cast(DecimalType(19, 0))
    def exact(c: Column) = c.cast("string").cast("double")
    val p = expr("(n_obs * (n_obs - 1)) div 2")
    val withP = agg.withColumn("n_pairs", p)
      .withColumn("tied", col("tied_a") + col("tied_b") - col("tied_ab"))
      .withColumn("concordant",
        col("n_pairs") - col("discordant") - col("tied"))
      .withColumn("pa", col("n_pairs") - col("tied_a"))
      .withColumn("pb", col("n_pairs") - col("tied_b"))
    withP.select(col("product_key"), col("n_obs"), col("n_pairs"),
      col("concordant"), col("discordant"), col("tied_a"), col("tied_b"),
      when(col("pa") > 0 && col("pb") > 0, Det.snap(
        (col("concordant") - col("discordant")).cast("double") /
          sqrt(exact(dec(col("pa")) * dec(col("pb")))), 6)).as("tau_b"))
  }

  private def resultFrame(spark: org.apache.spark.sql.SparkSession,
      nPairs: Long, c: Long, d: Long, t: Long): DataFrame = {
    import spark.implicits._
    Seq((nPairs, c, d, t))
      .toDF("n_pairs", "concordant", "discordant", "tied")
      .select(col("n_pairs"), col("concordant"), col("discordant"), col("tied"),
        when(col("n_pairs") > 0,
          Det.snap((col("concordant") - col("discordant")).cast("double") /
            col("n_pairs").cast("double"), 6)).as("tau_a"))
  }

  /** Strict inversions of `arr` (#{i < j : arr(i) > arr(j)}) by the
    * classic merge count; equal elements never count (left side is
    * consumed first on ties). */
  private[ops] def strictInversions(arr: Array[Double]): Long = {
    val buf = new Array[Double](arr.length)
    def merge(lo: Int, mid: Int, hi: Int): Long = {
      var inv = 0L
      var i = lo; var j = mid; var k = lo
      while (i < mid && j < hi) {
        if (arr(i) <= arr(j)) { buf(k) = arr(i); i += 1 }
        else { buf(k) = arr(j); j += 1; inv += (mid - i) }
        k += 1
      }
      while (i < mid) { buf(k) = arr(i); i += 1; k += 1 }
      while (j < hi) { buf(k) = arr(j); j += 1; k += 1 }
      System.arraycopy(buf, lo, arr, lo, hi - lo)
      inv
    }
    def sort(lo: Int, hi: Int): Long =
      if (hi - lo < 2) 0L
      else {
        val mid = (lo + hi) >>> 1
        sort(lo, mid) + sort(mid, hi) + merge(lo, mid, hi)
      }
    sort(0, arr.length)
  }
}

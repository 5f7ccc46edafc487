package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Scale-safe global ranking primitives.
  *
  * A bare `ntile(k) OVER (ORDER BY ...)` collapses the whole input into
  * ONE window task (Spark logs `WindowExec: No Partition Defined`) — fine
  * on a dimension table today, a straggler at 100 TB. [[ntileByRange]] is
  * the classic two-pass replacement (TeraSort-style global ranking):
  *
  *  1. range-repartition on the order → every partition sorts in
  *     parallel and partition p holds keys strictly below partition p+1;
  *  2. one tiny job counts rows per partition (nPart rows to the driver);
  *  3. the cumulative offsets are broadcast back and a compiled
  *     per-partition pass assigns the exact global row number, from which
  *     the tile follows by standard SQL NTILE arithmetic — with n rows
  *     and k tiles, the first n%k tiles get ⌈n/k⌉ rows, the rest ⌊n/k⌋.
  *
  * The tile value depends only on the global row number, never on where
  * the range boundaries fell, so the output is bit-identical to
  * `ntile(k) OVER (ORDER BY ...)` in Spark AND DuckDB (RanksSpec proves
  * the former; the rfm_segments oracle twin the latter). The order must
  * be fully tie-broken or no engine's ntile is deterministic.
  *
  * Dimension-sized inputs (plan stats under [[ntileByRange.smallBytes]])
  * skip the two-pass and run the plain window form — one task is the
  * fastest shape for a frame that fits in one task, and the values are
  * identical either way.
  */
object Ranks {

  /** The range-sorted input as ONE RDD instance: the per-partition
    * statistics job and the assignment pass both hang off this lineage,
    * so the second job reads the first's SHUFFLE FILES instead of
    * recomputing upstream — no cache, nothing to unpersist, upstream
    * evaluated exactly once. */
  private def rangeSorted(df: DataFrame, order: Seq[Column], nPart: Int) =
    df.repartitionByRange(nPart, order: _*)
      .sortWithinPartitions(order: _*)
      .rdd

  private def offsetsOf(perPart: Array[(Int, Long)], nPart: Int): Array[Long] = {
    val m = perPart.toMap
    (0 until nPart).scanLeft(0L)((acc, p) => acc + m.getOrElse(p, 0L)).toArray
  }

  /** Inputs whose plan-estimated size sits under this take the one-task
    * window form — a single sort of a dimension-sized frame beats two
    * distributed passes, and the VALUES are identical either way. Same
    * stats signal broadcast-join planning uses; no extra job to decide. */
  val DimensionBytes: Long = 64L << 20

  /** Default for the `smallBytes` threshold params: [[DimensionBytes]],
    * or −1 (always-distributed) under [[Adaptive.forceDistributed]]. */
  def defaultSmallBytes: Long = Adaptive.threshold(DimensionBytes)

  def ntileByRange(df: DataFrame, order: Seq[Column], k: Int, out: String,
                   partitions: Option[Int] = None,
                   smallBytes: Long = defaultSmallBytes): DataFrame = {
    require(k > 0, s"ntile bucket count must be positive, got $k")
    val spark = df.sparkSession
    // Adaptive flip (the CoOccur broadcast/sort-merge pattern): the tile
    // value depends only on the global row number, so both paths are
    // bit-identical — RanksSpec proves it — and only the PLAN changes
    // with the estimated input size.
    if (df.queryExecution.optimizedPlan.stats.sizeInBytes <= smallBytes)
      return df.withColumn(out,
        ntile(k).over(Window.orderBy(order: _*)).cast("long"))
    val nPart = partitions.getOrElse(spark.sessionState.conf.numShufflePartitions)
    // Declarative two-pass (no RDD, no per-row Row materialization):
    // after the range sort, `monotonically_increasing_id()` IS the pair
    // (partition id, within-partition position) — partition id in the
    // high bits, the 0-based row position within the partition in the
    // low 33 — assigned by a codegen'd project in sorted order. One tiny
    // job collects the per-partition counts; the cumulative offsets and
    // NTILE constants come back as literals, so the assignment is a pure
    // whole-stage-codegen project: rn = offsets[_pid] + low33(_mid) + 1.
    // The tile depends only on that global row number and the total,
    // never on where the range boundaries fell — the invariance the
    // oracle twins rely on.
    //
    // The eager localCheckpoint below is CORRECTNESS, not hygiene: the
    // count pass and the assignment pass are separate JOBS, and SQL
    // plans get no cross-job shuffle reuse (that is an RDD-identity
    // property — see rangeSorted, which runningSumByRange still uses).
    // Without pinning, each job re-evaluates the input AND re-samples
    // the range boundaries from whatever row order that evaluation's
    // hash aggregate emits — at sf0.1 the two samples genuinely differ,
    // the assignment job's partition populations no longer match the
    // counts job's offsets, and rn overruns the total (the round-7
    // forcing run caught tile k+1 rows and ±185-row tile skew;
    // RanksForcedScaleSpec pins the fix). The checkpoint materializes
    // the sorted frame once — both jobs then read the same blocks. On a
    // cluster swap for reliable checkpoint() — same shape, same cost
    // class as the shuffle it pins.
    val (tagged, total) = globalRn(df, order, nPart)
    val q = total / k
    val r = total % k
    tagged
      // standard NTILE: first r tiles have q+1 rows, the rest q
      .withColumn(out, expr(
        s"CASE WHEN _rn <= ${r * (q + 1)} THEN (_rn - 1) div ${q + 1} + 1 " +
        s"ELSE $r + (_rn - ${r * (q + 1)} - 1) div ${math.max(q, 1L)} + 1 END"))
      .select(df.columns.map(col).toIndexedSeq :+ col(out): _*)
  }

  /** The shared distributed-rank core: range-sorted frame with the exact
    * global 1-based row number in `_rn` (plus the total row count) —
    * see ntileByRange's scaladoc for why the eager localCheckpoint is
    * CORRECTNESS (one evaluation under both the counts job and the
    * assignment job), not hygiene. */
  private def globalRn(df: DataFrame, order: Seq[Column],
                       nPart: Int): (DataFrame, Long) = {
    val tagged = df.repartitionByRange(nPart, order: _*)
      .sortWithinPartitions(order: _*)
      .withColumn("_mid", monotonically_increasing_id())
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint(true)
    val counts = tagged.groupBy(col("_pid")).agg(count(lit(1)).as("_n"))
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    val offsets = offsetsOf(counts, nPart)
    val total = counts.map(_._2).sum
    val offCol = element_at(
      array(offsets.take(nPart).map(lit).toIndexedSeq: _*), col("_pid") + 1)
    (tagged.withColumn("_rn",
      offCol + pmod(col("_mid"), lit(1L << 33)) + lit(1L)), total)
  }

  /** Exact global 1-based row number under a total order — the bare
    * TeraSort-style two-pass rank (`ntileByRange` without the tile):
    * range-partitioned parallel external sorts, one tiny per-partition
    * count job, offsets back as literals, assignment in a pure codegen'd
    * project. Bit-identical to `row_number() OVER (ORDER BY …)` because
    * the number depends only on the total order, never on where the
    * range boundaries fell; the same size-adaptive flip as ntileByRange
    * keeps toy inputs on the single window. The generic scale form for
    * deterministic global orderings (epoch shuffles, offset assignment,
    * cumulative ids). */
  def rowNumberByRange(df: DataFrame, order: Seq[Column], out: String,
                       partitions: Option[Int] = None,
                       smallBytes: Long = defaultSmallBytes): DataFrame = {
    val spark = df.sparkSession
    if (df.queryExecution.optimizedPlan.stats.sizeInBytes <= smallBytes)
      return df.withColumn(out,
        row_number().over(Window.orderBy(order: _*)).cast("long"))
    val nPart = partitions.getOrElse(spark.sessionState.conf.numShufflePartitions)
    val (tagged, _) = globalRn(df, order, nPart)
    tagged.withColumn(out, col("_rn"))
      .select(df.columns.map(col).toIndexedSeq :+ col(out): _*)
  }

  /** Global INCLUSIVE running sum of a long column under a total order —
    * the same two-pass range shape as [[ntileByRange]] (per-partition
    * partial sums to the driver, cumulative offsets broadcast back, one
    * compiled in-partition accumulation), so no single-partition window
    * anywhere. Bit-exact vs `sum() OVER (ORDER BY … ROWS UNBOUNDED
    * PRECEDING)` because long addition is associative — the partition
    * split points cannot change any value. The generic scale form for
    * sequence packing, cumulative distributions, and offset assignment.
    * `valueCol` must be a NON-NULL LongType column (counts/grid sums by
    * construction everywhere it is used); a null would NPE in the
    * compiled accumulation rather than silently skew offsets.
    */
  def runningSumByRange(df: DataFrame, order: Seq[Column], valueCol: String,
                        out: String, partitions: Option[Int] = None,
                        smallBytes: Long = defaultSmallBytes): DataFrame = {
    val spark = df.sparkSession
    // Same adaptive flip as ntileByRange: exact-long prefix sums are
    // order-of-evaluation independent, so the one-task window form and
    // the two-pass range form are bit-identical (RanksSpec/RanksProps);
    // under the dimension-size threshold the single sort wins.
    if (df.queryExecution.optimizedPlan.stats.sizeInBytes <= smallBytes)
      return df.withColumn(out,
        sum(col(valueCol)).over(Window.orderBy(order: _*)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val nPart = partitions.getOrElse(spark.sessionState.conf.numShufflePartitions)
    val vIdx = df.schema.fieldIndex(valueCol)
    val sorted = rangeSorted(df, order, nPart)
    val sums = sorted.mapPartitionsWithIndex { (pid, it) =>
      var s = 0L; while (it.hasNext) s += it.next().getLong(vIdx)
      Iterator((pid, s))
    }.collect()
    val bc = spark.sparkContext.broadcast(offsetsOf(sums, nPart))
    val schema = df.schema.add(out, LongType, nullable = false)
    val rows = sorted.mapPartitionsWithIndex { (pid, it) =>
      var acc = bc.value(pid)
      it.map { row =>
        acc += row.getLong(vIdx)
        Row.fromSeq(row.toSeq :+ acc)
      }
    }
    spark.createDataFrame(rows, schema)
  }
}

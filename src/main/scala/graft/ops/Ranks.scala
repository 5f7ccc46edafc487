package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
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

  def ntileByRange(df: DataFrame, order: Seq[Column], k: Int, out: String,
                   partitions: Option[Int] = None): DataFrame = {
    require(k > 0, s"ntile bucket count must be positive, got $k")
    val spark = df.sparkSession
    val nPart = partitions.getOrElse(spark.sessionState.conf.numShufflePartitions)
    val sorted = rangeSorted(df, order, nPart)
    val counts = sorted.mapPartitionsWithIndex { (pid, it) =>
      var n = 0L; while (it.hasNext) { it.next(); n += 1 }
      Iterator((pid, n))
    }.collect()
    val offsets = offsetsOf(counts, nPart)
    val total = counts.map(_._2).sum
    val bc = spark.sparkContext.broadcast(offsets)
    val schema = df.schema.add(out, LongType, nullable = false)
    val q = total / k
    val r = total % k
    val rows = sorted.mapPartitionsWithIndex { (pid, it) =>
      var rn = bc.value(pid)
      it.map { row =>
        rn += 1
        // standard NTILE: first r tiles have q+1 rows, the rest q
        val tile =
          if (rn <= r * (q + 1)) (rn - 1) / (q + 1) + 1
          else r + (rn - r * (q + 1) - 1) / math.max(q, 1L) + 1
        Row.fromSeq(row.toSeq :+ tile)
      }
    }
    spark.createDataFrame(rows, schema)
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
                        out: String, partitions: Option[Int] = None): DataFrame = {
    val spark = df.sparkSession
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

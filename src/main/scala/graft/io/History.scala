package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet history warehouse — the engine's answer to the reference's
  * TimescaleDB hypertables (SURVEY §1, docker/postgres/init/02_schema.sql:
  * 48-63): time chunking → daily partition directories, hash
  * subpartitioning → layout repartitioned by (day, instrument), chunk
  * pruning → Catalyst partition pruning on `event_date`, compression →
  * parquet codec, and row-group skipping via min/max stats (data sorted
  * within partitions by (product_id, event_time), so an instrument slice
  * reads a handful of row groups out of a day).
  *
  * At 100 TB this layout is what makes replay/backtest cheap: a backtest
  * over one week × 10 instruments prunes to 7 directories and skips
  * almost every row group inside them.
  */
object History {

  /** Append a tick-shaped stream/batch slice to the warehouse. */
  def write(df: DataFrame, path: String, timeCol: String = "event_time"): Unit =
    df.withColumn("event_date", to_date(col(timeCol)))
      .repartition(col("event_date"), col("product_id"))
      .sortWithinPartitions(col("product_id"), col(timeCol))
      .write.mode("append")
      .partitionBy("event_date")
      .parquet(path)

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Pruned slice: one day × one instrument (the Grafana/runbook-style
    * serving read, SURVEY §2.6). The date predicate prunes partitions;
    * the instrument predicate is pushed to parquet row groups. */
  def slice(spark: SparkSession, path: String, date: String,
            productId: String): DataFrame =
    read(spark, path)
      .filter(col("event_date") === to_date(lit(date)) &&
        col("product_id") === productId)

  /** Compact a day partition's small files in place. Streaming appends
    * (one file per micro-batch per instrument) accrete thousands of tiny
    * files per day; at 100 TB the NameNode/listing cost and per-file
    * open overhead dominate reads long before data volume does. This
    * rewrites ONE day to ⌈bytes / targetBytes⌉ files, restoring the
    * (product_id, event_time) sort so row-group min/max skipping works
    * again, then swaps the directory crash-safely for a single-writer
    * warehouse: write new → rename old ASIDE → rename new into place →
    * delete the backup. Every rename return value is checked (Hadoop
    * signals failure by returning false), a failure aborts with the
    * backup retained, and entry RESTORES a stranded backup when the live
    * dir is missing — so any crash or failure point leaves the day
    * recoverable, and the next call self-heals rather than reading the
    * day as empty. Returns (files_before, files_after).
    *
    * File sizing: repartitionByRange on (product_id, event_time) — file
    * COUNT and SIZE track bytes even when one product dominates (hash
    * partitioning by product alone would leave empty files below the
    * product count and oversized files under skew), and the range layout
    * reinforces the min/max-skipping sort. */
  def compactDay(spark: SparkSession, path: String, date: String,
                 targetBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    val dayDir = new org.apache.hadoop.fs.Path(s"$path/event_date=$date")
    val fs = dayDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val backup = new org.apache.hadoop.fs.Path(s"$path/.old-event_date=$date")
    // Crash recovery FIRST: a previous swap that died between its two
    // renames left the day only in the backup — restore it before any
    // emptiness check, or the day would silently read as empty while its
    // data sat stranded in a dot-dir Spark readers skip as hidden.
    if (!fs.exists(dayDir) && fs.exists(backup) &&
        !fs.rename(backup, dayDir))
      throw new java.io.IOException(
        s"compactDay: restoring crashed-swap backup $backup -> $dayDir failed")
    if (!fs.exists(dayDir)) return (0, 0)
    val parts = fs.listStatus(dayDir).filter(_.getPath.getName.endsWith(".parquet"))
    val totalBytes = parts.map(_.getLen).sum
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    if (parts.length <= nOut) return (parts.length, parts.length)

    val tmp = new org.apache.hadoop.fs.Path(s"$path/.compact-event_date=$date")
    spark.read.parquet(dayDir.toString)
      .repartitionByRange(nOut, col("product_id"), col("event_time"))
      .sortWithinPartitions(col("product_id"), col("event_time"))
      .write.mode("overwrite").parquet(tmp.toString)
    swapInPlace(fs, dayDir, backup, tmp)
    val after = fs.listStatus(dayDir).count(_.getPath.getName.endsWith(".parquet"))
    (parts.length, after)
  }

  /** The checked two-rename directory swap shared by [[compactDay]] and
    * [[upsertDay]]. Hadoop rename() reports failure by RETURNING FALSE,
    * not throwing — every return is checked; aborting always leaves a
    * readable copy: either the live dir (first rename failed → nothing
    * moved) or the backup (second rename failed → restore attempted,
    * backup retained; entry-time restore then self-heals). */
  private def swapInPlace(fs: org.apache.hadoop.fs.FileSystem,
                          dayDir: org.apache.hadoop.fs.Path,
                          backup: org.apache.hadoop.fs.Path,
                          tmp: org.apache.hadoop.fs.Path): Unit = {
    // live dir exists, so any backup here is leftover from a crash AFTER
    // a completed swap (old data already superseded) — safe to drop
    fs.delete(backup, true)
    if (!fs.rename(dayDir, backup))
      throw new java.io.IOException(
        s"swap: rename $dayDir -> $backup failed; day left untouched")
    if (!fs.rename(tmp, dayDir)) {
      val restored = fs.rename(backup, dayDir)
      throw new java.io.IOException(
        s"swap: rename $tmp -> $dayDir failed; " +
          (if (restored) s"original restored at $dayDir"
           else s"ORIGINAL STILL IN $backup — restore it before reading this day"))
    }
    fs.delete(backup, true)
  }

  /** Idempotent MERGE (upsert) of late or corrected rows into ONE day
    * partition — the warehouse's answer to `MERGE INTO` for a
    * single-writer parquet layout: incoming rows REPLACE existing rows
    * with the same `keyCols` (last-write-wins), everything else appends,
    * and the day is rewritten sorted through the same crash-safe
    * checked-rename swap as [[compactDay]] (entry restores a stranded
    * backup first). Re-running with the same slice is a content no-op —
    * the retry-safety a late-data backfill job needs.
    *
    * Determinism: duplicate keys WITHIN the incoming slice would make
    * "which row wins" arrival-order-dependent, so the slice is deduped
    * by a deterministic (key, all-columns) order first. Incoming rows
    * are filtered to the target date — a mis-dated row cannot leak into
    * the wrong partition.
    *
    * Scale shape: one left-anti join of the day against the (small)
    * update slice + one union rewrite of ONE day — never touches the
    * rest of the warehouse; the anti join broadcasts the update side.
    * Returns (rows_before, rows_incoming, rows_after). */
  def upsertDay(spark: SparkSession, path: String, date: String,
                updates: DataFrame,
                keyCols: Seq[String] = Seq("product_id", "event_time", "sequence"),
                timeCol: String = "event_time",
                targetBytes: Long = 128L * 1024 * 1024): (Long, Long, Long) = {
    val dayDir = new org.apache.hadoop.fs.Path(s"$path/event_date=$date")
    val fs = dayDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val backup = new org.apache.hadoop.fs.Path(s"$path/.old-event_date=$date")
    if (!fs.exists(dayDir) && fs.exists(backup) &&
        !fs.rename(backup, dayDir))
      throw new java.io.IOException(
        s"upsertDay: restoring crashed-swap backup $backup -> $dayDir failed")
    val allCols = updates.columns.filter(_ != "event_date").map(col).toIndexedSeq
    val incoming = {
      import org.apache.spark.sql.expressions.Window
      updates.filter(to_date(col(timeCol)) === to_date(lit(date)))
        .select(allCols: _*)
        .withColumn("_rk", row_number().over(
          Window.partitionBy(keyCols.map(col): _*)
            .orderBy(allCols.map(_.desc): _*)))
        .filter(col("_rk") === 1).drop("_rk")
    }
    val nIn = incoming.count()
    if (!fs.exists(dayDir)) {
      if (nIn == 0) return (0L, 0L, 0L)
      incoming
        .repartitionByRange(col("product_id"), col(timeCol))
        .sortWithinPartitions(col("product_id"), col(timeCol))
        .write.mode("overwrite").parquet(dayDir.toString)
      return (0L, nIn, nIn)
    }
    val existing = spark.read.parquet(dayDir.toString)
    val nBefore = existing.count()
    if (nIn == 0) return (nBefore, 0L, nBefore)
    // Broadcast the anti-join key side only while it is provably small:
    // a routine late-data slice is a few thousand keys, but a bulk
    // backfill could exceed the driver's broadcast ceiling — above the
    // gate, leave the join unhinted and let AQE pick (it will still
    // broadcast if the runtime size allows). 2M keys ≈ tens of MB of
    // (product_id, ts) pairs, far under the 8 GB broadcast limit.
    val keysIn = incoming.select(keyCols.map(col): _*)
    val antiSide =
      if (nIn <= graft.ops.Adaptive.threshold(2000000L)) broadcast(keysIn)
      else keysIn
    val merged = existing
      .join(antiSide, keyCols, "left_anti")
      .unionByName(incoming)
    val totalBytes = fs.listStatus(dayDir)
      .filter(_.getPath.getName.endsWith(".parquet")).map(_.getLen).sum
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    val tmp = new org.apache.hadoop.fs.Path(s"$path/.upsert-event_date=$date")
    merged
      .repartitionByRange(nOut, col("product_id"), col(timeCol))
      .sortWithinPartitions(col("product_id"), col(timeCol))
      .write.mode("overwrite").parquet(tmp.toString)
    swapInPlace(fs, dayDir, backup, tmp)
    val nAfter = spark.read.parquet(dayDir.toString).count()
    (nBefore, nIn, nAfter)
  }
}

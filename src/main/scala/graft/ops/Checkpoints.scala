package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Release handle for eagerly `localCheckpoint(true)`'d frames.
  *
  * `Dataset.unpersist` goes through the CacheManager, which never heard
  * of a checkpoint — on a checkpointed frame it is a silent no-op and
  * the block sets linger until JVM GC gets around to the RDD object
  * (the round-10 verdict's walk-family hygiene finding). This helper
  * unpersists the blocks of the `LogicalRDD` behind the frame directly.
  *
  * A local checkpoint's blocks ARE its data (lineage is truncated), so
  * release is destructive: only call it once every consumer of the
  * frame has materialized (the callers checkpoint their final result
  * first, then release the intermediates — see RandomWalk, GraphQueries
  * walk/link queries). CacheHygieneSpec asserts the ≤1-survivor bound.
  */
object Checkpoints {

  /** Unpersist the checkpoint blocks behind each frame. Safe on frames
    * that are not checkpoints (no LogicalRDD leaf → nothing happens);
    * only pass frames returned by `localCheckpoint(true)`. */
  def release(dfs: DataFrame*): Unit = dfs.foreach { df =>
    df.queryExecution.analyzed.foreach {
      case lr: LogicalRDD => lr.rdd.unpersist(false)
      case _ => ()
    }
  }

  /** Byte size of an eagerly-checkpointed frame's stored blocks — an
    * O(1) driver-side storage-info read, NO job (r16: a row-count gate
    * costs a full count() job; the blocks were just materialized by
    * `localCheckpoint(true)`, so their size is already known to the
    * BlockManager). Only meaningful on frames returned by
    * `localCheckpoint(true)`. Shared by the size-adaptive graph ops
    * (RandomWalk r16; Bfs/KCore r17). */
  def bytes(df: DataFrame): Long = {
    val ids = df.queryExecution.analyzed.collect {
      case lr: LogicalRDD => lr.rdd.id
    }.toSet
    df.sparkSession.sparkContext.getRDDStorageInfo
      .filter(i => ids.contains(i.id)).map(i => i.memSize + i.diskSize).sum
  }
}

package graft.ops

import org.apache.spark.sql.DataFrame

/** Scan-parallelism repair for small single-file inputs (r16, guide
  * §2.5 "input skew" / §6 input splits).
  *
  * The contract's parquet inputs are single small files (documents
  * 0.6 MB, embeddings 0.8 MB at sf0.1) with one row group each, so a
  * FileScan yields ONE input partition no matter the session's core
  * count — and every per-record hot kernel that runs BEFORE the first
  * Exchange (shingling, minhash, md5 substring windows, dot products)
  * executes single-threaded. Measured: dedup_substring's window+md5
  * kernel was 1.86 s serial of its 3.0 s total at sf0.1 on 32 cores.
  *
  * `spread` round-robin-repartitions such a scan to the session's
  * default parallelism — a shuffle of the RAW doc rows (sub-MB here),
  * bought back ~30× in the kernel stage. It is scale-adaptive, not a
  * local[32] constant: the target is the session's own parallelism,
  * and an input that already carries at least that many partitions
  * (any real multi-file table — the 100 TB case) passes through
  * untouched. Under SPARK_GRAFT_FORCE_DISTRIBUTED the helper is
  * identity, so the forced Verify run proves the unspread path
  * bit-equal (all consumers are row-local or explicitly sorted;
  * nothing downstream reads partition layout).
  */
object Par {

  def spread(df: DataFrame): DataFrame = {
    if (Adaptive.forceDistributed) return df
    val n = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < n) df.repartition(n) else df
  }
}

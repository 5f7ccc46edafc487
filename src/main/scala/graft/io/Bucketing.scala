package graft.io

import org.apache.spark.sql.DataFrame

/** Bucketed-table layout — pre-shuffling at WRITE time so repeated joins
  * and aggregations on the same key never shuffle at READ time. The
  * warehouse twin of RangeJoin's runtime bucketing: when the same fact ⨝
  * fact join runs every day at 100 TB, paying the Exchange once in the
  * writer (buckets = files hash-partitioned by key, sorted within) lets
  * every subsequent sort-merge join and groupBy on that key run
  * exchange-free — Catalyst recognizes the bucket layout as the required
  * HashPartitioning. BucketingSpec proves the join plan has no Exchange.
  */
object Bucketing {

  /** Write `df` as a bucketed, per-bucket-sorted managed table. */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
                    key: String, moreKeys: String*): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key, moreKeys: _*)
      .sortBy(key, moreKeys: _*)
      .format("parquet")
      .saveAsTable(table)
}

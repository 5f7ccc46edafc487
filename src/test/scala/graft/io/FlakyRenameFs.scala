package graft.io

import org.apache.hadoop.fs.Path

/** Test-only local filesystem whose Nth DAY-DIRECTORY rename RETURNS
  * FALSE (the Hadoop failure convention compactDay must handle) and then
  * behaves normally — registered under the `flaky:` scheme by
  * HistorySpec. Only compactDay's top-level swaps qualify (both names
  * carry the event_date= prefix); the parquet committer's task-file
  * renames inside the write pass through untouched. */
class FlakyRenameFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "flaky"
  override def getUri: java.net.URI = java.net.URI.create("flaky:///")
  override def rename(src: Path, dst: Path): Boolean = {
    val daySwap = src.getName.contains("event_date=") &&
      dst.getName.contains("event_date=")
    if (daySwap && FlakyRenameFs.failAt.decrementAndGet() == 0) false
    else super.rename(src, dst)
  }
}

object FlakyRenameFs {
  /** 1-based index of the rename call to fail once; ≤ 0 disables. */
  val failAt = new java.util.concurrent.atomic.AtomicInteger(0)
}

package graft.ops

import graft.TestSpark
import graft.queries.VecQueries
import org.scalatest.funsuite.AnyFunSuite

/** Maintenance proofs for the persisted ANN serving index (r13 verdict
  * stretch — the WalkCorpus/GraphArtifact pattern for the retrieval
  * stack):
  *
  *  1. every index reader (ivfpq_topk, pq_adc_topk, ivf_probe_topk off
  *     the stored codebook + shard) produces its contract query's EXACT
  *     bits — so a serving deployment reading the artifact inherits the
  *     Verify gate's oracle-exactness transitively;
  *  2. rebuild equivalence: re-quantizing the corpus against the
  *     RELOADED codebook reproduces the stored shard bit-for-bit
  *     (parquet round-trips the codebook's doubles and the shard's
  *     ints/longs/floats losslessly, and builder + searcher share the
  *     VecKernels kernels);
  *  3. append exactness: the shard built over a corpus split equals the
  *     full build unioned (quantization is per-row under a fixed
  *     codebook — new vectors append without touching history; a
  *     codebook re-TRAIN is the rebuild event, per the scaladoc).
  */
class VecIndexSpec extends AnyFunSuite {
  import TestSpark._

  private val dir = "/root/testdata/sf0.001"
  private val path = "/tmp/vec_index_spec"

  // multiset compare (row -> count): a duplicate-row multiplicity
  // divergence between reader and contract must FAIL, which plain Set
  // semantics would mask (r14 ADVICE)
  private def rows(df: org.apache.spark.sql.DataFrame): Map[Seq[Any], Int] =
    df.collect().toSeq.map(_.toSeq).groupBy(identity)
      .map { case (r, g) => (r, g.size) }

  private lazy val built: Unit =
    VecQueries.buildVecIndexArtifact(spark, dir, path)

  test("every index reader equals its contract query bit-for-bit") {
    built
    val amortized = VecQueries.amortizedVecQueries(path)
    assert(amortized.keySet ==
      Set("ivfpq_topk", "pq_adc_topk", "ivf_probe_topk"))
    amortized.keySet.toSeq.sorted.foreach { name =>
      val want = rows(graft.SparkEntry.queries(name)(spark, dir))
      val got = rows(amortized(name)(spark, dir))
      assert(want.nonEmpty, s"$name: contract result is empty")
      assert(got == want, s"$name: index reader diverged from contract")
    }
  }

  test("rebuild equivalence: reloaded codebook re-quantizes to the stored shard") {
    built
    val v = spark.read.parquet(s"$dir/embeddings.parquet")
    val stored = VecIndex.loadShard(spark, path)
    val rebuilt = VecIndex.shard(v, VecIndex.loadCodebook(spark, path), 16)
    assert(rows(rebuilt) == rows(stored))
    assert(stored.count() == v.count())
  }

  test("partitioned layout: probe-pruned readers reproduce contract bits, " +
      "scan prunes on cell") {
    val pPath = "/tmp/vec_index_spec_part"
    VecQueries.buildVecIndexArtifactPartitioned(spark, dir, pPath)
    // the partitioned shard holds the same rows as the flat one (cell
    // moves from a data column to a partition directory, values intact)
    built
    val flat = VecIndex.loadShard(spark, path)
    val part = VecIndex.loadShard(spark, pPath)
      .select(flat.columns.map(org.apache.spark.sql.functions.col).toIndexedSeq: _*)
    assert(rows(part) == rows(flat))

    val prunedQ = VecQueries.prunedVecQueries(pPath)
    assert(prunedQ.keySet == Set("ivfpq_topk", "ivf_probe_topk"))
    prunedQ.keySet.toSeq.sorted.foreach { name =>
      val want = rows(graft.SparkEntry.queries(name)(spark, dir))
      val got = rows(prunedQ(name)(spark, dir))
      assert(want.nonEmpty, s"$name: contract result is empty")
      assert(got == want, s"$name: pruned index reader diverged from contract")
    }

    // the pruning is REAL partition pruning, and strict: one query
    // probes exactly nprobe=3 of the 8 cells, and the shard scan shows
    // the probe set as PartitionFilters (NOT a post-scan Filter: the
    // data read carries no cell column and no data filter at all)
    import org.apache.spark.sql.functions.col
    val v = spark.read.parquet(s"$dir/embeddings.parquet")
    val cb = VecIndex.loadCodebook(spark, pPath)
    val one = v.filter(col("vec_id") === 0)
    val cells = graft.ops.Similarity.probedCellUnion(one, cb, 3)
    assert(cells.size == 3, s"one query must probe exactly nprobe cells, got $cells")
    val prunedDf = graft.ops.Similarity.ivfProbeTopKFromIndex(
      one, VecIndex.loadShardPruned(spark, pPath, cells), cb, 3)
    // finalize AQE so the printed plan is the executed one, then assert
    // on the FileScan line (the typed collect() can't descend through
    // QueryStageExec wrappers)
    prunedDf.collect()
    val planStr = prunedDf.queryExecution.executedPlan.toString
    val scanLine = planStr.linesIterator
      .find(l => l.contains("FileScan parquet") && l.contains("shard"))
      .getOrElse(fail(s"no shard FileScan in plan:\n$planStr"))
    assert(scanLine.contains(s"PartitionFilters: [cell#"),
      s"probe IN-filter must land as PartitionFilters:\n$scanLine")
    assert(scanLine.contains(s" IN (${cells.mkString(",")})]"),
      s"PartitionFilters must hold the exact probe set $cells:\n$scanLine")
    assert(scanLine.contains("DataFilters: []") && !scanLine.contains("cell:int"),
      s"pruning must be partition-level only (no data filter, cell not read):\n$scanLine")
    // and the pruned single-query result equals the flat-shard read
    assert(rows(prunedDf) == rows(graft.ops.Similarity.ivfProbeTopKFromIndex(
      one, VecIndex.loadShard(spark, pPath), cb, 3)))
  }

  test("append exactness: shard(A) union shard(B) equals shard(A union B)") {
    built
    import org.apache.spark.sql.functions.col
    val v = spark.read.parquet(s"$dir/embeddings.parquet")
    val cb = VecIndex.loadCodebook(spark, path)
    val evens = v.filter(col("vec_id") % 2 === 0)
    val odds = v.filter(col("vec_id") % 2 =!= 0)
    val merged = rows(VecIndex.shard(evens, cb, 16)
      .unionByName(VecIndex.shard(odds, cb, 16)))
    assert(merged == rows(VecIndex.shard(v, cb, 16)))
    assert(merged.nonEmpty)
  }
}

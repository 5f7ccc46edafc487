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

  private def rows(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq).toSet

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

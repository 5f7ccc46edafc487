package graft.queries

import graft.TestSpark
import graft.ops.Similarity
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral cross-check for the `rrf_fusion` hybrid-retrieval query
  * (the DuckDB twin proves cross-engine bit-equality; this proves the
  * fusion SEMANTICS): every fused score must equal the exact-integer
  * RRF algebra applied to the row's own arm ranks, ranks must be
  * contiguous in (rrf DESC, doc_id) order, and the vector arm's ranks
  * must be exactly [[Similarity.bruteForceTopK]]'s at the same depth.
  */
class RrfFusionSpec extends AnyFunSuite {
  import TestSpark._

  private val dir = "/root/testdata/sf0.001"
  // THE production constants (r14 ADVICE: read, don't re-derive)
  private val K = VecQueries.RrfK
  private val Depth = VecQueries.RrfDepth
  private val TopK = VecQueries.RrfTopK

  private def contrib(rnk: Any): Long = rnk match {
    case null => 0L
    case r: Long => 1000000000000L / (K + r)
  }

  private lazy val rows =
    VecQueries.queries("rrf_fusion")(spark, dir).collect()

  test("fused score is exactly the integer RRF sum of the row's arm ranks") {
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val want = contrib(r.getAs[Any]("lex_rnk")) + contrib(r.getAs[Any]("vec_rnk"))
      assert(r.getAs[Long]("rrf") == want, s"row $r")
    }
    // fixture must exercise both fusion cases: a doc found by both arms
    // (the agreement boost RRF exists for) and a single-arm doc
    assert(rows.exists(r =>
      r.getAs[Any]("lex_rnk") != null && r.getAs[Any]("vec_rnk") != null))
    assert(rows.exists(r =>
      r.getAs[Any]("lex_rnk") == null || r.getAs[Any]("vec_rnk") == null))
  }

  test("ranks are contiguous per query in (rrf DESC, doc_id) order, cut at TopK") {
    rows.groupBy(_.getAs[Long]("qid")).foreach { case (qid, rs) =>
      val sorted = rs.sortBy(r => (-r.getAs[Long]("rrf"), r.getAs[Long]("doc_id")))
      assert(sorted.map(_.getAs[Long]("rnk")).toSeq == (1L to rs.length).toSeq,
        s"qid=$qid")
      assert(rs.length <= TopK)
    }
  }

  test("vector-arm ranks are exactly bruteForceTopK's at RrfDepth") {
    val v = spark.read.parquet(s"$dir/embeddings.parquet")
    val truth = Similarity.bruteForceTopK(v.filter("vec_id < 5"), v, k = Depth)
      .collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("vec_id")) -> r.getAs[Long]("rnk"))
      .toMap
    rows.filter(_.getAs[Any]("vec_rnk") != null).foreach { r =>
      val key = (r.getAs[Long]("qid"), r.getAs[Long]("doc_id"))
      assert(truth.get(key).contains(r.getAs[Long]("vec_rnk")), s"row $r")
    }
    // and docs absent from the vector arm are truly outside its top-Depth
    rows.filter(_.getAs[Any]("vec_rnk") == null).foreach { r =>
      val key = (r.getAs[Long]("qid"), r.getAs[Long]("doc_id"))
      assert(!truth.contains(key), s"row $r should not be in the vector top-$Depth")
    }
  }
}

package graft.queries

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Brute-force cross-check for the `dedup_substring` contract query
  * (Lee et al. 2022 ExactSubstr): recompute the merged duplicated
  * spans in plain Scala from the fixture texts — every length-L window
  * hashed, global occurrence counts, covered starts merged with gap ≤ L
  * — and require the query's span set to match exactly. Also asserts
  * the formulation's core invariants on real data: spans at least L
  * chars, inside their document, non-overlapping per doc.
  */
class DedupSubstringSpec extends AnyFunSuite {
  import TestSpark._

  private val dir = "/root/testdata/sf0.001"
  private val L = 40 // keep in sync with CorpusQueries.SubstrL

  test("spans equal the brute-force ExactSubstr merge on sf0.001") {
    val texts = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap

    // global window-occurrence counts (within-doc repeats count too)
    val occ = scala.collection.mutable.Map.empty[String, Int]
    for ((_, t) <- texts; if t.length >= L; i <- 0 to t.length - L)
      occ.updateWith(t.substring(i, i + L))(c => Some(c.getOrElse(0) + 1))

    val want = (for ((id, t) <- texts.toSeq; if t.length >= L) yield {
      val dupStarts = (0 to t.length - L)
        .filter(i => occ(t.substring(i, i + L)) >= 2)
      // merge runs of starts with gap <= L (coverage stays contiguous)
      val runs = scala.collection.mutable.ArrayBuffer.empty[List[Int]]
      for (p <- dupStarts) {
        if (runs.nonEmpty && p <= runs.last.head + L)
          runs(runs.size - 1) = p :: runs.last
        else runs += List(p)
      }
      runs.map { r =>
        val s0 = r.min + 1L // query is 1-based
        val e0 = r.max + L.toLong
        (id, s0, e0, e0 - s0 + 1L, r.size.toLong)
      }
    }).flatten.toSet

    val got = graft.SparkEntry.queries("dedup_substring")(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("span_start"),
        r.getAs[Long]("span_end"), r.getAs[Long]("span_len"),
        r.getAs[Long]("n_dup_windows"))).toSet

    assert(got.nonEmpty, "fixture should contain duplicated substrings")
    assert(got == want)
    // invariants: length >= L, in-bounds, per-doc non-overlap
    got.foreach { case (id, s0, e0, len, _) =>
      assert(len >= L && len == e0 - s0 + 1)
      assert(s0 >= 1 && e0 <= texts(id).length)
    }
    got.groupBy(_._1).values.foreach { spans =>
      val sorted = spans.toSeq.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Seq(a, b) => assert(b._2 > a._3 + 1,
          s"spans overlap or touch: $a $b") // gap > L would merge; > means disjoint with a real gap
        case _ =>
      }
    }
  }
}

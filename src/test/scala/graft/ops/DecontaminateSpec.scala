package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DecontaminateSpec extends AnyFunSuite {
  import TestSpark._

  test("flags training docs sharing n-grams with the benchmark set") {
    // doc 1 is the benchmark; doc 2 copies one of its 3-grams verbatim,
    // doc 3 shares nothing, doc 4 is a full copy (ratio 1.0).
    val df = docs(Seq(
      (1L, "the quick brown fox jumps over the lazy dog", "en"),
      (2L, "a quick brown fox appeared in the garden today", "en"),
      (3L, "completely unrelated text with no overlap at all", "en"),
      (4L, "the quick brown fox jumps over the lazy dog", "en")))
    val out = Decontaminate.report(df, col("doc_id") === 1L, n = 3)
      .orderBy("doc_id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(2L, 4L))
    val d2 = out(0)
    // doc 2 grams: 7 distinct (9 words); only "quick brown fox" overlaps
    assert(d2.getAs[Long]("sz") == 7L && d2.getAs[Long]("n_hit") == 1L)
    val d4 = out(1)
    assert(d4.getAs[Long]("n_hit") == d4.getAs[Long]("sz"))
    assert(d4.getAs[Double]("ratio") == 1.0)
  }

  test("no benchmark overlap yields an empty report") {
    val df = docs(Seq(
      (1L, "alpha beta gamma delta", "en"),
      (2L, "one two three four five", "en")))
    assert(Decontaminate.report(df, col("doc_id") === 1L, n = 3).count() == 0)
  }
}

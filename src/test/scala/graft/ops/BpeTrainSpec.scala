package graft.ops

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class BpeTrainSpec extends AnyFunSuite {
  import TestSpark._

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getAs[Long]("merge_rank"), r.getAs[String]("left_sym"),
      r.getAs[String]("right_sym"), r.getAs[Long]("pair_count"))).sortBy(_._1).toList

  test("hand-computed trajectory with frequency weighting and early stop") {
    // words: aaab (f=2), ab (f=1)
    // r1: (a,a)=4 (a,b)=3 -> merge (a,a): aaab = [aa,a,b]
    // r2: (aa,a)=2 (a,b)=2+1 -> merge (a,b): aaab = [aa,ab], ab = [ab]
    // r3: (aa,ab)=2 -> merge -> [aaab]; then no pairs remain: stop
    val out = BpeTrain.merges(docs(Seq((0L, "aaab aaab ab", "en"))), rounds = 5)
    assert(rows(out) == List(
      (1L, "a", "a", 4L), (2L, "a", "b", 3L), (3L, "aa", "ab", 2L)))
  }

  test("greedy left-to-right on a chained run: aaaa merges as [aa][aa]") {
    // r1: (a,a)=3 -> [aa,aa]; r2: (aa,aa)=1 -> [aaaa]; r3: nothing
    val out = BpeTrain.merges(docs(Seq((0L, "aaaa", "en"))), rounds = 4)
    assert(rows(out) == List((1L, "a", "a", 3L), (2L, "aa", "aa", 1L)))
  }

  test("tie-break is (count DESC, left, right)") {
    // xy and ab both appear once; (a,b) wins the tie lexicographically
    val out = BpeTrain.merges(docs(Seq((0L, "xy ab", "en"))), rounds = 1)
    assert(rows(out) == List((1L, "a", "b", 1L)))
  }

  test("tokenCounts: fully merged words compress to one symbol each") {
    // after the 3 learned merges, aaab and ab are both single symbols
    val out = BpeTrain.tokenCounts(
      docs(Seq((0L, "aaab aaab ab", "en"))), rounds = 5).head()
    assert(out.getAs[Long]("n_words") == 3L)
    assert(out.getAs[Long]("n_chars") == 10L)
    assert(out.getAs[Long]("n_bpe") == 3L)
    assert(out.getAs[Double]("compression") == 0.3)
  }

  test("partition-invariant: repartitioned corpus learns identical merges") {
    val d = docs(Seq((0L, "spark scala spark", "en"), (1L, "scala spark streams", "en")))
    val a = rows(BpeTrain.merges(d, rounds = 4))
    val b = rows(BpeTrain.merges(d.repartition(5), rounds = 4))
    assert(a == b && a.size == 4)
  }
}

package graft.ops

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class PerceptronSpec extends AnyFunSuite {
  import TestSpark._

  // labels FOLLOW the features: en docs are stuffed with en stopwords,
  // the rest with de stopwords — linearly separable on (x1, x2)
  private val separable = docs(
    (0L until 12L).map { i =>
      if (i % 2 == 0) (i, "the of and to is the a of and to", "en")
      else (i, "der die und das ist ein der die und das", "de")
    })

  test("converges to 100% on a separable corpus") {
    val out = Perceptron.train(separable, epochs = 3).collect()
    assert(out.length == 12)
    assert(out.forall(_.getAs[Boolean]("correct")))
    out.foreach { r =>
      val en = r.getAs[Long]("y") == 1L
      assert(r.getAs[Boolean]("predicted_en") == en)
      if (en) assert(r.getAs[Long]("margin") > 0L)
      else assert(r.getAs[Long]("margin") <= 0L)
    }
  }

  test("epoch-1 update equals the hand-computed all-misclassified batch") {
    // w starts at 0 -> margin 0 -> every doc misclassified -> after one
    // epoch w_j = sum_i y_i x_ij; en rows have x1=10 hits, de rows x2=10
    val out = Perceptron.train(separable, epochs = 1).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("margin")).toMap
    // w = (0, 60, -60, 0, 0, 0): bias cancels (6 en - 6 de), en-hits
    // +6*10, de-hits -6*10 -> en doc margin = 60*10, de doc = -60*10
    assert(out(0L) == 600L)
    assert(out(1L) == -600L)
  }

  test("partition-invariant: identical trajectory under repartition") {
    val a = Perceptron.train(separable, epochs = 2).collect().map(_.toSeq).toSet
    val b = Perceptron.train(separable.repartition(5), epochs = 2)
      .collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("aucHeldOut equals the brute-force pairwise U with midrank ties") {
    // a mixed corpus with DELIBERATE margin ties (duplicate texts on
    // both labels) so the ½-tie term is exercised
    val mixed = docs(Seq(
      (0L, "the of and to is", "en"),
      (1L, "the of and to is", "de"),     // tie with doc 0
      (2L, "der die und das ist", "de"),
      (3L, "the the the of of", "en"),
      (4L, "der die the of and", "de"),
      (5L, "the of and der die", "en"),   // tie with doc 4
      (6L, "word soup nothing here", "en"),
      (7L, "word soup nothing here", "de"))) // tie with doc 6
    val got = Perceptron.aucHeldOut(separable, mixed, epochs = 2).collect()(0)
    // independent pairwise computation from the same scored margins
    val marg = Perceptron.scoreHeldOut(separable, mixed, 2)
      .collect().map(r => (r.getAs[Long]("margin"), r.getAs[Long]("y")))
    val pos = marg.filter(_._2 == 1L).map(_._1)
    val neg = marg.filter(_._2 == -1L).map(_._1)
    val u2 = (for (p <- pos; n <- neg) yield {
      if (p > n) 2L else if (p == n) 1L else 0L
    }).sum
    assert(got.getAs[Long]("n_pos") == pos.length.toLong)
    assert(got.getAs[Long]("n_neg") == neg.length.toLong)
    val want = u2.toDouble / (2L * pos.length * neg.length).toDouble
    val wantSnapped = math.floor(want * 1e6 + 0.5) / 1e6
    assert(math.abs(got.getAs[Double]("auc") - wantSnapped) < 1e-12)
  }
}

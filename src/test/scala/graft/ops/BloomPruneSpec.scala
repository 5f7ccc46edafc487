package graft.ops

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class BloomPruneSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def kdf(ks: Long*) = ks.toDF("k")

  test("no false negatives: every true member row passes the filter") {
    val small = kdf(1L, 2L, 3L)
    val big = kdf((1L to 50L) ++ (1L to 3L): _*) // members appear twice
    val r = BloomPrune.audit(small, big, bits = 256, hashes = 3).head()
    assert(r.getAs[Long]("n_small") == 3L)
    assert(r.getAs[Long]("n_rows") == 53L)
    assert(r.getAs[Long]("n_match") == 6L)
    assert(r.getAs[Long]("n_pass") >= r.getAs[Long]("n_match"))
    assert(r.getAs[Long]("n_false_pos") ==
      r.getAs[Long]("n_pass") - r.getAs[Long]("n_match"))
  }

  test("empty small side: zero bits set, nothing passes") {
    val r = BloomPrune.audit(kdf(), kdf(1L to 20L: _*), bits = 256).head()
    assert(r.getAs[Long]("n_pass") == 0L && r.getAs[Long]("n_false_pos") == 0L)
    assert(r.getAs[Double]("fp_rate") == 0.0)
  }

  test("saturated filter: tiny bit budget passes everything (fp_rate -> 1)") {
    val r = BloomPrune.audit(kdf(1L to 200L: _*),
      kdf(1000L to 1099L: _*), bits = 64, hashes = 2).head()
    assert(r.getAs[Long]("n_match") == 0L)
    assert(r.getAs[Long]("n_pass") > 90L) // nearly all non-members leak through
  }
}

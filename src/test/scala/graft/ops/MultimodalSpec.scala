package graft.ops

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  import TestSpark._

  private val corpus = docs(Seq(
    (0L, "abcdefghij" * 20, "en"), // 200 bytes
    (1L, "short", "en"),
    (2L, "x" * 64, "en")))

  test("blob table carries opaque bytes + typed metadata") {
    val b = Multimodal.toBlobTable(corpus).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(b(0L).getAs[Array[Byte]]("media").length == 200)
    val meta = b(1L).getAs[org.apache.spark.sql.Row]("media_meta")
    assert(meta.getAs[Long]("n_bytes") == 5L)
    assert(meta.getAs[String]("checksum_md5").length == 32)
  }

  test("features: geometry deterministic from checksum, frame plan = ceil(bytes/64)") {
    val f = Multimodal.features(Multimodal.toBlobTable(corpus)).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(f(0L).getAs[Long]("n_frames") == 4L) // ceil(200/64)
    assert(f(1L).getAs[Long]("n_frames") == 1L)
    assert(f(2L).getAs[Long]("n_frames") == 1L)
    Seq(0L, 1L, 2L).foreach { id =>
      assert(f(id).getAs[Long]("width") >= 16L && f(id).getAs[Long]("width") <= 271L)
      assert(f(id).getAs[Long]("height") >= 16L && f(id).getAs[Long]("height") <= 271L)
    }
    // determinism: same content → same geometry
    val again = Multimodal.features(Multimodal.toBlobTable(corpus)).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("width")).toMap
    assert(again(0L) == f(0L).getAs[Long]("width"))
  }

  test("decodeFrames streams partition-wise and samples every Nth frame") {
    val frames = Multimodal.decodeFrames(
      Multimodal.toBlobTable(corpus), frameBytes = 64, sampleEvery = 2,
      parallelism = Some(3)).collect()
    val byDoc = frames.groupBy(_.doc_id)
    // doc 0: 4 frames (0..3), sampled idx 0 and 2
    assert(byDoc(0L).map(_.frame_idx).sorted.toSeq == Seq(0L, 2L))
    // 'x'*64: single frame of constant bytes → mean == min == max == 'x'
    val x = byDoc(2L).head
    assert(x.mean_byte == 'x'.toInt.toDouble && x.max_byte == 'x'.toInt)
    // Σ (j+1)·120 for j in 0..63 = 120 · 64·65/2
    assert(x.pos_checksum == 120L * (64 * 65 / 2))
    frames.foreach(f => assert(f.mean_byte >= f.min_byte && f.mean_byte <= f.max_byte))
  }

  test("resizePool covers every byte once with the floor index map") {
    val pooled = Multimodal.resizePool(
      Multimodal.toBlobTable(corpus), buckets = 16, parallelism = Some(3))
      .collect()
    val byDoc = pooled.groupBy(_.doc_id)
    // full coverage: bucket counts sum to the byte length
    assert(byDoc(0L).map(_.n_in).sum == 200L)
    assert(byDoc(1L).map(_.n_in).sum == 5L)
    // "short" (5 bytes < 16 buckets): exactly 5 singleton buckets at
    // floor(i*16/5) = 0,3,6,9,12
    assert(byDoc(1L).map(_.bucket).sorted.toSeq == Seq(0L, 3L, 6L, 9L, 12L))
    assert(byDoc(1L).forall(_.n_in == 1L))
    // constant payload: every bucket mean is exactly 'x'
    assert(byDoc(2L).forall(p => p.mean_byte == 'x'.toInt.toDouble))
    // sums are consistent with means (snap is identity on small ratios
    // only when exact — check via reconstruction inequality instead)
    pooled.foreach { p =>
      assert(math.abs(p.mean_byte - p.sum_bytes.toDouble / p.n_in) <= 5e-7)
    }
  }
}

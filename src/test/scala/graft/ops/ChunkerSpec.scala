package graft.ops

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class ChunkerSpec extends AnyFunSuite {
  import TestSpark._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("windows advance by stride, clamp at the end, and hash the joined text") {
    // 7 tokens, window 4, stride 3 → chunks at offsets 0, 3, 6
    val out = Chunker.chunks(docs(Seq((0L, "a b c d e f g", "en"))), 4, 3)
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(_._1)
    assert(out.toSeq == Seq(
      (0L, 4L, md5hex("a b c d")),
      (1L, 4L, md5hex("d e f g")),
      (2L, 1L, md5hex("g"))))
  }

  test("short documents yield exactly one chunk; trailing spaces count as tokens") {
    val out = Chunker.chunks(docs(Seq((0L, "x y", "en"), (1L, "x ", "en"))), 5, 5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out.length == 2)
    assert(out.find(_._1 == 0L).get == ((0L, 0L, 2L, md5hex("x y"))))
    // "x " splits to ["x", ""] — two tokens, joined back as the original
    assert(out.find(_._1 == 1L).get == ((1L, 0L, 2L, md5hex("x "))))
  }
}

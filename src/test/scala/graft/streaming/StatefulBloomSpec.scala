package graft.streaming

import graft.TestSpark
import graft.ops.BloomPrune
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable

/** Streaming Bloom words ≡ batch BloomPrune.buildWords after every
  * prefix, under chunking, duplicate keys, AND full replays
  * (at-least-once tolerance — the OR-idempotence contract); state and
  * emissions stay ≤ bits/64 words; saturated words go quiet. */
class StatefulBloomSpec extends AnyFunSuite {
  import TestSpark._
  import StatefulBloom.{KeyIn, WordOut}

  private val Bits = 512
  private val Hashes = 3
  private val keys: Seq[KeyIn] =
    ((0 until 60).map(i => KeyIn(i * 37L)) ++
      (0 until 30).map(i => KeyIn(i * 37L))).toSeq // heavy duplication

  private def runStream(chunks: Seq[Seq[KeyIn]]): Map[Int, Long] = {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val latest = mutable.LinkedHashMap[Int, Long]()
    var emissions = 0
    val ms = MemoryStream[KeyIn]
    val q = StatefulBloom.words(ms.toDS(), Bits, Hashes)
      .writeStream.outputMode(OutputMode.Append())
      .foreachBatch { (df: org.apache.spark.sql.Dataset[WordOut], _: Long) =>
        df.collect().foreach { o => latest(o.word_idx) = o.bits; emissions += 1 }
      }.start()
    try chunks.foreach { c => ms.addData(c); q.processAllAvailable() }
    finally q.stop()
    latest.toMap
  }

  private def batchOf(ks: Seq[KeyIn]): Map[Int, Long] =
    BloomPrune.buildWords(ks.map(_.k), Bits, Hashes)
      .zipWithIndex.collect { case (w, i) if w != 0L => i -> w }.toMap

  test("latest words equal batch after the full stream") {
    val got = runStream(Seq(keys.slice(0, 40), keys.slice(40, 90)))
    assert(got == batchOf(keys))
    assert(got.size <= Bits / 64)
  }

  test("replays and duplicates cannot move a bit (at-least-once safe)") {
    val c1 = keys.slice(0, 50)
    val replayed = Seq(c1, c1, keys, c1) // full redelivery mid-stream
    assert(runStream(replayed) == batchOf(keys))
  }

  test("every prefix equals batch over keys seen so far") {
    val c1 = keys.slice(0, 25); val c2 = keys.slice(25, 70)
    for ((chunks, seen) <- Seq(Seq(c1) -> c1, Seq(c1, c2) -> (c1 ++ c2))) {
      assert(runStream(chunks) == batchOf(seen))
    }
  }

  test("a saturated filter goes quiet: no-change batches emit nothing") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val perBatch = mutable.ArrayBuffer[Long]()
    val ms = MemoryStream[KeyIn]
    val q = StatefulBloom.words(ms.toDS(), Bits, Hashes)
      .writeStream.outputMode(OutputMode.Append())
      .foreachBatch { (df: org.apache.spark.sql.Dataset[WordOut], _: Long) =>
        perBatch += df.count(); ()
      }.start()
    try {
      ms.addData(keys); q.processAllAvailable()
      ms.addData(keys.slice(0, 30)); q.processAllAvailable() // pure replay
    } finally q.stop()
    assert(perBatch.length == 2 && perBatch(0) > 0 && perBatch(1) == 0L)
  }
}

package graft.streaming

import graft.TestSpark
import graft.ops.RandomWalk
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable

/** StatefulWalk.extendBiased ≡ the batch
  * [[RandomWalk.biasedWalks]] corpus at the matching total walk length,
  * after every exactly-once prefix of start-node ingestion, under any
  * chunking, under incremental multi-arrival extension, and across a
  * checkpoint restart — the node2vec (prev, cur) transition carried in
  * keyed state. Equality is exact: longs + shared md5 draws. */
class StatefulBiasedWalkSpec extends AnyFunSuite {
  import TestSpark._
  import StatefulWalk.{StartIn, WalkOut}

  private val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
  private val dirPairs = (edges ++ edges.map(_.swap)).distinct
  private val adjacency: Map[Long, Seq[Long]] =
    dirPairs.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
  private val starts = Seq(1L, 2L, 3L, 4L, 5L)
  private val (wr, wc, wo) = (4L, 2L, 1L)

  private def batchCorpus(nodes: Seq[Long], steps: Int): Set[(Long, Long, Long)] = {
    val s = spark
    import s.implicits._
    RandomWalk.biasedWalks(dirPairs.toDF("x", "y"), nodes.toDF("node"),
        steps, wr, wc, wo)
      .collect()
      .map(r => (r.getAs[Long]("walk_id"), r.getAs[Long]("step"),
        r.getAs[Long]("node"))).toSet
  }

  private def runStream(chunks: Seq[Seq[Long]],
                        stepsPerIngest: Int): Set[(Long, Long, Long)] = {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val got = mutable.ArrayBuffer[(Long, Long, Long)]()
    val ms = MemoryStream[StartIn]
    val q = StatefulWalk.extendBiased(ms.toDS(), adjacency, stepsPerIngest,
        wr, wc, wo)
      .writeStream.outputMode(OutputMode.Append())
      .foreachBatch { (df: org.apache.spark.sql.Dataset[WalkOut], _: Long) =>
        got.synchronized {
          df.collect().foreach(o => got += ((o.walk_id, o.step, o.node)))
        }; ()
      }.start()
    try chunks.foreach { c => ms.addData(c.map(StartIn)); q.processAllAvailable() }
    finally q.stop()
    got.toSet
  }

  test("one ingestion per start equals the batch biased corpus, any chunking") {
    val want = batchCorpus(starts, 4)
    assert(runStream(Seq(starts), 4) == want)
    assert(runStream(Seq(Seq(1L, 2L), Seq(3L), Seq(4L, 5L)), 4) == want)
  }

  test("every ingested prefix equals batch over the starts seen so far") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val got = mutable.ArrayBuffer[(Long, Long, Long)]()
    val ms = MemoryStream[StartIn]
    val q = StatefulWalk.extendBiased(ms.toDS(), adjacency, 3, wr, wc, wo)
      .writeStream.outputMode(OutputMode.Append())
      .foreachBatch { (df: org.apache.spark.sql.Dataset[WalkOut], _: Long) =>
        got.synchronized {
          df.collect().foreach(o => got += ((o.walk_id, o.step, o.node)))
        }; ()
      }.start()
    val cuts = Seq(2, 3, 5)
    try cuts.foldLeft(0) { (from, to) =>
      ms.addData(starts.slice(from, to).map(StartIn)); q.processAllAvailable()
      assert(got.toSet == batchCorpus(starts.take(to), 3),
        s"prefix $to diverged from batch")
      to
    } finally q.stop()
  }

  test("re-arrival extends the walk: 2 ingests x 2 steps == batch 4 steps") {
    // the (prev, cur) state must survive the round boundary — a lost
    // prev would collapse step 3 back to the uniform law
    val got = runStream(Seq(starts, starts), 2)
    assert(got == batchCorpus(starts, 4))
  }

  test("isolated start emits only step 0; sink walks park") {
    val got = runStream(Seq(Seq(99L), Seq(99L)), 3)
    assert(got == Set((99L, 0L, 99L)))
  }

  test("uniform weights reduce the stream to the uniform-law corpus") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val got = mutable.ArrayBuffer[(Long, Long, Long)]()
    val ms = MemoryStream[StartIn]
    val q = StatefulWalk.extendBiased(ms.toDS(), adjacency, 4, 1L, 1L, 1L)
      .writeStream.outputMode(OutputMode.Append())
      .foreachBatch { (df: org.apache.spark.sql.Dataset[WalkOut], _: Long) =>
        got.synchronized {
          df.collect().foreach(o => got += ((o.walk_id, o.step, o.node)))
        }; ()
      }.start()
    try { ms.addData(starts.map(StartIn)); q.processAllAvailable() }
    finally q.stop()
    val want = RandomWalk.biasedWalks(dirPairs.toDF("x", "y"),
        starts.toDF("node"), 4, 1L, 1L, 1L)
      .collect()
      .map(r => (r.getAs[Long]("walk_id"), r.getAs[Long]("step"),
        r.getAs[Long]("node"))).toSet
    assert(got.toSet == want)
  }

  test("restart from checkpoint resumes the (prev, cur) frontier") {
    val s = spark
    import s.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-sbwalk").toString
    val ckpt = base + "/ckpt"
    val srcDir = base + "/src"
    val got = mutable.ArrayBuffer[(Long, Long, Long)]()
    val schema = starts.map(StartIn).toDF().schema

    def runChunk(chunk: Seq[Long]): Unit = {
      chunk.map(StartIn).toDF().coalesce(1).write.mode("append").parquet(srcDir)
      val in = s.readStream.schema(schema).parquet(srcDir).as[StartIn]
      val q = StatefulWalk.extendBiased(in, adjacency, 2, wr, wc, wo)
        .writeStream
        .outputMode(OutputMode.Append())
        .foreachBatch { (df: org.apache.spark.sql.Dataset[WalkOut], _: Long) =>
          got.synchronized {
            df.collect().foreach(o => got += ((o.walk_id, o.step, o.node)))
          }; ()
        }
        .option("checkpointLocation", ckpt).start()
      try q.processAllAvailable() finally q.stop()
    }

    runChunk(starts)          // round 1: steps 0..2
    runChunk(starts)          // round 2 after restart: steps 3..4
    assert(got.toSet == batchCorpus(starts, 4))
  }
}

package graft.streaming

import graft.TestSpark
import graft.ops.Rollup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable

/** transformWithState continuous-aggregate reader ≡ Rollup.hourly bits:
  * after every ingested chunk the latest upsert per (run, bucket)
  * equals the batch rollup over the rows so far (prefix equality), the
  * final state equals the full batch rollup at any chunking, and a
  * checkpointed restart resumes the partials exactly (the 32nd
  * batch≡stream twin). */
class StatefulRollupReaderSpec extends AnyFunSuite {
  import TestSpark._
  import StatefulRollupReader.{MetricIn, RollOut}

  // 3 runs × 4 hours × 6 rows/hour, with periodic null sharpe/sortino
  // (a bucket's avg must stay null-correct) and non-monotone ingestion
  // order inside chunks (the fold is order-free).
  private val rows: Seq[MetricIn] = (for {
    r <- 1 to 3
    i <- 0 until 24
  } yield {
    val h = (r * 37 + i * 13) % 31
    MetricIn(s"run$r",
      tsUs(1700000000000000L + (i.toLong * 600 + r * 7) * 1000000L),
      if ((i + r) % 5 == 0) None else Some(0.8 + h * 0.01),
      if ((i + r) % 7 == 0) None else Some(1.1 + h * 0.02),
      100.0 + i * 0.5 + r,
      (h % 5) * 0.3,
      (h % 4).toLong)
  }).sortBy(m => (m.metric_time.getTime % 977, m.strategy_run_id))

  private type K = (String, java.sql.Timestamp)
  private type V = (Option[Double], Option[Double], Double, Double, Long)

  private def batchHourly(prefix: Seq[MetricIn]): Map[K, V] = {
    val s = spark
    import s.implicits._
    Rollup.hourly(prefix.toDF()).collect().map { r =>
      ((r.getString(0), r.getTimestamp(1)),
        (Option(r.get(2)).map(_.asInstanceOf[Double]),
          Option(r.get(3)).map(_.asInstanceOf[Double]),
          r.getDouble(4), r.getDouble(5), r.getLong(6)))
    }.toMap
  }

  private def record(latest: mutable.Map[K, V])(o: RollOut): Unit =
    latest((o.strategy_run_id, o.bucket)) =
      (o.avg_sharpe, o.avg_sortino, o.last_cumulative_return,
        o.max_drawdown, o.total_trades)

  test("upserts equal Rollup.hourly bits at every ingestion prefix") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val prev = s.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val latest = mutable.Map[K, V]()
    try {
      val ms = MemoryStream[MetricIn]
      val q = StatefulRollupReader.hourly(ms.toDS())
        .writeStream.outputMode(OutputMode.Append())
        .foreachBatch { (df: org.apache.spark.sql.Dataset[RollOut], _: Long) =>
          latest.synchronized(df.collect().foreach(record(latest))); ()
        }.start()
      try {
        val cuts = Seq(17, 40, rows.size)
        cuts.foldLeft(0) { (from, to) =>
          ms.addData(rows.slice(from, to)); q.processAllAvailable()
          assert(latest.toMap == batchHourly(rows.take(to)),
            s"prefix $to diverged from Rollup.hourly")
          to
        }
      } finally q.stop()
    } finally {
      prev match {
        case Some(p) => s.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => s.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
    assert(latest.nonEmpty)
  }

  test("restart from checkpoint resumes the partials exactly") {
    val s = spark
    import s.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-srollup").toString
    val ckpt = base + "/ckpt"
    val srcDir = base + "/src"
    val latest = mutable.Map[K, V]()
    val schema = rows.toDF().schema

    def runChunk(chunk: Seq[MetricIn]): Unit = {
      chunk.toDF().coalesce(1).write.mode("append").parquet(srcDir)
      val in = s.readStream.schema(schema).parquet(srcDir).as[MetricIn]
      val q = StatefulRollupReader.hourly(in).writeStream
        .outputMode(OutputMode.Append())
        .foreachBatch { (df: org.apache.spark.sql.Dataset[RollOut], _: Long) =>
          latest.synchronized(df.collect().foreach(record(latest))); ()
        }
        .option("checkpointLocation", ckpt).start()
      try q.processAllAvailable() finally q.stop()
    }

    val prevP = s.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      runChunk(rows.take(30))
      runChunk(rows.drop(30)) // new process, state restored from ckpt
    } finally {
      prevP match {
        case Some(p) => s.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => s.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
    assert(latest.toMap == batchHourly(rows))
  }
}

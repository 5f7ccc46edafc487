package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.sql.Timestamp

/** Shared local session + fixture builders for operator specs. */
object TestSpark {
  lazy val spark: SparkSession = {
    // local[4, 4]: 4 threads AND spark.task.maxFailures = 4 — task
    // retries are real in the test JVM, so FailureInjectionSpec can kill
    // first attempts and prove bit-stable recomputation. Specs that
    // assert a job THROWS still pass (the retried attempts hit the same
    // deterministic error and the job fails with it after 4 tries).
    val s = SparkSession.builder()
      .master("local[4, 4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", "/tmp/graft-test-warehouse")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def ts(secs: Long): Timestamp = new Timestamp(1700000000000L + secs * 1000L)

  /** Timestamp with full microsecond precision (offset in micros from the
    * same epoch as [[ts]]) — for fixtures that must exercise sub-ms event
    * times, which `getTime`-based code paths would silently truncate. */
  def tsUs(us: Long): Timestamp = {
    val total = 1700000000000000L + us
    val t = new Timestamp(Math.floorDiv(total, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(total, 1000000L) * 1000L).toInt)
    t
  }

  final case class Tick(
      product_id: String, event_time: Timestamp, sequence: Long,
      price: java.lang.Double, best_bid: java.lang.Double,
      best_ask: java.lang.Double)

  /** Raw-tick fixture: (product, second, seq, price, bid, ask). */
  def ticks(rows: Seq[(String, Long, Long, Double, Option[Double], Option[Double])]): DataFrame = {
    val s = spark
    import s.implicits._
    rows.map { case (p, t, q, pr, b, a) =>
      Tick(p, ts(t), q, pr,
        b.map(Double.box).orNull, a.map(Double.box).orNull)
    }.toDF()
  }

  /** Simple constant-spread tick series from prices (bid/ask = ±0.1%). */
  def series(product: String, prices: Seq[Double], stepSecs: Long = 1L): DataFrame =
    ticks(prices.zipWithIndex.map { case (p, i) =>
      (product, i * stepSecs, i.toLong, p, Some(p * 0.999), Some(p * 1.001))
    })

  final case class Doc(doc_id: Long, text: String, lang: String)
  def docs(rows: Seq[(Long, String, String)]): DataFrame = {
    val s = spark
    import s.implicits._
    rows.map { case (i, t, l) => Doc(i, t, l) }.toDF()
  }

  final case class Vec(vec_id: Long, embedding: Seq[Float], label: Int)
  def vecs(rows: Seq[(Long, Seq[Float], Int)]): DataFrame = {
    val s = spark
    import s.implicits._
    rows.map { case (i, e, l) => Vec(i, e, l) }.toDF()
  }
}

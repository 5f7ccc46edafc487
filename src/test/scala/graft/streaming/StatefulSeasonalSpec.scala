package graft.streaming

import graft.TestSpark
import graft.ops.Seasonal
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable

/** StatefulSeasonal ≡ batch Seasonal.hourOfDayProfile over the prefix's
  * full-window centers, per (key, hour) latest emission, bit-for-bit —
  * under any chunking (including splits INSIDE the 25-row window, so
  * the ring must survive a batch boundary) and across a checkpoint
  * restart. */
class StatefulSeasonalSpec extends AnyFunSuite {
  import TestSpark._
  import StatefulSeasonal.{GridIn, SlotOut}

  // two instruments, hourly grid, deterministic trend + period-24
  // pattern + per-key wobble (so slots differ and sd_within > 0)
  private val rows: Seq[GridIn] = for {
    (p, salt) <- Seq(("A", 3), ("B", 11))
    t <- 0 until 30 * 24
  } yield GridIn(p, new java.sql.Timestamp(t * 3600L * 1000L),
    (1000000L + 3L * t + ((t % 24) * 37 % 11 - 5) * 250L +
      ((t * 7919 + salt) % 13 - 6) * 10L).toDouble / 1e4)

  private def batchOf(rs: Seq[GridIn]): Map[(String, Long), (Long, Double, Double)] = {
    val s = spark
    import s.implicits._
    Seasonal.hourOfDayProfile(rs.toDF("product_id", "grid_ts", "price"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4)))
      .toMap
  }

  private def bitsEqual(a: Map[(String, Long), (Long, Double, Double)],
                        b: Map[(String, Long), (Long, Double, Double)]): Boolean =
    a.keySet == b.keySet && a.forall { case (k, (n1, s1, d1)) =>
      val (n2, s2, d2) = b(k)
      n1 == n2 &&
        java.lang.Double.doubleToLongBits(s1) == java.lang.Double.doubleToLongBits(s2) &&
        java.lang.Double.doubleToLongBits(d1) == java.lang.Double.doubleToLongBits(d2)
    }

  private def runStream(chunks: Seq[Seq[GridIn]]): Map[(String, Long), (Long, Double, Double)] = {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val latest = mutable.LinkedHashMap[(String, Long), (Long, Double, Double)]()
    val ms = MemoryStream[GridIn]
    val q = StatefulSeasonal.profile(ms.toDS())
      .writeStream.outputMode(OutputMode.Append())
      .foreachBatch { (df: org.apache.spark.sql.Dataset[SlotOut], _: Long) =>
        df.collect().foreach(o =>
          latest((o.product_id, o.hour_od)) = (o.n_obs, o.seasonal, o.sd_within))
      }.start()
    try chunks.foreach { c => ms.addData(c); q.processAllAvailable() }
    finally q.stop()
    latest.toMap
  }

  test("latest slot emissions equal batch, chunk split inside the window") {
    val want = batchOf(rows)
    assert(want.size == 48 && want.values.exists(_._3 > 0.0))
    // split at 40 (mid-window for key A's ring) and at 750 (mid-stream)
    val got = runStream(Seq(rows.slice(0, 40), rows.slice(40, 750),
      rows.slice(750, rows.size)))
    assert(bitsEqual(got, want))
  }

  test("every prefix matches batch over rows seen so far") {
    val byKey = rows.groupBy(_.product_id)
    // interleave keys in time order, cut at arbitrary points
    val ordered = rows.sortBy(r => (r.grid_ts.getTime, r.product_id))
    val cuts = Seq(100, 333, ordered.size)
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val latest = mutable.LinkedHashMap[(String, Long), (Long, Double, Double)]()
    val ms = MemoryStream[GridIn]
    val q = StatefulSeasonal.profile(ms.toDS())
      .writeStream.outputMode(OutputMode.Append())
      .foreachBatch { (df: org.apache.spark.sql.Dataset[SlotOut], _: Long) =>
        df.collect().foreach(o =>
          latest((o.product_id, o.hour_od)) = (o.n_obs, o.seasonal, o.sd_within))
      }.start()
    try cuts.foldLeft(0) { (from, to) =>
      ms.addData(ordered.slice(from, to)); q.processAllAvailable()
      assert(bitsEqual(latest.toMap, batchOf(ordered.take(to))),
        s"prefix $to diverged")
      to
    } finally q.stop()
  }

  test("restart from checkpoint resumes ring and slot state") {
    val s = spark
    import s.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-sseas").toString
    val ckpt = base + "/ckpt"
    val srcDir = base + "/src"
    val latest = mutable.LinkedHashMap[(String, Long), (Long, Double, Double)]()
    val ordered = rows.sortBy(r => (r.grid_ts.getTime, r.product_id))
    val schema = ordered.toDF().schema

    def runChunk(chunk: Seq[GridIn]): Unit = {
      chunk.toDF().coalesce(1).write.mode("append").parquet(srcDir)
      val in = s.readStream.schema(schema).parquet(srcDir).as[GridIn]
      val q = StatefulSeasonal.profile(in).writeStream
        .outputMode(OutputMode.Append())
        .foreachBatch { (df: org.apache.spark.sql.Dataset[SlotOut], _: Long) =>
          latest.synchronized {
            df.collect().foreach(o =>
              latest((o.product_id, o.hour_od)) = (o.n_obs, o.seasonal, o.sd_within))
          }; ()
        }
        .option("checkpointLocation", ckpt).start()
      try q.processAllAvailable() finally q.stop()
    }

    // cut INSIDE the ring window (row 50 of ~1440) so the restart must
    // recover a half-filled ring from the checkpoint
    runChunk(ordered.take(50))
    runChunk(ordered.drop(50))
    assert(bitsEqual(latest.toMap, batchOf(ordered)))
  }
}

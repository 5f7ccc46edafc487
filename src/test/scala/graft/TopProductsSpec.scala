package graft

import graft.ops.GapFill
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the closed-form filled-grid count behind TickQueries.topProducts:
  * n = (max − trunc(min,'hour')) div 1h + (min == trunc(min) ? 1 : 0)
  * must equal the count actually produced by building the hourly
  * gap-fill grid and filtering non-null fills — including the
  * exact-hour-boundary edge (min falling precisely on a truncation
  * point) and the single-tick degenerate cases. */
class TopProductsSpec extends AnyFunSuite {
  import TestSpark._

  private def rankViaGrid(ticksDf: org.apache.spark.sql.DataFrame): Seq[String] =
    GapFill(
      ticksDf.groupBy(col("product_id"), col("event_time"))
        .agg(max(col("price")).as("price")),
      Seq("product_id"), "event_time", "1 hour",
      Seq("price" -> "price"), truncUnit = "hour")
      .filter(col("price").isNotNull)
      .groupBy(col("product_id")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy { case (p, c) => (-c, p) }.map(_._1).toSeq

  test("closed-form pick equals the grid-built count ranking (boundary cases)") {
    // per product: offsets in MICROS from the shared epoch; covers
    // exact-hour minimum, sub-hour single tick, exact-hour single tick,
    // multi-hour spans with ragged ends, and duplicate timestamps
    val h = 3600L * 1000000L
    val fixtures: Seq[(String, Seq[Long])] = Seq(
      "exact_hour_min" -> Seq(0L, h / 2, 3 * h + 7L),
      "offhour_min" -> Seq(h / 3, h / 3, 2 * h + 1L),
      "single_offhour" -> Seq(h / 2),
      "single_exact" -> Seq(2 * h),
      "just_under_next_hour" -> Seq(h / 4, h - 1L),
      "long_span" -> (0L to 50L).map(i => i * h / 2 + (i % 3)),
      "dup_stamps" -> Seq(h + 5L, h + 5L, h + 5L, 4 * h)
    )
    val rows = fixtures.flatMap { case (p, offs) =>
      offs.zipWithIndex.map { case (us, i) =>
        (p, i.toLong, 100.0 + i, us)
      }
    }
    val s = spark
    import s.implicits._
    val ticksDf = rows.toDF("product_id", "sequence", "price", "us")
      .select(col("product_id"), col("sequence"), col("price"),
        expr("timestamp_micros(us + 1700000000000000)").as("event_time"))
    val viaGrid = rankViaGrid(ticksDf)
    val closed = queries.TickQueries.topProducts(ticksDf, fixtures.size)
    assert(closed == viaGrid)
  }

  test("randomized spans agree with the grid-built ranking") {
    val rnd = new scala.util.Random(7)
    val h = 3600L * 1000000L
    val rows = (0 until 40).flatMap { p =>
      val base = rnd.nextLong(30L * 24 * h)
      val n = 1 + rnd.nextInt(30)
      (0 until n).map { i =>
        val off = rnd.nextLong(72L * h)
        // 1 in 5 products get snapped-to-hour minima to hit the boundary
        val t = if (p % 5 == 0) (base / h) * h + (off / h) * h else base + off
        (f"p$p%02d", i.toLong, 100.0 + i, t)
      }
    }
    val s = spark
    import s.implicits._
    val ticksDf = rows.toDF("product_id", "sequence", "price", "us")
      .select(col("product_id"), col("sequence"), col("price"),
        expr("timestamp_micros(us + 1700000000000000)").as("event_time"))
    assert(queries.TickQueries.topProducts(ticksDf, 40) == rankViaGrid(ticksDf))
  }
}

package graft.tools
import graft.config.StrategyConfig
import graft.ops._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ScaleSanity {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = graft.queries.TickQueries.ticks(spark, "/root/testdata/sf0.1")
    // 10x: shift each copy by 30 days and offset sequences/keys
    val big = (0 until 10).map { i =>
      base.withColumn("event_time", expr(s"timestampadd(DAY, ${i * 30}, event_time)"))
        .withColumn("sequence", col("sequence") + lit(i * 10000000L))
    }.reduce(_ unionByName _)
    val cfg = StrategyConfig()
    val t0 = System.nanoTime()
    val costs = Positions.costs(Positions.stream(SmaCross.enrich(Normalize(big), cfg)), cfg)
    val m = Performance(costs, cfg)
    println(s"rows=${big.count()} metrics=${m.count()} execs=${Positions.executions(costs, cfg).count()}")
    val nulls = m.filter(col("cumulative_return").isNull || col("volatility").isNull).count()
    println(s"null-aggregates=$nulls  secs=${(System.nanoTime()-t0)/1e9}")

    // Round-2 operators at 10x: as-of enrich, bucketed range join, hourly
    // gap-fill, EWMA fold. Sanity = completes, plausible row counts, no
    // nulls where values are guaranteed.
    val t1 = System.nanoTime()
    val obs = big.select(col("product_id"), col("event_time"), col("sequence"), col("price"))
    val probes = obs.filter(col("sequence") % 97 === 0)
      .select(col("product_id"), col("event_time").as("pt"), col("sequence"))
    val asof = AsofJoin(probes, obs.groupBy(col("product_id"), col("event_time"))
        .agg(max(col("price")).as("p")),
      Seq("product_id"), "pt", "event_time", Seq("p" -> "last_price"))
    println(s"asof=${asof.count()} (probes matched, null last_price=${
      asof.filter(col("last_price").isNull).count()})")
    val rj = RangeJoin.pairs(probes, obs, Seq("product_id"), "pt", "event_time",
      -300L, 0L, Seq("price" -> "bp"))
    println(s"range_pairs=${rj.count()}")
    val gf = GapFill(obs.select(col("product_id"), col("event_time"), col("price")),
      Seq("product_id"), "event_time", "1 hour",
      Seq("price" -> "price"), truncUnit = "hour")
    println(s"gapfill=${gf.count()}")
    val ew = Ewma.finalPerKey(big, "product_id", "event_time", "sequence", "price")
    println(s"ewma_keys=${ew.count()} null_ewma=${ew.filter(col("ewma").isNull).count()}")
    println(s"round2 secs=${(System.nanoTime()-t1)/1e9}")
    spark.stop()
  }
}

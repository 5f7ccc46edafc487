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
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import graft.ops._
import graft.queries.TickQueries

/** Dev probe: where does metrics_5m's time go? Times the strategy
  * pipeline at four cut points (scan only, returns pipeline, + windows
  * aggregate, full metrics, hourly rollup) so the Performance.windows
  * scaladoc's "the aggregation is not the cost" claim stays a measured
  * fact rather than an assumption. */
object MetricsBreakdownProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    val cfg = TickQueries.cfg
    def costs = Positions.costs(
      Positions.stream(SmaCross.enrich(Normalize(TickQueries.ticks(spark, d)), cfg)), cfg)
    def time(label: String)(f: => org.apache.spark.sql.DataFrame): Unit = {
      val ts = (1 to 4).map { _ =>
        val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"PROBE $label%-30s median=${ts.drop(1).sorted.apply(1)}%.3f  all=${ts.map(x => f"$x%.2f").mkString(",")}")
    }
    time("ticks scan only")(TickQueries.ticks(spark, d))
    time("returns (upstream only)")(Performance.positionReturns(costs))
    time("windows (upstream+agg)")(Performance.windows(Performance.positionReturns(costs), cfg))
    time("metrics_5m (full)")(Performance(costs, cfg))
    time("rollup_hourly (full)")(Rollup.hourly(Performance(costs, cfg)))
    spark.stop()
  }
}

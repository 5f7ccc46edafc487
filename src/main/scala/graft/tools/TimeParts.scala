package graft.tools

import graft.config.StrategyConfig
import graft.ops.{Det, Normalize, Performance, Positions, SmaCross}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: attribute metrics_5m wall-clock to its pipeline stages.
  * Usage: runMain graft.tools.TimeParts [sfDir]
  */
object TimeParts {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val cfg = StrategyConfig()

    def costs: DataFrame =
      Positions.costs(Positions.stream(SmaCross.enrich(
        Normalize(graft.queries.TickQueries.ticks(spark, dir)), cfg)), cfg)

    def time(name: String)(df: => DataFrame): Unit = {
      // warmup + 3 timed
      df.write.format("noop").mode("overwrite").save()
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-28s median=${ts.sorted.apply(1)}%.3f  all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }

    time("costs")(costs)
    time("positionReturns")(Performance.positionReturns(costs))
    time("pr+count_agg")(
      Performance.positionReturns(costs)
        .groupBy(window(col("event_time"), cfg.metricsWindow))
        .agg(count(lit(1)).as("n")))
    time("pr+sumD_only")(
      Performance.positionReturns(costs)
        .groupBy(window(col("event_time"), cfg.metricsWindow))
        .agg(Det.sumD(col("realized_pnl"), 12).as("s")))
    time("pr+full13")(Performance.windows(Performance.positionReturns(costs), cfg))
    time("metrics_5m_full")(Performance(costs, cfg))
    spark.stop()
  }
}

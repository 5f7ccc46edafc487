package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev tool (r16): phase timing for the gap-filled-grid family
  * (rolling_beta being the heaviest). Usage: runMain graft.tools.GridProbe [sfDir]
  */
object GridProbe {
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
    import graft.ops._

    def time(name: String)(body: => Unit): Unit = {
      body
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-30s median=${ts.sorted.apply(1)}%.3f  all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    def noop(df: DataFrame): Unit = df.write.format("noop").mode("overwrite").save()

    def ticks = graft.queries.TickQueries.ticks(spark, dir)
    def uniq = ticks.groupBy(col("product_id"), col("event_time"))
      .agg(max(col("price")).as("price"))
    def filled = GapFill(uniq, Seq("product_id"), "event_time", "1 hour",
      Seq("price" -> "price"), truncUnit = "hour")
      .filter(col("price").isNotNull)
    def withMkt = filled.withColumn("mkt",
      Det.avgD(col("price"), 9, Window.partitionBy(col("grid_ts"))))
    def full = {
      val frame = Window.partitionBy(col("product_id"))
        .orderBy(col("grid_ts")).rowsBetween(-23, Window.currentRow)
      withMkt
        .withColumn("n_obs", count(lit(1)).over(frame))
        .withColumn("beta24", Det.betaD(col("price"), col("mkt"), 4, frame))
    }

    time("1 ticks scan+project")(noop(ticks))
    time("2 + uniq agg")(noop(uniq))
    time("3 + gapfill asof")(noop(filled))
    time("4 + mkt window")(noop(withMkt))
    time("5 + beta frame windows")(noop(full))
    println(s"grid rows = ${filled.count()}")
    spark.stop()
  }
}

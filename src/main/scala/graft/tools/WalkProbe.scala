package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev tool: attribute the walk-family corpus-build wall-clock to its
  * stages (the 5 walk queries each pay this build under the bench's
  * per-query isolation). Usage: runMain graft.tools.WalkProbe [sfDir]
  */
object WalkProbe {
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

    def time(name: String)(body: => Unit): Unit = {
      body // warmup
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-28s median=${ts.sorted.apply(1)}%.3f  all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }

    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    def edges: DataFrame =
      graft.ops.CoOccur.edges(li, "l_orderkey", "l_suppkey", 3)
    def dirDf: DataFrame = {
      val e = edges
      e.unionByName(e.select(col("y").as("x"), col("x").as("y")))
    }

    time("suppEdges (noop)") { edges.write.format("noop").mode("overwrite").save() }
    time("dir cached count") {
      val d = dirDf.cache(); d.count(); d.unpersist(false)
    }
    time("nbrFull checkpoint (fused)") {
      val d = dirDf.cache()
      val nbrFull = d.select(col("x").cast("long").as("nx"), col("y").cast("long").as("ny"))
        .withColumn("idx", row_number().over(
          Window.partitionBy(col("nx")).orderBy(col("ny"))).cast("long") - 1L)
        .withColumn("deg", count(lit(1)).over(Window.partitionBy(col("nx"))))
        .localCheckpoint(true)
      graft.ops.Checkpoints.release(nbrFull)
      d.unpersist(false)
    }
    time("full walks op") {
      val d = dirDf.cache()
      val nodes = d.select(col("x").as("node")).distinct()
      val out = graft.ops.RandomWalk.walks(d, nodes, 4)
      graft.ops.Checkpoints.release(out)
      d.unpersist(false)
    }
    spark.stop()
  }
}

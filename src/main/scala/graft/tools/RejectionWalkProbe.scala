package graft.tools

import graft.ops.RandomWalk
import graft.queries.GraphQueries
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: measure the rejection-sampled walker against the exact
  * cumulative-weight walker on a given fixture — the hub-scale story
  * (r14 verdict stretch): at the 100×-hub tier the exact walker's
  * per-step candidate expansion is Σ deg(visited) rows (~100k per hub
  * visit), while [[RandomWalk.rejectionWalks]] proposes
  * rounds·|walks| rows per step regardless of degree.
  *
  * Usage: runMain graft.tools.RejectionWalkProbe [sfDir] [rej|both]
  */
object RejectionWalkProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val mode = if (args.length > 1) args(1) else "both"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val t0 = System.nanoTime()
    val edges = GraphQueries.suppEdgesFrom(GraphQueries.suppPairCounts(spark, dir))
      .localCheckpoint(true)
    val dirDf = edges.unionByName(
      edges.select(col("y").as("x"), col("x").as("y"))).localCheckpoint(true)
    val nodes = dirDf.select(col("x").as("node")).distinct().localCheckpoint(true)
    val edgeS = (System.nanoTime() - t0) / 1e9
    val maxDeg = dirDf.groupBy(col("x")).count().agg(max(col("count"))).head().getLong(0)
    println(f"[rwprobe] graph: ${nodes.count()} nodes, ${dirDf.count()} arcs, " +
      f"max degree $maxDeg, edge build $edgeS%.1f s")

    def time(name: String)(body: => Long): Unit = {
      val s0 = System.nanoTime()
      val rows = body
      println(f"[rwprobe] $name%-10s ${(System.nanoTime() - s0) / 1e9}%8.1f s  ($rows rows)")
    }
    time("rejection") {
      RandomWalk.rejectionWalks(dirDf, nodes, GraphQueries.WalkSteps,
        4L, 2L, 1L).count()
    }
    if (mode == "both") time("exact") {
      RandomWalk.biasedWalks(dirDf, nodes, GraphQueries.WalkSteps,
        4L, 2L, 1L).count()
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev tool (r16): phase-attributed timing of the REAL walk-corpus
  * build (MinCo=5 supplier graph, the contract's graph) — where do the
  * ~2 s of graph_walks actually go?
  * Usage: runMain graft.tools.WalkPhaseProbe [sfDir]
  */
object WalkPhaseProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = spark.read.parquet(s"$dir/lineitem.parquet")

    def time(name: String)(body: => Unit): Unit = {
      body
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-34s median=${ts.sorted.apply(1)}%.3f  all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }

    def edges: DataFrame = graft.ops.CoOccur.edges(li, "l_orderkey", "l_suppkey", 5)
    def dirDf: DataFrame = {
      val e = edges
      e.unionByName(e.select(col("y").as("x"), col("x").as("y")))
    }

    // phase 1: edge build alone
    time("1 suppEdges noop") { edges.write.format("noop").mode("overwrite").save() }
    // phase 2: dir cache fill + count
    time("2 dir cache+count") { val d = dirDf.cache(); d.count(); d.unpersist(false) }
    // phase 3: + nbrFull window + checkpoint
    def nbrOf(d: DataFrame): DataFrame =
      d.select(col("x").cast("long").as("nx"), col("y").cast("long").as("ny"))
        .withColumn("idx", row_number().over(
          Window.partitionBy(col("nx")).orderBy(col("ny"))).cast("long") - 1L)
        .withColumn("deg", count(lit(1)).over(Window.partitionBy(col("nx"))))
    time("3 dir+nbrFull ckpt") {
      val d = dirDf.cache()
      val nf = nbrOf(d).localCheckpoint(true)
      graft.ops.Checkpoints.release(nf); d.unpersist(false)
    }
    // phase 4: + nodes checkpoint + count gate
    time("4 +nodes ckpt +count") {
      val d = dirDf.cache()
      val nf = nbrOf(d).localCheckpoint(true)
      val cur0 = d.select(col("x").cast("long").as("walk_id"))
        .withColumn("node", col("walk_id")).distinct().localCheckpoint(true)
      nf.count()
      graft.ops.Checkpoints.release(nf, cur0); d.unpersist(false)
    }
    // phase 5: the full walks op (whatever branch fires)
    time("5 full walks") {
      val d = dirDf.cache()
      val nodes = d.select(col("x").as("node")).distinct()
      val out = graft.ops.RandomWalk.walks(d, nodes, 4)
      graft.ops.Checkpoints.release(out); d.unpersist(false)
    }
    println(s"edge rows=${edges.count()}  dir rows=${dirDf.count()}")
    spark.stop()
  }
}

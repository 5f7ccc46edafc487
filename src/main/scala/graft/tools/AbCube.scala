package graft.tools

import graft.ops.Det
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Dev tool: A/B the CUBE aggregate — decimal-grid vs long-grid sums. */
object AbCube {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    def sumL(c: org.apache.spark.sql.Column, s: Int) =
      (sum(floor(c * lit(math.pow(10, s)) + lit(0.5)).cast("long")).cast("double") /
        lit(math.pow(10, s)))
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$label%-16s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    }
    for (r <- 1 to 3) {
      time(s"decimal r$r") {
        li.cube(col("l_returnflag"), col("l_linestatus"))
          .agg(count(lit(1)), Det.sumD(col("l_quantity"), 2), Det.sumD(col("l_extendedprice"), 2))
          .write.format("noop").mode("overwrite").save()
      }
      time(s"long r$r") {
        li.cube(col("l_returnflag"), col("l_linestatus"))
          .agg(count(lit(1)), sumL(col("l_quantity"), 2), sumL(col("l_extendedprice"), 2))
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}

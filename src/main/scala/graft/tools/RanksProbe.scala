package graft.tools

import graft.ops.{Det, Ranks}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev probe: two-pass ntileByRange vs the window form on the real
  * rfm_segments input at sf0.1 — isolates the forced-distributed
  * mismatch found by the round-7 threshold-forcing Verify run.
  */
object RanksProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val perCust = spark.read.parquet(s"$dir/orders.parquet")
      .groupBy(col("o_custkey"))
      .agg(max(col("o_orderdate")).as("last_order"),
        count(lit(1)).as("frequency"),
        Det.sumD(col("o_totalprice"), 2).as("monetary"))
    def cmp(name: String, order: Seq[org.apache.spark.sql.Column]): Unit = {
      val win = perCust.withColumn("t_win",
        ntile(5).over(Window.orderBy(order: _*)).cast("long"))
      val two = Ranks.ntileByRange(perCust, order, 5, "t_two", smallBytes = -1L)
      val j = win.select(col("o_custkey"), col("t_win"))
        .join(two.select(col("o_custkey"), col("t_two")), "o_custkey")
      val bad = j.filter(col("t_win") =!= col("t_two")).count()
      val n = j.count()
      println(s"[$name] rows=$n mismatches=$bad")
      // internal consistency of the two-pass: tile populations
      two.groupBy(col("t_two")).count().orderBy(col("t_two")).show()
    }
    cmp("last_order", Seq(col("last_order"), col("o_custkey")))
    cmp("frequency", Seq(col("frequency"), col("o_custkey")))
    cmp("monetary", Seq(col("monetary"), col("o_custkey")))
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev tool (r16): phase timing + shape A/B for dedup_substring's
  * Σchars window pipeline. Usage: runMain graft.tools.SubstrProbe [sfDir]
  */
object SubstrProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val L = graft.queries.CorpusQueries.SubstrL
    val docs = graft.queries.DocQueries.docs(spark, dir)

    def time(name: String)(body: => Unit): Unit = {
      body
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-30s median=${ts.sorted.apply(1)}%.3f  all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    def noop(df: DataFrame): Unit = df.write.format("noop").mode("overwrite").save()

    def windows: DataFrame = docs
      .filter(length(col("text")) >= L)
      .select(col("doc_id"), col("text"))
      .withColumn("pos", explode(sequence(lit(1), length(col("text")) - lit(L - 1))))
      .select(col("doc_id"), col("pos"), md5(expr(s"substr(text, pos, $L)")).as("g"))

    def dupStartsWindow: DataFrame = windows
      .withColumn("n_occ", count(lit(1)).over(Window.partitionBy(col("g"))))
      .filter(col("n_occ") >= 2).select(col("doc_id"), col("pos"))

    def dupStartsAggJoin: DataFrame = {
      val dupKeys = windows.groupBy(col("g")).agg(count(lit(1)).as("n_occ"))
        .filter(col("n_occ") >= 2).select(col("g"))
      windows.join(broadcast(dupKeys), Seq("g")).select(col("doc_id"), col("pos"))
    }

    println(s"window rows = ${windows.count()}, dup starts = ${dupStartsWindow.count()}, " +
      s"dup keys = ${windows.groupBy(col("g")).count().filter(col("count") >= 2).count()}")
    for (_ <- 1 to 2) {
      time("1 windows compute only")(noop(windows))
      time("2 + count-over-window")(noop(dupStartsWindow))
      time("3 + agg+broadcast-join")(noop(dupStartsAggJoin))
      time("4 full query (current)")(noop(
        graft.queries.CorpusQueries.queries("dedup_substring")(spark, dir)))
    }
    spark.stop()
  }
}

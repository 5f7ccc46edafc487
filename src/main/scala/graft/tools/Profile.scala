package graft.tools

import graft.ops._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: A/B timing of dedup variants. */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s  rows=$n")
    }
    def shingledOnly(d: DataFrame): DataFrame =
      d.select(col("doc_id"), explode(Shingles.of(col("text"), 3)).as("shingle"))
    for (round <- 1 to 3) {
      println(s"--- round $round")
      time("shingle 1-part")(shingledOnly(docs).count())
      time("shingle repart")(shingledOnly(docs.repartition(col("doc_id"))).count())
      time("jaccard full")(Dedup.ngramJaccardTopK(docs).count())
      time("minhash full")(Dedup.minhashLshPairs(docs).count())
    }
    spark.stop()
  }
}

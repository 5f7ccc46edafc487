package graft.tools

import graft.ops._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: A/B timing of dedup building blocks. */
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
    val docsR = docs.repartition(32)
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s  rows=$n")
    }
    for (round <- 1 to 3) {
      println(s"--- round $round")
      time("exploded 1-part")(Shingles.exploded(docs, 3).count())
      time("exploded repart")(Shingles.exploded(docsR, 3).count())
      time("jaccard 1-part")(Dedup.ngramJaccardTopK(docs).count())
      time("jaccard repart")(Dedup.ngramJaccardTopK(docsR).count())
      time("minhash repart")(Dedup.minhashLshPairs(docsR).count())
    }
    // curation_report composition breakdown
    val base = graft.queries.DocQueries.docs(spark, dir)
    for (round <- 1 to 2) {
      println(s"--- curation round $round")
      time("minhash pairs")(Dedup.minhashLshPairs(base).count())
      time("cc clusters")(ConnectedComponents
        .clusters(Dedup.minhashLshPairs(base), "doc_a", "doc_b").count())
      time("langId")(TextOps.langId(base).count())
      time("qualityRules")(graft.SparkEntry.queries("quality_rules")(spark, dir).count())
      time("vecs")(graft.queries.VecQueries.vecs(spark, dir).count())
      time("full curation_report")(
        graft.SparkEntry.queries("curation_report")(spark, dir).count())
    }
    spark.stop()
  }
}

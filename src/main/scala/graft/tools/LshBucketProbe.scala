package graft.tools

import graft.ops.{Dedup, Shingles}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: LSH band-bucket population profile on a documents fixture —
  * the quantity that decides whether band-bucket pair generation
  * (Σ |bucket|²) is finishable (the docs_zipf tier question: a
  * boilerplate template in ~20% of docs makes some band keys
  * non-discriminative, exactly like stop-shingles for the inverted
  * index). Usage: runMain graft.tools.LshBucketProbe <sfDir>
  */
object LshBucketProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val sh = Shingles.exploded(docs, 3)
    val sigs = Dedup.minhashSignaturesOf(sh, 16).localCheckpoint(true)
    for ((h, b) <- Seq((8, 1), (8, 2), (8, 4), (16, 4))) {
      val rows = h / b
      val banded = sigs.select(col("doc_id"),
        explode(array((0 until b).map { bb =>
          struct(lit(bb).as("idx"),
            md5(concat_ws("|", (0 until rows).map(r => col(s"m${bb * rows + r}")): _*))
              .as("key"))
        }: _*)).as("band"))
      val sizes = banded.groupBy(col("band.idx"), col("band.key"))
        .agg(count(lit(1)).as("n")).filter(col("n") >= 2)
        .localCheckpoint(true)
      val top = sizes.orderBy(col("n").desc).limit(8)
        .collect().map(_.getLong(2)).mkString(",")
      val stats = sizes.agg(count(lit(1)), sum(col("n") * col("n")),
        sum(when(col("n") > 4096, 1).otherwise(0))).head()
      println(s"[lshprobe] h=$h b=$b buckets>=2: ${stats.getLong(0)} " +
        s"sum_n2=${stats.getLong(1)} over4096=${stats.getLong(2)} top=[$top]")
    }
    spark.stop()
  }
}

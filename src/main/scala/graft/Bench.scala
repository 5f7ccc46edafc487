package graft
import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: every contract query on SPARK_GRAFT_SF_DIR,
  * one JSON line. Each query gets one untimed warmup run (JIT + codegen
  * + parquet footer cache) before its timed run — the driver compares
  * steady-state throughput, not JVM startup.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = SparkEntry.queries.keys.toSeq.sorted
    // Write to the noop sink, NOT count(): count(1) lets Catalyst prune every
    // unreferenced column, so projection-only queries (text_stats, lang_id,
    // fingerprint, ...) would time just the parquet scan instead of the real
    // per-row compute (regexp, md5, window functions).
    def run(name: String): Unit =
      try SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
    names.foreach(run) // warmup pass
    val results = names.map { name =>
      val t0 = System.nanoTime()
      run(name)
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: does `spark.sql.codegen.cache.maxEntries` keep the whole
  * contract's generated classes warm? Runs every contract query once
  * (fills the cache), then re-times five early-alphabet queries — if the
  * conf is honored, the re-runs skip Janino and land near warm-adjacent
  * times; if the global cache ignores it, they pay full recompilation. */
object CodegenCacheProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val maxEntries = if (args.nonEmpty) args(0) else "4096"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.codegen.cache.maxEntries", maxEntries)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = graft.SparkEntry.queries.keys.toSeq.sorted
    def run(name: String): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      spark.catalog.clearCache()
      (System.nanoTime() - t0) / 1e9
    }
    val probes = Seq("asof_join", "atr", "autocorr", "executions", "drawdown")
    println(s"maxEntries=$maxEntries")
    probes.foreach(n => println(f"first  $n%-12s ${run(n)}%6.2f s"))
    names.foreach(run) // full contract pass — evicts on a 100-entry cache
    probes.foreach(n => println(f"again  $n%-12s ${run(n)}%6.2f s"))
    spark.stop()
  }
}

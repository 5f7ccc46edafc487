package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe for the r4-anchor adjudication (docs/SCALE.md round 7):
  * times the named contract queries under BOTH bench protocols —
  * honest (cache cleared between runs, median) and r4-style
  * (global warmup, then back-to-back timed runs with no cache
  * clearing, so any cache a query leaks stays warm).
  * Usage: runMain graft.tools.ProtocolProbe q1,q2,...
  */
object ProtocolProbe {
  def main(args: Array[String]): Unit = {
    val names = (if (args.nonEmpty) args(0) else
      "triangle_count,market_corr,momentum_ranks").split(',').toSeq
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def run(name: String): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    for (n <- names) {
      run(n) // warmup (JIT + codegen + page cache)
      val honest = (1 to 3).map { _ =>
        spark.catalog.clearCache(); run(n)
      }
      spark.catalog.clearCache()
      run(n) // r4-style warmup leaving caches resident
      val r4Style = (1 to 3).map(_ => run(n))
      println(f"$n%-16s honest_median=${med(honest)}%.3f all=${honest.map(t => f"$t%.2f").mkString(",")}  r4style_median=${med(r4Style)}%.3f all=${r4Style.map(t => f"$t%.2f").mkString(",")}")
      spark.catalog.clearCache()
    }
    // r4's triangle_count CODE leaked its edge cache across runs, so its
    // timed run was census-on-warm-cache only. Reproduce that number.
    if (names.contains("triangle_count")) {
      val (edges, lazyOut) = graft.queries.GraphQueries.trianglesLazy(spark, dir)
      edges.count() // build + cache the edge list (the leaked state)
      def census(): Double = {
        val t0 = System.nanoTime()
        lazyOut.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      census()
      val warm = (1 to 3).map(_ => census())
      println(f"triangle_count census-on-leaked-warm-cache median=${med(warm)}%.3f all=${warm.map(t => f"$t%.2f").mkString(",")}")
      edges.unpersist(false)
    }
    spark.stop()
  }
}

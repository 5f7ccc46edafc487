package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: quantifies the WalkCorpus amortization — time to answer
  * walk_skipgrams + walk_visit_stats the contract way (each rebuilds
  * the corpus) vs once-through-the-artifact (store the corpus, readers
  * load it). Usage: runMain graft.tools.WalkCorpusProbe [sfDir]. */
object WalkCorpusProbe {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def drain(df: org.apache.spark.sql.DataFrame): Unit = {
      df.write.format("noop").mode("overwrite").save()
      spark.catalog.clearCache()
    }
    // warmup (JIT + page cache)
    drain(graft.SparkEntry.queries("graph_walks")(spark, d))
    // contract way: each query rebuilds the corpus
    time("contract walk_skipgrams + walk_visit_stats (2 corpus builds)") {
      drain(graft.SparkEntry.queries("walk_skipgrams")(spark, d))
      drain(graft.SparkEntry.queries("walk_visit_stats")(spark, d))
    }
    // artifact way: one build + store, readers load
    val path = "/tmp/walk_corpus_probe"
    time("artifact build+store (once)") {
      graft.ops.WalkCorpus.store(
        graft.SparkEntry.queries("graph_walks")(spark, d), path)
    }
    time("readers off artifact (skipgrams + visit_stats)") {
      val corpus = graft.ops.WalkCorpus.load(spark, path)
      drain(graft.queries.GraphQueries.walkSkipgramsFrom(corpus))
      drain(graft.queries.GraphQueries.walkVisitStatsFrom(corpus,
        graft.queries.GraphQueries.suppDir(spark, d)))
    }
    spark.stop()
  }
}

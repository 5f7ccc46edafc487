package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Standing 100×-tier mini-bench (r15 verdict #7 stretch): one timing
  * artifact per round over a FIXED slate of scale-bound queries, so a
  * performance regression that only shows at the stress tiers gets
  * caught by trend — the correctness tiers prove bits, this proves
  * minutes.
  *
  * Slate design: ten queries spanning the tiers and the shapes each
  * tier stresses —
  *  - events_zipf (hot-key skew): metrics_5m (tumbling agg),
  *    sessions (session windows — the r13 boundary-bug surface);
  *  - docs_zipf (hot-shingle boilerplate): dedup_exact (one md5
  *    Exchange), dedup_minhash (banding + stop-band cap),
  *    dedup_substring (Σchars window);
  *  - hub graph (100k-degree node): graph_walks (indexed uniform
  *    draw — hub-safe), graph_walks_rejection (the production biased
  *    walker), link_prediction (WedgeCap);
  *  - uniform 100×: rolling_beta (grid window fold),
  *    walk_visit_stats (corpus + aggregation).
  * graph_walks_biased is deliberately NOT in the slate: its Σ deg
  * expansion costs ~8.5 min at the hub tier by design (the documented
  * exact-walker trade) — a standing bench entry would just re-measure
  * that constant.
  *
  * Protocol: COLD single pass per query (caches cleared between; no
  * warmup round — at minutes-per-query scale, JIT noise is ≪ the
  * 1.5×-trend threshold this artifact exists to flag), noop sink so
  * per-row compute is not pruned (the Bench rationale). Queries whose
  * fixture dir is absent are SKIPPED with a note — fixtures live in
  * /tmp (rebuild via graft.tools.ScaleUp; recipes in docs/SCALE.md).
  *
  * Usage: SPARK_DRIVER_MEM=48g runMain graft.tools.ScaleBench [outPath]
  * Env: SPARK_GRAFT_SF100Z/SF100D/SF100H/SF100X override fixture dirs.
  * Output: ONE JSON line on stdout + the same object at outPath
  * (default docs/bench_100x.json — copy to bench_100x_rNN.json when
  * recording a round).
  */
object ScaleBench {

  def main(args: Array[String]): Unit = {
    val outPath = if (args.nonEmpty) args(0) else "docs/bench_100x.json"
    val z = sys.env.getOrElse("SPARK_GRAFT_SF100Z", "/tmp/sf100z")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF100D", "/tmp/sf100d")
    val h = sys.env.getOrElse("SPARK_GRAFT_SF100H", "/tmp/sf100h")
    val x = sys.env.getOrElse("SPARK_GRAFT_SF100X", "/tmp/sf100x")
    val slate: Seq[(String, String)] = Seq(
      "metrics_5m" -> z,
      "sessions" -> z,
      "dedup_exact" -> d,
      "dedup_minhash" -> d,
      "dedup_substring" -> d,
      "graph_walks" -> h,
      "graph_walks_rejection" -> h,
      "link_prediction" -> h,
      "rolling_beta" -> x,
      "walk_visit_stats" -> x)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window.WindowExec",
      org.apache.logging.log4j.Level.ERROR)
    def f1(v: Double): String =
      BigDecimal(v).setScale(1, BigDecimal.RoundingMode.HALF_UP)
        .bigDecimal.stripTrailingZeros.toPlainString
    val results = slate.map { case (name, dir) =>
      if (!new java.io.File(s"$dir/documents.parquet").exists()) {
        System.err.println(s"[scalebench] $name SKIPPED: fixture $dir absent")
        name -> s"""{"fixture":"$dir","sec":null,"skipped":true}"""
      } else {
        val t0 = System.nanoTime()
        try {
          SparkEntry.queries(name)(spark, dir)
            .write.format("noop").mode("overwrite").save()
          spark.catalog.clearCache()
          val sec = (System.nanoTime() - t0) / 1e9
          System.err.println(s"[scalebench] $name @ $dir: ${f1(sec)} s")
          name -> s"""{"fixture":"$dir","sec":${f1(sec)}}"""
        } catch {
          case e: Throwable =>
            System.err.println(s"[scalebench] $name FAILED: ${e.getMessage}")
            name -> s"""{"fixture":"$dir","sec":null,"failed":true}"""
        }
      }
    }
    spark.stop()
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val line = s"""{"metric":"scale_bench_100x","unit":"sec","cold":true,"queries":$qs}"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), line + "\n")
    println(line)
  }
}

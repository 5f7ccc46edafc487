package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: Verify <sfDir> <outDir>")
    val sfDir = args(0); val outDir = args(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // Testdata events.parquet stores TIMESTAMP(NANOS); Spark reads it as
      // a nanos LongType under this flag (TickQueries converts to micros).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // "WindowExec: No Partition Defined" fires for the contract's
    // deliberately-GLOBAL rank/prefix frames, every one of which is
    // bounded (dimension-sized or stats-gated — see Ranks scaladoc).
    // Expected and audited; silenced so each run doesn't re-raise it.
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window.WindowExec",
      org.apache.logging.log4j.Level.ERROR)
    new java.io.File(outDir).mkdirs()
    // 4 queries in flight: most contract queries are small multi-stage
    // jobs whose wall-clock is scheduling gaps, not CPU — concurrent
    // submission lets the local scheduler fill the cores (queries are
    // independent; the shared session is thread-safe for job submission).
    // comma-separated subset for local iteration (default: every query);
    // the oracle_sql dump below filters to the same set so check_oracle
    // never reports missing spark output for unselected queries
    val only = sys.env.get("SPARK_GRAFT_VERIFY_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    val selected = SparkEntry.queries.toSeq
      .filter { case (name, _) => only.forall(_.contains(name)) }
    val tasks = selected.map { case (name, fn) =>
      pool.submit(new Runnable {
        def run(): Unit =
          // repartition(1), NOT coalesce(1): coalesce collapses the whole
          // final stage (sort + window + project) into ONE task — at the
          // 100× stress tier that turned a parallel window query into a
          // 20-minute single-core stage. The extra exchange keeps compute
          // parallel and only the file write is single-task; the compare
          // is row-order-insensitive (rows sorted before hashing), so the
          // round-robin row order cannot move the verdict.
          try fn(spark, sfDir).repartition(1).write.mode("overwrite")
            .parquet(s"$outDir/$name")
          catch { case e: Throwable =>
            System.err.println(s"[verify] $name failed: ${e.getMessage}")
          }
      })
    }
    tasks.foreach(_.get())
    pool.shutdown()
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => only.forall(_.contains(k)) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Capacity decompositions (SparkEntry.oracleParts): per query, a
    // list of statements whose row union equals the full oracle —
    // check_oracle's --parts mode runs them one at a time when the
    // full statement exceeds the spill ceiling (100× tiers).
    val partsJson = SparkEntry.oracleParts
      .filter { case (k, _) => only.forall(_.contains(k)) }
      .map { case (k, vs) =>
        s"${q(k)}: ${vs.map(q).mkString("[", ",", "]")}"
      }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_parts.json"), partsJson)
    spark.stop()
  }
}

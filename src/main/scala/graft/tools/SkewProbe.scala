package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: observe AQE's skew-join split on a REAL skewed fixture
  * (the `events_zipf` ScaleUp direction — zipf(1.2) user_id, hot key
  * ~17% of all rows), not the shrunk toy shape SkewJoinSpec pins.
  *
  * The join is the canonical fact⨝dim shape (events × per-user dim)
  * with broadcast disabled so the shuffle join must handle the skew.
  * Thresholds are FIXTURE-PROPORTIONAL (1 MB trigger vs the 256 MB
  * default — the detector reads COMPRESSED map output, and 10M
  * low-entropy rows compress the hot partition to single-digit MB,
  * where a 100 TB feed's would be ~10⁶ MB); the point probed is that
  * OptimizeSkewedJoin fires and splits on real zipf data.
  *
  * Two production lessons this probe encodes:
  *  1. the skewed join's inputs must be STAGE-CLEAN — an aggregate
  *     between the Sort and the shuffle stage breaks the rule's
  *     SMJ(Sort(stage), Sort(stage)) pattern and the split silently
  *     never fires (hence the dim checkpoint below);
  *  2. when the pipeline continues into a differently-keyed aggregate,
  *     AQE's no-extra-shuffle heuristic declines the split —
  *     spark.sql.adaptive.forceOptimizeSkewedJoin opts in.
  *
  * Prints the final adaptive plan's skew marker, the split task count,
  * and wall-clock with the optimization on vs off.
  *
  * Usage: runMain graft.tools.SkewProbe [zipfDir]
  */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/tmp/sf100z"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // keep the payload columns: a fact row that shuffles only (key,
    // value) dictionary-compresses below any realistic skew threshold
    // at fixture scale — real event rows carry props/ids, and the skew
    // detector reads COMPRESSED map-output sizes
    val events = spark.read.parquet(s"$dir/events.parquet")
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("value"), col("props"))
    // materialize the dim: with the dim-building aggregate INSIDE the
    // join's right branch, OptimizeSkewedJoin's SMJ(Sort(stage),
    // Sort(stage)) pattern cannot match (the HashAggregate sits between
    // Sort and the shuffle read) and the split silently never fires —
    // the probe's first real lesson: keep a skewed join's inputs
    // stage-clean (checkpoint/table boundary), or AQE cannot help
    val dim = events.select(col("user_id")).distinct()
      .withColumn("tier", col("user_id") % 7)
      .localCheckpoint(true)

    def run(skewOn: Boolean): (Double, String) = {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", skewOn.toString)
      // the probe pipeline ends in a differently-keyed aggregate, so the
      // split's extra exchange is one the plan pays anyway — opt in to
      // splitting even when AQE's no-extra-shuffle heuristic would demur
      spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
      // COMPRESSED shuffle bytes: the skew detector reads lz4'd map
      // output, and the fixture's low-entropy columns compress the
      // 1.7M-row hot partition to single-digit MB — so the
      // fixture-proportional trigger is 1 MB where production defaults
      // are 256 MB (a 100 TB feed's hot partition dwarfs either)
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1MB")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "3")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "512KB")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      val j = events.join(dim, Seq("user_id"))
        .groupBy(col("tier")).agg(count(lit(1)).as("n"),
          graft.ops.Det.sumD(col("value"), 4).as("s"))
      val t0 = System.nanoTime()
      j.collect()
      val sec = (System.nanoTime() - t0) / 1e9
      (sec, j.queryExecution.executedPlan.toString)
    }

    val (tOff, _) = run(skewOn = false)
    val (tOn, planOn) = run(skewOn = true)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("/tmp/skewprobe_plan.txt"), planOn)
    val skewMarked = planOn.contains("skew=true")
    println(f"[skewprobe] dir=$dir skewJoin=off: $tOff%.1f s; skewJoin=on: $tOn%.1f s; " +
      s"final plan skew-marked: $skewMarked")
    require(skewMarked,
      "AQE did not mark the skewed join — thresholds or fixture wrong")
    spark.stop()
  }
}

package graft.tools

import graft.ops.{CoOccur, GraphArtifact, VecIndex}
import graft.queries.{GraphQueries, VecQueries}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measures the artifact REFRESH economics the GraphArtifact/VecIndex
  * scaladocs argue (r14 verdict #4): after one day of new orders /
  * one batch of new vectors arrives, how does
  *
  *  - refresh  — merge the delta's partial pair counts into the stored
  *    artifact ([[GraphArtifact.mergePairCounts]]) + re-derive the
  *    edge/label frames; or quantize ONLY the new vectors under the
  *    unchanged codebook and append ([[VecIndex.shard]] on the delta)
  *
  * compare against
  *
  *  - rebuild  — the from-scratch artifact build over the full corpus
  *    (what standard mode pays every time)?
  *
  * The delta is the ~1% slice `key % 100 == 0` (a "day" of a ~3-month
  * order book). Exactness is asserted in-run: the refreshed artifact's
  * frames must equal the rebuilt ones as unordered row multisets
  * (cheap xxhash64-sum checksum + counts here; GraphArtifactSpec /
  * VecIndexSpec carry the rigorous bit-level proofs).
  *
  * Usage: runMain graft.tools.RefreshBench <sfDir> [graph|vec|graph,vec]
  * Prints ONE JSON line; docs/bench_refresh_r15.json collects the runs.
  */
object RefreshBench {

  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  /** Order-independent exact-frame checksum (both sides Spark, so the
    * Spark-internal hash is fine here; modular sum keeps the ANSI long
    * envelope — ≤1e9 per row over any realistic row count). */
  private def checksum(df: DataFrame): (Long, Long) = {
    val r = df.agg(count(lit(1)),
      sum(pmod(xxhash64(df.columns.map(col).toIndexedSeq: _*), lit(1000000007L)))).head()
    (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val fams: Set[String] = (if (args.length > 1) args(1) else "graph,vec")
      .split(',').map(_.trim).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val out = scala.collection.mutable.ListBuffer.empty[String]

    if (fams("graph")) {
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      val hist = li.filter(col("l_orderkey") % 100 =!= 0)
      val delta = li.filter(col("l_orderkey") % 100 === 0)
      val basePath = "/tmp/refresh_bench/graph_base"
      val rebuiltPath = "/tmp/refresh_bench/graph_rebuilt"
      val refreshedPath = "/tmp/refresh_bench/graph_refreshed"

      // the standing artifact: built over history before the day arrives
      def buildOver(fact: DataFrame, path: String): Unit = {
        val supp = CoOccur.pairCounts(fact, "l_orderkey", "l_suppkey")
          .localCheckpoint(true)
        val labels = GraphQueries.bfsLabelsFrom(GraphQueries.suppEdgesFrom(supp))
        GraphArtifact.store(supp,
          CoOccur.pairCounts(fact, "l_orderkey", "l_partkey"), labels, path)
        graft.ops.Checkpoints.release(supp, labels)
      }
      val (_, baseS) = time(buildOver(hist, basePath))

      // rebuild: what standard mode pays — full fact re-scan + re-derive
      val (_, rebuildS) = time(buildOver(li, rebuiltPath))

      // refresh: pair counts over the DELTA only, exact merge into the
      // stored partials, re-derive the (edge-list-sized) derived frames
      val (_, refreshS) = time {
        val supp = GraphArtifact.mergePairCounts(
          GraphArtifact.loadSuppPairs(spark, basePath),
          CoOccur.pairCounts(delta, "l_orderkey", "l_suppkey"))
          .localCheckpoint(true)
        val part = GraphArtifact.mergePairCounts(
          GraphArtifact.loadPartPairs(spark, basePath),
          CoOccur.pairCounts(delta, "l_orderkey", "l_partkey"))
        val labels = GraphQueries.bfsLabelsFrom(GraphQueries.suppEdgesFrom(supp))
        GraphArtifact.store(supp, part, labels, refreshedPath)
        graft.ops.Checkpoints.release(supp, labels)
      }

      // exactness: refreshed ≡ rebuilt, frame by frame
      val checks = Seq("supp_pairs", "part_pairs", "bfs_labels").map { f =>
        val a = checksum(spark.read.parquet(s"$rebuiltPath/$f"))
        val b = checksum(spark.read.parquet(s"$refreshedPath/$f"))
        require(a == b, s"graph refresh diverged on $f: $a vs $b")
        s""""$f":${a._1}"""
      }
      out += s""""graph":{"base_build_s":${f3(baseS)},"rebuild_s":${f3(rebuildS)},""" +
        s""""refresh_s":${f3(refreshS)},"speedup":${f3(rebuildS / refreshS)},""" +
        s""""rows":{${checks.mkString(",")}},"exact":true}"""
    }

    if (fams("vec")) {
      val v = spark.read.parquet(s"$sfDir/embeddings.parquet")
      val hist = v.filter(col("vec_id") % 100 =!= 0)
      val delta = v.filter(col("vec_id") % 100 === 0)
      val basePath = "/tmp/refresh_bench/vec_base"
      val rebuiltPath = "/tmp/refresh_bench/vec_rebuilt"

      // codebook trained ONCE on history (the append contract: new rows
      // quantize under the unchanged codebook; a re-train is a rebuild)
      val (_, baseS) = time(VecQueries.buildVecIndexArtifactOver(hist, basePath))
      val cb = VecIndex.loadCodebook(spark, basePath)

      // rebuild: re-quantize the whole corpus under the same codebook
      val (_, rebuildS) = time {
        VecIndex.shard(v, cb, 16)
          .write.mode("overwrite").parquet(s"$rebuiltPath/shard")
      }
      // append: quantize ONLY the delta, append to the standing shard
      val (_, appendS) = time {
        VecIndex.shard(delta, cb, 16)
          .write.mode("append").parquet(s"$basePath/shard")
      }

      val a = checksum(spark.read.parquet(s"$rebuiltPath/shard"))
      val b = checksum(VecIndex.loadShard(spark, basePath))
      require(a == b, s"vec append diverged from rebuild: $a vs $b")
      out += s""""vec":{"base_build_s":${f3(baseS)},"rebuild_s":${f3(rebuildS)},""" +
        s""""append_s":${f3(appendS)},"speedup":${f3(rebuildS / appendS)},""" +
        s""""rows":${a._1},"exact":true}"""
    }

    println(s"""{"metric":"refresh_vs_rebuild","sf":"$sfDir",${out.mkString(",")}}""")
    spark.stop()
  }

  private def f3(d: Double): Double = math.round(d * 1000.0) / 1000.0
}

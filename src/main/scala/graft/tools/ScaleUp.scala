package graft.tools

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: synthesize a larger tick fixture by replicating
  * events.parquet `k`× with disjoint time/id shifts, copying every other
  * table as-is — CLAUDE.md's warning is that Det decimal-envelope
  * overflows only show at other scales, and the driver fixtures stop at
  * sf0.1. Each replica r shifts event times by r·(span + 1 day) (same
  * instruments, r more epochs of history — per-key densities and value
  * distributions unchanged, exactly how the envelope grows with corpus
  * age) and offsets event_id into a disjoint band.
  *
  * Output events are TIMESTAMP(MICROS): Spark's loaders take their
  * cast branch and DuckDB sees a plain TIMESTAMP — both engines read
  * identical micros, so the oracle contract is unchanged.
  *
  * With a 4th argument listing tables, `documents` and `embeddings`
  * can be replicated too (id columns offset into disjoint bands; text/
  * embeddings repeated verbatim, so every original row becomes a
  * k-way exact-duplicate cluster — a deliberate stress of the dedup
  * candidate paths: banding/minhash collide maximally, components grow
  * k-cliques, and the caps (maxDf, maxBucket) see k× document
  * frequencies).
  *
  * Usage: runMain graft.tools.ScaleUp [srcDir outDir k [tables]]
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val out = if (args.length > 1) args(1) else "/tmp/sf1x"
    val k = if (args.length > 2) args(2).toInt else 10
    val scaled: Set[String] = (if (args.length > 3) args(3) else "events")
      .split(',').map(_.trim).toSet
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(out))

    // single part file promoted to a plain <out>/<t>.parquet FILE — the
    // oracle harness reads `'<dir>/<t>.parquet'` as one file
    def writeOne(df: org.apache.spark.sql.DataFrame, table: String): Unit = {
      val tmp = s"$out/_${table}_build"
      df.coalesce(1).write.mode(SaveMode.Overwrite).parquet(tmp)
      val part = java.nio.file.Files.list(java.nio.file.Paths.get(tmp))
        .filter(p => p.getFileName.toString.endsWith(".parquet"))
        .findFirst().orElseThrow()
      java.nio.file.Files.move(part,
        java.nio.file.Paths.get(s"$out/$table.parquet"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }

    def scaleEvents(): Unit = {
      val raw = spark.read.parquet(s"$src/events.parquet")
      val base =
        if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
          raw.withColumn("ts_us", expr("ts div 1000"))
        else raw.withColumn("ts_us", unix_micros(col("ts").cast("timestamp")))
      val Array(minUs, maxUs, maxId) = base
        .agg(min(col("ts_us")), max(col("ts_us")), max(col("event_id")))
        .head().toSeq.map(_.asInstanceOf[Long]).toArray
      val spanUs = maxUs - minUs + 86400000000L // +1 day between replicas
      val idBand = maxId + 1L
      writeOne((0 until k).map { r =>
        base.select(
          (col("event_id") + lit(r * idBand)).as("event_id"),
          timestamp_micros(col("ts_us") + lit(r * spanUs)).as("ts"),
          col("user_id"), col("event_type"), col("value"), col("props"))
      }.reduce(_ unionByName _), "events")
    }

    /** Replicate a table verbatim with `idCol` offset into disjoint
      * bands — every original row becomes a k-way exact duplicate.
      * `bandOf` defaults to the table's own max id + 1; orders and
      * lineitem share the ORDERS band so l_orderkey keeps referencing
      * its replicated order (same customers and parts throughout —
      * 10× orders per customer, 10× co-occurrence counts per part
      * pair: the frequency direction the dedup fixture cannot grow). */
    def scaleById(table: String, idCol: String,
                  bandOf: Option[Long] = None): Unit = {
      val raw = spark.read.parquet(s"$src/$table.parquet")
      val band = bandOf.getOrElse(
        raw.agg(max(col(idCol))).head().getLong(0) + 1L)
      writeOne((0 until k).map { r =>
        raw.withColumn(idCol, col(idCol) + lit(r * band))
          .select(raw.columns.map(col).toIndexedSeq: _*)
      }.reduce(_ unionByName _), table)
    }

    lazy val orderBand: Long = spark.read.parquet(s"$src/orders.parquet")
      .agg(max(col("o_orderkey"))).head().getLong(0) + 1L

    /** Graph-direction lineitem scaling (`lineitem_graph` spec): offset
      * l_orderkey AND l_suppkey into disjoint bands, so the supplier
      * co-occurrence graph becomes k DISJOINT COPIES — k× nodes, k×
      * walks, k× corpus rows at the original degree profile. The plain
      * `lineitem` rule (orderkey only) is the other stress direction:
      * same nodes, k× co-occurrence counts → a denser graph past MinCo.
      * The walk family's cost scales with corpus rows, so the 100× tier
      * uses this rule. (l_suppkey no longer joins the unscaled supplier
      * table — fine for the graph tier, whose queries read lineitem
      * only; don't grade rel_* queries off this fixture.) */
    def scaleLineitemGraph(): Unit = {
      val raw = spark.read.parquet(s"$src/lineitem.parquet")
      val suppBand = raw.agg(max(col("l_suppkey"))).head().getLong(0) + 1L
      writeOne((0 until k).map { r =>
        raw.withColumn("l_orderkey", col("l_orderkey") + lit(r * orderBand))
          .withColumn("l_suppkey", col("l_suppkey") + lit(r * suppBand))
          .select(raw.columns.map(col).toIndexedSeq: _*)
      }.reduce(_ unionByName _), "lineitem")
    }

    val all = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    val specs = Map[String, () => Unit](
      "events" -> (() => scaleEvents()),
      "documents" -> (() => scaleById("documents", "doc_id")),
      "embeddings" -> (() => scaleById("embeddings", "vec_id")),
      "orders" -> (() => scaleById("orders", "o_orderkey", Some(orderBand))),
      "lineitem" -> (() => scaleById("lineitem", "l_orderkey", Some(orderBand))),
      "lineitem_graph" -> (() => scaleLineitemGraph()))
    val unknown = scaled -- specs.keySet
    require(unknown.isEmpty, s"no scale rule for: ${unknown.mkString(",")}")
    require(!(scaled.contains("lineitem") && scaled.contains("lineitem_graph")),
      "lineitem and lineitem_graph are mutually exclusive")
    for (t <- all) {
      if (scaled.contains(t)) specs(t)()
      else if (t == "lineitem" && scaled.contains("lineitem_graph"))
        specs("lineitem_graph")()
      else java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$src/$t.parquet"),
        java.nio.file.Paths.get(s"$out/$t.parquet"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    println(s"[scaleup] wrote $out: ${scaled.mkString(",")} ${k}x from $src, others copied")
    spark.stop()
  }
}

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

    /** Skewed-events scaling (`events_zipf`, round-13 verdict #1): the
      * same k-replica time/id shifts as the `events` rule, but user_id
      * is REMAPPED to a zipf(s=1.2) rank over the original user count —
      * the hot-key profile real 100 TB event feeds have (and every other
      * tier lacks: uniform replication keeps per-key densities flat).
      * The top rank absorbs ~20% of ALL events (hot user ≈ 2M rows at
      * k=100), which is exactly the single-key stress that kills
      * unsalted aggregations and unsplit sort-window stages at cluster
      * scale. Rank via the inverse zipf CDF on a deterministic
      * md5(event_id)-derived uniform — the fixture is a pure function of
      * the source, no RNG state. Both engines read the same parquet, so
      * the oracle contract is unchanged. */
    def scaleEventsZipf(): Unit = {
      val zipfS = 1.2
      val raw = spark.read.parquet(s"$src/events.parquet")
      val base =
        if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
          raw.withColumn("ts_us", expr("ts div 1000"))
        else raw.withColumn("ts_us", unix_micros(col("ts").cast("timestamp")))
      val Array(minUs, maxUs, maxId) = base
        .agg(min(col("ts_us")), max(col("ts_us")), max(col("event_id")))
        .head().toSeq.map(_.asInstanceOf[Long]).toArray
      val nUsers = base.agg(countDistinct(col("user_id"))).head().getLong(0)
      val spanUs = maxUs - minUs + 86400000000L
      val idBand = maxId + 1L
      // inverse CDF of the continuous zipf approximation:
      // rank = (1 − u·(1 − N^(1−s)))^(1/(1−s)), clamped to [1, N]
      val tailP = math.pow(nUsers.toDouble, 1.0 - zipfS)
      val u = (conv(substring(md5(col("event_id").cast("string")), 1, 12), 16, 10)
        .cast("double") + lit(0.5)) / lit(281474976710656.0) // 2^48
      val rank = least(greatest(
        floor(pow(lit(1.0) - u * lit(1.0 - tailP), lit(1.0 / (1.0 - zipfS))))
          .cast("long"), lit(1L)), lit(nUsers))
      writeOne((0 until k).map { r =>
        base.select(
          (col("event_id") + lit(r * idBand)).as("event_id"),
          timestamp_micros(col("ts_us") + lit(r * spanUs)).as("ts"),
          col("user_id"), col("event_type"), col("value"), col("props"))
      }.reduce(_ unionByName _)
        .withColumn("user_id", rank) // post-band id → replicas differ
        .select(raw.columns.map(col).toIndexedSeq: _*), "events")
    }

    /** Hot-shingle DOCUMENTS scaling (`docs_zipf`, round-14 verdict #1 —
      * the text twin of events_zipf/lineitem_hub): the same k disjoint
      * doc_id bands as the `documents` rule, then ONE fixed boilerplate
      * template (16 words) is APPENDED to ~20% of ALL docs (selection
      * is md5 of the BANDED doc_id, so replicas differ and the fixture
      * is a pure function of the source). Every template word n-gram
      * becomes a head shingle with df ≈ 0.2·N — at k=100 that is
      * ~100,000 docs per shingle, 200× past the maxDf=500 stop-shingle
      * cap — and on SHORT docs the template dominates the minhash mins,
      * so LSH band buckets concentrate on template-derived keys: the
      * single-hot-key stress for the dedup/LSH family (stop-shingle
      * cap, band buckets, pairCounts' Σdf² bound) that uniform
      * replication cannot produce — real crawls have exactly this
      * profile (one cookie banner / nav template in a fifth of pages).
      * n_chars is kept consistent (= length of the new text). */
    def scaleDocsZipf(): Unit = {
      val HotShare = 0.20
      val Template = "please subscribe to our newsletter and follow the " +
        "channel for daily updates terms apply"
      val raw = spark.read.parquet(s"$src/documents.parquet")
      val band = raw.agg(max(col("doc_id"))).head().getLong(0) + 1L
      val banded = (0 until k).map { r =>
        raw.withColumn("doc_id", col("doc_id") + lit(r * band))
          .select(raw.columns.map(col).toIndexedSeq: _*)
      }.reduce(_ unionByName _)
      val u = (conv(substring(md5(col("doc_id").cast("string")), 1, 12), 16, 10)
        .cast("double") + lit(0.5)) / lit(281474976710656.0) // 2^48
      writeOne(banded
        .withColumn("text",
          when(u < lit(HotShare), concat(col("text"), lit(" " + Template)))
            .otherwise(col("text")))
        .withColumn("n_chars", length(col("text")).cast("long"))
        .select(raw.columns.map(col).toIndexedSeq: _*), "documents")
    }

    /** Relational-direction scaling (`relational`, round-13 verdict #2):
      * k coherent DISJOINT COPIES of the customer→orders→lineitem
      * subgraph — c_custkey, o_orderkey AND o_custkey, l_orderkey all
      * offset in lockstep, so every replicated order still joins its
      * replicated customer and its lineitems. Dimension columns
      * (c_nationkey, parts, suppliers, dates, prices) stay verbatim:
      * per-customer order counts and value distributions are unchanged,
      * exactly how a 100× order book grows. market_basket's item sets
      * repeat per replica (pair counts ×k — the frequency direction),
      * while rel_* queries see k× disjoint join keys. */
    def scaleRelational(): Unit = {
      val cust = spark.read.parquet(s"$src/customer.parquet")
      val custBand = cust.agg(max(col("c_custkey"))).head().getLong(0) + 1L
      writeOne((0 until k).map { r =>
        cust.withColumn("c_custkey", col("c_custkey") + lit(r * custBand))
          .select(cust.columns.map(col).toIndexedSeq: _*)
      }.reduce(_ unionByName _), "customer")
      val ord = spark.read.parquet(s"$src/orders.parquet")
      writeOne((0 until k).map { r =>
        ord.withColumn("o_orderkey", col("o_orderkey") + lit(r * orderBand))
          .withColumn("o_custkey", col("o_custkey") + lit(r * custBand))
          .select(ord.columns.map(col).toIndexedSeq: _*)
      }.reduce(_ unionByName _), "orders")
      scaleById("lineitem", "l_orderkey", Some(orderBand))
    }

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

    /** Hot-HUB graph scaling (`lineitem_hub`, round-13 verdict #3 — the
      * graph twin of events_zipf): the same k disjoint copies as
      * `lineitem_graph`, then ONE GLOBAL hub supplier is spliced into
      * ~17% of all orders (the MINIMUM line number of each md5-selected
      * order is remapped to a hub id outside every copy's band — line
      * numbers are uniform-random 1..7 per row, so "line 1" exists in
      * only ~44% of orders). Every copy's
      * suppliers co-occur with the hub in ~0.17× their order count —
      * far past MinCo — so the hub's degree ≈ the GLOBAL supplier
      * count: one node carries ~17% of edges, stitches the k copies
      * into one component, and is guaranteed the top BFS seed. This is
      * the frontier-expansion stress (BFS relaxation, walk neighbor
      * draws, min-label propagation, wedge joins all meet one key with
      * k× the next degree) that disjoint-copy and densified tiers
      * cannot produce. Selection is a pure function of the BANDED
      * orderkey (md5), so replicas differ and the fixture is
      * deterministic. */
    def scaleLineitemHub(): Unit = {
      val HubShare = 0.17
      val raw = spark.read.parquet(s"$src/lineitem.parquet")
      val suppBand = raw.agg(max(col("l_suppkey"))).head().getLong(0) + 1L
      // l_partkey is banded too (unlike `lineitem_graph`, whose graded
      // queries read only the supplier graph): the part graph must stay
      // k disjoint copies — unbanded parts would densify co-occurrence
      // counts 100× and explode the PartMinCo=2 graph (the round-12
      // finding) — and then gets its own hub so kcore/communities see
      // the same single-hot-node stress as the supplier side.
      val partBand = raw.agg(max(col("l_partkey"))).head().getLong(0) + 1L
      val hubSupp = k * suppBand
      val hubPart = k * partBand
      val banded = (0 until k).map { r =>
        raw.withColumn("l_orderkey", col("l_orderkey") + lit(r * orderBand))
          .withColumn("l_suppkey", col("l_suppkey") + lit(r * suppBand))
          .withColumn("l_partkey", col("l_partkey") + lit(r * partBand))
          .select(raw.columns.map(col).toIndexedSeq: _*)
      }.reduce(_ unionByName _)
      val u = (conv(substring(md5(col("l_orderkey").cast("string")), 1, 12), 16, 10)
        .cast("double") + lit(0.5)) / lit(281474976710656.0) // 2^48
      // the fixture's line numbers are uniform-random 1..7 per row (NOT
      // sequential), so "line 1" exists in only ~44% of orders — anchor
      // the spliced row at each selected order's MIN line number instead
      val minLn = min(col("l_linenumber")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("l_orderkey")))
      val hubRow = u < lit(HubShare) && col("l_linenumber") === minLn
      writeOne(banded
        .withColumn("l_suppkey",
          when(hubRow, lit(hubSupp)).otherwise(col("l_suppkey")))
        .withColumn("l_partkey",
          when(hubRow, lit(hubPart)).otherwise(col("l_partkey")))
        .select(raw.columns.map(col).toIndexedSeq: _*), "lineitem")
    }

    val all = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    val specs = Map[String, () => Unit](
      "events" -> (() => scaleEvents()),
      "events_zipf" -> (() => scaleEventsZipf()),
      "documents" -> (() => scaleById("documents", "doc_id")),
      "docs_zipf" -> (() => scaleDocsZipf()),
      "embeddings" -> (() => scaleById("embeddings", "vec_id")),
      "orders" -> (() => scaleById("orders", "o_orderkey", Some(orderBand))),
      "lineitem" -> (() => scaleById("lineitem", "l_orderkey", Some(orderBand))),
      "lineitem_graph" -> (() => scaleLineitemGraph()),
      "lineitem_hub" -> (() => scaleLineitemHub()),
      "relational" -> (() => scaleRelational()))
    val unknown = scaled -- specs.keySet
    require(unknown.isEmpty, s"no scale rule for: ${unknown.mkString(",")}")
    require(Seq("lineitem", "lineitem_graph", "lineitem_hub")
      .count(scaled.contains) <= 1,
      "lineitem / lineitem_graph / lineitem_hub are mutually exclusive")
    require(!(scaled.contains("events") && scaled.contains("events_zipf")),
      "events and events_zipf are mutually exclusive")
    require(!(scaled.contains("documents") && scaled.contains("docs_zipf")),
      "documents and docs_zipf are mutually exclusive")
    require(!scaled.contains("relational") ||
      (scaled & Set("customer", "orders", "lineitem", "lineitem_graph")).isEmpty,
      "relational already scales customer+orders+lineitem (and owns the " +
        "lineitem slot lineitem_graph would claim)")
    // composite/aliased rules: which concrete table each active rule owns
    val ownedBy: Map[String, String] = Seq(
      "lineitem" -> "lineitem_graph", "lineitem" -> "lineitem_hub",
      "customer" -> "relational", "orders" -> "relational",
      "lineitem" -> "relational", "events" -> "events_zipf",
      "documents" -> "docs_zipf"
    ).filter { case (_, rule) => scaled.contains(rule) }.toMap
    var ranComposite = Set.empty[String]
    for (t <- all) {
      if (scaled.contains(t)) specs(t)()
      else if (ownedBy.contains(t)) {
        val rule = ownedBy(t)
        if (!ranComposite.contains(rule)) { specs(rule)(); ranComposite += rule }
      }
      else java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$src/$t.parquet"),
        java.nio.file.Paths.get(s"$out/$t.parquet"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    println(s"[scaleup] wrote $out: ${scaled.mkString(",")} ${k}x from $src, others copied")
    spark.stop()
  }
}

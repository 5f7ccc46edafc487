package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate aggregates — the 100 TB path next to the exact contract
  * queries. COUNT(DISTINCT) and exact per-group quantiles
  * (`rel_distinct_agg`, `rel_quantiles`) are the verified oracle
  * contract; at cluster scale you swap in these sketches when the exact
  * forms' shuffles dominate:
  *
  *   - HLL++ `approx_count_distinct`: fixed-size sketch per group
  *     (no Expand + two-phase distinct dedup shuffle), mergeable
  *     map-side, relative error ~rsd.
  *   - `approx_percentile` (KLL-ish): one pass, bounded memory,
  *     rank error ≤ 1/accuracy — vs the exact form's full sort per key.
  *
  * Sketch values are engine-specific (deterministic per engine+data, but
  * NOT portable bits), so these carry spec-level error-bound verification
  * against the exact aggregates instead of DuckDB oracle twins —
  * ApproxSpec pins the bounds.
  */
object Approx {

  /** Per-group distinct-count estimates alongside the exact counts they
    * approximate. `rsd` = target relative standard deviation. */
  def distinct(df: DataFrame, key: Column, value: Column,
               rsd: Double = 0.05): DataFrame =
    df.groupBy(key.as("key"))
      .agg(countDistinct(value).as("exact"),
        approx_count_distinct(value, rsd).as("approx"))

  /** Per-group p50/p90/p99 estimates; rank error ≤ 1/accuracy. */
  def percentiles(df: DataFrame, key: Column, value: Column,
                  accuracy: Int = 10000): DataFrame =
    df.groupBy(key.as("key"))
      .agg(percentile_approx(value, array(lit(0.5), lit(0.9), lit(0.99)),
        lit(accuracy)).as("approx_p"),
        count(value).as("n"))

  /** 2^48 — the hash-fraction denominator of the KMV sketch (exactly
    * representable: a power of two). */
  val KmvScale: Double = 281474976710656.0

  /** K-minimum-values distinct-count sketch (Bar-Yossef et al. 2002) —
    * the ONE cardinality sketch in this engine with engine-portable
    * bits, hence a real DuckDB oracle twin (HLL++ sketch values are
    * engine-internal; this one is pure md5 + exact integers). Per key:
    * the exact distinct count, the k-th smallest 48-bit hash of the
    * distinct values, the KMV estimate (k−1)/u₍ₖ₎ = (k−1)·2^48 / hvₖ,
    * and its relative error — i.e. the estimator AND its own quality
    * report in one row.
    *
    * Determinism: hv = the first 12 md5 hex digits as an exact integer
    * (< 2^48 — both the `conv` parse here and the oracle's nibble sum
    * are exact); the k-th pick orders by (hv, value) so even 48-bit
    * collisions break identically; the estimate is one IEEE division of
    * an exactly-representable constant by an exactly-converted long,
    * 6-dp snapped. Groups holding fewer than k distinct values have no
    * k-th hash and the sketch IS the exact count (the standard KMV
    * small-cardinality rule).
    *
    * Scale shape: one distinct shuffle on (key, value) — the same
    * exchange the exact count needs — then a per-key bottom-k
    * (WindowGroupLimit prunes partials map-side); at 100 TB you keep
    * ONLY the k smallest hashes per key per partition before the
    * shuffle, which is exactly what the window-limit rewrite does. */
  /** Count-Min frequency sketch audit (Cormode–Muthukrishnan 2005) —
    * the second sketch with engine-portable bits: counters are EXACT
    * order-free sums into md5-derived positions, and the estimate is a
    * min over depth counters, so unlike Misra-Gries/SpaceSaving (whose
    * state depends on arrival order) every number here is
    * bit-reproducible and oracle-verifiable. Output: the true top-k
    * values with their exact counts, CM estimates, and the
    * overestimation bias (est ≥ true always — the one-sided error
    * guarantee the audit re-checks on live data).
    *
    * Scale shape: the counter build is one map-side-combinable
    * aggregate to a FIXED width·depth table (the whole point — O(1)
    * memory per key-space at 100 TB); the probe side is top-k-sized.
    */
  private def cmPos(width: Int): Column = expr(
    s"cast(conv(substring(md5(concat(cast(h as string), ':', v)), 1, 12), 16, 10) as bigint) % $width")

  private def cmRows(depth: Int): Column =
    explode(array((0 until depth).map(lit): _*)).as("h")

  /** The width·depth counter table of the Count-Min sketch: one exact
    * order-free count per (row h, position) cell. Counter sums are
    * associative, so this is exactly the mergeable state a streaming
    * ingest maintains incrementally — [[graft.streaming.StatefulCountMin]]
    * keeps the same cells live and StatefulCountMinSpec pins
    * latest-emission ≡ this table after any exactly-once prefix. */
  def countMinCells(df: DataFrame, value: Column, width: Int = 256,
                    depth: Int = 3): DataFrame =
    df.select(value.cast("string").as("v"), cmRows(depth))
      .select(col("h"), cmPos(width).as("pos"))
      .groupBy(col("h"), col("pos")).agg(count(lit(1)).as("c"))

  def countMin(df: DataFrame, value: Column, width: Int = 256,
               depth: Int = 3, topK: Int = 20): DataFrame = {
    val vals = df.select(value.cast("string").as("v"))
    def pos = cmPos(width)
    val hs = cmRows(depth)
    val cm = countMinCells(df, value, width, depth)
    // Heavy-hitter selection via TakeOrdered (the distinct-value frame
    // is unbounded at scale; no global-sort window), then rank the
    // ≤topK serving rows — (true_c desc, v) is a total order, so the
    // set and ranks match the windowed form exactly.
    val top = vals.groupBy(col("v")).agg(count(lit(1)).as("true_c"))
      .orderBy(col("true_c").desc, col("v")).limit(topK)
      .withColumn("rk", row_number().over(
        Window.orderBy(col("true_c").desc, col("v"))).cast("long"))
    top.select(col("v"), col("true_c"), col("rk"), hs)
      .withColumn("pos", pos)
      .join(cm, Seq("h", "pos"))
      .groupBy(col("v"), col("true_c"), col("rk"))
      .agg(min(col("c")).as("est_c"))
      .select(col("v").as("value"), col("rk"), col("true_c"), col("est_c"),
        (col("est_c") - col("true_c")).as("overestimate"))
  }

  def kmvDistinct(df: DataFrame, key: Column, value: Column,
                  k: Int = 16): DataFrame = {
    val d = df.select(key.as("key"), value.cast("string").as("v")).distinct()
      .select(col("key"), col("v"),
        conv(substring(md5(col("v")), 1, 12), 16, 10).cast("long").as("hv"))
    val ranked = d.withColumn("rn", row_number().over(
      Window.partitionBy(col("key")).orderBy(col("hv"), col("v"))))
    val exact = d.groupBy(col("key")).agg(count(lit(1)).as("n_exact"))
    val kth = ranked.filter(col("rn") === k)
      .select(col("key"), col("hv").as("kth_hv"))
    val est = when(col("kth_hv").isNull, col("n_exact").cast("double"))
      .otherwise(Det.snap(
        lit((k - 1).toDouble * KmvScale) / col("kth_hv").cast("double"), 6))
    exact.join(kth, Seq("key"), "left")
      .withColumn("k", lit(k.toLong))
      .withColumn("estimate", est)
      .withColumn("rel_err", Det.snap(
        (col("estimate") - col("n_exact").cast("double")) /
          col("n_exact").cast("double"), 6))
      .select(col("key"), col("n_exact"), col("k"), col("kth_hv"),
        col("estimate"), col("rel_err"))
  }

  /** α_m·m²·2^43 — the raw-HLL estimator numerator, computed ONCE in
    * Scala so the Spark literal and the oracle's [[Det.dblLit]] carry
    * identical double bits. */
  def hllAlphaNum(m: Int): Double =
    0.7213 / (1.0 + 1.079 / m) * m * m * (1L << 43).toDouble

  /** Raw HyperLogLog distinct estimate audited against the exact count —
    * the fixed-register companion to [[kmvDistinct]] (m registers per
    * key REGARDLESS of cardinality; KMV keeps k order statistics, HLL
    * keeps max trailing-zero ranks).
    *
    * Engine-portable by integer construction: the 48-bit md5 hash
    * splits into bucket = hv % m and payload x = hv div m < 2^42; the
    * sentinel x' = x + 2^42 bounds the rank; the lowest-set-bit
    * g = x' & −x' IS 2^tz exactly, so the register indicator 2^{−M_j}
    * scales to the exact integer 2^43/(2·gmax_j) (gmax divides 2^43 —
    * the division is exact), empty registers contribute 2^43, and the
    * harmonic denominator S ≤ m·2^43 < 2^53 sums exactly. The ONE
    * floating op is αm²·2^43 / (double)S. No small/large-range bias
    * corrections (they need ln, which is not engine-portable) — the
    * audit's rel_err column IS the bias readout.
    */
  def hllDistinct(df: DataFrame, key: Column, value: Column,
                  m: Int = 64): DataFrame = {
    require(m > 0 && (m & (m - 1)) == 0, "m must be a power of two")
    val z = 1L << 43
    val d = df.select(key.as("key"), value.cast("string").as("v")).distinct()
      .select(col("key"),
        conv(substring(md5(col("v")), 1, 12), 16, 10).cast("long").as("hv"))
    val regs = d
      .select(col("key"), expr(s"hv % $m").as("bucket"),
        expr(s"(hv div $m) + ${1L << 42}L").as("x"))
      .withColumn("g", expr("x & -x"))
      .groupBy(col("key"), col("bucket")).agg(max(col("g")).as("gmax"))
    val ex = d.groupBy(col("key")).agg(count(lit(1)).as("n_exact"))
    val den = regs.groupBy(col("key")).agg(
        count(lit(1)).as("nb"),
        sum(expr(s"${z}L div (2 * gmax)")).as("s1"))
      .select(col("key"), (lit(m.toLong) - col("nb")).as("n_empty"),
        (col("s1") + (lit(m.toLong) - col("nb")) * z).as("sden"))
    ex.join(den, Seq("key"))
      .withColumn("m", lit(m.toLong))
      .withColumn("estimate",
        Det.snap(lit(hllAlphaNum(m)) / col("sden").cast("double"), 6))
      .withColumn("rel_err", Det.snap(
        (col("estimate") - col("n_exact").cast("double")) /
          col("n_exact").cast("double"), 6))
      .select(col("key"), col("n_exact"), col("m"), col("n_empty"),
        col("estimate"), col("rel_err"))
  }
}

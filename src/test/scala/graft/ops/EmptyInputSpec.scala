package graft.ops

import graft.TestSpark
import graft.config.StrategyConfig
import org.scalatest.funsuite.AnyFunSuite

/** Every operator must degrade to an empty result (never throw) on empty
  * input — at cluster scale empty partitions/slices are routine. */
class EmptyInputSpec extends AnyFunSuite {
  import TestSpark._

  private val cfg = StrategyConfig()
  private val noTicks = ticks(Seq.empty)
  private val noDocs = docs(Seq.empty)
  private val noVecs = vecs(Seq.empty)

  test("tick pipeline on empty input") {
    val enriched = SmaCross.enrich(Normalize(noTicks), cfg)
    val costs = Positions.costs(Positions.stream(enriched), cfg)
    assert(SmaCross.signals(enriched, cfg).count() == 0)
    assert(Positions.executions(costs, cfg).count() == 0)
    assert(Performance(costs, cfg).count() == 0)
    assert(Rollup.hourly(Performance(costs, cfg)).count() == 0)
  }

  test("text and dedup operators on empty corpus") {
    assert(TextOps.stats(noDocs).count() == 0)
    assert(TextOps.langId(noDocs).count() == 0)
    assert(TextOps.vocab(noDocs).count() == 1) // global agg row of zeros
    assert(Dedup.exact(noDocs).count() == 0)
    assert(Dedup.ngramJaccardTopK(noDocs).count() == 0)
    assert(Dedup.minhashLshPairs(noDocs).count() == 0)
    assert(Dedup.simhash(noDocs).count() == 0)
  }

  test("round-2 analytics operators on empty input") {
    import org.apache.spark.sql.functions._
    val obs = noTicks.select(col("product_id"), col("event_time"), col("price"))
    assert(AsofJoin(obs, obs, Seq("product_id"), "event_time", "event_time",
      Seq("price" -> "m")).count() == 0)
    assert(RangeJoin.pairs(obs, obs, Seq("product_id"), "event_time", "event_time",
      -60L, 0L, Seq("price" -> "m")).count() == 0)
    assert(GapFill(obs, Seq("product_id"), "event_time", "1 minute",
      Seq("price" -> "price")).count() == 0)
    assert(Ewma.finalPerKey(noTicks, "product_id", "event_time", "sequence", "price")
      .count() == 0)
    assert(Decontaminate.report(noDocs, lit(false)).count() == 0)
    assert(Sample.stratified(noDocs, col("doc_id"), col("lang"),
      Map("en" -> 0.5), 0.1).count() == 0)
    assert(noDocs.filter(Sample.hashFilter(col("doc_id"), 0.5)).count() == 0)
  }

  test("similarity operators on empty corpus") {
    assert(Similarity.bruteForceTopK(noVecs, noVecs).count() == 0)
    assert(Similarity.lshTopK(noVecs, noVecs).count() == 0)
    assert(Similarity.cosineNearDupPairs(noVecs).count() == 0)
    assert(Similarity.centroids(noVecs).count() == 0)
    assert(Similarity.ivfAssign(noVecs,
      Similarity.centroidArrays(Similarity.centroids(noVecs))).count() == 0)
    assert(Similarity.scalarQuantize(noVecs).count() == 0)
    val noCents = Similarity.centroidArrays(Similarity.centroids(noVecs))
    assert(Similarity.pqAssign(noVecs, noCents, subDims = 2).count() == 0)
    assert(Similarity.pqAdcTopK(noVecs, noVecs, noCents, subDims = 2).count() == 0)
    assert(Similarity.ivfProbeTopK(noVecs, noVecs, noCents).count() == 0)
    assert(Multimodal.decodeFrames(Multimodal.toBlobTable(noDocs)).count() == 0)
  }

  test("round-3 indicator folds on empty input") {
    import org.apache.spark.sql.functions.lit
    assert(Indicators.rsiPerKey(noTicks, "product_id", "event_time",
      "sequence", "price").count() == 0)
    assert(Indicators.macdPerKey(noTicks, "product_id", "event_time",
      "sequence", "price").count() == 0)
    assert(Indicators.holtPerKey(noTicks, "product_id", "event_time",
      "sequence", "price").count() == 0)
    assert(Indicators.adaptiveEwmaPerKey(noTicks.withColumn("sc", lit(0.5)),
      "product_id", "event_time", "sequence", "price", "sc").count() == 0)
    // single tick: RSI has no delta (drops out); MACD emits the seed row
    val one = ticks(Seq(("A", 0, 0, 100.0, None, None)))
    assert(Indicators.rsiPerKey(one, "product_id", "event_time",
      "sequence", "price").count() == 0)
    val m = Indicators.macdPerKey(one, "product_id", "event_time",
      "sequence", "price").collect()
    assert(m.length == 1 && m(0).getAs[Double]("macd") == 0.0 &&
      m(0).getAs[Double]("signal") == 0.0)
  }

  test("round-4 operators on empty input") {
    import org.apache.spark.sql.functions.col
    // empty fact → empty edge list → zero triangle census row
    val edges = CoOccur.edges(
      noTicks.selectExpr("sequence AS g", "sequence AS item"), "g", "item", 2)
    assert(edges.count() == 0)
    assert(CoOccur.triangleStats(edges).head.getAs[Long]("n_edges") == 0L)
    // chunker / packing on an empty corpus
    assert(Chunker.chunks(noDocs, 16, 8).count() == 0)
    assert(Ranks.runningSumByRange(
      noDocs.selectExpr("doc_id", "CAST(length(text) AS BIGINT) AS n"),
      Seq(col("doc_id")), "n", "cum").count() == 0)
  }

  test("round-9 operators on empty input") {
    import org.apache.spark.sql.functions.col
    assert(Similarity.kmeansRefine(noVecs, k = 4, iters = 2).count() == 0)
    assert(Dedup.containmentPairs(noDocs).count() == 0)
    assert(TextOps.lexicalDiversity(noDocs).count() == 0)
    assert(BpeTrain.merges(noDocs, rounds = 3).count() == 0)
    assert(BpeTrain.tokenCounts(noDocs, rounds = 3).count() == 0)
    assert(Approx.kmvDistinct(noDocs, col("lang"), col("text")).count() == 0)
    assert(KCore.peel(
      noTicks.selectExpr("sequence AS x", "sequence AS y"), k = 2, rounds = 2)
      .count() == 0)
  }

  test("round-8 operators on empty input") {
    import org.apache.spark.sql.functions.col
    val grid = noTicks.selectExpr("product_id",
      "event_time AS grid_ts", "price")
    assert(Seasonal.hourOfDayProfile(grid).count() == 0)
    assert(Seasonal.anomalies(grid).count() == 0)
    assert(Kendall.counts(grid, "price", "price", "grid_ts").head()
      .getLong(0) == 0L) // one summary row of zero pairs
    assert(Kendall.countsByKey(grid, "product_id", "price", "price",
      "grid_ts").count() == 0)
    assert(Indicators.holtEvalPerKey(noTicks, "product_id", "event_time",
      "sequence", "price", 0.2, 0.1, 3).count() == 0)
    assert(Dedup.minhashLshDeltaPairs(noDocs, col("doc_id") % 2 === 0)
      .count() == 0)
    assert(BpeTrain.tokenCountsHeldOut(noDocs, noDocs, rounds = 2)
      .count() == 0)
    assert(Perceptron.evalHeldOut(noDocs, noDocs).head().getLong(0) == 0L)
  }
}

package graft

import graft.config.StrategyConfig
import graft.ops.SmaCross
import graft.queries._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps one entry per implemented operator (SURVEY §2) to a
  * DataFrame program over the testdata dir; `oracleSql` carries the DuckDB
  * twin the driver hash-compares against. Query groups live under
  * `graft.queries.*` so each domain (ticks, relational, text, similarity)
  * keeps its Spark code and oracle SQL side by side.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Full normalize → SMA-enrich → crossover classification over the tick
    * stream (HOLD rows included so the count is never empty on tiny data).
    */
  def entry(spark: SparkSession): DataFrame =
    SmaCross(TickQueries.ticks(spark, "/root/testdata/sf0.001"), StrategyConfig())

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    TickQueries.queries ++ DocQueries.queries ++
      VecQueries.queries ++ RelQueries.queries ++ AnalyticsQueries.queries ++
      BreadthQueries.queries ++ CorpusQueries.queries ++ GraphQueries.queries ++
      BarQueries.queries ++ StatQueries.queries ++ IndicatorQueries.queries ++
      MatchQueries.queries ++ BasketQueries.queries

  def oracleSql: Map[String, String] =
    TickQueries.oracleSql ++ DocQueries.oracleSql ++
      VecQueries.oracleSql ++ RelQueries.oracleSql ++ AnalyticsQueries.oracleSql ++
      BreadthQueries.oracleSql ++ CorpusQueries.oracleSql ++ GraphQueries.oracleSql ++
      BarQueries.oracleSql ++ StatQueries.oracleSql ++ IndicatorQueries.oracleSql ++
      MatchQueries.oracleSql ++ BasketQueries.oracleSql

  /** Capacity decompositions (r15 verdict #1): for a query listed here,
    * the part statements' ROW UNION equals its [[oracleSql]] statement —
    * so a compare can run one part at a time, each under the DuckDB
    * spill ceiling that the full statement exceeds at a stress tier.
    * Verify dumps this as oracle_parts.json; check_oracle's --parts
    * mode consumes it. Contract-gate compares keep using the full
    * statement (parts exist for capacity, not semantics). */
  def oracleParts: Map[String, Seq[String]] =
    Map("dedup_sweep" -> DocQueries.dedupSweepSqlParts)
}

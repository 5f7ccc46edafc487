package graft.strategy

import graft.config.StrategyConfig
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Strategy-run lifecycle catalog — the control plane the reference keeps
  * in the `strategy_runs` Postgres table and drives through
  * `scripts/strategy_runs.py` (create/end/list) and
  * `scripts/strategy_manager.py` (deploy marks runs, `:337-349` summarizes
  * lifecycle). Here it is a small parquet-backed table: the control plane
  * is tiny (one row per run), so read-modify-write is the right storage
  * shape, and every runbook query (list active, lifecycle summary) is a
  * DataFrame one-liner.
  */
final class RunCatalog(spark: SparkSession, path: String) {

  import spark.implicits._
  import org.apache.hadoop.fs.Path

  private def emptyRuns: DataFrame =
    Seq.empty[(String, String, String, java.sql.Timestamp, Option[java.sql.Timestamp])]
      .toDF("run_id", "strategy_name", "params", "started_at", "ended_at")

  private def fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Committed snapshot versions, oldest→newest. A version counts only once
    * its `_SUCCESS` marker exists (the committer writes it last), so readers
    * never observe a half-written snapshot and a writer crash mid-save
    * leaves the previous version intact. */
  private def committedVersions: Seq[(Long, Path)] = {
    val dir = new Path(path)
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq
      .filter(_.isDirectory)
      .flatMap { st =>
        val n = st.getPath.getName
        if (n.startsWith("v") && n.drop(1).forall(_.isDigit) &&
            fs.exists(new Path(st.getPath, "_SUCCESS")))
          Some((n.drop(1).toLong, st.getPath))
        else None
      }
      .sortBy(_._1)
  }

  def runs: DataFrame =
    committedVersions.lastOption match {
      case Some((_, p)) => spark.read.parquet(p.toString) // IO errors propagate
      case None => emptyRuns // genuinely no table yet
    }

  /** Commit a new snapshot as `<path>/v<n+1>`; never touches the version a
    * concurrent reader may be scanning (only versions older than the
    * previous one are pruned). Version numbering assumes a SINGLE writer —
    * the reference has the same model (one strategy_manager mutating
    * strategy_runs); concurrent writers would need a real transactional
    * table format. */
  private def save(df: DataFrame): Unit = {
    val prior = committedVersions
    val next = prior.lastOption.map(_._1 + 1).getOrElse(1L)
    df.coalesce(1).write.mode(SaveMode.Overwrite)
      .parquet(new Path(path, f"v$next%019d").toString)
    // keep the just-superseded version for in-flight readers; prune older
    prior.dropRight(1).foreach { case (_, p) => fs.delete(p, true) }
  }

  /** Register a new run (strategy_runs INSERT, strategy_runs.py:24-47). */
  def create(runId: String, strategyName: String, cfg: StrategyConfig,
             startedAt: java.sql.Timestamp): Unit = {
    require(StrategyRegistry.available.contains(strategyName),
      s"unknown strategy '$strategyName'")
    val params =
      s"""{"sma_fast_window":${cfg.smaFastWindow},"sma_slow_window":${cfg.smaSlowWindow},""" +
        s""""confirmation":${cfg.confirmation},"transaction_cost_bps":${cfg.transactionCostBps},""" +
        s""""slippage_bps":${cfg.slippageBps},"execution_mode":"${cfg.executionMode}"}"""
    val row = Seq((runId, strategyName, params, startedAt,
      None: Option[java.sql.Timestamp]))
      .toDF("run_id", "strategy_name", "params", "started_at", "ended_at")
    save(runs.unionByName(row))
  }

  /** Mark a run ended (strategy_runs.py end / manager retire path). */
  def end(runId: String, endedAt: java.sql.Timestamp): Unit =
    save(runs.withColumn("ended_at",
      when(col("run_id") === runId && col("ended_at").isNull, lit(endedAt))
        .otherwise(col("ended_at"))))

  /** Run listing (strategy_runs.py list: ORDER BY started_at DESC). */
  def list(activeOnly: Boolean = false): DataFrame = {
    val base = if (activeOnly) runs.filter(col("ended_at").isNull) else runs
    base.orderBy(col("started_at").desc, col("run_id"))
  }

  /** Lifecycle summary (A8, strategy_manager.py:337-349): per strategy,
    * COUNT(*) FILTER (WHERE active), earliest active start. */
  def summary: DataFrame =
    runs.groupBy(col("strategy_name")).agg(
      count(lit(1)).as("n_runs"),
      count(when(col("ended_at").isNull, lit(1))).as("n_active"),
      min(when(col("ended_at").isNull, col("started_at"))).as("oldest_active_start"))
}

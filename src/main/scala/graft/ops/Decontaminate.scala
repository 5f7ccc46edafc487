package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination — flag training documents that share word
  * n-grams with a held-out benchmark/eval set, the standard pre-training
  * hygiene pass (the reference has no corpus tooling; this belongs to the
  * beyond-reference training-data family next to Dedup).
  *
  * Shape at 100 TB: the benchmark side is tiny (eval sets are thousands
  * of docs, not billions), so its distinct n-gram set is BROADCAST and
  * the training side is a single scan → flatMap-shingle → broadcast hash
  * join → partial+final agg. No shuffle of the training corpus at all —
  * the only Exchange is the final per-doc aggregation, whose input is
  * already reduced to the (rare) contaminated grams. Shingling uses the
  * same typed flatMap as Dedup (JIT-compiled per-record loop, see
  * Shingles.exploded).
  */
object Decontaminate {

  /** Per-training-doc contamination report: distinct-shingle count `sz`,
    * benchmark-overlapping count `n_hit`, and their ratio — only docs
    * with at least one hit survive (the 100 TB output is the exception
    * list, never the full corpus). `isBenchmark` splits the corpus. */
  def report(docs: DataFrame, isBenchmark: Column, n: Int = 5): DataFrame = {
    val flagged = docs.withColumn("__bench", isBenchmark)
    val train = Shingles.exploded(flagged.filter(!col("__bench")), n)
    val bench = Shingles.exploded(flagged.filter(col("__bench")), n)
      .select(col("shingle")).distinct()
    train.join(broadcast(bench), "shingle")
      .groupBy(col("doc_id"), col("sz"))
      .agg(count(lit(1)).as("n_hit"))
      .select(col("doc_id"), col("sz"), col("n_hit"),
        (col("n_hit").cast("double") / col("sz").cast("double")).as("ratio"))
  }

  /** DuckDB twin of [[report]] (same shingling via Shingles.ofSql). */
  def reportSql(table: String, benchCond: String, n: Int = 5): String =
    s"""WITH sh AS (
  SELECT doc_id, ($benchCond) AS bench, ${Shingles.ofSql("text", n)} AS sh
  FROM $table
), ex AS (
  SELECT doc_id, len(sh) AS sz, unnest(sh) AS shingle FROM sh WHERE NOT bench
), bench AS (
  SELECT DISTINCT unnest(sh) AS shingle FROM sh WHERE bench
)
SELECT ex.doc_id, ex.sz, count(*) AS n_hit,
       ${Det.snapSql("count(*)::DOUBLE / ex.sz::DOUBLE", 6)} AS ratio
FROM ex JOIN bench USING (shingle)
GROUP BY 1, 2"""
}

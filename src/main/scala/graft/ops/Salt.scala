package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling two-phase (salted) aggregation.
  *
  * A heavy-hitter group key sends its whole group to one reduce task;
  * at 100 TB one hot instrument or stop-shingle stalls the stage. The
  * classic fix: spread each group over `salts` sub-groups, partially
  * aggregate, then combine the partials — two small shuffles instead of
  * one skewed one.
  *
  * With floating sums the salted result would differ in the low bits from
  * the unsalted one (summation order changes). Because Det sums are exact
  * decimals, salting changes only the combine tree, NOT the value —
  * SaltSpec asserts bit-identity with [[Det.sumD]]. AQE's skew handling
  * covers joins; this covers aggregations it can't split.
  */
object Salt {

  /** Order-independent SUM of `value` at decimal scale `s` per `keys`,
    * computed via `salts` sub-groups. Output column: `sum`. */
  def saltedSumD(df: DataFrame, keys: Seq[String], value: Column, s: Int,
                 salts: Int = 16): DataFrame =
    df.withColumn("__salt", pmod(hash(value), lit(salts)))
      .groupBy(keys.map(col) :+ col("__salt"): _*)
      .agg(sum(Det.kl(value, s)).as("__partial"), count(lit(1)).as("__n"))
      .groupBy(keys.map(col): _*)
      .agg(
        (sum(col("__partial")).cast("double") / lit(s"1e$s".toDouble)).as("sum"),
        sum(col("__n")).as("count"))
}

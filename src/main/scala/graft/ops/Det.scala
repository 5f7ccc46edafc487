package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Deterministic, order-independent floating aggregation.
  *
  * Why this exists: IEEE-754 double addition is not associative, so any
  * engine-level freedom in summation order (Spark's partial/final aggregate
  * merge order across shuffle partitions, task retries, AQE re-plans,
  * DuckDB's sliding-window segment trees) changes the low bits of
  * `SUM`/`AVG`/`STDDEV` results. On a 1000-executor cluster that means a
  * re-run of the same backtest over the same 100 TB produces *different*
  * metric bits — unacceptable for a signals engine whose outputs gate
  * trading decisions, and fatal for bit-exact oracle verification.
  *
  * Design rules that make every aggregate bit-reproducible in ANY engine:
  *
  *  1. The additive part runs on exact fixed-point decimals (decimal
  *     addition IS associative). Inputs are snapped to the decimal grid
  *     with pure double ops (`floor(x*10^s+0.5)`), so the double→decimal
  *     cast is unambiguous everywhere: the snapped value sits ~1 ulp from
  *     a grid point, never near the half-way boundary where cast rounding
  *     is implementation-defined.
  *  2. Variance numerators are computed EXACTLY in integer arithmetic:
  *     `D = n·Σk² − (Σk)²` over grid integers k, carried in decimals wide
  *     enough to never round. D ≥ 0 by Cauchy–Schwarz and is exactly 0
  *     for constant inputs — no cancellation junk for `sqrt` to amplify,
  *     and the `x = 0 → NULL` ratio guards fire identically everywhere.
  *  3. Every decimal that is cast back to double stays below 2^53 in
  *     unscaled magnitude (asserted by the width choices below), so both
  *     a correctly-rounded cast (Spark: BigDecimal.doubleValue) and a
  *     two-step int64→double→÷10^s cast (DuckDB) yield the same bits.
  *  4. All finishing arithmetic (divide, sqrt) is a fixed sequence of
  *     correctly-rounded IEEE double ops.
  *
  * The grids (1e-9 for means, 1e-4/1e-5 for variance operands) perturb
  * inputs far below any signal-relevant scale; in exchange, aggregates are
  * reproducible run-to-run and engine-to-engine. The reference inherits
  * Flink's nondeterministic double aggregation (e.g. STDDEV_POP over
  * keyed streams, flink_jobs/strategies/sma_cross.py:89-93); this engine
  * upgrades that to deterministic semantics with the same formulas.
  *
  * Each Column builder has a DuckDB-SQL twin below generated from the SAME
  * constants — that pairing is what keeps the two engines in lockstep.
  */
object Det {

  private def pow10(s: Int): Double = s"1e$s".toDouble

  /** Snap a double to the 10^-s decimal grid using only IEEE double ops
    * (mul, add, floor, div — each correctly rounded, hence identical in
    * every conforming engine). Unlike `round(x, s)`, whose half-way
    * tie-breaking differs across engines (exact-decimal HALF_UP in Spark
    * vs double-math rounding elsewhere), this expression has no
    * implementation freedom. Requires |x|*10^s < 2^63 (true for every
    * column in this engine by construction).
    */
  def snap(c: Column, s: Int): Column =
    floor(c * lit(pow10(s)) + lit(0.5)) / lit(pow10(s))

  /** Snap to the 10^-s grid, then cast to DECIMAL(18,s) — exact by rule 1. */
  def dec(c: Column, s: Int): Column =
    snap(c, s).cast(DecimalType(18, s))

  /** Grid integer k = round(x·10^e) as DECIMAL(18,0). The double is exactly
    * an integer < 2^53 when it reaches the cast, so the cast is exact in
    * any implementation. */
  private def ki(c: Column, e: Int): Column =
    floor(c * lit(pow10(e)) + lit(0.5)).cast(DecimalType(18, 0))

  /** Order-independent SUM: exact decimal sum at scale s, finished as
    * double. Envelope: Σ|x|·10^s < 2^53. */
  def sumD(c: Column, s: Int): Column = sum(dec(c, s)).cast("double")

  /** Order-independent AVG = exact decimal sum / non-null count. */
  def avgD(c: Column, s: Int): Column = sumD(c, s) / count(c)

  /** Windowed [[avgD]] over a frame. */
  def avgD(c: Column, s: Int, frame: WindowSpec): Column =
    sum(dec(c, s)).over(frame).cast("double") / count(c).over(frame)

  /** Trailing-window mean over the last `w` rows, O(n) instead of the
    * O(n·w) per-row frame rebuild Spark does for sliding frames: running
    * prefix sum minus its value `w` rows back. EXACT decimal arithmetic
    * makes the subtraction bit-identical to summing the frame directly —
    * this rewrite is only sound because Det sums never round. Requires a
    * non-null input column (count = min(row_number, w)).
    */
  def avgDTrailing(c: Column, s: Int, w: Int, base: WindowSpec): Column = {
    val cum = sum(dec(c, s)).over(base.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    val sumW = cum - coalesce(lag(cum, w).over(base), lit(0).cast(DecimalType(18, s)))
    val cnt = least(row_number().over(base), lit(w))
    sumW.cast("double") / cnt
  }

  /** Trailing-window population stddev over the last `w` rows, O(n) via
    * exact prefix sums of k and k² (see [[avgDTrailing]] and
    * [[stddevPopD]]). Requires a non-null input column. */
  def stddevPopDTrailing(c: Column, e: Int, w: Int, base: WindowSpec): Column = {
    val k = ki(c, e)
    def trail(x: Column) = {
      val cum = sum(x).over(base.rowsBetween(Window.unboundedPreceding, Window.currentRow))
      cum - coalesce(lag(cum, w).over(base), lit(0).cast(DecimalType(38, 0)))
    }
    finishStd(trail(k), trail(k * k), least(row_number().over(base), lit(w)), e)
  }

  /** Order-independent population stddev over grid integers k = x·10^e:
    * sqrt(n·Σk² − (Σk)²) / (10^e · n), with the numerator exact (rule 2).
    * Envelope: Σk² < 2^53 and Σ|k| < 10^14. Matches STDDEV_POP semantics
    * (0.0 for a single sample or constant input, null only on empty).
    */
  def stddevPopD(c: Column, e: Int): Column = {
    val k = ki(c, e)
    finishStd(sum(k), sum(k * k), count(c), e)
  }

  /** Windowed variant of [[stddevPopD]] over a frame. */
  def stddevPopD(c: Column, e: Int, frame: WindowSpec): Column =
    finishStd(
      sum(ki(c, e)).over(frame),
      sum(ki(c, e) * ki(c, e)).over(frame),
      count(c).over(frame),
      e)

  private def finishStd(s1: Column, s2: Column, n: Column, e: Int): Column = {
    // Exact integer D = n·Σk² − (Σk)²  (≥ 0 by Cauchy–Schwarz).
    val d = n.cast(DecimalType(10, 0)) * s2.cast(DecimalType(18, 0)) -
      s1.cast(DecimalType(14, 0)) * s1.cast(DecimalType(14, 0))
    sqrt(d.cast("double")) / (lit(pow10(e)) * n.cast("double"))
  }

  /** Σ of k² over rows where cond holds (k = x·10^e grid integer), finished
    * as double·10^-2e; 0.0 when no row matches. Used for downside variance
    * (Sortino). */
  def sumSqWhereD(cond: Column, c: Column, e: Int): Column = {
    val k = ki(c, e)
    coalesce(sum(when(cond, k * k)).cast("double"), lit(0.0)) / lit(pow10(2 * e))
  }

  // -------------------------------------------------------------------
  // DuckDB-SQL twins (same formulas, same grids).
  // -------------------------------------------------------------------

  def snapSql(x: String, s: Int): String = s"floor(($x)*1e$s+0.5)/1e$s"

  def decSql(x: String, s: Int): String =
    s"CAST(${snapSql(x, s)} AS DECIMAL(18,$s))"

  private def kiSql(x: String, e: Int): String =
    s"CAST(floor(($x)*1e$e+0.5) AS DECIMAL(18,0))"

  def sumDSql(x: String, s: Int, over: String = ""): String =
    s"CAST(sum(${decSql(x, s)})$over AS DOUBLE)"

  def avgDSql(x: String, s: Int, over: String = ""): String =
    s"(${sumDSql(x, s, over)} / (count($x)$over))"

  def stddevPopDSql(x: String, e: Int, over: String = ""): String = {
    val k = kiSql(x, e)
    val s1 = s"CAST(sum($k)$over AS DECIMAL(14,0))"
    val s2 = s"CAST(sum($k*$k)$over AS DECIMAL(18,0))"
    val n = s"count($x)$over"
    val d = s"(CAST($n AS DECIMAL(10,0))*$s2 - $s1*$s1)"
    s"(sqrt(CAST($d AS DOUBLE)) / (1e$e * CAST($n AS DOUBLE)))"
  }

  def sumSqWhereDSql(cond: String, x: String, e: Int): String = {
    val k = kiSql(x, e)
    s"(coalesce(CAST(sum(CASE WHEN $cond THEN $k*$k END) AS DOUBLE), 0.0) / 1e${2 * e})"
  }
}

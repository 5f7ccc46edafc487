package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) interleaving for multi-dimensional storage layout —
  * the clustering key that makes file-level min/max statistics prune on
  * BOTH dimensions at once. A 100 TB fact table laid out on
  * `zorder(custkey, dayIdx)` serves `custkey = ?` AND `day BETWEEN`
  * predicates from a small set of files each, where a single-column sort
  * can only skip on its leading dimension (the same trick Delta/Iceberg
  * `OPTIMIZE ZORDER BY` applies; here it is a plain expression, so
  * `df.repartitionByRange(col("z")).sortWithinPartitions("z")` +
  * parquet min/max stats reproduce it with no table format needed).
  *
  * The interleave is pure integer bit algebra: bit i of each dimension
  * lands at bit 2i / 2i+1 of the key. Both sides are generated from the
  * same Scala loop so the Spark [[bits]]-bit column and the DuckDB twin
  * [[zvalSql]] are structurally identical terms summed in the same
  * order — exact Long arithmetic, engine-portable by construction
  * (non-overlapping bits make `+` equal to bitwise OR).
  */
object ZOrder {

  /** Morton key of two dimensions, `bits` low bits each (dims must be
    * pre-masked to `bits` — the query is responsible for the cast). */
  def zval(x: Column, y: Column, bits: Int = 16): Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)

  /** DuckDB twin of [[zval]] — same terms, same order. */
  def zvalSql(x: String, y: String, bits: Int = 16): String =
    (0 until bits).map { i =>
      s"((($x >> $i) & 1) << ${2 * i}) + ((($y >> $i) & 1) << ${2 * i + 1})"
    }.mkString(" + ")
}

package graft.ops

import graft.TestSpark
import org.scalacheck.{Gen, Prop, Properties, Test}
import java.sql.Timestamp

/** ScalaCheck property: incremental rollup maintenance is split-
  * invariant — for ANY split of the metric history (including empty and
  * bucket-straddling slices), merging the slices' partial states and
  * finalizing equals the full recompute bit-for-bit. This is the
  * associativity claim the materialized-view path rests on. */
object RollupProps extends Properties("RollupMaintenance") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6) // each sample runs Spark jobs

  private lazy val spark = TestSpark.spark

  private val cols = Seq("strategy_run_id", "metric_time", "sharpe_ratio",
    "sortino_ratio", "cumulative_return", "drawdown", "trades_executed")

  private def row(run: String, min: Long, sharpe: Double) =
    (run, new Timestamp(1700000000000L + min * 60000L), sharpe, sharpe / 2,
      sharpe * 0.1, -0.5 + sharpe * 0.01, 2L)

  private val historyGen = for {
    n <- Gen.chooseNum(1, 60)
    split <- Gen.chooseNum(0, n)
    sharpes <- Gen.listOfN(n, Gen.chooseNum(-3.0, 3.0))
  } yield {
    val rows = sharpes.zipWithIndex.map { case (sh, i) =>
      row(if (i % 2 == 0) "a" else "b", i.toLong * 7, sh)
    }
    (rows, split)
  }

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(r => r.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq

  property("finalize(merge(partials(A), partials(B))) = hourly(A ++ B) for any split") =
    Prop.forAll(historyGen) { case (rows, split) =>
      import spark.implicits._
      val (a, b) = rows.splitAt(split)
      val full = rows.toDF(cols: _*)
      val want = canon(Rollup.hourly(full))
      val got = canon(Rollup.finalizeHourly(Rollup.mergeHourly(
        Rollup.hourlyPartials(
          if (a.isEmpty) full.filter("trades_executed < 0") else a.toDF(cols: _*)),
        Rollup.hourlyPartials(
          if (b.isEmpty) full.filter("trades_executed < 0") else b.toDF(cols: _*)))))
      Prop(got == want) :| s"split=$split n=${rows.size}"
    }
}

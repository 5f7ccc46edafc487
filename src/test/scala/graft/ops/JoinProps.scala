package graft.ops

import graft.TestSpark
import org.scalacheck.{Gen, Prop, Properties, Test}

/** ScalaCheck properties: AsofJoin and RangeJoin agree with naive
  * in-memory reference models on random inputs. */
object JoinProps extends Properties("Joins") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8) // each sample runs Spark jobs

  private lazy val spark = TestSpark.spark
  import spark.implicits._
  import org.apache.spark.sql.functions._

  private val keyGen = Gen.oneOf("a", "b", "c")
  // (key, seconds, value); seconds small so collisions and ties happen
  private val rowGen = for {
    k <- keyGen; t <- Gen.chooseNum(0L, 50L); v <- Gen.chooseNum(1, 999)
  } yield (k, t, v.toDouble)
  private val rowsGen = Gen.nonEmptyListOf(rowGen)

  private def df(rows: List[(String, Long, Double)], tc: String, vc: String) =
    rows.map { case (k, t, v) => (k, TestSpark.ts(t), v) }.toDF("k", tc, vc)

  property("AsofJoin = per-row latest-at-or-before lookup") =
    Prop.forAll(rowsGen, rowsGen) { (left, right) =>
      // AsofJoin requires right unique per (key, time): keep max value
      val rightU = right.groupBy(r => (r._1, r._2)).map { case ((k, t), g) =>
        (k, t, g.map(_._3).max)
      }.toList
      val out = AsofJoin(df(left, "lt", "lv"), df(rightU, "rt", "rv"),
          Seq("k"), "lt", "rt", Seq("rv" -> "mv"))
        .collect()
        .map(r => (r.getString(0), r.getTimestamp(1).getTime,
          if (r.isNullAt(3)) None else Some(r.getDouble(3))))
        .sortBy(x => (x._1, x._2))
      val expected = left.map { case (k, t, _) =>
        val cands = rightU.filter(r => r._1 == k && r._2 <= t)
        (k, TestSpark.ts(t).getTime,
          if (cands.isEmpty) None else Some(cands.maxBy(_._2)._3))
      }.sortBy(x => (x._1, x._2))
      Prop(out.toList.map(x => (x._1, x._2)) == expected.map(x => (x._1, x._2)) &&
        out.toList.map(_._3) == expected.map(_._3)) :|
        s"asof mismatch: got ${out.toList} want $expected"
    }

  property("AsofJoin.forward = per-row earliest-at-or-after lookup") =
    Prop.forAll(rowsGen, rowsGen) { (left, right) =>
      val rightU = right.groupBy(r => (r._1, r._2)).map { case ((k, t), g) =>
        (k, t, g.map(_._3).max)
      }.toList
      val out = AsofJoin.forward(df(left, "lt", "lv"), df(rightU, "rt", "rv"),
          Seq("k"), "lt", "rt", Seq("rv" -> "mv"))
        .collect()
        .map(r => (r.getString(0), r.getTimestamp(1).getTime,
          if (r.isNullAt(3)) None else Some(r.getDouble(3))))
        .sortBy(x => (x._1, x._2))
      val expected = left.map { case (k, t, _) =>
        val cands = rightU.filter(r => r._1 == k && r._2 >= t)
        (k, TestSpark.ts(t).getTime,
          if (cands.isEmpty) None else Some(cands.minBy(_._2)._3))
      }.sortBy(x => (x._1, x._2))
      Prop(out.toList.map(x => (x._1, x._2)) == expected.map(x => (x._1, x._2)) &&
        out.toList.map(_._3) == expected.map(_._3)) :|
        s"forward asof mismatch: got ${out.toList} want $expected"
    }

  property("RangeJoin = naive interval filter") =
    Prop.forAll(rowsGen, rowsGen, Gen.chooseNum(-30L, 0L), Gen.chooseNum(1L, 30L)) {
      (probe, build, lo, span) =>
        val hi = lo + span
        val out = RangeJoin.pairs(df(probe, "pt", "pv"), df(build, "bt", "bv"),
            Seq("k"), "pt", "bt", lo, hi, Seq("bv" -> "mv"))
          .groupBy("k", "pt").count().collect()
          .map(r => ((r.getString(0), r.getTimestamp(1).getTime), r.getLong(2))).toMap
        val expected = probe.groupBy(p => (p._1, p._2)).flatMap { case ((k, t), ps ) =>
          val n = build.count(b => b._1 == k &&
            b._2 >= t + lo && b._2 < t + hi).toLong
          if (n == 0) None else Some((k, TestSpark.ts(t).getTime) -> n * ps.size)
        }
        Prop(out == expected) :| s"range mismatch: got $out want $expected"
    }
}

package graft.ops

import graft.TestSpark
import org.scalacheck.{Gen, Prop, Properties, Test}

/** ScalaCheck properties: the prefix-min window form of CUSUM equals the
  * naive sequential fold S_t = max(0, S_{t-1} + (k_t − ref − drift)) on
  * random inputs, and Robust's disc-median picks the sorted-rank value. */
object CusumProps extends Properties("CusumRobust") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8) // each sample runs Spark jobs

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val Scale = 4
  private val DriftK = 50L
  private val ThreshK = 3000L

  private val priceGen = Gen.chooseNum(95.0, 105.0)
  private val seriesGen = for {
    n <- Gen.chooseNum(1, 60)
    xs <- Gen.listOfN(n, priceGen)
  } yield xs

  private def kOf(v: Double): Long = math.floor(v * 1e4 + 0.5).toLong

  property("prefix-min CUSUM = naive sequential fold") =
    Prop.forAll(seriesGen) { xs =>
      val df = xs.zipWithIndex
        .map { case (v, i) => ("k", TestSpark.ts(i.toLong), i.toLong, v) }
        .toDF("key", "t", "seq", "x")
      val row = Cusum.perKey(df, "key", "t", "seq", "x", Scale, DriftK, ThreshK)
        .collect().head
      // naive fold over the same grid integers
      val ks = xs.map(kOf)
      val ref = ks.head
      var s = 0L; var maxS = 0L; var alarms = 0L
      for (k <- ks) {
        s = math.max(0L, s + (k - ref - DriftK))
        maxS = math.max(maxS, s)
        if (s > ThreshK) alarms += 1
      }
      val got = (row.getAs[Long]("n_ticks"), row.getAs[Long]("n_alarms"),
        row.getAs[Double]("max_s"), row.getAs[Double]("final_s"))
      val want = (xs.size.toLong, alarms, maxS.toDouble / 1e4, s.toDouble / 1e4)
      Prop(got == want) :| s"got $got, want $want"
    }

  property("Robust disc-median = sorted value at rank ceil(n/2)") =
    Prop.forAll(seriesGen) { xs =>
      val df = xs.zipWithIndex
        .map { case (v, i) => ("k", i.toLong, v) }
        .toDF("key", "seq", "x")
      // cutoff −1 keeps every row with a non-null z (MAD > 0), exposing med
      val meds = Robust.madOutliers(df, "key", "x", Seq("seq"), cutoff = -1.0)
        .select("med").distinct().collect().map(_.getDouble(0)).toSeq
      val want = xs.sorted.apply(((xs.size + 1) / 2) - 1)
      val devs = xs.map(x => math.abs(x - want)).sorted
      val mad = devs(((xs.size + 1) / 2) - 1)
      if (mad == 0) Prop(meds.isEmpty) :| s"MAD 0 must null the z filter, got $meds"
      else Prop(meds == Seq(want)) :| s"got $meds, want $want"
    }
}

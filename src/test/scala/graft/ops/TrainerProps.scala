package graft.ops

import graft.TestSpark
import org.scalacheck.{Gen, Prop, Properties, Test}

/** ScalaCheck properties for the in-engine trainers: on random corpora
  * the distributed implementations must agree EXACTLY with naive
  * driver-side references implementing the same contracts — the guard
  * against subtle divergence (tie-breaks, greedy-scan semantics, grid
  * rounding) under future refactors. */
object TrainerProps extends Properties("Trainers") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6) // each sample runs several Spark jobs

  private lazy val spark = TestSpark.spark

  // ------------------------------------------------------------- BPE

  private val bpeCorpusGen: Gen[List[String]] = for {
    n <- Gen.chooseNum(1, 8)
    docs <- Gen.listOfN(n, for {
      m <- Gen.chooseNum(1, 6)
      ws <- Gen.listOfN(m, Gen.oneOf("aab", "abab", "ba", "aaa", "bcb", "cc"))
    } yield ws.mkString(" "))
  } yield docs

  /** Naive in-memory BPE over the same weighted word dictionary. */
  private def naiveBpe(texts: Seq[String], rounds: Int): List[(Long, String, String, Long)] = {
    var seqs: Map[String, (Long, Vector[String])] = texts
      .flatMap(_.split(" ", -1)).groupBy(identity)
      .map { case (w, occ) => w -> (occ.size.toLong, w.map(_.toString).toVector) }
    val out = scala.collection.mutable.ListBuffer.empty[(Long, String, String, Long)]
    var r = 0
    var done = false
    while (r < rounds && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      seqs.values.foreach { case (f, s) =>
        s.indices.dropRight(1).foreach { i =>
          counts((s(i), s(i + 1))) = counts.getOrElse((s(i), s(i + 1)), 0L) + f
        }
      }
      if (counts.isEmpty) done = true
      else {
        val ((a, b), c) = counts.toSeq
          .sortBy { case ((x, y), n) => (-n, x, y) }.head
        out += ((r + 1L, a, b, c))
        seqs = seqs.map { case (w, (f, s)) =>
          val buf = Vector.newBuilder[String]
          var i = 0
          while (i < s.length) {
            if (i < s.length - 1 && s(i) == a && s(i + 1) == b) { buf += (a + b); i += 2 }
            else { buf += s(i); i += 1 }
          }
          w -> (f, buf.result())
        }
      }
      r += 1
    }
    out.toList
  }

  property("BpeTrain.merges equals the naive in-memory trajectory") =
    Prop.forAll(bpeCorpusGen) { texts =>
      val rows = texts.zipWithIndex.map { case (t, i) => (i.toLong, t, "en") }
      val got = BpeTrain.merges(TestSpark.docs(rows), rounds = 4)
        .collect()
        .map(r => (r.getAs[Long]("merge_rank"), r.getAs[String]("left_sym"),
          r.getAs[String]("right_sym"), r.getAs[Long]("pair_count")))
        .sortBy(_._1).toList
      got == naiveBpe(texts, 4)
    }

  // ---------------------------------------------------------- k-means

  private val vecsGen: Gen[List[Seq[Float]]] = for {
    n <- Gen.chooseNum(2, 12)
    vs <- Gen.listOfN(n, Gen.listOfN(4,
      Gen.chooseNum(-100, 100).map(_ / 100.0f)).map(_.toSeq))
  } yield vs

  /** Naive Lloyd's with the SAME exact-grid arithmetic contract. */
  private def naiveKmeans(vs: Seq[Seq[Float]], k: Int, iters: Int): Map[Long, (Long, Double)] = {
    def d2l(e: Seq[Float], cv: Seq[Double]): Long =
      e.zip(cv).map { case (x, c) =>
        val d = x.toDouble - c; math.floor(d * d * 1e12 + 0.5).toLong
      }.sum
    var cb: Seq[(Int, Seq[Double])] = vs.zipWithIndex.sortBy(_._2).take(k)
      .map { case (v, i) => (i, v.map(_.toDouble)) }
    def argmin(e: Seq[Float]): (Int, Long) =
      cb.map { case (c, cv) => (c, d2l(e, cv)) }.minBy { case (c, d) => (d, c) }
    for (_ <- 1 to iters) {
      val byC = vs.map(v => (argmin(v)._1, v)).groupBy(_._1)
      cb = byC.toSeq.sortBy(_._1).map { case (c, members) =>
        val dim = members.head._2.length
        (c, (0 until dim).map { j =>
          // Det.avgD(12): exact grid-long sum, (double)Σk/1e12/n
          val s = members.map(m => math.floor(m._2(j).toDouble * 1e12 + 0.5).toLong).sum
          s.toDouble / 1e12 / members.size
        })
      }
    }
    vs.zipWithIndex.map { case (v, i) =>
      val (c, d) = argmin(v)
      i.toLong -> (c.toLong, math.floor((d.toDouble / 1e12) * 1e6 + 0.5) / 1e6)
    }.toMap
  }

  property("kmeansRefine equals the naive exact-grid Lloyd trajectory") =
    Prop.forAll(vecsGen) { vs =>
      val k = math.min(3, vs.size)
      val rows = vs.zipWithIndex.map { case (v, i) => (i.toLong, v, 0) }
      val got = Similarity.kmeansRefine(TestSpark.vecs(rows), k, iters = 2)
        .collect()
        .map(r => r.getAs[Long]("vec_id") ->
          ((r.getAs[Long]("cluster"), r.getAs[Double]("d2")))).toMap
      got == naiveKmeans(vs, k, 2)
    }
}

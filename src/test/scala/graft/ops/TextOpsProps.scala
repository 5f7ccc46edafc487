package graft.ops

import graft.TestSpark
import org.scalacheck.{Gen, Prop, Properties, Test}

/** ScalaCheck properties for the vocabulary-growth curve: on random
  * word-soup corpora the cumulative columns must reconcile exactly with
  * a naive driver-side model — vocab_size is the distinct-word count of
  * the prefix, cum_tokens the token count of the prefix, and new_words
  * their per-doc increments. */
object TextOpsProps extends Properties("TextOps") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8) // each sample runs Spark jobs

  private lazy val spark = TestSpark.spark

  private val wordGen = Gen.oneOf("a", "b", "cat", "dog", "spark", "x9")

  private val corpusGen: Gen[List[String]] = for {
    n <- Gen.chooseNum(1, 20)
    docs <- Gen.listOfN(n, for {
      m <- Gen.chooseNum(1, 12)
      ws <- Gen.listOfN(m, wordGen)
    } yield ws.mkString(" "))
  } yield docs

  property("vocabGrowth reconciles with the naive prefix model") =
    Prop.forAll(corpusGen) { texts =>
      val rows = texts.zipWithIndex.map { case (t, i) => (i.toLong, t, "en") }
      val got = TextOps.vocabGrowth(TestSpark.docs(rows))
        .orderBy("doc_id").collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tokens"),
          r.getAs[Long]("new_words"), r.getAs[Long]("vocab_size"),
          r.getAs[Long]("cum_tokens"))).toSeq
      // Naive model over the same " "-split tokenization (keep empties,
      // matching Catalyst split / DuckDB string_split)
      var seen = Set.empty[String]
      var cumTok = 0L
      val want = texts.zipWithIndex.map { case (t, i) =>
        val ws = t.split(" ", -1).toSeq
        val fresh = ws.toSet -- seen
        seen ++= fresh
        cumTok += ws.size
        (i.toLong, ws.size.toLong, fresh.size.toLong, seen.size.toLong, cumTok)
      }
      got == want
    }
}

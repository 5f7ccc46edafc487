package graft.streaming

import graft.TestSpark
import graft.ops.Similarity
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable

/** Incremental streaming top-k ≡ batch bruteForceTopK. */
class StatefulTopKSpec extends AnyFunSuite {
  import TestSpark._
  import StatefulTopK.VecIn

  private def emb(i: Long): Seq[Float] =
    (0 until 8).map(d => (math.sin(i * 0.7 + d) * (1 + (i % 5) * 0.1)).toFloat)

  private val corpus: Seq[VecIn] = (1L to 120L).map(i => VecIn(i, emb(i)))
  private val queryIds = Seq(1L, 2L, 3L)
  private val k = 5

  test("streaming upserts converge to the batch brute-force ranking") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext

    val latest = mutable.LinkedHashMap[(Long, Long), (Long, Double)]() // (qid,rnk) -> (vec,cos)
    val ms = MemoryStream[VecIn]
    val q = StatefulTopK.topK(ms.toDS(),
        queryIds.map(i => i -> emb(i)), k)
      .writeStream.outputMode(OutputMode.Append())
      .foreachBatch { (df: org.apache.spark.sql.Dataset[StatefulTopK.TopKOut], _: Long) =>
        df.collect().foreach(o => latest((o.qid, o.rnk)) = (o.vec_id, o.cosine))
      }.start()
    try {
      // three chunks + a replay of 30 already-seen vectors (idempotence)
      Seq(corpus.slice(0, 50), corpus.slice(50, 90),
        corpus.slice(30, 60) ++ corpus.slice(90, 120))
        .foreach { c => ms.addData(c); q.processAllAvailable() }
    } finally q.stop()

    val all = corpus.map(v => (v.vec_id, v.embedding, 0)).toDF("vec_id", "embedding", "label")
    val queries = all.filter($"vec_id".isin(queryIds: _*))
    val batch = Similarity.bruteForceTopK(queries, all, k)
      .collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("rnk")) ->
        ((r.getAs[Long]("vec_id"), r.getAs[Double]("cosine"))))
      .toMap

    assert(latest.nonEmpty)
    assert(latest.toMap == batch, "streaming top-k must equal batch ranking")
  }
}

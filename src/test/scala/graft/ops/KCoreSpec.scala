package graft.ops

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class KCoreSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def edges(es: (Long, Long)*) = es.toDF("x", "y")

  test("2-core keeps the triangle and peels the tail") {
    val out = KCore.peel(edges((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)), k = 2, rounds = 3)
      .collect().map(r => r.getAs[Long]("node") -> r.getAs[Long]("degree")).toMap
    assert(out == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("a path graph peels to nothing at k = 2") {
    val out = KCore.peel(edges((1L, 2L), (2L, 3L), (3L, 4L)), k = 2, rounds = 4).collect()
    assert(out.isEmpty)
  }

  test("the peel is idempotent past the fixpoint") {
    val es = edges((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L), (5L, 6L), (4L, 6L))
    val a = KCore.peel(es, k = 2, rounds = 3).collect().map(_.toSeq).toSet
    val b = KCore.peel(es, k = 2, rounds = 8).collect().map(_.toSeq).toSet
    assert(a == b && a.nonEmpty)
  }

  test("one round reports residual degree, including a survivor cut to 0") {
    // star center 1 with leaves 2..4 plus edge (2,3): round 1 peels the
    // degree-1 leaf 4; center keeps 3 >= k so survives with residual 2
    val out = KCore.peel(edges((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L)), k = 2, rounds = 1)
      .collect().map(r => r.getAs[Long]("node") -> r.getAs[Long]("degree")).toMap
    assert(out == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }
}

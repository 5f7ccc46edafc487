package graft.strategy

import graft.TestSpark
import graft.config.StrategyConfig
import org.scalatest.funsuite.AnyFunSuite

class RunCatalogSpec extends AnyFunSuite {
  import TestSpark._

  test("create / list / end / summary lifecycle") {
    val path = java.nio.file.Files.createTempDirectory("graft-runs").toString + "/runs"
    val cat = new RunCatalog(spark, path)
    assert(cat.runs.count() == 0)

    cat.create("r1", "sma_cross", StrategyConfig(), ts(0))
    cat.create("r2", "sma_cross", StrategyConfig(smaFastWindow = 5, smaSlowWindow = 30), ts(10))
    assert(cat.list().count() == 2)
    assert(cat.list(activeOnly = true).count() == 2)
    // newest first
    assert(cat.list().head().getAs[String]("run_id") == "r2")

    cat.end("r1", ts(100))
    val active = cat.list(activeOnly = true).collect()
    assert(active.length == 1 && active.head.getAs[String]("run_id") == "r2")

    val s = cat.summary.collect()
    assert(s.length == 1)
    assert(s.head.getAs[Long]("n_runs") == 2L)
    assert(s.head.getAs[Long]("n_active") == 1L)
    assert(s.head.getAs[java.sql.Timestamp]("oldest_active_start") == ts(10))

    // params survive round-trip and carry the knobs
    val r2 = cat.runs.filter("run_id = 'r2'").head()
    assert(r2.getAs[String]("params").contains("\"sma_fast_window\":5"))

    assertThrows[IllegalArgumentException] {
      cat.create("r3", "no_such_strategy", StrategyConfig(), ts(0))
    }
  }
}

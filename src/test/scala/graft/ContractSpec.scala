package graft

import graft.queries._
import org.scalatest.funsuite.AnyFunSuite

/** Static sanity for the driver contract: the merged query/oracle maps
  * must not silently drop entries (Map ++ overrides duplicate keys —
  * a lost query would weaken the correctness gate without any failure). */
class ContractSpec extends AnyFunSuite {

  private val queryGroups = Seq(
    "tick" -> TickQueries.queries.keySet,
    "doc" -> DocQueries.queries.keySet,
    "vec" -> VecQueries.queries.keySet,
    "rel" -> RelQueries.queries.keySet,
    "analytics" -> AnalyticsQueries.queries.keySet,
    "breadth" -> BreadthQueries.queries.keySet,
    "corpus" -> CorpusQueries.queries.keySet,
    "graph" -> GraphQueries.queries.keySet,
    "bar" -> BarQueries.queries.keySet,
    "stat" -> StatQueries.queries.keySet,
    "indicator" -> IndicatorQueries.queries.keySet,
    "match" -> MatchQueries.queries.keySet,
    "basket" -> BasketQueries.queries.keySet)

  test("no query name collides across groups") {
    val all = queryGroups.flatMap(_._2)
    val dups = all.groupBy(identity).filter(_._2.size > 1).keys
    assert(dups.isEmpty, s"duplicate query names: ${dups.mkString(", ")}")
    assert(SparkEntry.queries.size == all.size)
  }

  test("every oracle entry points at an existing query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: ${orphans.mkString(", ")}")
  }

  test("every query has an oracle") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries missing oracles: ${missing.mkString(", ")}")
  }

  test("no oracle SQL carries an interpolated null or empty body") {
    // a cross-object initialization cycle interpolates literal "null"
    // into composed SQL (seen once with curation_report ↔ source_mixture);
    // the driver would then fail that query with a parser error
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(sql != null && sql.trim.nonEmpty, s"$name: empty oracle")
      assert(!sql.contains("(null)") && !sql.contains(" null\n WITH") &&
        !sql.matches("(?s).*\\(\\s*null\\s*\\).*"),
        s"$name: oracle SQL contains an interpolated null — object init cycle?")
    }
  }
}

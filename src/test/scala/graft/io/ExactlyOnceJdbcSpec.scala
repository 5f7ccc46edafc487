package graft.io

import graft.TestSpark
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Exactly-once JDBC delivery via PK-idempotent upsert (SURVEY §7 hard
  * part 4) — the SINK-side sibling of StreamingFailureInjectionSpec:
  * foreachBatch gives at-least-once batch delivery, and
  * [[JdbcSink.upsert]] must make every replay granularity converge to
  * the clean run's table, byte for byte, against a REAL JDBC engine
  * (embedded Derby — same wire semantics as the reference's Postgres
  * sink, no network).
  *
  * Scenarios proven:
  *  1. partial write then full replay — half of batch 2 lands and
  *     COMMITS (a crash between partition commits, or a
  *     non-transactional sink's partial flush), then the whole batch
  *     re-delivers: table == clean run;
  *  2. duplicate replay — an already-applied batch re-delivers
  *     verbatim: table unchanged;
  *  3. cross-batch overwrite — a later batch re-keys earlier PKs:
  *     last write wins (the CDC-shaped update path);
  *  4. mid-partition failure — every attempt of one partition's task
  *     throws: the job fails, the poisoned partition's transaction
  *     ROLLS BACK (no half partition is ever visible), surviving
  *     partitions' commits stand, and the standard full replay then
  *     converges to the clean run.
  */
class ExactlyOnceJdbcSpec extends AnyFunSuite {
  import TestSpark.spark

  private def url(db: String) = s"jdbc:derby:memory:$db;create=true"

  private val schema = StructType(Seq(
    StructField("user_id", LongType, nullable = false),
    StructField("win_start", LongType, nullable = false),
    StructField("n", LongType),
    StructField("sum_v", DoubleType)))

  private def frame(rows: Seq[(Long, Long, Long, Double)]): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        rows.map(r => Row(r._1, r._2, r._3, r._4)), 3),
      schema)

  private def createTable(db: String): Unit = {
    val c = java.sql.DriverManager.getConnection(url(db))
    try {
      val st = c.createStatement()
      st.executeUpdate(
        """CREATE TABLE metrics_sink (
          |  user_id BIGINT NOT NULL, win_start BIGINT NOT NULL,
          |  n BIGINT, sum_v DOUBLE,
          |  PRIMARY KEY (user_id, win_start))""".stripMargin)
      st.close()
    } finally c.close()
  }

  private def snapshot(db: String): Seq[(Long, Long, Long, Double)] = {
    val c = java.sql.DriverManager.getConnection(url(db))
    try {
      val rs = c.createStatement().executeQuery(
        "SELECT user_id, win_start, n, sum_v FROM metrics_sink " +
          "ORDER BY user_id, win_start")
      val b = Seq.newBuilder[(Long, Long, Long, Double)]
      while (rs.next())
        b += ((rs.getLong(1), rs.getLong(2), rs.getLong(3), rs.getDouble(4)))
      b.result()
    } finally c.close()
  }

  // three micro-batches; batch 3 re-keys two of batch 2's PKs (overwrite
  // path) and adds new ones — one row per PK per batch (the contract)
  private val b1 = (1L to 12L).map(i => (i % 4, i, i, i * 0.25))
  private val b2 = (13L to 24L).map(i => (i % 4, i, i * 2, i * 0.5))
  private val b3 = Seq((1L, 13L, 99L, 9.75), (2L, 14L, 98L, 8.5)) ++
    (25L to 30L).map(i => (i % 4, i, i, i * 1.0))

  private def apply(db: String, rows: Seq[(Long, Long, Long, Double)]): Unit =
    JdbcSink.upsert(url(db), "metrics_sink",
      Seq("user_id", "win_start"), batchSize = 5)(frame(rows))

  private lazy val clean: Seq[(Long, Long, Long, Double)] = {
    createTable("eo_clean")
    Seq(b1, b2, b3).foreach(apply("eo_clean", _))
    snapshot("eo_clean")
  }

  test("partial write + full replay + duplicate replay converge to the clean run") {
    createTable("eo_retry")
    apply("eo_retry", b1)
    // partial COMMIT of batch 2 (first half lands, crash before the rest)
    apply("eo_retry", b2.take(b2.size / 2))
    assert(snapshot("eo_retry") != clean) // the partial state is really partial
    apply("eo_retry", b2) // the at-least-once re-delivery
    apply("eo_retry", b3)
    assert(snapshot("eo_retry") == clean)
    apply("eo_retry", b3) // verbatim duplicate replay
    assert(snapshot("eo_retry") == clean)
  }

  test("cross-batch overwrite: last write wins on a re-keyed PK") {
    val got = clean.find(r => r._1 == 1L && r._2 == 13L).get
    assert(got == ((1L, 13L, 99L, 9.75))) // b3's value, not b2's (13*2, 6.5)
  }

  test("mid-partition failure rolls back its transaction; full replay then converges") {
    import spark.implicits._
    createTable("eo_fail")
    apply("eo_fail", b1)
    // poison batch 2: the partition holding win_start=20 throws on EVERY
    // attempt (deterministic), so the job fails after task retries; its
    // partition's transaction must roll back each time
    val poisoned = frame(b2).as[(Long, Long, Long, Double)]
      .map { r => if (r._2 == 20L) throw new RuntimeException("sink crash"); r }
      .toDF("user_id", "win_start", "n", "sum_v")
    val thrown = intercept[Exception] {
      JdbcSink.upsert(url("eo_fail"), "metrics_sink",
        Seq("user_id", "win_start"), batchSize = 5)(poisoned)
    }
    assert(thrown.getMessage != null)
    val mid = snapshot("eo_fail")
    // nothing from the poisoned partition is visible (rollback), and only
    // whole partitions of b2 may have landed
    assert(!mid.exists(_._2 == 20L))
    val extras = mid.filterNot(clean.toSet) // rows not in the final state
    assert(extras.forall(r => b2.contains(r))) // committed b2 partitions only
    // standard recovery: re-deliver the whole batch, then continue
    apply("eo_fail", b2)
    apply("eo_fail", b3)
    assert(snapshot("eo_fail") == clean)
  }
}

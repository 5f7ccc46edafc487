package graft.io

import graft.TestSpark
import org.apache.spark.sql.types.{LongType, StringType, StructType}
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

class JsonlCorpusSpec extends AnyFunSuite {
  import TestSpark._

  private val schema = new StructType()
    .add("doc_id", LongType).add("text", StringType).add("lang", StringType)

  test("good lines parse to the schema; malformed lines are captured, not dropped") {
    val dir = Files.createTempDirectory("jsonl").toFile
    val f = new java.io.File(dir, "part0.jsonl")
    Files.writeString(f.toPath,
      """{"doc_id": 1, "text": "hello world", "lang": "en"}
        |{"doc_id": 2, "text": "bonjour", "lang": "fr"}
        |{broken json line
        |{"doc_id": 3, "text": "third", "lang": "en"}
        |also not json at all
        |""".stripMargin)
    val r = JsonlCorpus.read(spark, f.getAbsolutePath, schema)
    val good = r.rows.collect().map(x => x.getLong(0) -> x.getString(1)).toMap
    assert(good == Map(1L -> "hello world", 2L -> "bonjour", 3L -> "third"))
    assert(r.rows.columns.toSeq == Seq("doc_id", "text", "lang"),
      "corrupt column must not leak into the clean stream")
    val bad = r.malformed.collect().map(_.getString(0)).toSeq
    assert(bad.size == 2 && bad.exists(_.contains("broken json")) &&
      bad.exists(_.contains("also not json")))
  }
}

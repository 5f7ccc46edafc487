package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** JSONL corpus source — the batch file twin of the Kafka JSON source
  * (S1): one JSON document per line, the standard interchange format for
  * LLM training corpora. PERMISSIVE decode with the corrupt line
  * CAPTURED, so ingest accounts for malformed records instead of
  * silently dropping them — the `json.ignore-parse-errors` model plus an
  * audit trail (a 100 TB crawl always contains broken lines; dropping
  * them without a count corrupts downstream mixture weights invisibly).
  *
  * Scale shape: a line-splittable text source — input splits parallelize
  * by byte range like any text scan; the explicit schema keeps the
  * reader off the double-pass infer path.
  */
object JsonlCorpus {

  final case class ReadResult(rows: DataFrame, malformed: DataFrame)

  private val CorruptCol = "_corrupt_record"

  /** `rows` = schema-conforming documents; `malformed` = the raw text of
    * every line that failed to parse (one column, `raw`). The scan is
    * cached: Spark cannot filter on the corrupt-record column of an
    * uncached JSON scan (it is populated during parsing only), and the
    * two outputs would otherwise re-read the files. Callers streaming
    * only `rows` may `.unpersist()` it when done. */
  def read(spark: SparkSession, path: String, schema: StructType): ReadResult = {
    val raw = spark.read
      .schema(schema.add(CorruptCol, StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)
      .cache()
    ReadResult(
      rows = raw.filter(col(CorruptCol).isNull).drop(CorruptCol),
      malformed = raw.filter(col(CorruptCol).isNotNull)
        .select(col(CorruptCol).as("raw")))
  }
}

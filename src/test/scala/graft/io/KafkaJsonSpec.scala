package graft.io

import graft.TestSpark
import graft.schemas.Schemas
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The serialization contract of the Kafka sinks (S2-S4): all columns →
  * one JSON value; a consumer decoding with the declared schema recovers
  * the rows (the transport itself needs a broker and is out of unit
  * scope). */
class KafkaJsonSpec extends AnyFunSuite {
  import TestSpark._

  test("toJsonValue round-trips through from_json with the topic schema") {
    val df = ticks(Seq(
      ("BTC-USD", 0, 1, 41000.12, Some(40999.9), Some(41000.5)),
      ("ETH-USD", 1, 2, 2500.5, None, None)))
      .withColumn("price", col("price").cast("double"))
      .withColumn("volume_24h", lit(123.45))
      .withColumn("side", lit("buy"))
      .withColumn("source", lit("coinbase"))
    val json = KafkaJson.toJsonValue(df, keyCol = Some("product_id"))
    assert(json.columns.toSeq == Seq("key", "value"))

    val back = json
      .select(from_json(col("value"), Schemas.rawPrice).as("r"))
      .select("r.*")
      .orderBy("sequence").collect()
    assert(back.length == 2)
    assert(back(0).getAs[String]("product_id") == "BTC-USD")
    assert(back(0).getAs[Double]("price") == 41000.12)
    assert(back(0).getAs[Double]("best_bid") == 40999.9)
    assert(back(1).isNullAt(back(1).fieldIndex("best_bid")))
    assert(back(0).getAs[java.sql.Timestamp]("event_time") == ts(0))
  }

  test("malformed payloads decode to null rows (ignore-parse-errors model)") {
    val s = spark
    import s.implicits._
    val decoded = Seq("""{"product_id":"A","price":1.0,"event_time":"2024-01-01T00:00:00Z"}""",
      "not json at all", """{"price": "wat"""")
      .toDF("value")
      .select(from_json(col("value"), Schemas.rawPrice).as("r"))
      .filter(col("r").isNotNull && col("r.event_time").isNotNull)
    assert(decoded.count() == 1)
  }
}

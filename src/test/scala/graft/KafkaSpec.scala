package graft

import graft.etl.RedsetSchema
import graft.sources.Kafka
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** S2/S3 Kafka form without a broker: the option plumbing is code under
  * test, and the wire codecs round-trip on batch frames (the identical
  * expressions run inside the streaming plan against a real cluster).
  */
class KafkaSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("source config builds the full option map (S2)") {
    val cfg = Kafka.SourceConfig(
      bootstrapServers = "broker1:9092,broker2:9092",
      topics = Seq("leaderboard", "query_metrics"),
      startingOffsets = "earliest",
      maxOffsetsPerTrigger = Some(100000L))
    assert(cfg.options == Map(
      "kafka.bootstrap.servers" -> "broker1:9092,broker2:9092",
      "subscribe" -> "leaderboard,query_metrics",
      "startingOffsets" -> "earliest",
      "failOnDataLoss" -> "true",
      "maxOffsetsPerTrigger" -> "100000"))
    // the reader is constructible broker-free (format+options wiring)
    assert(cfg.reader(spark) != null)
    assertThrows[IllegalArgumentException](
      Kafka.SourceConfig("b:9092", Seq.empty))
  }

  test("sink config builds the full option map (S3)") {
    val cfg = Kafka.SinkConfig("broker1:9092", "output_table", "/tmp/ckpt")
    assert(cfg.options == Map(
      "kafka.bootstrap.servers" -> "broker1:9092",
      "topic" -> "output_table",
      "checkpointLocation" -> "/tmp/ckpt"))
  }

  test("wire codec round-trips the raw redset frame (encode -> decode)") {
    val rows = Seq(
      Map("query_id" -> "7", "user_id" -> "10", "query_type" -> "select",
        "read_table_ids" -> "[90, 91]", "mbytes_scanned" -> "12.0"),
      Map("query_id" -> "8", "arrival_timestamp" -> "2024-03-01 00:10:00"))
    val raw = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(m =>
        Row(RedsetSchema.rawSchema.fieldNames.map(n => m.getOrElse(n, null)).toSeq: _*))),
      RedsetSchema.rawSchema)
    val wire = Kafka.encode(raw)
    assert(wire.columns.toSeq == Seq("key", "value"))
    assert(wire.orderBy("key").collect().map(_.getString(0)).toSeq == Seq("7", "8"))
    val back = Kafka.decode(wire)
    assert(back.schema == RedsetSchema.rawSchema)
    val got = back.orderBy("query_id").collect()
    val want = raw.orderBy("query_id").collect()
    assert(got.sameElements(want))
  }
}

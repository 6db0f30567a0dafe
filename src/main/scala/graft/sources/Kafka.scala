package graft.sources

import graft.etl.RedsetSchema
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamReader, DataStreamWriter}

/** S2/S3 Kafka form (the reference's actual transport:
  * `Real Final APP/producer_Final.py:50-76` produce,
  * `Dashboard_Live_Final.py:642-665` consume) as real code, not a comment.
  *
  * Broker-blocked surface, precisely: ONLY the `load()` / `start()`
  * executions (they need the `spark-sql-kafka` connector jar plus a live
  * broker — neither exists in this environment). Everything up to that
  * line is exercised by KafkaSpec: the option maps against the
  * connector's documented option contract, reader/writer construction,
  * format resolution (`load()`/`start()` provably reach Spark's
  * data-source lookup and fail on the absent connector, not earlier in
  * our wiring), and the wire codecs INSIDE a genuine streaming plan
  * (MemoryStream → encode → binary wire → decode → memory sink), not
  * just on batch frames. Against a real cluster,
  * `SourceConfig(...).load(spark)` replaces `Streams.jsonFileSource` and
  * the whole topology downstream is identical.
  *
  * Scale notes: `maxOffsetsPerTrigger` bounds micro-batch size (backpressure
  * at 1000 executors); `failOnDataLoss=true` keeps at-least-once honest;
  * one source can subscribe N topics and fan out via `Streams.fanOut`.
  */
object Kafka {

  /** Structured-Streaming Kafka source configuration (S2). */
  final case class SourceConfig(
      bootstrapServers: String,
      topics: Seq[String],
      startingOffsets: String = "latest",
      maxOffsetsPerTrigger: Option[Long] = None,
      failOnDataLoss: Boolean = true) {
    require(topics.nonEmpty, "at least one topic")
    // the connector's accepted forms: the two symbolic positions or a
    // per-partition JSON offset map — anything else fails at stream start,
    // hours after the config was written; fail at construction instead
    require(startingOffsets == "earliest" || startingOffsets == "latest" ||
      startingOffsets.trim.startsWith("{"),
      s"startingOffsets must be 'earliest', 'latest', or a JSON offset map: $startingOffsets")

    def options: Map[String, String] = Map(
      "kafka.bootstrap.servers" -> bootstrapServers,
      "subscribe" -> topics.mkString(","),
      "startingOffsets" -> startingOffsets,
      "failOnDataLoss" -> failOnDataLoss.toString) ++
      maxOffsetsPerTrigger.map("maxOffsetsPerTrigger" -> _.toString)

    /** The configured (not yet loaded) reader — broker-free. */
    def reader(spark: SparkSession): DataStreamReader =
      spark.readStream.format("kafka").options(options)

    /** Opens the stream (requires a broker + connector jar). */
    def load(spark: SparkSession): DataFrame = reader(spark).load()
  }

  /** Structured-Streaming Kafka sink configuration (S3). */
  final case class SinkConfig(
      bootstrapServers: String,
      topic: String,
      checkpointLocation: String) {

    def options: Map[String, String] = Map(
      "kafka.bootstrap.servers" -> bootstrapServers,
      "topic" -> topic,
      "checkpointLocation" -> checkpointLocation)

    /** The configured (not yet started) writer over an encoded frame. */
    def writer(encoded: DataFrame): DataStreamWriter[Row] =
      encoded.writeStream.format("kafka").options(options)
  }

  /** Kafka wire → typed raw frame: each message value is one JSON object
    * (the reference's wire format), decoded against the declared
    * [[RedsetSchema.rawSchema]] — schema-on-read with zero inference.
    */
  def decode(kafkaFrame: DataFrame): DataFrame =
    kafkaFrame
      .select(from_json(col("value").cast("string"), RedsetSchema.rawSchema).as("r"))
      .select("r.*")

  /** Raw frame → Kafka wire: JSON value plus a partitioning key column —
    * keying by entity keeps per-key ordering within a Kafka partition.
    */
  def encode(df: DataFrame, keyCol: String = "query_id"): DataFrame =
    df.select(col(keyCol).cast("string").as("key"),
      to_json(struct(df.columns.toIndexedSeq.map(col): _*)).as("value"))
}

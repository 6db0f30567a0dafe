package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for training-data pipelines: image/audio/video
  * travel as opaque `binary` columns with typed metadata; decode /
  * feature-extract / resize / frame-sample run per-partition in batches.
  *
  * The actual codecs are NOT in this environment, so the decode kernel is a
  * clearly-marked deterministic STUB (`StubCodec`) — everything around it
  * (schema, batch iteration, partition-local execution, output shape) is
  * the real Spark plumbing: swap `StubCodec` for an ImageIO/ffmpeg-backed
  * implementation and nothing else changes.
  *
  * Scale notes: `mapPartitions` keeps the codec call batched and
  * executor-local (no shuffle); payload columns should be stored in their
  * own parquet column chunk (automatic) so metadata-only queries never read
  * bytes (column pruning); partition by content-defined key (e.g.
  * sha prefix) for even codec load.
  */
object Multimodal {

  /** Typed metadata carried alongside every payload. */
  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("media_type", StringType),
    StructField("n_bytes", LongType),
    StructField("sha_hex", StringType)))

  /** Wrap a binary payload column with content-addressed metadata — the
    * ingestion-side transform establishing the multimodal column shape.
    */
  def withMediaMeta(df: DataFrame, payload: String, mediaType: String): DataFrame =
    df.withColumn("media_meta", struct(
      lit(mediaType).as("media_type"),
      length(col(payload)).cast("long").as("n_bytes"),
      sha2(col(payload), 256).as("sha_hex")))

  /** One decoded record: fixed-shape feature vector + declared dims.
    * (What a real image decode would yield post-resize.)
    */
  case class DecodedMedia(id: Long, width: Int, height: Int,
                          features: Array[Float])

  /** STUB codec — deterministic fake standing in for ImageIO/ffmpeg (the
    * libs aren't in this container). Derives a fixed-size "feature vector"
    * from payload bytes. Swap this object to productionize; the Spark
    * plumbing around it is real and tested.
    */
  object StubCodec {
    val FeatureDim = 16
    def decode(payload: Array[Byte], targetW: Int, targetH: Int): DecodedMedia = {
      val feats = new Array[Float](FeatureDim)
      var i = 0
      while (i < payload.length) {
        feats(i % FeatureDim) += (payload(i) & 0xFF) / 255.0f
        i += 1
      }
      DecodedMedia(0L, targetW, targetH, feats)
    }
    /** Frame-sample stub: every `stride`-th byte window stands in for a
      * video frame.
      */
    def sampleFrames(payload: Array[Byte], stride: Int): Seq[Array[Byte]] =
      payload.grouped(stride).toSeq
  }

  /** Decode + feature-extract, batched per partition (the mapPartitions
    * analog of a Pandas-UDF decode). Input: (id, payload) rows; output:
    * typed DecodedMedia. Codec instantiation cost is amortized per
    * partition, exactly as a heavyweight decoder handle would be.
    */
  def decodeFeatures(df: DataFrame, idCol: String, payloadCol: String,
                     targetW: Int = 224, targetH: Int = 224): Dataset[DecodedMedia] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition: open the (stub) codec once, stream batches through
        it.map { case (id, bytes) =>
          StubCodec.decode(bytes, targetW, targetH).copy(id = id)
        }
      }
  }

  /** Frame sampling for video payloads: one output row per sampled frame,
    * preserving provenance (id, frame_idx). Generator-shaped (explode), so
    * fan-out stays distributed and bounded by payload size / stride.
    */
  def sampleFrames(df: DataFrame, idCol: String, payloadCol: String,
                   stride: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          StubCodec.sampleFrames(bytes, stride).zipWithIndex.map {
            case (frame, idx) => (id, idx, frame)
          }
        }
      }
      .toDF("id", "frame_idx", "frame_bytes")
  }
}

package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for training-data pipelines: image/audio/video
  * travel as opaque `binary` columns with typed metadata; decode /
  * feature-extract / resize / frame-sample run per-partition in batches.
  *
  * The image path is a REAL codec: [[Farbfeld]] parses the farbfeld format
  * (suckless.org's interchange format — 8-byte magic, big-endian u32
  * width/height, 16-bit big-endian RGBA components). It is deliberately the
  * simplest real raster format so the full decode → resample → feature
  * chain is genuine and oracle-checkable; an ImageIO/ffmpeg-backed decoder
  * for richer formats swaps in behind the same `decode` signature and
  * nothing else changes.
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

  /** The farbfeld image format, for real: `"farbfeld" | u32be width |
    * u32be height | width*height px of 4×u16be (RGBA, row-major)`.
    * Malformed input (bad magic, truncated pixel data) throws
    * `IllegalArgumentException` — a decoder that silently invents pixels
    * would poison every stat downstream.
    */
  object Farbfeld {
    val Magic: Array[Byte] = "farbfeld".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val HeaderLen: Int = 16
    val Channels: Int = 4

    /** Decoded raster: `components(i*4 + c)` = channel `c` of pixel `i`
      * (row-major), each in [0, 65535].
      */
    final case class Image(width: Int, height: Int, components: Array[Int])

    /** Encode from a component generator `(pixelIdx, channel) => 0..65535`
      * — the ingestion/test-fixture side of the codec.
      */
    def encode(width: Int, height: Int, component: (Int, Int) => Int): Array[Byte] = {
      require(width >= 0 && height >= 0, s"bad dims ${width}x$height")
      val buf = java.nio.ByteBuffer.allocate(HeaderLen + width * height * Channels * 2)
      buf.put(Magic).putInt(width).putInt(height)
      var i = 0
      while (i < width * height) {
        var c = 0
        while (c < Channels) {
          buf.putShort((component(i, c) & 0xFFFF).toShort)
          c += 1
        }
        i += 1
      }
      buf.array()
    }

    def decode(bytes: Array[Byte]): Image = {
      require(bytes.length >= HeaderLen, s"truncated header: ${bytes.length} bytes")
      val buf = java.nio.ByteBuffer.wrap(bytes)
      val magic = new Array[Byte](Magic.length)
      buf.get(magic)
      require(java.util.Arrays.equals(magic, Magic),
        "bad magic: not a farbfeld payload")
      val width = buf.getInt
      val height = buf.getInt
      require(width >= 0 && height >= 0, s"bad dims ${width}x$height")
      // long arithmetic: a crafted header (e.g. 2^30 x 4) overflows the Int
      // product to 0 and would pass a length check while the real raster is
      // absent — the guarantee is malformed input THROWS, never bogus stats.
      // Matching against bytes.length (an Int) also bounds w*h*Channels.
      require(width.toLong * height * Channels * 2 + HeaderLen == bytes.length,
        s"truncated pixels: ${bytes.length} bytes for ${width}x$height")
      val n = width * height * Channels
      val comps = new Array[Int](n)
      var i = 0
      while (i < n) { comps(i) = buf.getShort & 0xFFFF; i += 1 }
      Image(width, height, comps)
    }
  }

  /** Canonical 16-bit mono PCM WAV, for real: the audio analog of
    * [[Farbfeld]] — 44-byte RIFF/WAVE header (PCM fmt chunk) +
    * little-endian s16 samples. Deliberately the simplest real audio
    * container so the parse is genuine and oracle-checkable; an
    * ffmpeg-backed decoder for compressed formats swaps in behind the
    * same `decode` signature. Malformed input (bad magic, non-PCM,
    * stereo, inconsistent chunk lengths, truncated samples) THROWS —
    * never bogus stats.
    */
  object Wav {
    val HeaderLen: Int = 44
    private def ascii(s: String) =
      s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)

    final case class Audio(sampleRate: Int, samples: Array[Short])

    def encode(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
      require(sampleRate > 0, s"bad sample rate $sampleRate")
      val dataLen = samples.length * 2
      val buf = java.nio.ByteBuffer.allocate(HeaderLen + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put(ascii("RIFF")).putInt(36 + dataLen).put(ascii("WAVE"))
      buf.put(ascii("fmt ")).putInt(16)
        .putShort(1).putShort(1) // PCM, mono
        .putInt(sampleRate).putInt(sampleRate * 2) // byte rate
        .putShort(2).putShort(16) // block align, bits/sample
      buf.put(ascii("data")).putInt(dataLen)
      samples.foreach(buf.putShort)
      buf.array()
    }

    def decode(bytes: Array[Byte]): Audio = {
      require(bytes.length >= HeaderLen, s"truncated header: ${bytes.length} bytes")
      val buf = java.nio.ByteBuffer.wrap(bytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      def tag(at: Int, expect: String): Unit = {
        val t = new Array[Byte](4)
        buf.position(at); buf.get(t)
        require(java.util.Arrays.equals(t, ascii(expect)),
          s"bad chunk tag at $at: expected '$expect'")
      }
      tag(0, "RIFF"); tag(8, "WAVE"); tag(12, "fmt "); tag(36, "data")
      require(buf.getInt(16) == 16, "non-PCM fmt chunk size")
      require(buf.getShort(20) == 1, "not PCM")
      require(buf.getShort(22) == 1, "not mono")
      require(buf.getShort(34) == 16, "not 16-bit")
      val sampleRate = buf.getInt(24)
      require(sampleRate > 0, s"bad sample rate $sampleRate")
      require(buf.getInt(28) == sampleRate * 2, "byte rate mismatch")
      require(buf.getShort(32) == 2, "block align mismatch")
      val dataLen = buf.getInt(40)
      // long arithmetic mirror of the farbfeld guard: every length field
      // must agree with the actual byte count, or the parse throws
      require(dataLen >= 0 && dataLen % 2 == 0 &&
        dataLen.toLong + HeaderLen == bytes.length,
        s"truncated samples: ${bytes.length} bytes for dataLen $dataLen")
      require(buf.getInt(4).toLong == 36L + dataLen, "RIFF length mismatch")
      val samples = new Array[Short](dataLen / 2)
      buf.position(HeaderLen)
      var i = 0
      while (i < samples.length) { samples(i) = buf.getShort; i += 1 }
      Audio(sampleRate, samples)
    }
  }

  /** Decode + integrity stats for audio payloads: sample rate, sample
    * count, and the sum of absolute amplitudes — the all-integer checksum
    * that pins header fields AND the full sample payload to an arithmetic
    * oracle (the audio mm2).
    */
  def audioStats(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val audio = Wav.decode(bytes)
          var s = 0L
          var i = 0
          while (i < audio.samples.length) {
            s += math.abs(audio.samples(i).toLong); i += 1
          }
          (id, audio.sampleRate, audio.samples.length.toLong, s)
        }
      }
      .toDF("id", "sample_rate", "n_samples", "abs_sum")
  }

  /** Audio feature extraction (the audio analog of [[gridFeatures]]):
    * RMS amplitude over `nWindows` equal sample ranges, normalized to
    * [0, 1] — one row per (id, window), the fixed-shape descriptor a
    * downstream embedding/filter consumes. The sum of squares is exact
    * integer arithmetic; only the final mean/sqrt/normalize run in
    * doubles (IEEE-exact ops), so the features are engine-portable and
    * the `mm5` gate hash-checks them.
    */
  def audioFeatures(df: DataFrame, idCol: String, payloadCol: String,
                    nWindows: Int = 8): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          val audio = Wav.decode(bytes)
          val ns = audio.samples.length
          (0 until nWindows).map { j =>
            val lo = j * ns / nWindows
            val hi = (j + 1) * ns / nWindows
            val rms = if (hi > lo) {
              var ss = 0L
              var k = lo
              while (k < hi) {
                val s = audio.samples(k).toLong; ss += s * s; k += 1
              }
              math.sqrt(ss.toDouble / (hi - lo)) / 32768.0
            } else 0.0
            (id, j, rms)
          }
        }
      }
      .toDF("id", "win", "__rms")
      .select(col("id"), col("win"), round(col("__rms"), 6).as("rms"))
  }

  /** One decoded record: source dims + fixed-shape feature vector (what an
    * image decode yields post-resize).
    */
  case class DecodedMedia(id: Long, width: Int, height: Int,
                          features: Array[Float])

  val FeatureDim: Int = 16 // 4 channels × 2×2 spatial grid

  /** Feature kernel: nearest-neighbor resample to (targetW, targetH), then
    * per-channel mean over a 2×2 spatial grid, normalized to [0, 1] —
    * 16 floats. Deterministic pure function of the pixel data.
    */
  private[multimodal] def gridFeatures(img: Farbfeld.Image,
                                       targetW: Int, targetH: Int): Array[Float] = {
    val sums = new Array[Double](FeatureDim)
    val counts = new Array[Long](FeatureDim)
    if (img.width > 0 && img.height > 0) {
      var y = 0
      while (y < targetH) {
        val srcY = y * img.height / targetH
        val gy = if (y * 2 >= targetH) 1 else 0
        var x = 0
        while (x < targetW) {
          val srcX = x * img.width / targetW
          val gx = if (x * 2 >= targetW) 1 else 0
          val px = (srcY * img.width + srcX) * Farbfeld.Channels
          val cell = (gy * 2 + gx) * Farbfeld.Channels
          var c = 0
          while (c < Farbfeld.Channels) {
            sums(cell + c) += img.components(px + c) / 65535.0
            counts(cell + c) += 1
            c += 1
          }
          x += 1
        }
        y += 1
      }
    }
    Array.tabulate(FeatureDim)(i =>
      if (counts(i) == 0) 0.0f else (sums(i) / counts(i)).toFloat)
  }

  /** Decode + feature-extract, batched per partition (the mapPartitions
    * analog of a Pandas-UDF decode). Input: (id, payload) rows with real
    * farbfeld bytes; output: typed DecodedMedia carrying the SOURCE dims
    * and the resampled grid features. Codec state is partition-local,
    * exactly as a heavyweight decoder handle would be.
    */
  def decodeFeatures(df: DataFrame, idCol: String, payloadCol: String,
                     targetW: Int = 224, targetH: Int = 224): Dataset[DecodedMedia] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val img = Farbfeld.decode(bytes)
          DecodedMedia(id, img.width, img.height,
            gridFeatures(img, targetW, targetH))
        }
      }
  }

  /** Decode + integrity stats: source dims + the sum of every 16-bit
    * component — the pixel checksum that pins the parse (header fields AND
    * full pixel payload) to an arithmetic oracle.
    */
  def decodeStats(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val img = Farbfeld.decode(bytes)
          var s = 0L
          var i = 0
          while (i < img.components.length) { s += img.components(i); i += 1 }
          (id, img.width, img.height, s)
        }
      }
      .toDF("id", "width", "height", "px_sum")
  }

  /** Prime modulus of the positional image fingerprint (< 2^31, so the
    * fold's `h·31 + comp` stays far under 2^63).
    */
  val FingerprintP: Long = 2038074743L

  /** CLIP-style image-text PAIR dedup — the model-free shape: two
    * (text, image) training pairs are duplicates iff their canonical
    * text token sets match AND their decoded image fingerprints (source
    * dims + full 16-bit pixel checksum) match. The modality composition
    * a multimodal curation pipeline runs before training: text-only
    * dedup merges pairs whose captions repeat under DIFFERENT images
    * (alt-text spam) — the image fingerprint keeps those apart, and
    * vice versa.
    *
    * Plan shape for 100 TB: ONE fused mapPartitions pass decodes the
    * real payload bytes and carries the text signature alongside (no
    * join between the modalities — the pair row already holds both),
    * then a single joint-key groupBy (map-side combined). The signature
    * rides as the raw string for oracle parity; hash it (xxhash64) at
    * PB scale — the d9 staging convention. Emits one row per joint
    * group `(keep_doc_id, dup_count)`, min id kept, exact-dedup (d1)
    * semantics on the composite key.
    *
    * The image identity is a POSITIONAL polynomial fingerprint of the
    * component stream (`h := (h·31 + comp) mod P`, P prime < 2^31), not
    * the commutative pixel SUM `decodeStats` reports: a sum is an
    * integrity check, but as a dedup KEY it would merge distinct images
    * whose values merely permute or compensate. The fold is
    * order-sensitive, collides at ~1/P per pair, and stays exactly
    * expressible in oracle SQL (`list_reduce`).
    */
  def imageTextPairDedup(df: DataFrame, idCol: String, payloadCol: String,
                         text: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"),
        graft.dedup.Dedup.exactSignature(text, 1))
      .as[(Long, Array[Byte], String)]
      .mapPartitions { it =>
        it.map { case (id, bytes, sig) =>
          val img = Farbfeld.decode(bytes)
          var h = 0L
          var i = 0
          while (i < img.components.length) {
            h = (h * 31L + img.components(i)) % FingerprintP
            i += 1
          }
          (id, img.width, img.height, h, sig)
        }
      }
      .toDF("id", "width", "height", "px_fp", "__tsig")
      .groupBy(col("__tsig"), col("width"), col("height"), col("px_fp"))
      .agg(min(col("id")).as("keep_doc_id"), count(lit(1)).as("dup_count"))
      .select(col("keep_doc_id"), col("dup_count"))
  }

  /** ViT-style patch extraction: split each decoded image into a
    * ⌊h/p⌋ × ⌊w/p⌋ grid of p×p patches (edge remainders dropped — the
    * standard ViT contract) and emit one row per patch with the exact
    * component sum over its p·p·4 RGBA values. The 100 TB shape for
    * "image → token grid" preprocessing: one mapPartitions pass per
    * payload batch, output fan-out bounded by (w/p)·(h/p) per image,
    * no shuffle (downstream groupBys key on (id, patch) as needed).
    * The per-patch checksum makes the whole decode→tile path
    * SQL-oracle-gatable (mm7) without shipping raster blobs to the
    * oracle.
    */
  def extractPatches(df: DataFrame, idCol: String, payloadCol: String,
                     p: Int): DataFrame = {
    require(p >= 1, s"bad patch size $p")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          val img = Farbfeld.decode(bytes)
          val (w, h) = (img.width, img.height)
          for {
            py <- 0 until h / p
            px <- 0 until w / p
          } yield {
            var s = 0L
            var r = 0
            while (r < p) {
              var c = 0
              while (c < p) {
                val pix = (py * p + r) * w + (px * p + c)
                var ch = 0
                while (ch < Farbfeld.Channels) {
                  s += img.components(pix * Farbfeld.Channels + ch)
                  ch += 1
                }
                c += 1
              }
              r += 1
            }
            (id, py, px, s)
          }
        }
      }
      .toDF("id", "patch_row", "patch_col", "px_sum")
  }

  /** Nearest-neighbor resize of farbfeld payloads by a rational factor
    * `num/den` (dims floor-scaled, clamped to ≥1): for destination pixel
    * (x, y), the source pixel is (⌊x·w/nw⌋, ⌊y·h/nh⌋) — the standard
    * integer mapping, exact arithmetic end to end, so a resized raster's
    * checksum is SQL-expressible and the `mm6` gate pins the whole
    * decode → resize → re-encode path through [[decodeStats]] on the
    * OUTPUT payloads (the resize must produce bytes the verified decoder
    * round-trips). mapPartitions batched, like every codec op here — the
    * per-pixel loop is real image work, not expressible as Catalyst
    * columns.
    */
  def resizeNearest(df: DataFrame, idCol: String, payloadCol: String,
                    num: Int, den: Int): DataFrame = {
    require(num > 0 && den > 0, s"bad factor $num/$den")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val img = Farbfeld.decode(bytes)
          val nw = math.max(img.width * num / den, 1)
          val nh = math.max(img.height * num / den, 1)
          val out = Farbfeld.encode(nw, nh, (i, c) => {
            val sx = (i % nw) * img.width / nw
            val sy = (i / nw) * img.height / nh
            img.components((sy * img.width + sx) * Farbfeld.Channels + c)
          })
          (id, out)
        }
      }
      .toDF(idCol, payloadCol)
  }

  /** Center crop of farbfeld payloads to the rational fraction `num/den`
    * of each dimension (floor-scaled, clamped to ≥1), offset to the image
    * center with floor division — the standard vision-preprocessing
    * companion to [[resizeNearest]] (crop-then-resize is the canonical
    * training-input path). Exact integer arithmetic end to end, so the
    * cropped raster's checksum is SQL-expressible and the `mm8` gate pins
    * decode → crop → re-encode through [[decodeStats]] on the OUTPUT
    * payloads. mapPartitions batched like every codec op here.
    */
  def centerCrop(df: DataFrame, idCol: String, payloadCol: String,
                 num: Int, den: Int): DataFrame = {
    require(num > 0 && den > 0 && num <= den, s"bad crop fraction $num/$den")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val img = Farbfeld.decode(bytes)
          val cw = math.max(img.width * num / den, 1)
          val ch = math.max(img.height * num / den, 1)
          val ox = (img.width - cw) / 2
          val oy = (img.height - ch) / 2
          val out = Farbfeld.encode(cw, ch, (i, c) => {
            val sx = ox + i % cw
            val sy = oy + i / cw
            img.components((sy * img.width + sx) * Farbfeld.Channels + c)
          })
          (id, out)
        }
      }
      .toDF(idCol, payloadCol)
  }

  /** Frame sampling for video payloads: one output row per sampled frame,
    * preserving provenance (id, frame_idx). The sampler is a byte-window
    * chunker — a real, deterministic operation standing where a container
    * parser's keyframe iterator would plug in; the generator shape
    * (flatMap fan-out, distributed, bounded by payload size / stride) is
    * the production plumbing either way.
    */
  def sampleFrames(df: DataFrame, idCol: String, payloadCol: String,
                   stride: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          bytes.grouped(stride).zipWithIndex.map {
            case (frame, idx) => (id, idx, frame)
          }
        }
      }
      .toDF("id", "frame_idx", "frame_bytes")
  }
}

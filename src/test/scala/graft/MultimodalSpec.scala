package graft

import graft.multimodal.Multimodal
import graft.ops.TopK
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val media = Seq(
    (1L, "abcdef".getBytes("UTF-8")),
    (2L, Array.fill[Byte](200)(65)),
    (3L, Array.empty[Byte])
  ).toDF("id", "payload")

  test("withMediaMeta attaches content-addressed typed metadata") {
    val m = Multimodal.withMediaMeta(media, "payload", "image/png")
      .select("id", "media_meta.media_type", "media_meta.n_bytes", "media_meta.sha_hex")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(m == Set((1L, "image/png", 6L), (2L, "image/png", 200L), (3L, "image/png", 0L)))
  }

  test("Farbfeld encode/decode round-trips header and every component") {
    val img = Multimodal.Farbfeld.encode(3, 2, (i, c) => i * 1000 + c * 7)
    // 16-byte header + 3*2 px * 4 ch * 2 bytes
    assert(img.length == 16 + 3 * 2 * 4 * 2)
    assert(new String(img.take(8), "US-ASCII") == "farbfeld")
    val back = Multimodal.Farbfeld.decode(img)
    assert(back.width == 3 && back.height == 2)
    assert(back.components.toSeq ==
      (0 until 6).flatMap(i => (0 until 4).map(c => i * 1000 + c * 7)))
  }

  test("Farbfeld decode rejects malformed payloads instead of inventing pixels") {
    val good = Multimodal.Farbfeld.encode(2, 2, (_, _) => 5)
    intercept[IllegalArgumentException] {
      Multimodal.Farbfeld.decode("notmagic".getBytes ++ good.drop(8))
    }
    intercept[IllegalArgumentException] {
      Multimodal.Farbfeld.decode(good.dropRight(1)) // truncated pixel data
    }
    intercept[IllegalArgumentException] {
      Multimodal.Farbfeld.decode(Array[Byte](1, 2, 3)) // truncated header
    }
  }

  test("decodeFeatures parses real farbfeld bytes into grid-mean features") {
    // 2x2 image, one channel-0 value per quadrant: resampling to any even
    // target keeps each quadrant pure, so the grid means recover the
    // original pixels exactly (normalized /65535).
    val px = Array(1000, 2000, 3000, 4000) // TL TR BL BR, channel 0
    val payload = Multimodal.Farbfeld.encode(2, 2,
      (i, c) => if (c == 0) px(i) else 65535)
    val df = Seq((7L, payload)).toDF("id", "payload")
    val d = Multimodal.decodeFeatures(df, "id", "payload", 8, 8).collect().head
    assert(d.id == 7L && d.width == 2 && d.height == 2)
    assert(d.features.length == Multimodal.FeatureDim)
    // cell layout: (gy*2+gx)*4 + c
    val got = Seq(0, 1, 2, 3).map(cell => d.features(cell * 4))
    val want = Seq(1000, 2000, 3000, 4000).map(_ / 65535.0f)
    got.zip(want).foreach { case (g, w) => assert(math.abs(g - w) < 1e-6) }
    // alpha channel is constant 65535 -> normalized 1.0 in every cell
    assert((0 until 4).forall(cell => math.abs(d.features(cell * 4 + 3) - 1.0f) < 1e-6))
  }

  test("Farbfeld 0x0 image round-trips to zero features and zero checksum") {
    val img = Multimodal.Farbfeld.encode(0, 0, (_, _) => 99)
    assert(img.length == 16)
    val back = Multimodal.Farbfeld.decode(img)
    assert(back.width == 0 && back.height == 0 && back.components.isEmpty)
    val df = Seq((1L, img)).toDF("id", "payload")
    val d = Multimodal.decodeFeatures(df, "id", "payload", 4, 4).collect().head
    assert(d.features.forall(_ == 0.0f))
    val r = Multimodal.decodeStats(df, "id", "payload").collect().head
    assert((r.getInt(1), r.getInt(2), r.getLong(3)) == ((0, 0, 0L)))
  }

  test("decodeStats pixel checksum matches the arithmetic the oracle uses") {
    val id = 42L
    val w = (4 + id % 5).toInt
    val h = (3 + id % 4).toInt
    def comp(i: Int, c: Int): Int =
      ((id * 7919L + i.toLong * 31L + c.toLong * 101L) % 65536L).toInt
    val df = Seq((id, Multimodal.Farbfeld.encode(w, h, comp)))
      .toDF("id", "payload")
    val r = Multimodal.decodeStats(df, "id", "payload").collect().head
    val expected = (0 until w * h).flatMap(i => (0 until 4).map(comp(i, _)))
      .map(_.toLong).sum
    assert((r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)) ==
      ((id, w, h, expected)))
  }

  test("resizeNearest: hand-mapped pixels, clamp-to-1, decoder round-trip") {
    import graft.multimodal.Multimodal
    // 2x2 image with distinct per-pixel values: component c of pixel i = i*10+c
    val src = Multimodal.Farbfeld.encode(2, 2, (i, c) => i * 10 + c)
    val df = Seq((1L, src)).toDF("doc_id", "payload")
    val half = Multimodal.resizeNearest(df, "doc_id", "payload", 1, 2)
    val img = Multimodal.Farbfeld.decode(
      half.collect().head.getAs[Array[Byte]]("payload"))
    // 2x2 -> 1x1: dest (0,0) maps to source (0*2/1=0, 0*2/1=0) -> pixel 0
    assert(img.width == 1 && img.height == 1)
    assert(img.components.toSeq == Seq(0, 1, 2, 3))
    // 3x upscale of the 2x2: dest x of 0..5 maps to source x = x*2/6 etc.
    val up = Multimodal.resizeNearest(df, "doc_id", "payload", 3, 1)
    val imgUp = Multimodal.Farbfeld.decode(
      up.collect().head.getAs[Array[Byte]]("payload"))
    assert(imgUp.width == 6 && imgUp.height == 6)
    // corner checks: dest (0,0) -> src pixel 0; dest (5,5) -> src (1,1) = pixel 3
    assert(imgUp.components.slice(0, 4).toSeq == Seq(0, 1, 2, 3))
    assert(imgUp.components.slice((5 * 6 + 5) * 4, (5 * 6 + 5) * 4 + 4).toSeq ==
      Seq(30, 31, 32, 33))
  }

  test("centerCrop: hand-mapped offsets, identity at num=den, clamp-to-1") {
    import graft.multimodal.Multimodal
    // 4x3 image, component c of pixel i = i*10+c
    val src = Multimodal.Farbfeld.encode(4, 3, (i, c) => i * 10 + c)
    val df = Seq((1L, src)).toDF("doc_id", "payload")
    // half crop: cw=2, ch=1, ox=(4-2)/2=1, oy=(3-1)/2=1 -> pixels (1,1),(2,1)
    val half = Multimodal.centerCrop(df, "doc_id", "payload", 1, 2)
    val img = Multimodal.Farbfeld.decode(
      half.collect().head.getAs[Array[Byte]]("payload"))
    assert(img.width == 2 && img.height == 1)
    assert(img.components.toSeq ==
      Seq(50, 51, 52, 53, 60, 61, 62, 63)) // pixels 5 and 6 of the source
    // identity crop returns the full raster unchanged
    val same = Multimodal.centerCrop(df, "doc_id", "payload", 1, 1)
    assert(same.collect().head.getAs[Array[Byte]]("payload").toSeq == src.toSeq)
    // 1xN image crops clamp to >=1 in the degenerate dimension
    val thin = Multimodal.Farbfeld.encode(1, 3, (i, c) => i + c)
    val thinDf = Seq((2L, thin)).toDF("doc_id", "payload")
    val tc = Multimodal.Farbfeld.decode(
      Multimodal.centerCrop(thinDf, "doc_id", "payload", 1, 3)
        .collect().head.getAs[Array[Byte]]("payload"))
    assert(tc.width == 1 && tc.height == 1)
  }

  test("sampleFrames fans out one row per frame with provenance") {
    val f = Multimodal.sampleFrames(media, "id", "payload", stride = 64)
    val counts = f.groupBy("id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 6 bytes -> 1 frame; 200 bytes -> ceil(200/64)=4; empty -> 0
    assert(counts == Map(1L -> 1L, 2L -> 4L))
    val idx = f.filter($"id" === 2L).select("frame_idx").as[Int].collect().sorted
    assert(idx.toSeq == Seq(0, 1, 2, 3))
  }

  test("Wav codec round-trips and rejects malformed payloads") {
    val samples = Array.tabulate(37)(j => ((j * 1013) % 65536 - 32768).toShort)
    val bytes = Multimodal.Wav.encode(16000, samples)
    val back = Multimodal.Wav.decode(bytes)
    assert(back.sampleRate == 16000)
    assert(back.samples.toSeq == samples.toSeq)
    // zero-sample payload round-trips
    assert(Multimodal.Wav.decode(Multimodal.Wav.encode(8000,
      Array.empty[Short])).samples.isEmpty)
    // truncated samples
    intercept[IllegalArgumentException](Multimodal.Wav.decode(bytes.dropRight(2)))
    // bad magic
    val evil = bytes.clone(); evil(0) = 'X'.toByte
    intercept[IllegalArgumentException](Multimodal.Wav.decode(evil))
    // stereo rejected
    val stereo = bytes.clone(); stereo(22) = 2
    intercept[IllegalArgumentException](Multimodal.Wav.decode(stereo))
    // lying RIFF length rejected
    val lying = bytes.clone(); lying(4) = (lying(4) + 1).toByte
    intercept[IllegalArgumentException](Multimodal.Wav.decode(lying))
  }

  test("audioStats decodes real WAV bytes into the integer checksum") {
    val samples = Array[Short](100, -200, 300)
    val df = Seq((7L, Multimodal.Wav.encode(8000, samples))).toDF("id", "payload")
    val r = Multimodal.audioStats(df, "id", "payload").head()
    assert((r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)) ==
      ((7L, 8000, 3L, 600L)))
  }

  test("audioFeatures: constant signal gives constant RMS; silence gives zero") {
    val loud = Array.fill[Short](16)(16384)   // |s|/32768 = 0.5 everywhere
    val quiet = Array.fill[Short](16)(0)
    val df = Seq(
      (1L, Multimodal.Wav.encode(8000, loud)),
      (2L, Multimodal.Wav.encode(8000, quiet))).toDF("id", "payload")
    val r = Multimodal.audioFeatures(df, "id", "payload", nWindows = 4)
      .collect().map(x => (x.getLong(0), x.getInt(1), x.getDouble(2)))
    assert(r.length == 8)
    assert(r.filter(_._1 == 1L).forall(_._3 == 0.5))
    assert(r.filter(_._1 == 2L).forall(_._3 == 0.0))
  }

  test("imageTextPairDedup: joint key splits text dups with different images, merges full dups") {
    def img(seed: Int): Array[Byte] =
      Multimodal.Farbfeld.encode(2, 2, (i, c) => (seed * 31 + i * 7 + c) % 65536)
    val pairs = Seq(
      (1L, "a caption here", img(1)),  // full dup of 2 (text reordered:
      (2L, "caption a here", img(1)),  //   same token SET, same image)
      (3L, "a caption here", img(9)),  // same text, DIFFERENT image
      (4L, "unrelated words", img(1))  // same image, different text
    ).toDF("doc_id", "text", "payload")
    val got = Multimodal.imageTextPairDedup(pairs, "doc_id", "payload",
        col("text"))
      .orderBy("keep_doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    // {1,2} merge (joint dup); 3 survives (image differs); 4 survives
    // (text differs)
    assert(got == Seq((1L, 2L), (3L, 1L), (4L, 1L)), got.toString)
  }

  test("imageTextPairDedup: permuted images with equal component sums stay distinct") {
    // same dims, same component MULTISET (sum-equal), different order —
    // a commutative checksum would merge these; the positional
    // fingerprint must not
    val a = Multimodal.Farbfeld.encode(1, 2, (i, c) => if (i == 0) 10 else 20)
    val b = Multimodal.Farbfeld.encode(1, 2, (i, c) => if (i == 0) 20 else 10)
    val pairs = Seq(
      (1L, "same caption", a),
      (2L, "same caption", b)
    ).toDF("doc_id", "text", "payload")
    val got = Multimodal.imageTextPairDedup(pairs, "doc_id", "payload",
        col("text"))
      .orderBy("keep_doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 1L), (2L, 1L)), got.toString)
  }

  test("BoundedTopK aggregator keeps k best with deterministic tie-break") {
    val topk = udaf(new TopK.BoundedTopK(3))
    val df = Seq((5.0, 1L), (9.0, 2L), (9.0, 1L), (1.0, 3L), (7.0, 4L))
      .toDF("value", "id")
    val got = df.agg(topk(col("value"), col("id")).as("tk"))
      .select(explode(col("tk")).as("s"))
      .select("s.value", "s.id").as[(Double, Long)].collect()
    assert(got.toSeq == Seq((9.0, 1L), (9.0, 2L), (7.0, 4L)))
  }
}

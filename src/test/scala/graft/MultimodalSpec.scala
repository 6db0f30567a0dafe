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

  test("decodeFeatures emits fixed-shape vectors per payload (stub codec)") {
    val d = Multimodal.decodeFeatures(media, "id", "payload", 224, 224)
      .collect().sortBy(_.id)
    assert(d.map(_.id).toSeq == Seq(1L, 2L, 3L))
    assert(d.forall(_.features.length == Multimodal.StubCodec.FeatureDim))
    assert(d.forall(x => x.width == 224 && x.height == 224))
    // deterministic: byte 'a'=97 lands in slot 0
    assert(math.abs(d(0).features(0) - 97 / 255.0f) < 1e-6)
    assert(d(2).features.forall(_ == 0.0f)) // empty payload -> zero vector
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

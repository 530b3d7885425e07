package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Multimodal plumbing: schema, metadata pruning, batch decode boundary. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq((1L, "hello world"), (2L, "spark engine")).toDF("doc_id", "text")

  test("asMedia produces the canonical media schema with correct byte metadata") {
    val m = Multimodal.asMedia(docs, "doc_id", "text", "image")
    assert(m.schema.fieldNames.toSeq ==
      Seq("media_id", "modality", "payload", "mime", "byte_len", "content_hash"))
    val row = m.filter($"media_id" === 1L).head()
    assert(row.getAs[Long]("byte_len") == "hello world".getBytes("UTF-8").length)
    assert(row.getAs[String]("content_hash").length == 32)
  }

  test("decodeFeatures runs per-partition and emits the feature schema") {
    val out = Multimodal.decodeFeatures(Multimodal.asMedia(docs, "doc_id", "text", "image"))
    assert(out.schema == Multimodal.featureSchema)
    val feats = out.orderBy("media_id").collect()
    assert(feats.length == 2)
    assert(feats.head.getSeq[Float](feats.head.fieldIndex("feature")).length == 8)
  }

  test("sampleFrames explodes fixed-width windows, capped, last frame short") {
    val docs = Seq((1L, "a" * 150), (2L, "b" * 1000), (3L, "xy")).toDF("doc_id", "text")
    val frames = Multimodal.sampleFrames(
      Multimodal.asMedia(docs, "doc_id", "text", "video"), frameBytes = 64, maxFrames = 4)
      .orderBy("media_id", "frame_idx")
      .select("media_id", "frame_idx", "frame_len")
      .as[(Long, Long, Long)].collect().toSeq
    // 150 bytes -> frames of 64, 64, 22; 1000 bytes -> capped at 4 frames; 2 bytes -> 1 frame
    assert(frames == Seq(
      (1L, 0L, 64L), (1L, 1L, 64L), (1L, 2L, 22L),
      (2L, 0L, 64L), (2L, 1L, 64L), (2L, 2L, 64L), (2L, 3L, 64L),
      (3L, 0L, 2L)))
  }

  test("decode stub is deterministic: same payload, same feature") {
    val (f1, _, _) = MediaCodec.decodeStub("same bytes".getBytes)
    val (f2, _, _) = MediaCodec.decodeStub("same bytes".getBytes)
    assert(f1.toSeq == f2.toSeq)
    val (fEmpty, w, h) = MediaCodec.decodeStub(null)
    assert(fEmpty.isEmpty && w == 0 && h == 0)
  }
}

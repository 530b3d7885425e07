package graft.ops

import graft.SparkSpec
import java.nio.file.Files

/** Real binaryFile-source ingest -> real javax.imageio decode, end to end:
  * PNG fixtures written to disk come back with exact analytic channel
  * moments through the distributed media pipeline.
  */
class MultimodalIngestSpec extends SparkSpec {

  test("binaryFile ingest + PNG decode recovers exact channel means") {
    val dir = Files.createTempDirectory("graft_media")
    val specs = Seq((3L, 20, 17), (7L, 16, 16), (250L, 24, 18))
    specs.foreach { case (id, w, h) =>
      Files.write(dir.resolve(s"$id.png"), PngCodec.syntheticPng(id, w, h))
      ()
    }
    Files.writeString(dir.resolve("ignored.txt"), "not an image")

    val media = Multimodal.fromBinaryFiles(
      spark, dir.toString, "*.png", "image", "image/png")
    val rows = media.collect()
    assert(rows.length === 3) // glob filtered the .txt out
    assert(rows.forall(_.getAs[String]("modality") == "image"))
    assert(rows.map(_.getAs[Long]("media_id")).sorted.toSeq === Seq(3L, 7L, 250L))

    val moments = Multimodal.decodeImageMoments(media)
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getDouble(3))).toMap
    specs.foreach { case (id, w, h) =>
      val expMeanR = (0 until w).map(x => (id + x) % 256).sum.toDouble * h / (w * h)
      assert(moments(id) === ((w, h, expMeanR)), s"media $id")
    }
  }
}

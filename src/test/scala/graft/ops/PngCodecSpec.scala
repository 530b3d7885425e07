package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** Real javax.imageio PNG codec: lossless encode->decode roundtrip with
  * analytically-known channel moments.
  */
class PngCodecSpec extends AnyFunSuite {

  test("encode->decode recovers exact dimensions and channel sums") {
    val (id, w, h) = (7L, 20, 17)
    val png = PngCodec.syntheticPng(id, w, h)
    // PNG magic
    assert(png.take(4).map(_ & 0xff).toSeq === Seq(0x89, 0x50, 0x4e, 0x47))
    val (dw, dh, sr, sg, sb) = PngCodec.channelSums(png)
    assert((dw, dh) === ((w, h)))
    // analytic sums: r=(id+x)%256 summed over all pixels, etc. (no wrap at
    // these sizes: id + x + y <= 7+19+16 < 256)
    val expR = (0 until w).map(x => (id + x) % 256).sum * h
    val expG = (0 until h).map(y => (id + y) % 256).sum * w
    val expB = (for (x <- 0 until w; y <- 0 until h) yield (id + x + y) % 256).sum
    assert((sr, sg, sb) === ((expR, expG, expB)))
  }

  test("channel values wrap at 256 exactly like the oracle's modulo") {
    val png = PngCodec.syntheticPng(250L, 16, 16)
    val (_, _, sr, _, _) = PngCodec.channelSums(png)
    assert(sr === (0 until 16).map(x => (250L + x) % 256).sum * 16)
  }

  test("non-image payload fails loudly") {
    intercept[IllegalArgumentException](
      PngCodec.channelSums("not a png".getBytes("UTF-8")))
  }
}

package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.MediaCodec

/**
 * Totality fuzz for every media parser: the 100 TB contract is "corrupt
 * blobs are data, not exceptions", so every decode entry point must return
 * (Some/None/bytes) — never throw — on arbitrary bytes, magic-prefixed
 * garbage (reaches the format-specific walks), bit-flipped valid
 * containers, and truncations at every prefix length. Deterministic
 * generation (fixed seeds) keeps failures reproducible.
 */
class MediaFuzzSpec extends AnyFunSuite {

  private def parseAll(b: Array[Byte]): Unit = {
    MediaCodec.imageDims(b)
    MediaCodec.innerPayload(b)
    MediaCodec.pngPixels(b)
    MediaCodec.jpegPixels(b)
    MediaCodec.wavInfo(b)
    MediaCodec.wavSamples(b)
    MediaCodec.wavDataBytes(b)
    MediaCodec.y4mInfo(b)
    MediaCodec.y4mFrames(b)
    MediaCodec.inflate(b)
  }

  test("fuzz: every parser is total on random / magic-prefixed / mutated / truncated blobs") {
    val arrGen = Gen.chooseNum(0, 400)
      .flatMap(n => Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray))
    val magics = Seq[Array[Byte]](
      Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte),
      Array(0xff, 0xd8).map(_.toByte),
      "RIFF0000WAVEfmt ".getBytes("US-ASCII"),
      "YUV4MPEG2 ".getBytes("US-ASCII"))
    var parsed = 0

    // arbitrary bytes + the same bytes behind each container magic
    (0 until 300).foreach { i =>
      val raw = arrGen.pureApply(Gen.Parameters.default, Seed(7L + i))
      parseAll(raw); parsed += 1
      magics.foreach { m => parseAll(m ++ raw); parsed += 1 }
    }

    // bit-flipped and truncated VALID containers of all four formats
    val pixels = Array.tabulate(36)(i => (i * 7).toByte)
    val valid = Seq(
      MediaCodec.encodePng(pixels, 4, 3),
      MediaCodec.encodeJpeg("hello fuzz world".getBytes("US-ASCII"), 5, 4),
      MediaCodec.encodeJpegPixels(Array.tabulate(3 * 5 * 4)(i => (i * 11).toByte), 5, 4),
      MediaCodec.encodeWav(Array.tabulate[Short](50)(i => (i * 321).toShort), 16000),
      MediaCodec.encodeY4m(Array.tabulate(36)(i => i.toByte), 2, 2, 3))
    (0 until 100).foreach { i =>
      valid.foreach { v =>
        val b = v.clone()
        (0 to i % 4).foreach { j =>
          val idx = Gen.chooseNum(0, b.length - 1)
            .pureApply(Gen.Parameters.default, Seed(i * 131L + j))
          b(idx) = (b(idx) ^ (1 << (j % 8))).toByte
        }
        parseAll(b); parsed += 1
        parseAll(java.util.Arrays.copyOf(v, i % v.length)); parsed += 1
      }
    }
    assert(parsed > 2000)

    // untouched valid containers still decode after the fuzz pass (the
    // parsers hold no state)
    assert(MediaCodec.pngPixels(valid(0)).get.sameElements(pixels))
    assert(MediaCodec.jpegPixels(valid(2)).exists(_.length == 3 * 5 * 4))
    assert(MediaCodec.wavInfo(valid(3)).contains((16000, 50)))
    assert(MediaCodec.y4mInfo(valid(4)).contains((2, 2, 3)))
  }
}

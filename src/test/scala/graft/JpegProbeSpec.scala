package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.MediaCodec

/**
 * The real JPEG pixel codec (JDK baseline DCT via `javax.imageio`):
 * encode/decode determinism, SOF-parse roundtrip, raster-size exactness,
 * and the LUMA-error contract the `multimodal_jpeg_roundtrip` gate bounds.
 * Uniform noise is the worst case for DCT (no energy compaction) — the
 * measured max luma error there is ~21 at quality 0.9, so the gate's 48
 * bound holds with >2× margin while a garbage decode (uncorrelated
 * pixels) would blow far past it.
 */
class JpegProbeSpec extends AnyFunSuite {
  test("jpeg codec: deterministic roundtrip with bounded luma error on noise") {
    val rnd = new scala.util.Random(42)
    var maxErr = 0
    var maxLumaErr = 0.0
    var meanAcc = 0.0
    var n = 0L
    for (_ <- 0 until 200) {
      val w = rnd.nextInt(24) + 1
      val h = rnd.nextInt(8) + 1
      val rgb = Array.fill(3 * w * h)(rnd.nextInt(256).toByte)
      val enc = MediaCodec.encodeJpegPixels(rgb, w, h)
      val enc2 = MediaCodec.encodeJpegPixels(rgb, w, h)
      assert(java.util.Arrays.equals(enc, enc2), "encode nondeterministic")
      assert(MediaCodec.imageDims(enc) == Some(("jpeg", w, h)))
      val dec = MediaCodec.jpegPixels(enc).get
      val dec2 = MediaCodec.jpegPixels(enc).get
      assert(java.util.Arrays.equals(dec, dec2), "decode nondeterministic")
      assert(dec.length == 3 * w * h)
      var i = 0
      while (i < dec.length) {
        val e = math.abs((dec(i) & 0xff) - (rgb(i) & 0xff))
        if (e > maxErr) maxErr = e
        meanAcc += e; n += 1; i += 1
      }
      def luma(a: Array[Byte], p: Int): Double =
        0.299 * (a(3 * p) & 0xff) + 0.587 * (a(3 * p + 1) & 0xff) + 0.114 * (a(3 * p + 2) & 0xff)
      var p = 0
      while (p < w * h) {
        val e = math.abs(luma(dec, p) - luma(rgb, p))
        if (e > maxLumaErr) maxLumaErr = e
        p += 1
      }
    }
    info(s"maxErr=$maxErr meanErr=${meanAcc / n} maxLumaErr=$maxLumaErr")
    // the gate's contract: luma survives DCT; per-channel error does not
    // (chroma subsampling) — so the gate bounds luma, and this spec pins
    // that the bound has real margin on the hardest input
    assert(maxLumaErr <= 48.0)
  }

  test("jpeg codec: hostile dims and foreign bytes are data, not exceptions") {
    // a declared-huge SOF must be refused before any raster allocation
    val huge = MediaCodec.encodeJpeg(Array.emptyByteArray, 65535, 65535)
    assert(MediaCodec.jpegPixels(huge).isEmpty)
    // structurally valid JPEG container with no scan data decodes to None
    val noScan = MediaCodec.encodeJpeg("just a comment".getBytes("US-ASCII"), 4, 3)
    assert(MediaCodec.jpegPixels(noScan).isEmpty)
    assert(MediaCodec.jpegPixels("not a jpeg".getBytes("US-ASCII")).isEmpty)
    assert(MediaCodec.jpegPixels(Array[Byte](0xff.toByte, 0xd8.toByte)).isEmpty)
  }
}

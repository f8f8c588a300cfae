package graft.operators

import java.io.ByteArrayOutputStream
import java.util.zip.CRC32

/**
 * Real PNG / JPEG CONTAINER codec for the multimodal pipeline — header
 * parsing on the read side, structurally-valid container writing on the
 * fixture side. Both formats are public specifications: PNG (RFC 2083 /
 * ISO 15948 — 8-byte signature, length-type-data-CRC chunks, IHDR carries
 * width/height as big-endian u32 at data offsets 0/4) and JPEG/JFIF
 * (ISO 10918 / ITU T.81 — FF-marker segments with big-endian u16 lengths;
 * SOF0/SOF2 carry height/width as big-endian u16 at payload offsets 1/3).
 *
 * The container layer is REAL: `imageDims` walks actual chunk/marker
 * structure (skipping APP0/COM and any other variable-length segment to
 * find SOF — the part a fixed-offset peek gets wrong), and the writers
 * emit spec-correct signatures, lengths and CRC32s. Only the PIXEL codec
 * (inflate/DCT) stays behind the declared [[Multimodal.FakeDecoder]] stub —
 * the container's embedded data is carried verbatim in IDAT (PNG) / COM
 * segments (JPEG), which keeps every byte of the artifact deterministic
 * and lets the DuckDB oracle replay features from the inner payload while
 * the dims replay from the generator's width/height formulas (an
 * encode→parse roundtrip gate).
 *
 * Parsing never throws on foreign bytes: anything that is not a
 * recognizable PNG/JPEG container yields `None` (SQL null) — corrupt blobs
 * are data, not exceptions, at 100 TB.
 */
object MediaCodec {

  private val PngSig: Array[Byte] =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** Max COM-segment payload per JPEG segment (u16 length field covers
    * payload + 2; 60000 leaves headroom) — longer inner payloads split
    * across consecutive COM segments. */
  private val MaxComData = 60000

  private def beInt(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  private def beShort(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)

  private def isPng(b: Array[Byte]): Boolean =
    b.length >= 24 && java.util.Arrays.equals(
      java.util.Arrays.copyOfRange(b, 0, 8), PngSig)

  private def isJpeg(b: Array[Byte]): Boolean =
    b.length >= 4 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8

  // ------------------------------------------------------------------ parse

  /** `(format, width, height)` parsed from real container bytes; `None` if
    * the blob is neither a parseable PNG nor JPEG. */
  def imageDims(b: Array[Byte]): Option[(String, Int, Int)] =
    if (b == null) None
    else if (isPng(b)) {
      // first chunk MUST be IHDR (spec): length at 8, type "IHDR" at 12,
      // width/height big-endian at 16/20
      if (b.length >= 24 && beInt(b, 8) >= 13 &&
        b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')
        Some(("png", beInt(b, 16), beInt(b, 20)))
      else None
    } else if (isJpeg(b)) {
      // marker scan: skip every variable-length segment until a SOF frame
      // header (C0..CF minus DHT C4 / JPG C8 / DAC CC); height/width are
      // big-endian u16 at payload offsets 1/3
      var i = 2
      while (i + 3 < b.length && (b(i) & 0xff) == 0xff) {
        val m = b(i + 1) & 0xff
        if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc) {
          if (i + 8 < b.length) return Some(("jpeg", beShort(b, i + 7), beShort(b, i + 5)))
          else return None
        }
        if (m == 0xd8 || (m >= 0xd0 && m <= 0xd7) || m == 0x01) i += 2
        else if (m == 0xd9) return None // EOI before any SOF
        else i += 2 + beShort(b, i + 2) // segment length covers its payload
      }
      None
    } else None

  /** The embedded data bytes: PNG → concatenated IDAT chunk data, JPEG →
    * concatenated COM segment data, anything else → the input itself (raw
    * payloads stay a valid identity pass-through). */
  def innerPayload(b: Array[Byte]): Array[Byte] =
    if (b == null) null
    else if (isPng(b)) {
      val out = new ByteArrayOutputStream()
      var i = 8
      while (i + 8 <= b.length) {
        val len = beInt(b, i)
        val t = new String(b, i + 4, 4, "US-ASCII")
        if (t == "IDAT" && i + 8 + len <= b.length) out.write(b, i + 8, len)
        i += 12 + len // length + type + data + crc
      }
      out.toByteArray
    } else if (isJpeg(b)) {
      val out = new ByteArrayOutputStream()
      var i = 2
      var done = false
      while (!done && i + 3 < b.length && (b(i) & 0xff) == 0xff) {
        val m = b(i + 1) & 0xff
        if (m == 0xd9) done = true
        else if (m == 0xd8 || (m >= 0xd0 && m <= 0xd7) || m == 0x01) i += 2
        else {
          val len = beShort(b, i + 2)
          if (m == 0xfe && i + 2 + len <= b.length) out.write(b, i + 4, len - 2)
          i += 2 + len
        }
      }
      out.toByteArray
    } else b

  // ----------------------------------------------------------------- encode

  private def writeBe32(out: ByteArrayOutputStream, v: Int): Unit = {
    out.write((v >>> 24) & 0xff); out.write((v >>> 16) & 0xff)
    out.write((v >>> 8) & 0xff); out.write(v & 0xff)
  }
  private def writeBe16(out: ByteArrayOutputStream, v: Int): Unit = {
    out.write((v >>> 8) & 0xff); out.write(v & 0xff)
  }

  private def pngChunk(out: ByteArrayOutputStream, chunkType: String,
                       data: Array[Byte]): Unit = {
    writeBe32(out, data.length)
    val t = chunkType.getBytes("US-ASCII")
    out.write(t, 0, 4)
    out.write(data, 0, data.length)
    val crc = new CRC32()
    crc.update(t); crc.update(data)
    writeBe32(out, crc.getValue.toInt)
  }

  /** Spec-correct PNG container (signature, IHDR with real dims + CRCs,
    * one IDAT carrying `inner` verbatim, IEND). The IDAT content is NOT
    * zlib — pixel decode is the declared stub — but every header byte,
    * length and CRC is real PNG structure. Fixed overhead: 57 bytes. */
  def encodePng(inner: Array[Byte], width: Int, height: Int): Array[Byte] = {
    val out = new ByteArrayOutputStream(inner.length + 64)
    out.write(PngSig, 0, 8)
    val ihdr = new ByteArrayOutputStream(13)
    writeBe32(ihdr, width); writeBe32(ihdr, height)
    ihdr.write(8)  // bit depth
    ihdr.write(2)  // color type: truecolor
    ihdr.write(0); ihdr.write(0); ihdr.write(0) // compression, filter, interlace
    pngChunk(out, "IHDR", ihdr.toByteArray)
    pngChunk(out, "IDAT", inner)
    pngChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Spec-correct JPEG/JFIF container: SOI, APP0 (JFIF 1.1), `inner` split
    * across COM segments (≤ [[MaxComData]] each, at least one), a baseline
    * SOF0 frame header with real dims, EOI. A parser must SCAN markers to
    * find SOF — the COM segments sit in front of it deliberately.
    * Overhead: 41 + 4 × numComSegments bytes. */
  def encodeJpeg(inner: Array[Byte], width: Int, height: Int): Array[Byte] = {
    val out = new ByteArrayOutputStream(inner.length + 64)
    out.write(0xff); out.write(0xd8) // SOI
    out.write(0xff); out.write(0xe0) // APP0
    writeBe16(out, 16)
    out.write("JFIF".getBytes("US-ASCII"), 0, 4); out.write(0)
    out.write(1); out.write(1) // version 1.1
    out.write(0)               // density units
    writeBe16(out, 1); writeBe16(out, 1) // x/y density
    out.write(0); out.write(0)           // thumbnail
    val nSeg = math.max(1, (inner.length + MaxComData - 1) / MaxComData)
    (0 until nSeg).foreach { s =>
      val from = s * MaxComData
      val len = math.min(MaxComData, inner.length - from)
      out.write(0xff); out.write(0xfe) // COM
      writeBe16(out, len + 2)
      out.write(inner, from, len)
    }
    out.write(0xff); out.write(0xc0) // SOF0
    writeBe16(out, 17)
    out.write(8) // precision
    writeBe16(out, height); writeBe16(out, width)
    out.write(3) // components
    Seq((1, 0x22, 0), (2, 0x11, 1), (3, 0x11, 1)).foreach { case (id, samp, q) =>
      out.write(id); out.write(samp); out.write(q)
    }
    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }
}

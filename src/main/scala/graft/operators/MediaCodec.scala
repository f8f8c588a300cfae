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
 * emit spec-correct signatures, lengths and CRC32s. The PNG PIXEL path is
 * real too: IDAT carries genuine zlib-wrapped scanlines ([[zlibStore]] —
 * deterministic stored-block deflate) and [[pngPixels]] decodes them with
 * the real [[java.util.zip.Inflater]] plus a full five-filter defilter.
 * The JPEG PIXEL path is real as well: [[encodeJpegPixels]] /
 * [[jpegPixels]] run the JDK's built-in baseline-DCT codec
 * (`javax.imageio.ImageIO` — ISO 10918 sequential DCT, no external
 * dependency). DCT output is not SQL arithmetic, so the JPEG gates pin the
 * roundtrip differently: parsed dims and decoded raster size replay
 * exactly in DuckDB, reconstruction error against the source pixels is
 * bounded (lossy-but-bounded is the DCT contract), and the decoded-pixel
 * checksum rides a rows-only companion. Every byte of the PNG/WAV/Y4M
 * writers is deterministic, so the DuckDB oracle replays features from the
 * decoded payload and dims from the generator's width/height formulas (an
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
      var ok = true
      while (ok && i + 8 <= b.length) {
        val len = beInt(b, i)
        // a negative length (high bit set) or one past the buffer is a
        // corrupt chunk: stop walking — corrupt blobs are data, not loops
        if (len < 0 || len > b.length - i - 12) ok = false
        else {
          val t = new String(b, i + 4, 4, "US-ASCII")
          if (t == "IDAT") out.write(b, i + 8, len)
          i += 12 + len // length + type + data + crc
        }
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
          // u16 segment length covers itself, so < 2 is malformed
          if (m == 0xfe && len >= 2 && i + 2 + len <= b.length)
            out.write(b, i + 4, len - 2)
          i += 2 + len
        }
      }
      out.toByteArray
    } else b

  // -------------------------------------------------------------------- wav

  private def leShort(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  private def leInt(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  private def isWav(b: Array[Byte]): Boolean =
    b.length >= 44 &&
      b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'

  /** Walk the RIFF chunks of a WAV blob to `(sampleRate, nSamples)` for
    * PCM-16 mono audio — real chunk traversal (fmt/data may sit anywhere
    * after the RIFF header, lengths are little-endian and byte-guarded), so
    * a fixed-offset peek is deliberately not what this does. `None` for
    * foreign bytes, non-PCM16-mono encodings, or corrupt lengths. */
  def wavInfo(b: Array[Byte]): Option[(Int, Int)] =
    if (b == null || !isWav(b)) None
    else {
      var i = 12
      var rate = -1
      var nSamples = -1
      while (i + 8 <= b.length && (rate < 0 || nSamples < 0)) {
        val id = new String(b, i, 4, "US-ASCII")
        val len = leInt(b, i + 4)
        if (len < 0 || len > b.length - i - 8) return None // corrupt length
        if (id == "fmt ") {
          // PCM (audioFormat=1), mono, 16-bit only — everything else is
          // foreign data to this engine (None, not an exception)
          if (len < 16 || leShort(b, i + 8) != 1 || leShort(b, i + 10) != 1 ||
            leShort(b, i + 22) != 16) return None
          rate = leInt(b, i + 12)
        } else if (id == "data") {
          nSamples = len / 2
        }
        i += 8 + len + (len & 1) // RIFF chunks are word-aligned
      }
      if (rate > 0 && nSamples >= 0) Some((rate, nSamples)) else None
    }

  /** The decoded PCM-16 samples of a [[wavInfo]]-valid WAV blob (data-chunk
    * little-endian int16s); `None` on anything else. */
  def wavSamples(b: Array[Byte]): Option[Array[Short]] =
    wavInfo(b).flatMap { case (_, n) =>
      var i = 12
      while (i + 8 <= b.length) {
        val id = new String(b, i, 4, "US-ASCII")
        val len = leInt(b, i + 4)
        if (id == "data") {
          val out = new Array[Short](n)
          var k = 0
          while (k < n) { out(k) = leShort(b, i + 8 + 2 * k).toShort; k += 1 }
          return Some(out)
        }
        i += 8 + len + (len & 1)
      }
      None
    }

  /** The data-chunk BYTES of a WAV blob (the LE byte stream the feature
    * kernel consumes); `None` for non-WAV/corrupt input. */
  def wavDataBytes(b: Array[Byte]): Option[Array[Byte]] =
    wavInfo(b).flatMap { case (_, n) =>
      var i = 12
      while (i + 8 <= b.length) {
        val id = new String(b, i, 4, "US-ASCII")
        val len = leInt(b, i + 4)
        if (id == "data") return Some(java.util.Arrays.copyOfRange(b, i + 8, i + 8 + 2 * n))
        i += 8 + len + (len & 1)
      }
      None
    }

  /** Spec-correct PCM-16 mono WAV container (RIFF/WAVE, canonical 16-byte
    * fmt chunk, one data chunk). Fixed overhead: 44 bytes + the 2·n sample
    * bytes — byte-exact, formula-computable (the oracle replays sizes). */
  def encodeWav(samples: Array[Short], sampleRate: Int): Array[Byte] = {
    require(sampleRate > 0, s"encodeWav: bad sample rate $sampleRate")
    val dataLen = 2 * samples.length
    val out = new ByteArrayOutputStream(44 + dataLen)
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >>> 8) & 0xff) }
    def le32(v: Int): Unit = { le16(v & 0xffff); le16((v >>> 16) & 0xffff) }
    out.write("RIFF".getBytes("US-ASCII"), 0, 4)
    le32(36 + dataLen) // riff payload size
    out.write("WAVE".getBytes("US-ASCII"), 0, 4)
    out.write("fmt ".getBytes("US-ASCII"), 0, 4)
    le32(16)           // canonical PCM fmt chunk
    le16(1)            // audioFormat = PCM
    le16(1)            // mono
    le32(sampleRate)
    le32(sampleRate * 2) // byte rate = rate · block align
    le16(2)            // block align (mono 16-bit)
    le16(16)           // bits per sample
    out.write("data".getBytes("US-ASCII"), 0, 4)
    le32(dataLen)
    samples.foreach(s => le16(s & 0xffff))
    out.toByteArray
  }

  // --------------------------------------------------------------------- y4m

  private val Y4mMagic = "YUV4MPEG2 ".getBytes("US-ASCII")

  /**
   * Spec-correct YUV4MPEG2 (Y4M) container — the public uncompressed video
   * interchange format (mjpegtools): ASCII stream header
   * `YUV4MPEG2 W<w> H<h> F25:1 Ip A1:1 C444\n` followed by `nFrames` blocks
   * of `FRAME\n` + `3·w·h` C444 plane bytes. Byte-exact, formula-computable
   * size: `33 + digits(w) + digits(h) + nFrames·(6 + 3wh)`.
   */
  def encodeY4m(frameData: Array[Byte], width: Int, height: Int, nFrames: Int): Array[Byte] = {
    require(width > 0 && height > 0, s"encodeY4m: bad dims ${width}x$height")
    val fsz = 3 * width * height
    require(frameData.length == nFrames * fsz,
      s"encodeY4m: ${frameData.length} bytes for $nFrames ${width}x$height frames")
    val header = s"YUV4MPEG2 W$width H$height F25:1 Ip A1:1 C444\n".getBytes("US-ASCII")
    val out = new ByteArrayOutputStream(header.length + nFrames * (6 + fsz))
    out.write(header, 0, header.length)
    val fm = "FRAME\n".getBytes("US-ASCII")
    var f = 0
    while (f < nFrames) {
      out.write(fm, 0, 6)
      out.write(frameData, f * fsz, fsz)
      f += 1
    }
    out.toByteArray
  }

  /** Parse `(width, height, nFrames)` from a Y4M blob — real header-token
    * parse plus a full frame-block walk (every block must carry the FRAME
    * marker and a complete `3wh` payload, so a truncated stream is caught,
    * not guessed from a size division). `None` for foreign bytes, a
    * colourspace other than the C444 this engine writes, or malformed
    * structure — corrupt blobs are data. Bare `FRAME` markers only (the
    * writer's subset; per-frame params are out of scope). */
  def y4mInfo(b: Array[Byte]): Option[(Int, Int, Int)] = {
    if (b == null || b.length < Y4mMagic.length + 1) return None
    var i = 0
    while (i < Y4mMagic.length) {
      if (b(i) != Y4mMagic(i)) return None
      i += 1
    }
    val nl = b.indexOf('\n'.toByte)
    if (nl < 0) return None
    val toks = new String(b, 0, nl, "US-ASCII").split(' ')
    var w = -1; var h = -1; var c444 = false
    toks.iterator.drop(1).foreach { t =>
      if (t.startsWith("W")) w = t.drop(1).toIntOption.getOrElse(-1)
      else if (t.startsWith("H")) h = t.drop(1).toIntOption.getOrElse(-1)
      else if (t.startsWith("C")) c444 = t == "C444"
    }
    if (w <= 0 || h <= 0 || !c444) return None
    // hostile dims (e.g. W2000000000 H2000000000) overflow 3wh even in
    // Long — bound by the structural limit first (a frame must fit a byte
    // array), then the per-block Long check below catches the rest; an
    // unguarded overflow walks the loop backwards (hung executor task)
    val whL = w.toLong * h
    if (whL > Int.MaxValue / 3) return None
    val fszL = 3L * whL
    var pos = nl + 1
    var n = 0
    while (pos < b.length) {
      if (pos + 6 > b.length || b(pos) != 'F' || b(pos + 1) != 'R' ||
        b(pos + 2) != 'A' || b(pos + 3) != 'M' || b(pos + 4) != 'E' ||
        b(pos + 5) != '\n') return None
      if (pos + 6L + fszL > b.length) return None
      pos += 6 + fszL.toInt // fits: pos + 6 + fszL ≤ b.length ≤ Int.MaxValue
      n += 1
    }
    Some((w, h, n))
  }

  /** The concatenated frame payloads (`nFrames · 3wh` bytes) of a
    * [[y4mInfo]]-valid blob; `None` otherwise. */
  def y4mFrames(b: Array[Byte]): Option[Array[Byte]] =
    y4mInfo(b).map { case (w, h, n) =>
      val fsz = 3 * w * h
      val nl = b.indexOf('\n'.toByte)
      val out = new Array[Byte](n * fsz)
      var pos = nl + 1
      var f = 0
      while (f < n) {
        System.arraycopy(b, pos + 6, out, f * fsz, fsz)
        pos += 6 + fsz
        f += 1
      }
      out
    }

  // ------------------------------------------------------------------- zlib

  /**
   * Deterministic zlib container (RFC 1950) around STORED deflate blocks
   * (RFC 1951 `btype=00`) — a REAL zlib stream any inflater accepts, with a
   * byte-exact formula-computable length:
   * `2 + 5·max(1, ceil(len/65535)) + len + 4` (header + per-block 5-byte
   * stored header + data + Adler-32). Compression isn't the point here —
   * determinism is (the DuckDB oracle replays container sizes byte-exactly);
   * the read side runs the real [[java.util.zip.Inflater]] either way, so
   * swapping in compressed deflate changes nothing downstream.
   */
  def zlibStore(data: Array[Byte]): Array[Byte] = {
    val nBlocks = math.max(1, (data.length + 65534) / 65535)
    val out = new ByteArrayOutputStream(data.length + 6 + 5 * nBlocks)
    out.write(0x78); out.write(0x01) // CMF/FLG: deflate/32K window, FCHECK ok
    var off = 0
    var blk = 0
    while (blk < nBlocks) {
      val len = math.min(65535, data.length - off)
      out.write(if (blk == nBlocks - 1) 1 else 0) // BFINAL on the last block
      out.write(len & 0xff); out.write((len >>> 8) & 0xff)       // LEN (LE)
      out.write((~len) & 0xff); out.write(((~len) >>> 8) & 0xff) // NLEN
      out.write(data, off, len)
      off += len; blk += 1
    }
    val ad = new java.util.zip.Adler32()
    ad.update(data)
    writeBe32(out, ad.getValue.toInt)
    out.toByteArray
  }

  /** Real zlib inflate via [[java.util.zip.Inflater]]; `None` on any
    * corrupt or truncated stream, and a hard output cap (`maxLen`) so a
    * hostile ratio bomb can't balloon an executor at corpus scale —
    * corrupt blobs are data, not exceptions. */
  def inflate(b: Array[Byte], maxLen: Int = 1 << 26): Option[Array[Byte]] = {
    if (b == null || b.length < 6) return None
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(b)
      // clamp BEFORE doubling: b.length * 2 overflows Int past ~1 GiB and a
      // negative capacity throws IllegalArgumentException past the
      // DataFormatException catch — breaking the never-throws contract
      val out = new ByteArrayOutputStream(math.max(64, math.min(b.length, 1 << 15)) * 2)
      val buf = new Array[Byte](8192)
      while (!inf.finished()) {
        val n = inf.inflate(buf)
        if (n == 0 && (inf.needsInput() || inf.needsDictionary())) return None
        out.write(buf, 0, n)
        if (out.size > maxLen) return None
      }
      Some(out.toByteArray)
    } catch {
      case _: java.util.zip.DataFormatException => None
    } finally inf.end()
  }

  /**
   * Decode a PNG's PIXEL bytes — the real pixel path: concatenated IDAT →
   * [[inflate]] (real Inflater) → scanline defilter (all five RFC 2083 §6
   * filter types, bpp = 3 truecolor) → `3·w·h` RGB bytes. `None` if the
   * blob isn't a PNG, the zlib stream is corrupt, the decompressed length
   * disagrees with the IHDR geometry, or a row carries an unknown filter
   * type — never an exception.
   */
  def pngPixels(b: Array[Byte]): Option[Array[Byte]] = imageDims(b) match {
    // geometry guard in overflow-safe arithmetic: the raw scanline stream
    // h·(1+3w) must fit a byte array (w·h alone can overflow 3L·w·h)
    case Some(("png", w, h)) if w > 0 && h > 0 &&
        w.toLong * h <= (Int.MaxValue.toLong - h) / 3 =>
      inflate(innerPayload(b)).flatMap { raw =>
        val rowBytes = 3 * w
        val stride = 1 + rowBytes
        if (raw.length.toLong != h.toLong * stride) None
        else {
          val bpp = 3
          val out = new Array[Byte](rowBytes * h)
          var y = 0
          var ok = true
          while (ok && y < h) {
            val ft = raw(y * stride) & 0xff
            val rowIn = y * stride + 1
            val rowOut = y * rowBytes
            var x = 0
            while (ok && x < rowBytes) {
              val rv = raw(rowIn + x) & 0xff
              val a = if (x >= bpp) out(rowOut + x - bpp) & 0xff else 0
              val up = if (y > 0) out(rowOut - rowBytes + x) & 0xff else 0
              val ul = if (y > 0 && x >= bpp) out(rowOut - rowBytes + x - bpp) & 0xff else 0
              val v = ft match {
                case 0 => rv
                case 1 => rv + a
                case 2 => rv + up
                case 3 => rv + ((a + up) >> 1)
                case 4 => rv + paeth(a, up, ul)
                case _ => ok = false; 0
              }
              out(rowOut + x) = (v & 0xff).toByte
              x += 1
            }
            y += 1
          }
          if (ok) Some(out) else None
        }
      }
    case _ => None
  }

  /** RFC 2083 §6.6 Paeth predictor. */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

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

  /**
   * Spec-correct PNG (signature, IHDR with real dims + CRCs, IDAT, IEND)
   * carrying REAL pixel data: `pixels` must be exactly `3·width·height` RGB
   * bytes, serialized as genuine scanlines (one filter byte + `3·width`
   * sample bytes per row — filter type 0, the identity; [[pngPixels]]
   * defilters all five types on read) and zlib-wrapped by [[zlibStore]], so
   * any standards-compliant PNG reader inflates and reconstructs the exact
   * pixel array. Container overhead over the raw scanline stream
   * (`height·(1+3·width)` bytes): 57 bytes of chunk structure + the
   * [[zlibStore]] formula.
   */
  def encodePng(pixels: Array[Byte], width: Int, height: Int): Array[Byte] = {
    require(pixels.length == 3 * width * height,
      s"encodePng: ${pixels.length} pixel bytes for ${width}x$height (need ${3 * width * height})")
    val rowBytes = 3 * width
    val raw = new Array[Byte](height * (1 + rowBytes))
    var y = 0
    while (y < height) {
      // raw(y * (1 + rowBytes)) stays 0: filter type None
      System.arraycopy(pixels, y * rowBytes, raw, y * (1 + rowBytes) + 1, rowBytes)
      y += 1
    }
    val out = new ByteArrayOutputStream(raw.length + 80)
    out.write(PngSig, 0, 8)
    val ihdr = new ByteArrayOutputStream(13)
    writeBe32(ihdr, width); writeBe32(ihdr, height)
    ihdr.write(8)  // bit depth
    ihdr.write(2)  // color type: truecolor
    ihdr.write(0); ihdr.write(0); ihdr.write(0) // compression, filter, interlace
    pngChunk(out, "IHDR", ihdr.toByteArray)
    pngChunk(out, "IDAT", zlibStore(raw))
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

  // --------------------------------------------------- JPEG pixels (ImageIO)

  // keep ImageIO memory-only: the default disk-backed stream cache would
  // write temp files from every executor task
  javax.imageio.ImageIO.setUseCache(false)

  /** Decoded-raster sanity bound for [[jpegPixels]]: a corrupt or
    * adversarial SOF header can declare up to 65535×65535 (12 GB of
    * raster) — refuse anything over ~4M pixels BEFORE ImageIO allocates. */
  private val MaxJpegPixels = 1 << 22

  /** Real baseline-JPEG encode of a row-major RGB pixel array via the JDK's
    * `javax.imageio` writer at a FIXED explicit quality (0.9) — fully
    * deterministic for a given input on a given JDK, which is the same
    * reproducibility contract the rest of the fixture relies on. */
  def encodeJpegPixels(rgb: Array[Byte], width: Int, height: Int): Array[Byte] = {
    require(width > 0 && height > 0 && rgb.length >= 3 * width * height,
      s"encodeJpegPixels: need 3*$width*$height bytes, got ${rgb.length}")
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val i = (y * width + x) * 3
        img.setRGB(x, y,
          ((rgb(i) & 0xff) << 16) | ((rgb(i + 1) & 0xff) << 8) | (rgb(i + 2) & 0xff))
        x += 1
      }
      y += 1
    }
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val param = writer.getDefaultWriteParam
    param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionQuality(0.9f)
    val bos = new ByteArrayOutputStream(3 * width * height / 2 + 1024)
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
      ios.flush()
    } finally {
      writer.dispose()
      ios.close()
    }
    bos.toByteArray
  }

  /** Real baseline-JPEG pixel decode via the JDK's `javax.imageio` reader:
    * row-major RGB bytes (3·w·h). `None` for anything that does not parse
    * as a JPEG with sane dims or fails to decode — corrupt blobs are data,
    * not exceptions (same totality contract as [[pngPixels]], fuzz-pinned).
    * Dims are bounded via the [[imageDims]] marker walk BEFORE ImageIO
    * touches the stream, so an adversarial SOF cannot force a huge raster
    * allocation. */
  def jpegPixels(b: Array[Byte]): Option[Array[Byte]] =
    imageDims(b) match {
      case Some(("jpeg", w, h))
          if w > 0 && h > 0 && w.toLong * h <= MaxJpegPixels =>
        try {
          val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
          if (img == null || img.getWidth != w || img.getHeight != h) None
          else {
            val out = new Array[Byte](3 * w * h)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val p = img.getRGB(x, y)
                val i = (y * w + x) * 3
                out(i) = ((p >> 16) & 0xff).toByte
                out(i + 1) = ((p >> 8) & 0xff).toByte
                out(i + 2) = (p & 0xff).toByte
                x += 1
              }
              y += 1
            }
            Some(out)
          }
        } catch { case _: Exception => None }
      case _ => None
    }
}

package graft

import graft.operators.Multimodal
import graft.sources.Tables

class MultimodalSpec extends SparkSpec {

  test("media pipeline: binary payloads → deterministic features per partition") {
    val media = Multimodal.syntheticMedia(Tables.documents(spark, Sf))
    val feats = Multimodal.extractFeatures(media).collect()
    assert(feats.length == media.count())
    feats.foreach { f =>
      assert(f.feature.length == Multimodal.FeatureKernel.FeatureDim)
      assert(f.n_bytes > 0)
      // L2-normalized feature — except a decoded-empty record (e.g. a
      // zero-frame Y4M), whose histogram is legitimately all zeros
      val n = math.sqrt(f.feature.map(x => x * x.toDouble).sum)
      if (f.n_inner_bytes > 0) assert(math.abs(n - 1.0) < 1e-5)
      else assert(n == 0.0)
    }
    // determinism: same payload → same checksum across runs
    val again = Multimodal.extractFeatures(media).collect()
    assert(feats.map(_.checksum).sorted.toSeq == again.map(_.checksum).sorted.toSeq)
  }

  test("resize: real nearest-neighbor on the decoded pixel grid for PNG and JPEG") {
    import graft.operators.MediaCodec
    val media = Multimodal.syntheticMedia(Tables.documents(spark, Sf))
    val before = media.collect().map(r => r.media_id -> r).toMap
    val after = Multimodal.resize(media, factor = 4).collect()
    after.foreach { r =>
      val b = before(r.media_id)
      if (b.kind == "image") {
        // container format survives, header carries the scaled dims
        val bd = MediaCodec.imageDims(b.payload).get
        val rd = MediaCodec.imageDims(r.payload).get
        assert(rd._1 == bd._1)
        assert(rd._2 == r.width && rd._3 == r.height)
        // ceil-grid dims on BOTH branches — never to zero
        val (w, h) = (bd._2, bd._3)
        assert(r.width == (w + 3) / 4 && r.height == (h + 3) / 4)
        assert(r.width > 0 && r.height > 0)
        if (bd._1 == "png") {
          // out(x,y) == in(4x, 4y) EXACTLY, decoded through the REAL
          // inflate + defilter path on both sides
          val bp = MediaCodec.pngPixels(b.payload).get
          val rp = MediaCodec.pngPixels(r.payload).get
          assert(rp.length == 3 * r.width * r.height)
          for (y <- 0 until r.height; x <- 0 until r.width; ch <- 0 until 3)
            assert(rp((y * r.width + x) * 3 + ch) == bp((y * 4 * w + x * 4) * 3 + ch))
        } else {
          // JPEG: decoded through the REAL baseline-DCT codec on both
          // sides; the resample is exact on the decoded grids, but the
          // re-encode is lossy — bound the LUMA error of the roundtrip
          // (chroma is subsampled; see jpegDecodeAudit for the rationale)
          val bp = MediaCodec.jpegPixels(b.payload).get
          val rp = MediaCodec.jpegPixels(r.payload).get
          assert(rp.length == 3 * r.width * r.height)
          def luma(a: Array[Byte], p: Int): Double =
            0.299 * (a(3 * p) & 0xff) + 0.587 * (a(3 * p + 1) & 0xff) +
              0.114 * (a(3 * p + 2) & 0xff)
          for (y <- 0 until r.height; x <- 0 until r.width) {
            val expect = luma(bp, y * 4 * w + x * 4)
            val got = luma(rp, y * r.width + x)
            assert(math.abs(got - expect) <= 48.0,
              s"luma drift $got vs $expect at ($x,$y) of ${r.media_id}")
          }
        }
      } else {
        assert(r.payload.sameElements(b.payload) && r.width == b.width)
      }
    }
  }

  test("MediaCodec: spec-correct containers, golden-offset parse, foreign bytes -> None") {
    import graft.operators.MediaCodec
    val inner = "hello media world".getBytes("UTF-8")
    // PNG: real pixels through the real zlib + scanline round-trip
    val (w, h) = (6, 2)
    val pixels = Array.tabulate(3 * w * h)(i => (i * 7 % 251).toByte)
    val png = MediaCodec.encodePng(pixels, w, h)
    // golden PNG offsets (public spec): 8-byte signature, IHDR length 13 at
    // offset 8, type at 12, width/height big-endian at 16/20
    assert((png(0) & 0xff) == 0x89 && new String(png, 1, 3, "US-ASCII") == "PNG")
    assert(new String(png, 12, 4, "US-ASCII") == "IHDR")
    // container size: 57 bytes of chunk structure + the zlib-stored
    // scanline stream (h·(1+3w) raw + 2 hdr + 5 block hdr + 4 adler)
    val rawLen = h * (1 + 3 * w)
    assert(png.length == 57 + rawLen + 11)
    assert(MediaCodec.imageDims(png).contains(("png", w, h)))
    // REAL decode: java.util.zip.Inflater + defilter → the exact pixels
    assert(MediaCodec.pngPixels(png).get.sameElements(pixels))
    // the IDAT payload is a genuine zlib stream on its own
    assert(MediaCodec.inflate(MediaCodec.innerPayload(png)).get.length == rawLen)
    // IHDR CRC is a real CRC32 over type+data
    val crc = new java.util.zip.CRC32()
    crc.update(png, 12, 4 + 13)
    val stored = ((png(29) & 0xffL) << 24) | ((png(30) & 0xffL) << 16) |
      ((png(31) & 0xffL) << 8) | (png(32) & 0xffL)
    assert(stored == crc.getValue)
    // corrupt zlib stream → None from the pixel path (data, not exception),
    // while the container header still parses
    val corrupt = png.clone()
    corrupt(45) = (corrupt(45) ^ 0x55).toByte // inside the IDAT data
    assert(MediaCodec.imageDims(corrupt).contains(("png", w, h)))
    assert(MediaCodec.pngPixels(corrupt).isEmpty)

    val jpg = MediaCodec.encodeJpeg(inner, 1280, 721)
    // golden JPEG markers: SOI, APP0/JFIF, then the parser must SCAN past
    // the COM segment to reach SOF0
    assert((jpg(0) & 0xff) == 0xff && (jpg(1) & 0xff) == 0xd8)
    assert(new String(jpg, 6, 4, "US-ASCII") == "JFIF")
    assert(jpg.length == inner.length + 45)
    assert(MediaCodec.imageDims(jpg).contains(("jpeg", 1280, 721)))
    assert(MediaCodec.innerPayload(jpg).sameElements(inner))

    // multi-segment COM round-trip (inner longer than one segment)
    val big = Array.tabulate(130000)(i => (i % 251).toByte)
    val bigJpg = MediaCodec.encodeJpeg(big, 12, 34)
    assert(bigJpg.length == big.length + 41 + 4 * 3)
    assert(MediaCodec.imageDims(bigJpg).contains(("jpeg", 12, 34)))
    assert(MediaCodec.innerPayload(bigJpg).sameElements(big))

    // foreign / truncated bytes are data, not exceptions
    assert(MediaCodec.imageDims("not an image".getBytes("UTF-8")).isEmpty)
    assert(MediaCodec.imageDims(Array[Byte](0xff.toByte, 0xd8.toByte)).isEmpty)
    assert(MediaCodec.imageDims(java.util.Arrays.copyOf(png, 20)).isEmpty)
    assert(MediaCodec.innerPayload("raw".getBytes("UTF-8"))
      .sameElements("raw".getBytes("UTF-8")))
  }

  test("MediaCodec WAV: spec-correct RIFF container, chunk-walk parse, PCM roundtrip") {
    import graft.operators.MediaCodec
    val samples = Array.tabulate(100)(i => ((i * 1103 + 7) % 65536).toShort)
    val wav = MediaCodec.encodeWav(samples, 16000)
    // canonical PCM-16 mono layout: 44-byte header + 2 bytes per sample
    assert(wav.length == 44 + 200)
    assert(new String(wav, 0, 4, "US-ASCII") == "RIFF")
    assert(new String(wav, 8, 4, "US-ASCII") == "WAVE")
    assert(MediaCodec.wavInfo(wav).contains((16000, 100)))
    assert(MediaCodec.wavSamples(wav).get.sameElements(samples))
    assert(MediaCodec.wavDataBytes(wav).get.length == 200)
    // corrupt fmt-chunk length (offset 16, LE) → None, never an exception
    val bad = wav.clone()
    bad(16) = 0x7f.toByte; bad(17) = 0x7f.toByte; bad(18) = 0x7f.toByte; bad(19) = 0x7f.toByte
    assert(MediaCodec.wavInfo(bad).isEmpty)
    // non-PCM audioFormat (offset 20) is foreign data to this engine
    val nonPcm = wav.clone(); nonPcm(20) = 3
    assert(MediaCodec.wavInfo(nonPcm).isEmpty)
    // foreign / truncated bytes
    assert(MediaCodec.wavInfo("RIFFxxxxWAVE but short".getBytes("US-ASCII")).isEmpty)
    assert(MediaCodec.wavInfo("not audio at all".getBytes("US-ASCII")).isEmpty)
  }

  test("MediaCodec Y4M: spec-correct stream, header + frame-walk parse, roundtrip") {
    import graft.operators.MediaCodec
    val (w, h, nf) = (4, 3, 5)
    val frames = Array.tabulate(3 * w * h * nf)(i => ((i * 31 + 5) % 251).toByte)
    val y = MediaCodec.encodeY4m(frames, w, h, nf)
    assert(new String(y, 0, 10, "US-ASCII") == "YUV4MPEG2 ")
    // size formula: 33-char fixed header + dim digits + nf·(6 + 3wh)
    assert(y.length == 33 + 1 + 1 + nf * (6 + 3 * w * h))
    assert(MediaCodec.y4mInfo(y).contains((4, 3, 5)))
    assert(MediaCodec.y4mFrames(y).get.sameElements(frames))
    // a truncated final frame is malformed, not rounded down
    assert(MediaCodec.y4mInfo(java.util.Arrays.copyOf(y, y.length - 1)).isEmpty)
    // colourspaces this engine doesn't write are foreign data
    assert(MediaCodec.y4mInfo(
      "YUV4MPEG2 W4 H3 F25:1 Ip A1:1 C420\nFRAME\n".getBytes("US-ASCII")).isEmpty)
    // a zero-frame stream (header only) is valid
    assert(MediaCodec.y4mInfo(
      MediaCodec.encodeY4m(Array.emptyByteArray, 2, 2, 0)).contains((2, 2, 0)))
    assert(MediaCodec.y4mInfo("not video at all".getBytes("US-ASCII")).isEmpty)
    // hostile dims that would overflow 3wh are rejected, not spun on
    assert(MediaCodec.y4mInfo(
      "YUV4MPEG2 W2000000000 H2000000000 F25:1 Ip A1:1 C444\nFRAME\nxx"
        .getBytes("US-ASCII")).isEmpty)
  }

  test("pngPixels defilters all five RFC 2083 filter types") {
    import graft.operators.MediaCodec
    // original 2x5 truecolor image; each row serialized with a DIFFERENT
    // filter type (0..4), filtered forward here per spec — the decoder must
    // invert every one to reconstruct the original pixels
    val (w, h) = (2, 5)
    val bpp = 3
    val rowBytes = 3 * w
    val pix = Array.tabulate(rowBytes * h)(i => ((i * 37 + 11) % 256).toByte)
    def p(y: Int, x: Int): Int = if (y < 0 || x < 0) 0 else pix(y * rowBytes + x) & 0xff
    def paeth(a: Int, b: Int, c: Int): Int = {
      val q = a + b - c
      val (pa, pb, pc) = (math.abs(q - a), math.abs(q - b), math.abs(q - c))
      if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
    }
    val raw = new Array[Byte](h * (1 + rowBytes))
    for (y <- 0 until h) {
      raw(y * (1 + rowBytes)) = y.toByte // filter type = row index
      for (x <- 0 until rowBytes) {
        val a = if (x >= bpp) p(y, x - bpp) else 0
        val b = p(y - 1, x)
        val c = if (x >= bpp) p(y - 1, x - bpp) else 0
        val v = y match {
          case 0 => p(y, x)
          case 1 => p(y, x) - a
          case 2 => p(y, x) - b
          case 3 => p(y, x) - ((a + b) >> 1)
          case 4 => p(y, x) - paeth(a, b, c)
        }
        raw(y * (1 + rowBytes) + 1 + x) = (v & 0xff).toByte
      }
    }
    // wrap in a real container: chunk structure identical to encodePng's
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte), 0, 8)
    def chunk(t: String, d: Array[Byte]): Unit = {
      def be32(v: Int): Unit = { out.write(v >>> 24); out.write((v >>> 16) & 0xff)
        out.write((v >>> 8) & 0xff); out.write(v & 0xff) }
      be32(d.length); out.write(t.getBytes("US-ASCII"), 0, 4); out.write(d, 0, d.length)
      val crc = new java.util.zip.CRC32()
      crc.update(t.getBytes("US-ASCII")); crc.update(d)
      be32(crc.getValue.toInt)
    }
    val ihdr = new java.io.ByteArrayOutputStream()
    Seq(w, h).foreach { v => ihdr.write(v >>> 24); ihdr.write((v >>> 16) & 0xff)
      ihdr.write((v >>> 8) & 0xff); ihdr.write(v & 0xff) }
    Seq(8, 2, 0, 0, 0).foreach(ihdr.write)
    chunk("IHDR", ihdr.toByteArray)
    chunk("IDAT", MediaCodec.zlibStore(raw))
    chunk("IEND", Array.emptyByteArray)
    val png = out.toByteArray
    assert(MediaCodec.imageDims(png).contains(("png", w, h)))
    assert(MediaCodec.pngPixels(png).get.sameElements(pix))
    // an unknown filter type is rejected as corrupt (None, no throw):
    // rebuild the container (signature + IHDR survive at offsets 0..32)
    // around a stream whose first row claims filter type 9
    val bad = raw.clone(); bad(0) = 9
    val rebuilt = new java.io.ByteArrayOutputStream()
    rebuilt.write(png, 0, 33)
    def chunk2(t: String, d: Array[Byte]): Unit = {
      def be32(v: Int): Unit = { rebuilt.write(v >>> 24); rebuilt.write((v >>> 16) & 0xff)
        rebuilt.write((v >>> 8) & 0xff); rebuilt.write(v & 0xff) }
      be32(d.length); rebuilt.write(t.getBytes("US-ASCII"), 0, 4); rebuilt.write(d, 0, d.length)
      val crc = new java.util.zip.CRC32()
      crc.update(t.getBytes("US-ASCII")); crc.update(d)
      be32(crc.getValue.toInt)
    }
    chunk2("IDAT", MediaCodec.zlibStore(bad))
    chunk2("IEND", Array.emptyByteArray)
    assert(MediaCodec.pngPixels(rebuilt.toByteArray).isEmpty)
  }

  test("image_dims expression parses headers in the scan (no UDF in the plan)") {
    import org.apache.spark.sql.functions._
    graft.plans.GraftFunctions.register(spark)
    val m = Multimodal.syntheticMedia(Tables.documents(spark, Sf)).toDF()
      .filter(col("kind") === "image")
    val parsed = m.select(col("media_id"), col("width"), col("height"),
        call_function("image_dims", col("payload")).as("d"))
    assert(!parsed.queryExecution.executedPlan.toString.contains("ScalaUDF"))
    parsed.collect().foreach { r =>
      val d = r.getStruct(3)
      assert(d.getString(0) == (if (r.getLong(0) % 2 == 0) "png" else "jpeg"))
      assert(d.getInt(1) == r.getInt(1) && d.getInt(2) == r.getInt(2))
    }
    // null propagation + non-image bytes -> null struct
    import spark.implicits._
    val probe = Seq(("raw bytes".getBytes("UTF-8"), 1)).toDF("payload", "i")
    assert(probe.select(call_function("image_dims", col("payload"))).collect()(0).isNullAt(0))
  }

  test("resampleAudio: decimated PCM round-trips; non-audio and corrupt pass through") {
    import spark.implicits._
    import graft.operators.MediaCodec
    val samples = Array.tabulate[Short](101)(i => ((i * 517 + 3) % 65536).toShort)
    val good = Multimodal.MediaRecord(1L, "audio",
      MediaCodec.encodeWav(samples, 16000), 0, 0, 16000, 0)
    val video = Multimodal.MediaRecord(2L, "video",
      MediaCodec.encodeY4m(Array.emptyByteArray, 2, 2, 0), 2, 2, 16000, 0)
    val corrupt = Multimodal.MediaRecord(3L, "audio",
      "RIFF not a wav".getBytes("US-ASCII"), 0, 0, 16000, 0)
    val out = Multimodal
      .resampleAudio(spark.createDataset(Seq(good, video, corrupt)), factor = 4)
      .collect().map(r => r.media_id -> r).toMap
    // ceil(101/4) = 26 samples, every 4th source sample, rate 16000/4
    val rs = MediaCodec.wavSamples(out(1L).payload).get
    assert(rs.length == 26 && rs.indices.forall(i => rs(i) == samples(i * 4)))
    assert(MediaCodec.wavInfo(out(1L).payload).contains((4000, 26)))
    assert(out(1L).sample_rate == 4000)
    assert(out(2L).payload.sameElements(video.payload)) // non-audio untouched
    assert(out(3L).payload.sameElements(corrupt.payload)) // corrupt is data
  }

  test("sampleFrameData extracts real frame payloads; corrupt containers yield no rows") {
    import spark.implicits._
    import graft.operators.MediaCodec
    val (w, h, nf) = (2, 2, 9)
    val fsz = 3 * w * h
    val data = Array.tabulate(fsz * nf)(i => ((i * 13 + 1) % 251).toByte)
    val good = Multimodal.MediaRecord(1L, "video",
      MediaCodec.encodeY4m(data, w, h, nf), w, h, 16000, nf)
    val corrupt = Multimodal.MediaRecord(2L, "video",
      "YUV4MPEG2 garbage".getBytes("US-ASCII"), 0, 0, 16000, 3)
    val rows = Multimodal
      .sampleFrameData(spark.createDataset(Seq(good, corrupt)), stride = 4).collect()
    assert(rows.map(_.getLong(0)).distinct.toSeq == Seq(1L)) // corrupt → no rows
    assert(rows.map(_.getInt(1)).sorted.toSeq == Seq(0, 4, 8))
    rows.foreach { r =>
      val f = r.getInt(1)
      val expect = java.util.Arrays.copyOfRange(data, f * fsz, (f + 1) * fsz)
      assert(r.getLong(3) == Multimodal.FeatureKernel.checksum(expect))
    }
  }

  test("perceptual hash: near-identical images collide, different images diverge") {
    import graft.operators.{Dedup, MediaCodec}
    import org.apache.spark.sql.functions.col
    // dHash kernel laws on hand-built grids (w=16, h=16: every grid cell
    // maps to a distinct pixel, no NN degeneracy)
    val w = 16; val h = 16
    def grid(f: (Int, Int) => Int): Array[Byte] = {
      val a = new Array[Byte](3 * w * h)
      for (y <- 0 until h; x <- 0 until w; c <- 0 until 3)
        a((y * w + x) * 3 + c) = (f(x, y) & 0xff).toByte
      a
    }
    val ramp = grid((x, _) => x * 16)         // brightens left→right
    val flat = grid((_, _) => 128)
    val rampHash = Multimodal.dHash64(ramp, w, h)
    assert(rampHash == -1L, s"monotone ramp must set all 64 bits, got $rampHash")
    assert(Multimodal.dHash64(flat, w, h) == 0L)
    // determinism + one-sub-pixel perturbation stays within a few bits
    val perturbed = ramp.clone(); perturbed(0) = (perturbed(0) + 1).toByte
    assert(java.lang.Long.bitCount(rampHash ^ Multimodal.dHash64(perturbed, w, h)) <= 3)
    intercept[IllegalArgumentException](Multimodal.dHash64(Array[Byte](1, 2), 2, 2))

    // end-to-end over real containers: planted perturbed PNGs pair with
    // their originals through the banded join at Hamming <= 3, and the
    // banded pair set EQUALS the exhaustive Hamming relation (4 bands > 3)
    val media = Multimodal.syntheticMedia(Tables.documents(spark, Sf))
    val fixture = media.union(Multimodal.plantImageNearDups(media))
    val hashes = Multimodal.imagePerceptualHashes(fixture)
      .filter(col("container") === "png").cache()
    val pairs = Dedup.hamming64Pairs(hashes, "media_id", "phash").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val hs = hashes.collect().map(r => (r.getLong(0), r.getLong(2)))
    val exhaustive = (for {
      (a, ha) <- hs; (b, hb) <- hs
      if a < b && java.lang.Long.bitCount(ha ^ hb) <= 3
    } yield (a, b)).toSet
    assert(pairs == exhaustive)
    // every planted copy whose hash stayed within 3 bits is found
    val byId = hs.toMap
    val planted = hs.filter(_._1 >= 600000L)
    assert(planted.nonEmpty)
    planted.foreach { case (pid, phash) =>
      val orig = pid - 600000L
      if (java.lang.Long.bitCount(byId(orig) ^ phash) <= 3)
        assert(pairs.contains((orig, pid)), s"missing planted pair ($orig, $pid)")
    }
    // the JPEG decode path flows through the same kernel (hashes exist)
    val jpegHashes = Multimodal.imagePerceptualHashes(media)
      .filter(col("container") === "jpeg")
    assert(jpegHashes.count() > 0)
    hashes.unpersist()
  }

  test("audio perceptual hash: energy-delta laws; planted LSB copies collide") {
    import graft.operators.Dedup
    import org.apache.spark.sql.functions.col
    // kernel laws: monotone-increasing loudness = all 64 bits; constant = 0
    val up = Array.tabulate[Short](130)(i => (i * 100).toShort)
    assert(Multimodal.aHash64(up) == -1L)
    assert(Multimodal.aHash64(Array.fill[Short](130)(42)) == 0L)
    // single-sample LSB bump moves at most 2 bits (its window's two deltas)
    val bumped = up.clone(); bumped(0) = (bumped(0) + 1).toShort
    assert(java.lang.Long.bitCount(Multimodal.aHash64(up) ^ Multimodal.aHash64(bumped)) <= 2)
    intercept[IllegalArgumentException](Multimodal.aHash64(Array.empty[Short]))

    // end-to-end: every planted WAV pairs with its original through the
    // shared banded engine (≤2 bits moved < maxHamming=3 ⇒ always found)
    val media = Multimodal.syntheticMedia(
      Tables.documents(spark, Sf).filter(col("doc_id") < 150))
    val fixture = media.union(Multimodal.plantAudioNearDups(media))
    val hashes = Multimodal.audioPerceptualHashes(fixture)
    val pairs = Dedup.hamming64Pairs(hashes, "media_id", "phash").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val plantedIds = hashes.filter(col("media_id") >= 700000L)
      .collect().map(_.getLong(0))
    assert(plantedIds.nonEmpty)
    plantedIds.foreach { pid =>
      assert(pairs.contains((pid - 700000L, pid)), s"missing planted pair for $pid")
    }
  }

  test("video perceptual hash: frame-energy deltas; planted sub-pixel copies collide") {
    import graft.operators.Dedup
    import org.apache.spark.sql.functions.col
    // shared kernel law: with n a multiple of 65 every window holds the
    // same count of a strictly increasing sequence → all 64 bits set
    // (uneven window sizes can legitimately break monotonicity)
    assert(Multimodal.deltaHash64(Array.tabulate[Long](130)(i => i * 7L)) == -1L)
    intercept[IllegalArgumentException](Multimodal.deltaHash64(Array.empty[Long]))
    val media = Multimodal.syntheticMedia(
      Tables.documents(spark, Sf).filter(col("doc_id") < 150))
    val fixture = media.union(Multimodal.plantVideoNearDups(media))
    val hashes = Multimodal.videoPerceptualHashes(fixture)
    val pairs = Dedup.hamming64Pairs(hashes, "media_id", "phash").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val plantedIds = hashes.filter(col("media_id") >= 800000L)
      .collect().map(_.getLong(0))
    assert(plantedIds.nonEmpty)
    // one sub-pixel of one frame moves <=2 bits < maxHamming=3: always found
    plantedIds.foreach { pid =>
      assert(pairs.contains((pid - 800000L, pid)), s"missing planted pair for $pid")
    }
    // zero-frame videos hash to no rows, planted skips them identically
    val nfZero = media.filter(r => r.kind == "video" && r.n_frames == 0).count()
    assert(hashes.filter(col("media_id") < 800000L).count() ==
      media.filter(_.kind == "video").count() - nfZero)
  }

  test("frame sampling yields stride-spaced indices within n_frames") {
    val media = Multimodal.syntheticMedia(Tables.documents(spark, Sf))
    val rows = Multimodal.sampleFrames(media, stride = 7).collect()
    rows.foreach { r =>
      val n = r.getAs[Int]("n_frames")
      val idx = r.getSeq[Int](2)
      if (n > 0) {
        assert(idx.head == 0 && idx.last < n)
        assert(idx.sliding(2).forall { case Seq(a, b) => b - a == 7; case _ => true })
      } else assert(idx.isEmpty)
    }
  }
}

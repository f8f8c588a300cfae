package graft

import graft.operators.Multimodal
import graft.sources.Tables

class MultimodalSpec extends SparkSpec {

  test("media pipeline: binary payloads → deterministic features per partition") {
    val media = Multimodal.syntheticMedia(Tables.documents(spark, Sf))
    val feats = Multimodal.extractFeatures(media).collect()
    assert(feats.length == media.count())
    feats.foreach { f =>
      assert(f.feature.length == Multimodal.FakeDecoder.FeatureDim)
      assert(f.n_bytes > 0)
      // L2-normalized fake feature
      val n = math.sqrt(f.feature.map(x => x * x.toDouble).sum)
      assert(math.abs(n - 1.0) < 1e-5)
    }
    // determinism: same payload → same checksum across runs
    val again = Multimodal.extractFeatures(media).collect()
    assert(feats.map(_.checksum).sorted.toSeq == again.map(_.checksum).sorted.toSeq)
  }

  test("resize decimates the embedded data, re-encodes the container, scales dims") {
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
        assert(r.width == b.width / 4 && r.height == b.height / 4)
        assert(rd._2 == r.width && rd._3 == r.height)
        // decimation keeps every 4th EMBEDDED byte, starting at 0
        val bi = MediaCodec.innerPayload(b.payload)
        val ri = MediaCodec.innerPayload(r.payload)
        assert(ri.length == (bi.length + 3) / 4)
        assert(ri.indices.forall(i => ri(i) == bi(i * 4)))
      } else {
        assert(r.payload.sameElements(b.payload) && r.width == b.width)
      }
    }
  }

  test("MediaCodec: spec-correct containers, golden-offset parse, foreign bytes -> None") {
    import graft.operators.MediaCodec
    val inner = "hello media world".getBytes("UTF-8")
    val png = MediaCodec.encodePng(inner, 640, 360)
    // golden PNG offsets (public spec): 8-byte signature, IHDR length 13 at
    // offset 8, type at 12, width/height big-endian at 16/20
    assert((png(0) & 0xff) == 0x89 && new String(png, 1, 3, "US-ASCII") == "PNG")
    assert(new String(png, 12, 4, "US-ASCII") == "IHDR")
    assert(png.length == inner.length + 57)
    assert(MediaCodec.imageDims(png).contains(("png", 640, 360)))
    assert(MediaCodec.innerPayload(png).sameElements(inner))
    // IHDR CRC is a real CRC32 over type+data
    val crc = new java.util.zip.CRC32()
    crc.update(png, 12, 4 + 13)
    val stored = ((png(29) & 0xffL) << 24) | ((png(30) & 0xffL) << 16) |
      ((png(31) & 0xffL) << 8) | (png(32) & 0xffL)
    assert(stored == crc.getValue)

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

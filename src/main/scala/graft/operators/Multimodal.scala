package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal-column plumbing (driver brief): media payloads as opaque
 * `binary` columns with typed metadata, and batch feature-extraction over
 * them. The CONTAINER layer is real — image payloads are spec-correct
 * PNG/JPEG byte streams and the read side parses actual chunk/marker
 * structure ([[MediaCodec]], plus the codegen'd `image_dims` expression in
 * [[graft.plans.ImageDims]] for DataFrame plans). The container has no
 * image/audio PIXEL codecs, so only the inflate/DCT step is a
 * clearly-marked deterministic fake ([[FakeDecoder]]) over the container's
 * embedded data; swapping in a real codec changes only `FakeDecoder.decode`.
 *
 * Scala-side equivalent of a Python `mapInPandas` batch UDF: a typed
 * `Dataset.mapPartitions` that processes records streamingly per partition
 * (constant memory, codec init amortized once per partition — the same
 * reason mapInPandas batches).
 */
object Multimodal {

  /** A media record: opaque bytes + typed metadata. */
  final case class MediaRecord(
      media_id: Long,
      kind: String,            // "image" | "audio" | "video"
      payload: Array[Byte],    // encoded container bytes (PNG/JPEG for images)
      width: Int, height: Int, // image/video metadata (0 when n/a)
      sample_rate: Int,        // audio metadata (0 when n/a)
      n_frames: Int)           // video/audio frames

  /** Extracted features for one media record. `container`/`width`/`height`
    * are PARSED from the payload bytes (real PNG-IHDR / JPEG-SOF headers),
    * not copied from metadata — "raw"/0/0 for non-container payloads. */
  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,           // container size (the stored blob)
      n_inner_bytes: Long,     // embedded-data size (what the decoder reads)
      checksum: Long,
      feature: Array[Float],   // fixed-dim embedding-like vector
      container: String,       // "png" | "jpeg" | "raw" (parsed, not metadata)
      width: Int,              // parsed from the header; 0 for raw
      height: Int)

  /**
   * STUB decoder — deterministic fake standing in for the absent codec
   * libraries. Produces a stable pseudo-feature from the payload bytes so
   * pipelines downstream (dedup, ANN) are exercised end-to-end with real
   * Spark semantics. Replace `decode` with a real codec binding in prod.
   */
  object FakeDecoder {
    val FeatureDim = 16
    def decode(payload: Array[Byte]): Array[Float] = {
      // ??? real codec goes here; fake: folded byte histogram, L2-normalized
      val h = new Array[Float](FeatureDim)
      var i = 0
      while (i < payload.length) { h((payload(i) & 0xff) % FeatureDim) += 1f; i += 1 }
      val n = math.sqrt(h.map(x => x * x.toDouble).sum).toFloat
      if (n > 0) h.map(_ / n) else h
    }
    def checksum(payload: Array[Byte]): Long = {
      var c = 1125899906842597L
      var i = 0
      while (i < payload.length) { c = 31 * c + (payload(i) & 0xff); i += 1 }
      c
    }
  }

  /** Synthesize a deterministic media table from `documents` — lets every
    * sf dir drive the pipeline. Image-kind records carry REAL container
    * bytes: even ids a spec-correct PNG (signature + IHDR with the record's
    * dims + CRCs), odd ids a JPEG/JFIF (marker segments, COM-embedded data,
    * SOF0 with the dims); the UTF-8 text rides inside as the embedded data,
    * so every byte stays a deterministic function of the document row and
    * the DuckDB oracle can replay both the inner features and (via the
    * generator formulas) the parsed dims. Audio/video stay raw bytes. */
  def syntheticMedia(docs: DataFrame): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text"), col("n_chars")).as[(Long, String, Long)]
      .map { case (id, text, n) =>
        val kind = if (id % 3 == 0) "image" else if (id % 3 == 1) "audio" else "video"
        val w = (n % 640).toInt
        val h = (n % 480).toInt
        val inner = text.getBytes("UTF-8")
        val payload =
          if (kind != "image") inner
          else if (id % 2 == 0) MediaCodec.encodePng(inner, w, h)
          else MediaCodec.encodeJpeg(inner, w, h)
        MediaRecord(id, kind, payload, width = w, height = h,
          sample_rate = 16000, n_frames = (n % 100).toInt)
      }
  }

  /**
   * Batched per-partition feature extraction (the mapInPandas analogue):
   * iterator-in/iterator-out keeps memory flat; decoder state would be
   * initialized once per partition here.
   */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      // per-partition decoder init would go here (codec contexts, etc.)
      it.map { r =>
        // container parse is real (PNG IHDR / JPEG SOF); the pixel decode
        // over the embedded data stays the declared stub
        val dims = MediaCodec.imageDims(r.payload)
        val inner = MediaCodec.innerPayload(r.payload)
        MediaFeatures(r.media_id, r.kind, r.payload.length.toLong, inner.length.toLong,
          FakeDecoder.checksum(inner), FakeDecoder.decode(inner),
          container = dims.map(_._1).getOrElse("raw"),
          width = dims.map(_._2).getOrElse(0),
          height = dims.map(_._3).getOrElse(0))
      }
    }
  }

  /** Frame sampling for video-kind records: every `stride`-th frame index —
    * pure metadata math (real frame decode sits behind FakeDecoder). */
  def sampleFrames(media: Dataset[MediaRecord], stride: Int): DataFrame =
    media.toDF().select(col("media_id"), col("n_frames"),
      when(col("n_frames") > 0,
        sequence(lit(0), col("n_frames") - 1, lit(stride)))
        .otherwise(array().cast("array<int>")).as("frame_idx"))

  /**
   * "Resize" for image-kind records: decode the container, deterministically
   * decimate the EMBEDDED data (every `factor`-th byte — the stand-in for
   * the real resample kernel, which sits behind the decode stub like
   * [[FakeDecoder.decode]]), and RE-ENCODE the same container format with
   * the scaled dimensions in its header — so a resized image is still a
   * structurally valid PNG/JPEG whose parsed dims match its metadata. The
   * plumbing (container round-trip, metadata update, streaming
   * per-partition batching) is the production shape. Non-image records pass
   * through untouched.
   */
  def resize(media: Dataset[MediaRecord], factor: Int): Dataset[MediaRecord] = {
    require(factor >= 1, s"factor must be >= 1, got $factor")
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        if (r.kind != "image" || factor == 1) r
        else {
          val fmt = MediaCodec.imageDims(r.payload).map(_._1)
          val inner = MediaCodec.innerPayload(r.payload)
          val out = new Array[Byte]((inner.length + factor - 1) / factor)
          var i = 0
          while (i < out.length) { out(i) = inner(i * factor); i += 1 }
          val (w, h) = (r.width / factor, r.height / factor)
          val payload = fmt match {
            case Some("png")  => MediaCodec.encodePng(out, w, h)
            case Some("jpeg") => MediaCodec.encodeJpeg(out, w, h)
            case _            => out
          }
          r.copy(payload = payload, width = w, height = h)
        }
      }
    }
  }

  /** Partition-friendly write shape: media tables should be written
    * partitioned by kind and bucketed by id at scale. */
  def repartitionForWrite(media: Dataset[MediaRecord], n: Int): DataFrame =
    media.toDF().repartition(n, col("kind"), col("media_id"))
}

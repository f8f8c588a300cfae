package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal-column plumbing (driver brief): media payloads as opaque
 * `binary` columns with typed metadata, and batch feature-extraction over
 * them. The container has no image/audio codecs, so the DECODE step is a
 * clearly-marked deterministic fake ([[FakeDecoder]]) — the Spark-side
 * plumbing (schema, batched per-partition processing, partitioning) is real
 * and tested; swapping in a real decoder changes only `FakeDecoder.decode`.
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
      payload: Array[Byte],    // opaque encoded bytes
      width: Int, height: Int, // image/video metadata (0 when n/a)
      sample_rate: Int,        // audio metadata (0 when n/a)
      n_frames: Int)           // video/audio frames

  /** Extracted features for one media record. */
  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      checksum: Long,
      feature: Array[Float])   // fixed-dim embedding-like vector

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

  /** Synthesize a deterministic media table from `documents` (bytes = UTF-8
    * text; stands in for real blobs) — lets every sf dir drive the pipeline. */
  def syntheticMedia(docs: DataFrame): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text"), col("n_chars")).as[(Long, String, Long)]
      .map { case (id, text, n) =>
        MediaRecord(id, if (id % 3 == 0) "image" else if (id % 3 == 1) "audio" else "video",
          text.getBytes("UTF-8"), width = (n % 640).toInt, height = (n % 480).toInt,
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
        MediaFeatures(r.media_id, r.kind, r.payload.length.toLong,
          FakeDecoder.checksum(r.payload), FakeDecoder.decode(r.payload))
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
   * "Resize" for image-kind records: deterministic payload decimation
   * (every `factor`-th byte) with scaled dimensions — the real resample
   * kernel sits behind the decode stub like [[FakeDecoder.decode]]; the
   * plumbing (binary in/binary out, metadata update, streaming
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
          val out = new Array[Byte]((r.payload.length + factor - 1) / factor)
          var i = 0
          while (i < out.length) { out(i) = r.payload(i * factor); i += 1 }
          r.copy(payload = out, width = r.width / factor, height = r.height / factor)
        }
      }
    }
  }

  /** Partition-friendly write shape: media tables should be written
    * partitioned by kind and bucketed by id at scale. */
  def repartitionForWrite(media: Dataset[MediaRecord], n: Int): DataFrame =
    media.toDF().repartition(n, col("kind"), col("media_id"))
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Multimodal}
import graft.operators.Multimodal.MediaRecord
import graft.sources.Tables
import graft.streaming.StreamingPhashDedup

/**
 * Per-JVM cache of the perceptual-hash frames the multimodal-dedup entries
 * consume — the [[GraphArtifacts]] build-vs-serve discipline applied to
 * media decode (round-12: the family re-decoded the synthetic media corpus
 * in seven separate entries; decode dominates each at ~70-80 %).
 *
 * Honest full recomputes stay honest: `image_phash` / `audio_ahash` /
 * `video_vhash` own measuring each modality's decode+hash scan, and
 * `phash_near_dup` owns the image fixture path end to end (decode + plant
 * + hash + banded join) — the family's headline, like `pagerank_trade` and
 * `minhash_lsh_dedup`. The OTHER consumers measure what is distinct about
 * them: `ahash_near_dup` / `vhash_near_dup` the banded Hamming join,
 * `phash_keep` the transitive-closure representative collapse,
 * `streaming_phash_flag` the per-micro-batch decode + index join.
 *
 * Cached frames are `localCheckpoint`ed (plan-severed, survive the bench's
 * per-measurement `clearCache()`, reclaimed by the ContextCleaner on
 * memo eviction) and hash-shaped: 8 bytes per media object, never pixels.
 */
private[graft] object MediaArtifacts {

  private val imageFixtureMemo = new BoundedMemo[DataFrame](8)
  private val imagePairsMemo = new BoundedMemo[DataFrame](8)
  private val audioFixtureMemo = new BoundedMemo[DataFrame](8)
  private val videoFixtureMemo = new BoundedMemo[DataFrame](8)
  private val pngIndexMemo = new BoundedMemo[DataFrame](8)
  private val plantedImagesMemo = new BoundedMemo[Array[MediaRecord]](8)

  private def media(s: SparkSession, dir: String) =
    Multimodal.syntheticMedia(Tables.documents(s, dir))

  /** `phash_keep` input: (media_id, phash) for the PNG corpus ∪ planted
    * one-sub-pixel copies — the fixture hash set `phash_near_dup` derives
    * honestly. */
  def imageFixtureHashes(s: SparkSession, dir: String): DataFrame =
    imageFixtureMemo.get(dir) {
      val m = media(s, dir)
      Multimodal.imagePerceptualHashes(m.union(Multimodal.plantImageNearDups(m)))
        .filter(col("container") === "png")
        .select(col("media_id"), col("phash"))
        .localCheckpoint()
    }

  /** `phash_keep` input: the banded Hamming≤3 pair set over
    * [[imageFixtureHashes]] (bands=4 > maxHamming=3 makes it exactly the
    * Hamming relation — same parameters as the honest entry). */
  def imagePairs(s: SparkSession, dir: String): DataFrame =
    imagePairsMemo.get(dir) {
      Dedup.hamming64Pairs(imageFixtureHashes(s, dir),
          idCol = "media_id", hashCol = "phash", bands = 4, maxHamming = 3)
        .localCheckpoint()
    }

  /** `ahash_near_dup` input: (media_id, phash) for the WAV corpus ∪
    * planted one-LSB-perturbed copies. */
  def audioFixtureHashes(s: SparkSession, dir: String): DataFrame =
    audioFixtureMemo.get(dir) {
      val m = media(s, dir)
      Multimodal.audioPerceptualHashes(m.union(Multimodal.plantAudioNearDups(m)))
        .localCheckpoint()
    }

  /** `vhash_near_dup` input: (media_id, phash) for the Y4M corpus ∪
    * planted one-sub-pixel-of-frame-0 copies. */
  def videoFixtureHashes(s: SparkSession, dir: String): DataFrame =
    videoFixtureMemo.get(dir) {
      val m = media(s, dir)
      Multimodal.videoPerceptualHashes(m.union(Multimodal.plantVideoNearDups(m)))
        .localCheckpoint()
    }

  /** `streaming_phash_flag` static side: the banded, bucket-capped,
    * materialized index over the corpus-only PNG hashes — what a serving
    * deployment holds per corpus epoch. */
  def pngBandedIndex(s: SparkSession, dir: String): DataFrame =
    pngIndexMemo.get(dir) {
      StreamingPhashDedup.bandedIndex(
        Multimodal.imagePerceptualHashes(media(s, dir))
          .filter(col("container") === "png")
          .select(col("media_id"), col("phash")))
    }

  /** `streaming_phash_flag` stream-side fixture: the planted near-copy
    * records (driver-held, micro-batch-sized by construction — one planted
    * copy per corpus PNG). */
  def plantedImageRecords(s: SparkSession, dir: String): Array[MediaRecord] =
    plantedImagesMemo.get(dir) {
      Multimodal.plantImageNearDups(media(s, dir)).collect()
    }
}

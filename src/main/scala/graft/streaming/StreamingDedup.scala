package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/**
 * Streaming ingest deduplication for a document stream — the continuous
 * counterpart of [[graft.operators.Dedup.exactDedup]]: drop any document
 * whose normalized-content fingerprint was already seen, keeping state only
 * as long as the watermark allows.
 *
 * `dropDuplicatesWithinWatermark` keys the dedup state store on the
 * fingerprint and evicts entries once the event-time watermark passes their
 * timestamp + delay — state is bounded by (unique docs per watermark
 * window), independent of stream length, which is what makes this runnable
 * forever on an ingest firehose. (Plain `dropDuplicates` on a stream never
 * evicts and OOMs eventually.)
 */
object StreamingDedup {

  /**
   * Deduplicate `docs(tsCol, textCol, …)` by content fingerprint within the
   * watermark delay. First occurrence wins; later duplicates are dropped
   * even when they arrive in a different micro-batch (as long as the first
   * is still within the watermark).
   */
  def byContent(docs: DataFrame, watermarkDelay: String,
                tsCol: String = "ts", textCol: String = "text"): DataFrame =
    docs
      .withColumn("fp", TextFunctions.fingerprint(col(textCol)))
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark("fp")

  /** Same, keyed on explicit id columns (e.g. an upstream event id). */
  def byKey(docs: DataFrame, watermarkDelay: String, keys: Seq[String],
            tsCol: String = "ts"): DataFrame =
    docs
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)
}

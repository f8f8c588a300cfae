package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Streaming windowed MEMBERSHIP: a tumbling event-time-window bloom
 * filter maintained incrementally by Structured Streaming's aggregation
 * state store — the fifth cell of the streaming sketch matrix (heavy
 * hitters = [[StreamingHeavyHitters]], distinct = [[StreamingKmv]],
 * frequency = [[StreamingCms]], quantiles = [[StreamingHistogram]],
 * membership = this). "Which keys did day D see" as a KB-sized artifact
 * per window, probeable long after the raw events are gone.
 *
 * The state is the [[graft.plans.BloomWordsAgg]] buffer: m/62 int64
 * words per window REGARDLESS of key cardinality — micro-batch partials
 * merge word-wise (OR is idempotent and associative), so the emitted
 * filter after N batches equals one batch-mode build over the union,
 * and any key probes the drained artifact later through
 * [[graft.operators.Bloom.containsColumn]] with the structural
 * no-false-negative guarantee intact.
 *
 * State lifetime: the watermark expires window state past `window end +
 * watermarkDelay` ONLY in append/update output modes — in `complete`
 * mode (what the `streaming_bloom_daily` demo runs, so every window's
 * filter stays queryable in the sink) Structured Streaming retains all
 * window state by definition, and the per-window m/62-long rows
 * accumulate for as long as the query runs. The production mode over
 * unbounded time is APPEND — each window emits once, finalized, after
 * the watermark passes its end, and the store then EVICTS it, bounding
 * state by open windows instead of total history — demonstrated by the
 * `streaming_bloom_append` gate and pinned by BloomSpec's
 * bounded-state assertion; alternatively persist drained filters via
 * [[graft.operators.Bloom.saveWords]] and restart per retention epoch.
 */
object StreamingBloom {

  /** `events` needs an event-time `ts` column; `key` must be an int64 or
    * string column (`bloom_agg`'s two key forms — URLs/doc-ids stream
    * directly, no pre-hash); emits per window `(window_start, words)` —
    * the dense m/62-long word array. */
  def windowedWords(events: DataFrame, key: Column,
                    windowDuration: String, mBits: Int, numHashes: Int,
                    watermarkDelay: String = "10 minutes"): DataFrame = {
    require(mBits >= 62 && mBits % 62 == 0,
      s"windowedWords: mBits must be a positive multiple of 62, got $mBits")
    require(numHashes >= 1 && numHashes <= 8,
      s"windowedWords: numHashes must be in [1, 8], got $numHashes")
    graft.plans.GraftFunctions.register(events.sparkSession)
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowDuration).as("w"))
      .agg(call_function("bloom_agg", key, lit(mBits),
        lit(numHashes)).as("words"))
      .select(col("w.start").as("window_start"), col("words"))
  }
}

package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Streaming heavy hitters: a tumbling event-time window keyed SpaceSaving
 * sketch, maintained incrementally by Structured Streaming's aggregation
 * state store.
 *
 * The interesting property is WHAT the state is: the
 * [[graft.plans.SpaceSavingTopK]] `TypedImperativeAggregate` serializes its
 * fixed-size stream-summary as the aggregation buffer, so per-window state
 * is O(capacity) REGARDLESS of how many distinct items flow through the
 * window — the streaming analogue of the batch sketch's shuffle bound.
 * Micro-batches merge into the stored sketch via the aggregate's
 * `merge(partial)` path, exactly like map-side partials merge at a batch
 * exchange, so the emitted top-k after N batches equals one batch-mode
 * sketch over the union of all N inputs (asserted in
 * StreamingHeavyHittersSpec).
 *
 * Update mode: each trigger re-emits the refined sketch row for windows the
 * batch touched; the watermark expires window state past
 * `window end + watermarkDelay`, bounding total state by active windows ×
 * capacity.
 */
object StreamingHeavyHitters {

  /** `events` needs an event-time `ts` column; emits
    * `(window_start, topk: array<struct<item, count_min, count_max>>)`. */
  def windowedTopK(events: DataFrame, item: Column, windowDuration: String,
                   capacity: Int, watermarkDelay: String = "10 minutes"): DataFrame = {
    graft.plans.GraftFunctions.register(events.sparkSession)
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowDuration).as("w"))
      .agg(call_function("space_saving_topk", item, lit(capacity)).as("topk"))
      .select(col("w.start").as("window_start"), col("topk"))
  }
}

package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Streaming point-frequency estimation: a tumbling event-time window
 * keyed count-min grid, maintained incrementally by Structured
 * Streaming's aggregation state store — the [[StreamingKmv]] shape
 * applied to frequency instead of cardinality, completing the streaming
 * sketch matrix (heavy hitters = [[StreamingHeavyHitters]], distinct =
 * [[StreamingKmv]], frequency = this).
 *
 * The state is the [[graft.plans.CmsGrid]] `TypedImperativeAggregate`
 * buffer: `depth·width` int64 cells per window REGARDLESS of how many
 * distinct keys flow through — micro-batch partials merge into the
 * stored grid cell-wise (the grid is additive), so the emitted grid
 * after N batches equals one batch-mode build over the union of all N
 * inputs, and any key's frequency can be estimated from the stored
 * artifact later ([[graft.operators.Sketches.gridEstimate]]) without
 * touching raw data.
 *
 * Update/complete mode; the watermark expires window state past
 * `window end + watermarkDelay`, bounding total state by
 * active windows × depth·width longs.
 */
object StreamingCms {

  /** `events` needs an event-time `ts` column; emits per window
    * `(window_start, grid)` — the dense row-major depth×width cell
    * array ([[graft.plans.CmsGrid]]). */
  def windowedGrid(events: DataFrame, key: Column,
                   windowDuration: String, depth: Int, width: Int,
                   watermarkDelay: String = "10 minutes"): DataFrame = {
    require(depth >= 1, s"windowedGrid: depth must be >= 1, got $depth")
    require(width >= 2, s"windowedGrid: width must be >= 2, got $width")
    graft.plans.GraftFunctions.register(events.sparkSession)
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowDuration).as("w"))
      .agg(call_function("cms_grid", key.cast("long"), lit(depth),
        lit(width)).as("grid"))
      .select(col("w.start").as("window_start"), col("grid"))
  }
}

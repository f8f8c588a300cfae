package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.Sketches

/**
 * Streaming distinct-count estimation: a tumbling event-time window keyed
 * KMV sketch, maintained incrementally by Structured Streaming's
 * aggregation state store — the [[StreamingHeavyHitters]] shape applied to
 * cardinality instead of frequency.
 *
 * The state is the [[graft.plans.KmvKMin]] `TypedImperativeAggregate`
 * buffer: k int64 minima per window REGARDLESS of how many distinct keys
 * flow through — micro-batch partials merge into the stored buffer via the
 * aggregate's set-union `merge`, and because the k-min set is
 * associative/commutative, the emitted sketch after N batches equals one
 * batch-mode sketch over the union of all N inputs (asserted in
 * SketchesSpec / replayed by the gate oracle).
 *
 * Update/complete mode; the watermark expires window state past
 * `window end + watermarkDelay`, bounding total state by
 * active windows × k longs.
 */
object StreamingKmv {

  /** `events` needs an event-time `ts` column; emits per window
    * `(window_start, n, hk, estimate)` — the [[Sketches.kmvEstimate]]
    * columns: exact count below k, `(k−1)·2^52 / h_(k)` once full. */
  def windowedDistinct(events: DataFrame, key: Column,
                       windowDuration: String, k: Int,
                       watermarkDelay: String = "10 minutes"): DataFrame = {
    require(k >= 2, s"windowedDistinct: k must be >= 2, got $k")
    graft.plans.GraftFunctions.register(events.sparkSession)
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowDuration).as("w"))
      .agg(call_function("kmv_kmin", Sketches.kmvHash(key), lit(k)).as("mins"))
      .select(col("w.start").as("window_start"),
        size(col("mins")).cast("long").as("n"),
        element_at(col("mins"), -1).as("hk"),
        when(size(col("mins")) < k, size(col("mins")).cast("double"))
          .otherwise(round(lit((k - 1).toDouble) * lit(Sketches.KmvRange) /
            element_at(col("mins"), -1), 6))
          .as("estimate"))
  }
}

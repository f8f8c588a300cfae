package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Streaming windowed value histograms — the quantile cell of the
 * streaming sketch matrix (heavy hitters = [[StreamingHeavyHitters]],
 * distinct = [[StreamingKmv]], frequency = [[StreamingCms]], quantiles =
 * this). The state is the WEIGHTED HISTOGRAM itself: one (window,
 * quantized value) count row per occupied bucket, maintained by plain
 * streaming aggregation — counts are additive, so micro-batch partials
 * merge into the stored cells exactly as a batch build over the union,
 * and any quantile is derived LATER from the stored artifact via
 * [[graft.operators.Curation.histogramQuantiles]] (the exact
 * interpolation, bit-equal to quantile_cont over the quantized values)
 * without touching raw data.
 *
 * State is bounded by QUANTIZATION, not data volume: `scale`-decimal
 * rounding caps distinct buckets per window at the value range × 10^scale
 * (e.g. metric values in [0, 1000] at scale 2 → ≤ 10^5 cells per window,
 * regardless of event count). This is the same histogram-state discipline
 * as the batch [[graft.operators.Curation.groupQuantiles]] — state ∝
 * distinct values, never rows — applied to the state store.
 *
 * Update/complete mode; the watermark expires window state past
 * `window end + watermarkDelay`.
 */
object StreamingHistogram {

  /** `events` needs an event-time `ts` column; emits per (window, bucket)
    * `(window_start, v, cnt)` — the weighted-histogram rows
    * [[graft.operators.Curation.histogramQuantiles]] consumes. Null
    * values are dropped (no quantile signal — the groupQuantiles
    * convention). */
  def windowedHistogram(events: DataFrame, value: Column,
                        windowDuration: String, scale: Int,
                        watermarkDelay: String = "10 minutes"): DataFrame = {
    require(scale >= 0, s"windowedHistogram: scale must be >= 0, got $scale")
    events
      .filter(value.isNotNull)
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowDuration).as("w"),
        round(value.cast("double"), scale).as("v"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("w.start").as("window_start"), col("v"), col("cnt"))
  }
}

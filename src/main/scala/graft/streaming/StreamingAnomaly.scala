package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Streaming ingest-volume anomaly scoring — the monitoring × streaming
 * cell: live event streams are aggregated into tumbling event-time daily
 * windows (Structured Streaming state = one count per active window) and
 * each window is scored against a BATCH-derived robust baseline
 * (median / MAD from [[graft.operators.EventAnalytics.volumeAnomalies]]'
 * derivation over history) — the [[StreamingDivergence]] shape applied to
 * volume instead of token distributions: the model is two literals riding
 * the plan, never a state store.
 *
 * Semantics match the batch operator exactly: `dev_score =
 * |cnt − med| / MAD` rounded to 6 (NULL when MAD = 0), `anomaly =
 * |cnt − med| > k·MAD` — so a day's final streamed row equals the batch
 * verdict on the same rows (the gate's oracle replays both the baseline
 * derivation and the scoring).
 */
object StreamingAnomaly {

  /** `events` needs an event-time `ts` column. Emits per daily window
    * `(window_start, cnt, dev_score, anomaly)`; update/complete mode,
    * watermark bounds state to active windows. */
  def scoreStream(events: DataFrame, med: Double, mad: Double,
                  madK: Double = 3.0,
                  watermarkDelay: String = "1 day"): DataFrame = {
    require(mad >= 0, s"scoreStream: mad must be >= 0, got $mad")
    require(madK > 0, s"scoreStream: madK must be positive, got $madK")
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), "1 day").as("w"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("w.start").as("window_start"), col("cnt"),
        (if (mad == 0) lit(null).cast("double")
         else round(abs(col("cnt") - lit(med)) / lit(mad), 6))
          .as("dev_score"),
        (abs(col("cnt") - lit(med)) > lit(madK) * lit(mad)).as("anomaly"))
  }
}

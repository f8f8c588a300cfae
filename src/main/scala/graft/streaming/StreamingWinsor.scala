package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/**
 * Streaming per-group winsorize + quantile-floor scoring — the stateless
 * stream-static twin of [[graft.operators.Curation.winsorize]] /
 * [[graft.operators.Curation.quantileFloor]] (the [[StreamingQuality]]
 * admission-control shape applied to the histogram-quantile thresholds):
 * derive the per-group [qLow, qHigh] clip band once batch-side via
 * [[graft.operators.Curation.groupQuantiles]] (ONE weighted-histogram
 * pass for both bounds, state ∝ distinct scores per group), then clip
 * and floor-flag every incoming document in-flight against the stored
 * band.
 *
 * This is the per-source length/quality admission cut at ingest:
 * periodically re-derive thresholds from the curated corpus, push the
 * |groups|-row table to the stream, route/clip documents as they arrive.
 * Stateless by construction — the feature (token count) is a narrow
 * expression, the thresholds side is a |groups|-row broadcast, so there
 * is no state store, append-mode is safe, and streamed verdicts are
 * row-identical to the batch operators at the same thresholds by
 * construction (gate-pinned against the DuckDB quantile_cont replay,
 * not assumed).
 *
 * All comparisons are pure IEEE on the unrounded quantile thresholds —
 * identical bit-for-bit in any engine replaying the same interpolation
 * (the [[graft.operators.Curation.winsorize]] discipline).
 */
object StreamingWinsor {

  /**
   * Flag a stream of (idCol, groupCol, textCol) documents against stored
   * per-group thresholds (`thresholds`: (groupCol, lo, hi) — e.g.
   * [[graft.operators.Curation.groupQuantiles]] output with thr_0/thr_1
   * renamed). Emits (idCol, groupCol, v, lo, hi, clipped, kept) with
   * v = whitespace token count, clipped = v winsorized to [lo, hi],
   * kept = v >= lo (the quantile-floor verdict). Rows whose group has no
   * stored threshold are dropped (an unknown source has no band to score
   * against — route those to a default policy upstream). Callers should
   * `localCheckpoint` the thresholds frame once per epoch: in a
   * stream-static join the static subplan re-executes per micro-batch.
   */
  def flagStream(stream: DataFrame, thresholds: DataFrame,
                 groupCol: String = "source", idCol: String = "doc_id",
                 textCol: String = "text"): DataFrame =
    stream.select(col(idCol), col(groupCol),
        TextFunctions.tokenCount(col(textCol)).cast("double").as("v"))
      .join(broadcast(thresholds.select(col(groupCol), col("lo"), col("hi"))),
        Seq(groupCol))
      .withColumn("clipped", least(greatest(col("v"), col("lo")), col("hi")))
      .withColumn("kept", col("v") >= col("lo"))
      .select(col(idCol), col(groupCol), col("v"), col("lo"), col("hi"),
        col("clipped"), col("kept"))
}

package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.operators.Learn

/**
 * Streaming quality scoring — the stateless stream-static twin of
 * [[Learn.scoreDocuments]] (the [[StreamingClusterAssign]] pattern applied
 * to the trained classifier): train the linear quality model once batch-
 * side, then score every incoming document in-flight through the same
 * feature expressions and inlined-literal predictor the batch path uses.
 * Every op is narrow (features + rational sigmoid), so the transform
 * applies directly to a streaming DataFrame — zero state-store rows,
 * append-mode safe, and streamed scores are row-identical to the batch
 * operator at the same weights by construction (gate-pinned against the
 * DuckDB GD replay, not assumed).
 *
 * This is the admission-control shape of a curation pipeline: periodically
 * retrain on the curated corpus, push the d+1 weights to the ingest
 * stream, drop or route documents by score as they arrive.
 */
object StreamingQuality {

  /** Score a stream of (doc_id, text, lang) rows with batch-trained
    * weights: (doc_id, label, score, pred_label) per input row. */
  def scoreStream(stream: DataFrame, weights: Array[Double]): DataFrame =
    Learn.scoreWith(stream, weights)
}

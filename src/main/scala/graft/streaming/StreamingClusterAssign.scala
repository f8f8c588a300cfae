package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.operators.Similarity

/**
 * Streaming cluster assignment — the stateless stream-static twin of
 * [[Similarity.clusterAssignments]] (the [[StreamingAnnServing]] pattern
 * applied to the clustering product): each micro-batch row is assigned to
 * its nearest STORED centroid through the same codegen'd
 * `vec_top_centroids` kernel the batch path uses, plus the broadcast
 * centroid join for the rounded member-to-centroid cosine. Every op is
 * narrow, so the transform applies directly to a streaming DataFrame —
 * zero state-store rows, append-mode safe, and streamed assignments are
 * row-identical to the batch operator at the same centroids by
 * construction (gate-pinned against the DuckDB replay, not assumed).
 *
 * This is the serving shape of a clustered corpus: train centroids once
 * (batch, bounded md5-order sample), then bucket every incoming document
 * embedding in-flight — routing, per-cluster quotas, drift monitoring.
 */
object StreamingClusterAssign {

  /** Assign a stream of (id, vector) rows to stored centroids:
    * (idCol, list_id, cos_centroid) per finite input row. */
  def assignStream(stream: DataFrame, centroids: Array[(Int, Array[Float])],
                   idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    Similarity.withCentroidCosine(
      Similarity.assignIvf(stream, centroids, idCol, vecCol), centroids, idCol)
}

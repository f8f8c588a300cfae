package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.TextAnalysis

/**
 * Streaming BM25 serving from a persisted lexical index
 * ([[TextAnalysis.saveLexicalIndex]] layout): the index artifact is the
 * STATIC side of a stream-static composition, the query batches are the
 * stream — the lexical twin of [[StreamingAnnServing]].
 *
 * Every micro-batch answers through the EXACT batch operator
 * ([[TextAnalysis.bm25QueryIndexBatch]] — one pruned postings scan for the
 * union of the batch's terms, heap-based per-query top-k), so streaming
 * answers are row-identical to batch answers for the same query set by
 * construction (gated in StreamingLexicalSpec, not assumed). Per-query
 * top-k needs a rank over the candidate set, which append-mode streaming
 * cannot express without state; answering each micro-batch with the batch
 * operator is the standard serving shape and keeps ONE implementation of
 * the scoring semantics.
 *
 * GROWING-INDEX semantics: the batch operator reads postings / termstats /
 * stats BY PATH inside each call, so every micro-batch sees a fresh file
 * listing — segments added by [[TextAnalysis.appendLexicalIndex]] become
 * searchable on the next epoch without restarting the stream (gate-pinned
 * with a term unique to the appended documents). This matters because a
 * captured DataFrame would snapshot its leaf files at stream construction
 * and silently never see appends.
 */
object StreamingLexicalServing {

  /**
   * Serve BM25 top-k answers for a stream of (query_id, terms) rows from
   * the index at `indexPath`: each micro-batch's answer frame
   * (query_id, doc_id, score, rnk) goes to `sink`. Queries with no
   * non-blank term (empty/blank/null terms arrays) are DATA, not
   * exceptions: they are dropped per batch, and a micro-batch left with
   * nothing servable is skipped — one malformed client query must never
   * take down serving for everyone (`sink` sees only epochs that carried
   * servable queries).
   */
  def serveBm25FromPath(queryStream: DataFrame, indexPath: String, k: Int,
                        k1: Double = 1.2, b: Double = 0.75,
                        queryIdCol: String = "query_id", termsCol: String = "terms")
                       (sink: (DataFrame, Long) => Unit): StreamingQuery = {
    // fail FAST at stream construction on a missing/corrupt artifact (one
    // footer read per table) instead of letting the deployment look healthy
    // until epoch 0 dies inside foreachBatch
    val spark0 = queryStream.sparkSession
    spark0.read.parquet(s"$indexPath/postings").schema
    spark0.read.parquet(s"$indexPath/termstats").schema
    spark0.read.parquet(s"$indexPath/stats").schema
    queryStream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], epochId: Long) =>
        // the batch operator requires ≥1 non-blank term across the batch —
        // filter unservable queries out FIRST (null arrays filter out via
        // exists' null propagation)
        val servable = batch.toDF()
          .where(exists(col(termsCol), t => trim(lower(t)) =!= ""))
        if (!servable.isEmpty)
          sink(TextAnalysis.bm25QueryIndexBatch(batch.sparkSession, indexPath,
            servable, k, k1, b, queryIdCol, termsCol), epochId)
      }
      .start()
  }
}

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
 * Every micro-batch answers through the EXACT batch scoring pipeline
 * ([[TextAnalysis.bm25QueryIndexBatchLocal]] — the driver-resident entry of
 * the same shared scorer as [[TextAnalysis.bm25QueryIndexBatch]]: one
 * pruned postings scan for the union of the batch's terms, heap-based
 * per-query top-k), so streaming answers are row-identical to batch
 * answers for the same query set by construction (gated in
 * StreamingLexicalSpec, not assumed). Per-query top-k needs a rank over
 * the candidate set, which append-mode streaming cannot express without
 * state; answering each micro-batch with the batch operator is the
 * standard serving shape and keeps ONE implementation of the scoring
 * semantics.
 *
 * Epoch cost discipline: the micro-batch is collected once (serving
 * batches are driver-small by contract) and the serve prelude — term
 * normalization, corpus stats (memoized on the stats-file listing), bucket
 * pruning ids (driver-side xxhash64) — runs without Spark jobs, so each
 * epoch spends its wall-clock on the one pruned scoring scan.
 *
 * GROWING-INDEX semantics: the batch operator reads postings / termstats /
 * stats BY PATH inside each call, so every micro-batch sees a fresh file
 * listing — segments added by [[TextAnalysis.appendLexicalIndex]] become
 * searchable on the next epoch without restarting the stream (gate-pinned
 * with a term unique to the appended documents). This matters because a
 * captured DataFrame would snapshot its leaf files at stream construction
 * and silently never see appends. [[serveBm25FromRoot]] extends the same
 * freshness across GENERATIONS: it re-resolves a
 * [[graft.operators.Generations]] pointer per micro-batch, so maintenance
 * flips are served without a restart (gate-pinned by
 * `streaming_bm25_generation_flip`).
 */
object StreamingLexicalServing extends org.apache.spark.internal.Logging {

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
                        queryIdCol: String = "query_id", termsCol: String = "terms",
                        maxBatchQueries: Int = 100000)
                       (sink: (DataFrame, Long) => Unit): StreamingQuery =
    serveBm25Resolving(queryStream, () => indexPath, k, k1, b,
      queryIdCol, termsCol, maxBatchQueries)(sink)

  /**
   * [[serveBm25FromPath]] for a [[graft.operators.Generations]] ROOT (or a
   * raw index path — a pointer-less root serves as-is): the serving
   * generation is RE-RESOLVED inside every micro-batch (at most three
   * driver-side FS metadata calls, never a Spark job), so an out-of-band
   * maintenance flip (`compactLexicalIndex` fold → `Generations.advance`)
   * is served from the NEXT epoch with no stream restart — the streamed
   * twin of [[graft.serving.RetrievalServer]]'s per-request resolution.
   * Within a generation the growing-index contract carries over unchanged
   * (appended segments searchable next epoch); across a flip the whole
   * artifact — postings, termstats, stats — rebinds at once, so an epoch
   * can never mix two generations' sums. The construction-time
   * torn-segment audit runs against the generation serving AT START.
   */
  def serveBm25FromRoot(queryStream: DataFrame, indexRoot: String, k: Int,
                        k1: Double = 1.2, b: Double = 0.75,
                        queryIdCol: String = "query_id", termsCol: String = "terms",
                        maxBatchQueries: Int = 100000)
                       (sink: (DataFrame, Long) => Unit): StreamingQuery = {
    val spark0 = queryStream.sparkSession
    serveBm25Resolving(queryStream,
      () => graft.operators.Generations.resolveIfPublished(spark0, indexRoot)
        .getOrElse(indexRoot),
      k, k1, b, queryIdCol, termsCol, maxBatchQueries)(sink)
  }

  private def serveBm25Resolving(queryStream: DataFrame,
                                 resolvePath: () => String, k: Int,
                                 k1: Double, b: Double,
                                 queryIdCol: String, termsCol: String,
                                 maxBatchQueries: Int)
                                (sink: (DataFrame, Long) => Unit): StreamingQuery = {
    require(maxBatchQueries > 0,
      "serveBm25FromPath: maxBatchQueries must be positive")
    val indexPath = resolvePath()
    // fail FAST at stream construction on a missing, corrupt or TORN
    // artifact (a crash mid-append leaves postings rows whose stats commit
    // record never landed — silently skewed idf/avgdl) instead of letting
    // the deployment look healthy until epoch 0 serves wrong scores. One
    // full count of postings/termstats — a construction-time audit, never
    // a per-epoch cost.
    val spark0 = queryStream.sparkSession
    // a pre-audit-schema artifact can't be audited but SERVES correctly
    // (serve paths read only the stats sums) — skip the torn-segment check
    // with an explicit notice instead of refusing to start; compaction
    // migrates it to auditable form
    TextAnalysis.lexicalAuditability(spark0, indexPath) match {
      case Some(reason) =>
        logWarning(s"serveBm25FromPath: skipping construction-time " +
          s"torn-segment audit — $reason")
      case None =>
        val audit = TextAnalysis.validateLexicalIndex(spark0, indexPath).collect()(0)
        require(audit.getAs[Boolean]("postings_consistent") &&
          audit.getAs[Boolean]("terms_consistent"),
          s"lexical index at $indexPath is torn: postings " +
            s"${audit.getAs[Long]("n_postings_actual")} vs committed " +
            s"${audit.getAs[Long]("n_postings_expected")}, termstats " +
            s"${audit.getAs[Long]("n_terms_actual")} vs committed " +
            s"${audit.getAs[Long]("n_terms_expected")} — recover by rebuilding " +
            "from the corpus, or remove the orphan segment files and compact")
    }
    queryStream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], epochId: Long) =>
        // collect the micro-batch ONCE (serving batches are driver-small by
        // contract) and run the whole serve prelude driver-side — term
        // normalization, blank/null-query filtering, stats (memoized),
        // bucket pruning ids — so the only Spark job per epoch is the
        // pruned scoring scan. A malformed client query (null/blank terms)
        // is dropped here, never an exception; an epoch left with nothing
        // servable is skipped (`sink` sees only epochs that carried
        // servable queries).
        // "serving batches are driver-small" is a CONTRACT, and contracts
        // get enforced: the collect is bounded by maxBatchQueries + 1 rows
        // (limit runs before collect, so driver memory is capped even when
        // a client violates it), and a violation fails with the config
        // knob's name instead of an OOM that takes down serving opaquely
        val rows = batch.toDF()
          .select(col(queryIdCol).cast("long"), col(termsCol))
          .limit(if (maxBatchQueries == Int.MaxValue) Int.MaxValue
                 else maxBatchQueries + 1) // saturating: MaxValue disables the cap
          .collect()
        require(rows.length <= maxBatchQueries,
          s"serveBm25FromPath: micro-batch exceeds maxBatchQueries=" +
            s"$maxBatchQueries query rows — split the client batch or " +
            "raise the limit")
        val qs = rows.iterator.collect {
          case r if !r.isNullAt(0) && !r.isNullAt(1) =>
            (r.getLong(0), r.getSeq[String](1))
        }.toSeq
        // servable = at least one term that normalizes (same UTF8String
        // trim/lowercase the scoring path applies) to a non-blank token
        def nonBlank(t: String): Boolean = t != null &&
          !org.apache.spark.unsafe.types.UTF8String.fromString(t)
            .trim().toString.isEmpty
        if (qs.exists(q => q._2 != null && q._2.exists(nonBlank)))
          // re-resolve the serving path PER EPOCH: for a Generations root
          // this is what makes an out-of-band pointer flip visible on the
          // next micro-batch (for a raw path the resolver is constant)
          sink(TextAnalysis.bm25QueryIndexBatchLocal(batch.sparkSession,
            resolvePath(), qs, k, k1, b), epochId)
      }
      .start()
  }
}

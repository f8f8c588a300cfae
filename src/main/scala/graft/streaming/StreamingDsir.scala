package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.TextFunctions

/**
 * Streaming per-document DSIR domain-affinity scoring — the data-selection
 * twin of [[StreamingDivergence]]: each incoming document's mean per-token
 * log-likelihood ratio against a STORED (term, lnr6) model
 * ([[graft.operators.TextAnalysis.dsirModel]]), entirely statelessly —
 * route or down-weight off-domain documents at ingest instead of after a
 * batch lands. iw(doc) = (Σ_buckets c_b · lnr6_b) / n — identical to the
 * per-token mean because each token contributes its bucket's ratio once.
 *
 * Statelessness: the (vocabSize+1)-row model is inlined as literals (the
 * quality-weights convention — model-sized state rides the plan, never a
 * state store), per-term counts are higher-order `filter` scans over the
 * tokenized array, OOV is the arithmetic complement n − Σ in-vocab, and
 * the weighted sum folds through exact DECIMAL(30,12) terms — matching
 * the batch oracle's decimal summation, so streamed scores replay
 * bit-for-bit. O(vocab × tokens) per row (fine for a per-row stream, the
 * reason the BATCH ranking uses the relational
 * [[graft.operators.TextAnalysis.dsirWeights]] instead); hard-capped for
 * vocabularies where the inlined-scan kernel stops making sense.
 */
object StreamingDsir {

  /** Score a stream of (idCol, textCol) rows against a batch-derived
    * (term, lnr6) model incl. the ''-keyed OOV bucket: (idCol, iw) per
    * input row with ≥1 token, iw rounded to 6 decimals. Token-free rows
    * are dropped (no distribution — mirrors the batch operator). */
  def scoreStream(stream: DataFrame, model: Seq[(String, Double)],
                  idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(model.nonEmpty, "scoreStream: empty DSIR model")
    require(model.size <= 1024,
      s"scoreStream: model inlines one filter scan per term — ${model.size} terms " +
        "exceeds the 1024 cap; score with the batch operator instead")
    require(model.count(_._1.isEmpty) == 1,
      "scoreStream: model must carry exactly one ''-keyed OOV bucket row")
    val toks = filter(TextFunctions.tokens(col(textCol)), t => t =!= lit(""))
    val n = size(toks)
    val vocabTerms = model.filter(_._1.nonEmpty)
    val oovLnr = model.find(_._1.isEmpty).get._2
    val vocabCnt: Seq[Column] = vocabTerms.map { case (v, _) =>
      size(filter(toks, t => t === lit(v))).cast("long")
    }
    val inVocabTotal = vocabCnt.reduceOption(_ + _).getOrElse(lit(0L))
    val termCols: Seq[Column] =
      vocabTerms.zip(vocabCnt).map { case ((_, lnr), cnt) =>
        cnt.cast("double") * lit(lnr)
      } :+ (n.cast("long") - inVocabTotal).cast("double") * lit(oovLnr)
    // exact decimal fold of the per-bucket c·lnr6 terms (the oracle's
    // SUM(CAST(term AS DECIMAL)) replayed order-free), then the mean
    val iw = round(
      aggregate(
        array(termCols.map(_.cast(DecimalType(30, 12))): _*),
        lit(java.math.BigDecimal.ZERO).cast(DecimalType(30, 12)),
        (acc, x) => (acc + x).cast(DecimalType(30, 12))
      ).cast("double") / n.cast("double"), 6)
    stream.filter(size(toks) > 0)
      .select(col(idCol), iw.as("iw"))
  }
}

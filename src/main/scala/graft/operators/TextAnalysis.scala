package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/**
 * Text-analysis pipelines over a documents table (doc_id, text, lang, source,
 * n_chars — TESTDATA.md): language ID, quality scoring, token counting,
 * fingerprinting. All narrow per-row transforms (whole-stage-codegen'd /
 * higher-order expressions) followed by at most one aggregate — the shape
 * that streams over 100 TB without a second thought.
 */
object TextAnalysis {

  /** Stopword list used by the quality score (English function words). */
  val Stopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "with", "for", "on", "as", "at", "by", "this", "be")

  /** Per-document metrics: token counts, lengths, ratios, quality score. */
  def docMetrics(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(
      col(idCol),
      length(col(textCol)).as("n_chars_m"),
      TextFunctions.tokenCount(col(textCol)).as("n_tokens"),
      TextFunctions.subwordCount(col(textCol)).as("n_subwords"),
      TextFunctions.meanTokenLen(col(textCol)).as("mean_token_len"),
      TextFunctions.punctRatio(col(textCol)).as("punct_ratio"),
      TextFunctions.stopwordRatio(col(textCol), Stopwords).as("stopword_ratio"),
      TextFunctions.qualityScore(col(textCol), Stopwords).as("quality"))

  /** Predicted language + per-document marker scores. */
  def langId(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val scored = TextFunctions.langScores(col(textCol)).foldLeft(
      docs.select(col(idCol), col(textCol))) {
      case (df, (lang, c)) => df.withColumn(s"score_$lang", c)
    }
    scored
      .withColumn("lang_pred", TextFunctions.langId(col(textCol)))
      .drop(textCol)
  }

  /** Corpus-level language-ID confusion vs a labeled `lang` column. */
  def langConfusion(docs: DataFrame): DataFrame =
    docs.select(col("lang"), TextFunctions.langId(col("text")).as("lang_pred"))
      .groupBy(col("lang"), col("lang_pred")).agg(count(lit(1)).as("n"))

  /** Document fingerprints: stable MD5 of normalized text + min rolling
    * 64-bit shingle fingerprint (winnowing-style representative). */
  def fingerprints(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
                   shingleN: Int = 3): DataFrame =
    docs.select(
      col(idCol),
      TextFunctions.fingerprint(col(textCol)).as("fp_md5"),
      array_min(TextFunctions.rollingFingerprints(col(textCol), shingleN)).as("fp_min_shingle"))

  /** Token-frequency table (corpus vocabulary with counts) — explode +
    * aggregate; the shuffle is keyed on token (high cardinality → scales). */
  def vocabulary(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(explode(TextFunctions.tokens(col(textCol))).as("token"))
      .filter(col("token") =!= "")
      .groupBy(col("token")).agg(count(lit(1)).as("freq"))
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/**
 * End-to-end training-data curation: the composition the individual M6
 * operators exist for. One call takes a raw documents table and returns the
 * kept corpus plus a per-stage audit trail:
 *
 *   1. exact dedup        — keep min-id doc per normalized-text fingerprint
 *   2. near-dup removal   — MinHash-LSH pairs; drop the higher id of each
 *                           verified pair (connected components degenerate to
 *                           this under the a<b convention applied repeatedly;
 *                           single-pass drop-b is the standard approximation)
 *   3. quality filter     — composite score ≥ minQuality
 *   4. language filter    — predicted language ∈ keepLangs (empty = keep all)
 *
 * Every stage is a shuffle-bounded DataFrame op (hash-agg, bucket-join,
 * narrow filter) — the pipeline form survives a 1000-executor 100 TB run:
 * nothing is collected, no stage is quadratic, and the near-dup join is
 * LSH-bucketed.
 */
object Curation {

  final case class Config(
      shingleN: Int = 3,
      minhashBands: Int = 8,
      minhashRowsPerBand: Int = 4,
      nearDupThreshold: Double = 0.8,
      minQuality: Double = 0.0,
      keepLangs: Seq[String] = Nil,
      stopwords: Seq[String] = TextAnalysis.Stopwords)

  /** Kept documents after all stages, with per-doc metrics attached.
    * Input needs (idCol, textCol); all other columns pass through. */
  def curate(docs: DataFrame, cfg: Config = Config(),
             idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    // 1. exact dedup (deterministic representative)
    val exact = Dedup.exactDedupKept(docs, idCol, textCol)

    // 2. near-dup removal: drop the b side of each verified pair
    val dupB = Dedup.minHashLsh(exact, idCol, textCol,
      cfg.shingleN, cfg.minhashBands, cfg.minhashRowsPerBand, cfg.nearDupThreshold)
      .select(col("b").as(idCol)).distinct()
    val deduped = exact.join(dupB, Seq(idCol), "left_anti")

    // 3+4. quality + language, computed in one narrow pass
    deduped
      .withColumn("quality", TextFunctions.qualityScore(col(textCol), cfg.stopwords))
      .withColumn("lang_pred", TextFunctions.langId(col(textCol)))
      .filter(col("quality") >= cfg.minQuality)
      .filter(if (cfg.keepLangs.isEmpty) lit(true)
              else col("lang_pred").isin(cfg.keepLangs: _*))
  }

  /** Per-stage survivor counts — the audit table a curation run reports. */
  def funnel(docs: DataFrame, cfg: Config = Config(),
             idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val n0 = docs.count()
    // each stage is counted AND feeds the next — cache the two reused
    // frontiers so the funnel costs one pipeline pass, not three
    val exact = Dedup.exactDedupKept(docs, idCol, textCol).persist()
    val n1 = exact.count()
    val dupB = Dedup.minHashLsh(exact, idCol, textCol,
      cfg.shingleN, cfg.minhashBands, cfg.minhashRowsPerBand, cfg.nearDupThreshold)
      .select(col("b").as(idCol)).distinct()
    val deduped = exact.join(dupB, Seq(idCol), "left_anti").persist()
    val n2 = deduped.count()
    val n3 = deduped
      .withColumn("quality", TextFunctions.qualityScore(col(textCol), cfg.stopwords))
      .withColumn("lang_pred", TextFunctions.langId(col(textCol)))
      .filter(col("quality") >= cfg.minQuality)
      .filter(if (cfg.keepLangs.isEmpty) lit(true)
              else col("lang_pred").isin(cfg.keepLangs: _*))
      .count()
    exact.unpersist()
    deduped.unpersist()
    Seq(
      ("0_input", n0),
      ("1_exact_dedup", n1),
      ("2_near_dedup", n2),
      ("3_quality_lang", n3))
      .toDF("stage", "n_docs")
  }

  /**
   * Deterministic token-budget sample: keep documents in xxhash64 order until
   * the cumulative whitespace-token count reaches `tokenBudget`. Stable
   * across runs/partitionings (hash order, not input order); one window pass.
   */
  def sampleToTokenBudget(docs: DataFrame, tokenBudget: Long,
                          idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(xxhash64(col(idCol)), col(idCol))
    docs
      .withColumn("_tokens", TextFunctions.tokenCount(col(textCol)).cast("long"))
      .withColumn("_cum", sum(col("_tokens")).over(w))
      .filter(col("_cum") <= tokenBudget)
      .drop("_cum")
      .withColumnRenamed("_tokens", "n_tokens")
  }
}

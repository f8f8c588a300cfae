package graft

import org.apache.spark.sql.functions._

import graft.operators.{Curation, Dedup, TextAnalysis}
import graft.sources.Tables

/**
 * End-to-end training-data pipeline composition — the "switch to this
 * library" story in one test: raw corpus → curate (exact dedup → near-dup
 * removal → quality/lang) → decontaminate against a benchmark slice →
 * chunk → pack into training sequences, with the stage invariants a real
 * run audits.
 */
class PipelineSpec extends SparkSpec {

  test("curate -> decontaminate -> chunk -> pack composes with stage invariants") {
    val docs = Tables.documents(spark, Sf).select(col("doc_id"), col("text"))
    val bench = docs.filter(col("doc_id") % 97 === 0)
    val train = docs.filter(col("doc_id") % 97 =!= 0)
    val n0 = train.count()

    // 1. curate: survivors are a subset with no duplicate fingerprints
    val curated = Curation.curate(train,
      Curation.Config(nearDupThreshold = 0.6, minQuality = 0.1))
    val n1 = curated.count()
    assert(n1 > 0 && n1 <= n0)
    val dupFps = curated
      .groupBy(graft.functions.TextFunctions.fingerprint(col("text")))
      .count().filter(col("count") > 1).count()
    assert(dupFps == 0, "curated corpus must be exact-dup free")

    // 2. decontaminate (Bloom, shuffle-free): no kept doc shares a 5-gram
    //    with the benchmark — verified with the EXACT contamination scan
    val clean = TextAnalysis.decontaminateBloom(curated, bench, shingleN = 5)
    val n2 = clean.count()
    assert(n2 <= n1)
    assert(TextAnalysis.contamination(clean, bench, shingleN = 5).count() == 0,
      "bloom-decontaminated corpus must pass the exact contamination scan")

    // 3. chunk: every kept doc yields >= 1 chunk; token accounting closes
    //    (sum of NEW tokens per chunk == doc token count)
    val chunks = Curation.chunkDocuments(clean, chunkTokens = 64, overlapTokens = 16)
    val perDoc = chunks.groupBy(col("doc_id")).agg(
      count(lit(1)).as("n_chunks"),
      sum(when(col("chunk_id") === 0, col("chunk_tokens"))
        .otherwise(col("chunk_tokens") - 16)).as("new_tokens"),
      max(col("tok_start") + col("chunk_tokens")).as("covered"))
    val toks = clean.select(col("doc_id"),
      graft.functions.TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"))
    val bad = perDoc.join(toks, "doc_id")
      .filter(col("n_chunks") < 1 || col("covered") =!= col("n_tokens")).count()
    assert(bad == 0, "chunks must tile every document exactly to its last token")

    // 4. pack: sequence ids are dense from 0 and each doc's span is sane
    val packed = Curation.packSequences(clean, seqTokens = 2048)
    val stats = packed.agg(
      min(col("seq_first")).as("mn"),
      max(col("seq_last")).as("mx"),
      count(when(col("seq_last") < col("seq_first"), 1)).as("bad")).head()
    assert(stats.getLong(2) == 0)
    assert(stats.getLong(0) == 0L)
    val totalTokens = packed.agg(sum(col("n_tokens"))).head().getLong(0)
    assert(stats.getLong(1) == (totalTokens - 1) / 2048,
      "last sequence id must equal ceil(total/2048) - 1")
  }
}

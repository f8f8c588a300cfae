package graft

import graft.operators.Curation
import graft.operators.Curation.Config

class CurationSpec extends SparkSpec {
  import spark.implicits._

  lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog and runs away to the hills today"),
    (2L, "the quick brown fox jumps over the lazy dog and runs away to the hills today"), // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy dog and runs away to the"),             // near dup of 1
    (4L, "der hund und die katze sind nicht ein paar mit problemen heute hier"),          // german
    (5L, "x"),                                                                            // junk (low quality)
    (6L, "a completely different english document with the usual words in it for testing"))
    .toDF("doc_id", "text")

  test("curate: exact dup, near dup, junk, and off-language docs are removed") {
    val kept = Curation.curate(docs,
      Config(nearDupThreshold = 0.6, minQuality = 0.15, keepLangs = Seq("en")))
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(kept.contains(1L))   // representative of 1/2/3
    assert(!kept.contains(2L))  // exact dup dropped
    assert(!kept.contains(3L))  // near dup dropped
    assert(!kept.contains(4L))  // german dropped by lang filter
    assert(!kept.contains(5L))  // junk dropped by quality
    assert(kept.contains(6L))
  }

  test("funnel reports monotonically shrinking survivor counts") {
    val f = Curation.funnel(docs, Config(nearDupThreshold = 0.6, minQuality = 0.15))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(f("0_input") == 6)
    assert(f("1_exact_dedup") == 5)
    assert(f("2_near_dedup") == 4)
    assert(f("3_quality_lang") <= f("2_near_dedup"))
  }

  test("token-budget sampling is deterministic and respects the budget") {
    val d = graft.sources.Tables.documents(spark, Sf)
    val s1 = Curation.sampleToTokenBudget(d, 5000).select($"doc_id").collect().map(_.getLong(0)).toSeq
    val s2 = Curation.sampleToTokenBudget(d, 5000).select($"doc_id").collect().map(_.getLong(0)).toSeq
    assert(s1 == s2 && s1.nonEmpty)
    val total = Curation.sampleToTokenBudget(d, 5000)
      .agg(org.apache.spark.sql.functions.sum($"n_tokens")).head().getLong(0)
    assert(total <= 5000)
  }
}

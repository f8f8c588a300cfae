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

  test("hashSplit: id-stable assignment, corpus-growth invariance, validation") {
    import org.apache.spark.sql.functions._
    val docs = graft.sources.Tables.documents(spark, Sf)
    val full = Curation.hashSplit(docs, Seq(0.8, 0.1, 0.1), Seq("train", "val", "test"))
      .select($"doc_id", $"split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // every split non-empty at fixture scale, roughly proportioned
    val byName = full.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(byName.keySet == Set("train", "val", "test"), byName.toString)
    assert(byName("train") > byName("val") && byName("train") > byName("test"))
    // growth invariance: a SUBSET of the corpus assigns identically — rows
    // never migrate between splits as data is added or removed
    val sub = Curation.hashSplit(docs.filter($"doc_id" % 3 === 0),
        Seq(0.8, 0.1, 0.1), Seq("train", "val", "test"))
      .select($"doc_id", $"split").collect()
    sub.foreach(r => assert(full(r.getLong(0)) == r.getString(1)))
    // determinism across calls
    val again = Curation.hashSplit(docs, Seq(0.8, 0.1, 0.1), Seq("train", "val", "test"))
      .select($"doc_id", $"split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(again == full)
    intercept[IllegalArgumentException] {
      Curation.hashSplit(docs, Seq(0.8, -0.1), Seq("a", "b"))
    }
    intercept[IllegalArgumentException] {
      Curation.hashSplit(docs, Seq(0.8, 0.2), Seq("only"))
    }
  }

  test("cdc chunk rows: tile each document's bytes; duplicate report finds planted copies") {
    import org.apache.spark.sql.functions._
    val docs = graft.sources.Tables.documents(spark, Sf)
    val chunks = Curation.cdcChunkDocuments(docs, maskBits = 6)
    // per-doc: chunk spans tile [0, octet_length) contiguously
    val audit = chunks.groupBy($"doc_id")
      .agg(min($"start").as("s0"), max(col("start") + col("len")).as("end"),
        sum($"len").as("cover"), count(lit(1)).as("k"))
      .join(docs.select($"doc_id",
        octet_length(encode($"text", "UTF-8")).as("n")), "doc_id")
    assert(audit.filter($"s0" =!= 0 || $"end" =!= $"n" || $"cover" =!= $"n").count() == 0)
    // an exact copy of a doc must produce identical chunk digests → the
    // duplicate report finds every chunk of the copied doc
    val withCopy = docs.select($"doc_id", $"text")
      .union(docs.filter($"doc_id" === 3).select(($"doc_id" + 500000).as("doc_id"), $"text"))
    val dup = Curation.cdcDuplicateChunks(withCopy, maskBits = 6)
    val copiedChunks = Curation.cdcChunkDocuments(
      docs.filter($"doc_id" === 3), maskBits = 6).count()
    assert(dup.filter($"min_doc_id" === 3).count() >= copiedChunks)
  }

  test("cdc maskBits outside [1,63] is rejected loudly, not an empty result") {
    val docs = graft.sources.Tables.documents(spark, Sf)
    for (bad <- Seq(0, -1, 64)) {
      val e = intercept[IllegalArgumentException] {
        Curation.cdcChunkDocuments(docs, maskBits = bad)
      }
      assert(e.getMessage.contains("maskBits"))
    }
  }

  test("temperatureMix: hand-computed sqrt-flattened weights; validation") {
    import org.apache.spark.sql.functions.col
    // source a: 3 + 6 = 9 tokens (√ = 3.0), source b: 16 tokens (√ = 4.0)
    val mix = Seq(
      (1L, "a", "w w w"),
      (2L, "a", "w w w w w w"),
      (3L, "b", Seq.fill(16)("w").mkString(" "))).toDF("doc_id", "source", "text")
    val got = Curation.temperatureMix(mix, budgetTokens = 1000000L)
      .orderBy(col("source"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    // raw shares 9/25 = 0.36 vs 16/25 = 0.64 flatten to 3/7 vs 4/7 —
    // the tail source gains (0.36 → 0.428571), the head loses
    assert(got.toSeq == Seq(
      ("a", 2L, 9L, 0.36, 0.428571, 428571.0),
      ("b", 1L, 16L, 0.64, 0.571429, 571429.0)))
    intercept[IllegalArgumentException] {
      Curation.temperatureMix(mix, budgetTokens = 0L)
    }
  }

  test("snapshotDiff classifies added/removed/changed/unchanged exactly") {
    import spark.implicits._
    val old = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma")).toDF("doc_id", "text")
    val nw = Seq((2L, "beta"), (3L, "gamma edited"), (4L, "delta")).toDF("doc_id", "text")
    val got = Curation.snapshotDiff(old, nw).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "removed", 2L -> "unchanged", 3L -> "changed", 4L -> "added"))
    // identical snapshots: everything unchanged, cardinality preserved
    val same = Curation.snapshotDiff(old, old).collect()
    assert(same.length == 3 && same.forall(_.getString(1) == "unchanged"))
    // NULL content is compared null-safely, never read as absence:
    // id 1 NULL->NULL unchanged, id 2 text->NULL changed, id 3 removed
    val oldN = Seq((1L, null: String), (2L, "beta"), (3L, "gamma"))
      .toDF("doc_id", "text")
    val nwN = Seq((1L, null: String), (2L, null: String)).toDF("doc_id", "text")
    val gotN = Curation.snapshotDiff(oldN, nwN).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(gotN == Map(1L -> "unchanged", 2L -> "changed", 3L -> "removed"))
  }
}

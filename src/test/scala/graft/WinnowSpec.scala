package graft

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** Robust winnowing (MOSS): bit-exact naive driver replay, the
  * w+k-1 match guarantee on planted prefix copies, short-doc edges,
  * parameter validation, plan shape (no inferred-filter md5 storm). */
class WinnowSpec extends SparkSpec {
  import spark.implicits._

  /** Driver replay of the exact operator arithmetic (Spark `trim` strips
    * ASCII spaces only — not Java's `String.trim` control-char sweep).
    * Gram hashes are the DIRECT per-gram Karp-Rabin polynomial (no rolling
    * update) and window minima the O(n·w) rescan — independently pinning
    * that the kernel's rolling update and monotone deque compute the same
    * values the definition does. */
  private def naive(text: String, k: Int, w: Int): Seq[(Int, Long)] = {
    val lowered = text.toLowerCase(java.util.Locale.ROOT)
    val trimmed = lowered.dropWhile(_ == ' ').reverse.dropWhile(_ == ' ').reverse
    val nm = trimmed.replaceAll("\\s+", " ")
    val cps = nm.codePoints().toArray
    val n = cps.length - (k - 1)
    if (n < 1) return Seq.empty
    val B = graft.plans.TextKernels.WinnowBase
    val M = graft.plans.TextKernels.WinnowMod
    val hs = (0 until n).map { p =>
      var h = 0L
      for (i <- 0 until k) h = (h * B + cps(p + i)) % M
      h
    }
    (1 to math.max(n - w + 1, 1)).map { i =>
      var best = (Long.MaxValue, 0)
      for (p <- i to math.min(i + w - 1, n))
        if (hs(p - 1) <= best._1) best = (hs(p - 1), p) // <= → rightmost min
      (best._2, best._1)
    }.distinct
  }

  test("bit-exact naive replay over the real corpus") {
    val docs = graft.sources.Tables.documents(spark, Sf)
    val got = TextAnalysis.winnowFingerprints(docs)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .groupBy(_._1).map { case (id, rs) => id -> rs.map(t => (t._2, t._3)).toSet }
    val exp = docs.select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> naive(r.getString(1), 8, 4).toSet)
      .filter(_._2.nonEmpty).toMap
    assert(got.keySet == exp.keySet)
    got.foreach { case (id, fps) => assert(fps == exp(id), s"doc $id") }
  }

  test("guarantee: every planted 75%-prefix copy pairs with its original") {
    // a shared verbatim passage of >= w+k-1 = 11 normalized chars means a
    // shared selected fingerprint (both docs contain the identical full
    // window and select its rightmost minimum) — with the df cut disabled,
    // every planted (orig, orig+100000) pair must surface
    val docs = Fixtures.docsWithNearDups(
      graft.sources.Tables.documents(spark, Sf).filter(col("doc_id") < 100))
    val pairs = TextAnalysis.winnowMatches(docs, minShared = 1, maxDf = 1000000)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = docs.filter(col("doc_id") >= 100000)
      .filter(length(regexp_replace(trim(lower(col("text"))), "\\s+", " ")) >= 11)
      .select((col("doc_id") - 100000).as("a"), col("doc_id").as("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    expected.foreach(p => assert(pairs.contains(p), s"missing planted pair $p"))
  }

  test("short docs: < k chars → no rows; k <= len < k+w-1 → one fingerprint") {
    val docs = Seq(
      (1L, "abcdefg"),        // 7 chars < k=8 → no grams
      (2L, "abcdefgh"),       // exactly k → 1 gram, 1 window
      (3L, "abcdefghij")      // 3 grams < w=4 → single window, 1 selection
    ).toDF("doc_id", "text")
    val out = TextAnalysis.winnowFingerprints(docs)
      .collect().map(r => r.getLong(0)).groupBy(identity).view.mapValues(_.length).toMap
    assert(!out.contains(1L))
    assert(out(2L) == 1)
    assert(out(3L) == 1)
  }

  test("identical docs share their full fingerprint set; validation") {
    val t = "the quick brown fox jumps over the lazy dog again and again"
    val docs = Seq((1L, t), (2L, t)).toDF("doc_id", "text")
    val nFps = TextAnalysis.winnowFingerprints(docs)
      .filter(col("doc_id") === 1L).select(col("fp")).distinct().count()
    val m = TextAnalysis.winnowMatches(docs, minShared = 1, maxDf = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(m.toSeq == Seq((1L, 2L, nFps)))
    intercept[IllegalArgumentException] {
      TextAnalysis.winnowFingerprints(docs, k = 0)
    }
    intercept[IllegalArgumentException] {
      TextAnalysis.winnowFingerprints(docs, w = 0)
    }
    intercept[IllegalArgumentException] {
      TextAnalysis.winnowMatches(docs, minShared = 0)
    }
    intercept[IllegalArgumentException] {
      TextAnalysis.winnowMatches(docs, maxDf = 1)
    }
  }

  test("plan: the selection kernel runs once — no inferred-filter duplicate") {
    val docs = graft.sources.Tables.documents(spark, Sf)
    val plan = TextAnalysis.winnowFingerprints(docs)
      .queryExecution.optimizedPlan.toString
    // exactly one winnow_select: a second copy would mean Catalyst's
    // InferFiltersFromGenerate re-evaluates the whole kernel in a guard
    // filter below the generate (the round-12 md5-storm failure mode)
    assert("winnow_select".r.findAllIn(plan).length == 1, plan.take(2000))
    assert(!plan.contains("md5"), plan.take(2000))
  }
}

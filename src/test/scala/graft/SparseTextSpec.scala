package graft

import org.apache.spark.sql.execution.joins.CartesianProductExec
import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** tf-idf phrase extraction + sparse more-like-this (inverted-index cosine). */
class SparseTextSpec extends SparkSpec {
  import spark.implicits._

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("tfIdfTopTerms: hand-computed bigram scores, (score DESC, term ASC) ties") {
    // 3 docs; bigram "b c" in all three (df=3), "a b" in two (df=2),
    // "x y" only in doc 3 (df=1)
    val docs = Seq(
      (1L, "a b c"),        // bigrams: "a b", "b c"
      (2L, "a b c"),
      (3L, "x y b c")       // bigrams: "x y", "y b", "b c"
    ).toDF("doc_id", "text")
    val out = TextAnalysis.tfIdfTopTerms(docs, gramN = 2, k = 5)
      .orderBy(col("doc_id"), col("rnk"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3), r.getLong(4), r.getDouble(5)))
    def idf6(df: Long) = round6(math.log(4.0 / (df + 1.0)) + 1.0)
    // doc 1: "a b" (df=2, idf6≈1.287682) beats "b c" (df=3, idf6=1.0)
    assert(out.filter(_._1 == 1L).toSeq === Seq(
      (1L, 1, "a b", 1L, 2L, round6(1 * idf6(2))),
      (1L, 2, "b c", 1L, 3L, round6(1 * idf6(3)))))
    // doc 3: df=1 bigrams tie on score → term ASC breaks: "x y" then "y b"
    assert(out.filter(_._1 == 3L).map(t => (t._2, t._3)).toSeq ===
      Seq((1, "x y"), (2, "y b"), (3, "b c")))
  }

  test("sparseSimilarDocs: identical docs hit cosine 1.0; df-cut drops ubiquitous terms") {
    // 12 docs: 1 and 2 identical; 3 shares nothing in-band; the trigram
    // "z z z" appears in ALL docs → df=12 > 12/5 → cut everywhere
    val noise = (4L to 12L).map(i => (i, s"n$i m$i o$i p$i z z z"))
    val docs = (Seq(
      (1L, "p q r s z z z"),
      (2L, "p q r s z z z"),
      (3L, "u v w x z z z")) ++ noise).toDF("doc_id", "text")
    val out = TextAnalysis.sparseSimilarDocs(docs, gramN = 3, k = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(4)))
    // only the 1↔2 pair shares in-band trigrams ("p q r", "q r s"); the
    // shared "z z z"-suffixed grams differ per doc tail, and "z z z" is cut
    assert(out.toSet === Set((1L, 1, 2L, 1.0), (2L, 1, 1L, 1.0)))
  }

  test("sparseSimilarDocs: partial overlap scores strictly below 1 and replays the unit arithmetic") {
    val docs = Seq(
      (1L, "a b c d e"),   // trigrams: abc, bcd, cde
      (2L, "a b c d x"),   // trigrams: abc, bcd, cdx
      (3L, "a b c y z"),   // abc, bcy, cyz
      (4L, "q r s t u"),   // disjoint
      (5L, "q r s t u")    // pair so doc 4/5 have a partner
    ).toDF("doc_id", "text")
    val out = TextAnalysis.sparseSimilarDocs(docs, gramN = 3, k = 5,
      minDf = 1, maxDfNum = 4, maxDfDen = 5) // df ∈ [1, 4]: singletons in-band
      .collect().map(r => ((r.getLong(0), r.getLong(2)), (r.getLong(3), r.getDouble(4)))).toMap
    // doc1↔doc2 share {abc, bcd} (2 of 3 equal-weight-ish terms each side);
    // doc1↔doc3 share {abc} only → strictly smaller cosine
    val s12 = out((1L, 2L)); val s13 = out((1L, 3L))
    assert(s12._1 === 2L && s13._1 === 1L)
    assert(s12._2 > s13._2 && s12._2 < 1.0 && s13._2 > 0.0)
    // doc4≡doc5 but with THREE equal-weight terms the micro-unit grid shows:
    // u = round(1e6/sqrt(3)) = 577350, dot = 3*577350^2 = 999_999_067_500
    // → round6(dot/1e12) = 0.999999 — the quantized self-cosine, exactly
    // what the integer-unit contract (and the DuckDB oracle) computes.
    assert(out((4L, 5L))._2 === 0.999999)
    // symmetric
    assert(out((2L, 1L)) === s12 && out((3L, 1L)) === ((1L, s13._2)))
  }

  test("maxDfAbs bounds per-term fan-out absolutely (duplicate-heavy corpus)") {
    // 6 exact copies + 2 singletons: with a permissive relative cut the copy
    // group's terms (df=6) generate 15 pairs; maxDfAbs=4 cuts them while the
    // singleton pair (df=2) survives
    val docs = ((1L to 6L).map(i => (i, "a b c d e")) ++
      Seq((7L, "p q r s t"), (8L, "p q r s t"))).toDF("doc_id", "text")
    val out = TextAnalysis.sparseSimilarDocs(docs, gramN = 3, k = 10,
      minDf = 2, maxDfNum = 1, maxDfDen = 1, maxDfAbs = Some(4))
      .select("doc_id", "nbr_id").as[(Long, Long)].collect().toSet
    assert(out === Set((7L, 8L), (8L, 7L)))
    intercept[IllegalArgumentException] {
      TextAnalysis.sparseSimilarDocs(docs, minDf = 3, maxDfAbs = Some(2))
    }
  }

  test("plan: the candidate generator is a term equi-join, never cartesian") {
    val docs = Seq((1L, "a b c d"), (2L, "a b c e")).toDF("doc_id", "text")
    val plan = TextAnalysis.sparseSimilarDocs(docs, gramN = 3, k = 2,
      maxDfNum = 1, maxDfDen = 1)
      .queryExecution.executedPlan
    assert(plan.collect { case c: CartesianProductExec => c }.isEmpty,
      s"cartesian in sparse-similarity plan:\n$plan")
  }
}

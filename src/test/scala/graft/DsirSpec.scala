package graft

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** DSIR importance weights: separation on a planted two-domain corpus, a
  * bit-exact naive driver replay of the smoothed log-ratio, invariance to
  * partition count, and the no-token / empty-target edges. */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  // two "domains": target docs speak alpha, background docs speak beta;
  // doc 5 mixes, doc 6 is whitespace-only (no distribution)
  private def corpus = Seq(
    (1L, "en", "alpha alpha alpha gamma"),
    (2L, "en", "alpha gamma alpha alpha"),
    (3L, "de", "beta beta beta gamma"),
    (4L, "de", "beta gamma beta beta"),
    (5L, "de", "alpha beta gamma gamma"),
    (6L, "de", "   ")
  ).toDF("doc_id", "lang", "text")

  test("target-domain docs outweigh background docs; mixed doc sits between") {
    val w = TextAnalysis.dsirWeights(corpus, col("lang") === "en", vocabSize = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(w.keySet === Set(1L, 2L, 3L, 4L, 5L)) // doc 6 has no tokens
    assert(w(1L) > w(5L) && w(2L) > w(5L))
    assert(w(5L) > w(3L) && w(5L) > w(4L))
  }

  test("matches a naive driver-side replay bit-for-bit (OOV path exercised)") {
    val v = 2 // < 3 distinct corpus tokens, so gamma goes through OOV smoothing
    val docs = corpus.collect().map(r =>
      (r.getLong(0), r.getString(1) == "en",
        r.getString(2).trim.toLowerCase.split("\\s+").filter(_.nonEmpty)))
    val all = docs.flatMap(_._3)
    val tgt = docs.filter(_._2).flatMap(_._3)
    val cAll = all.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val cTgt = tgt.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val vocab = cAll.toSeq.sortBy { case (t, c) => (-c, t) }.take(v).map(_._1).toSet
    val (tAll, tTgt) = (all.length.toLong, tgt.length.toLong)
    def lnr(t: String): Double = {
      val (fa, ft) =
        if (vocab(t)) (cAll(t), cTgt.getOrElse(t, 0L)) else (0L, 0L)
      math.log((ft + 1).toDouble / (tTgt + v + 1)) -
        math.log((fa + 1).toDouble / (tAll + v + 1))
    }
    val expected = docs.filter(_._3.nonEmpty).map { case (id, _, ts) =>
      val iw = BigDecimal(ts.map(lnr).sum / ts.length)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      id -> iw
    }.toMap
    val got = TextAnalysis.dsirWeights(corpus, col("lang") === "en", vocabSize = v)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got === expected)
  }

  test("weights are invariant to partitioning") {
    val base = TextAnalysis.dsirWeights(corpus, col("lang") === "en", vocabSize = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1).toSeq
    val re = TextAnalysis.dsirWeights(corpus.repartition(7), col("lang") === "en",
        vocabSize = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1).toSeq
    assert(base === re)
  }

  test("empty target slice degenerates to all-negative weights, no failure") {
    val w = TextAnalysis.dsirWeights(corpus, col("lang") === "xx", vocabSize = 10)
      .collect().map(_.getDouble(1))
    assert(w.nonEmpty && w.forall(_ < 0.0))
  }

  test("vocabSize must be positive") {
    intercept[IllegalArgumentException] {
      TextAnalysis.dsirWeights(corpus, col("lang") === "en", vocabSize = 0)
    }
  }
}

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

  test("dsirModel: quantized log-ratios match a naive replay; OOV row always present") {
    val v = 2 // gamma falls out of vocab -> exercises the OOV bucket maths
    val model = TextAnalysis.dsirModel(corpus, col("lang") === "en", vocabSize = v)
    val docs = corpus.collect().map(r =>
      (r.getString(1) == "en",
        r.getString(2).trim.toLowerCase.split("\\s+").filter(_.nonEmpty)))
    val all = docs.flatMap(_._2)
    val tgt = docs.filter(_._1).flatMap(_._2)
    val cAll = all.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val cTgt = tgt.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val vocab = cAll.toSeq.sortBy { case (t, c) => (-c, t) }.take(v).map(_._1)
    def lnr6(fa: Long, ft: Long): Double =
      BigDecimal(math.log((ft + 1).toDouble / (tgt.length + v + 1)) -
          math.log((fa + 1).toDouble / (all.length + v + 1)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = (vocab.map(t => (t, lnr6(cAll(t), cTgt.getOrElse(t, 0L)))) :+
      (("", lnr6(0L, 0L)))).sortBy(_._1)
    assert(model === expected)
    assert(model.count(_._1.isEmpty) == 1 && model.size == v + 1)
  }

  test("StreamingDsir.scoreStream matches a naive weighted-bucket replay") {
    import graft.streaming.StreamingDsir
    val v = 2
    val model = TextAnalysis.dsirModel(corpus, col("lang") === "en", vocabSize = v)
    val lnrOf = model.toMap
    val vocab = model.map(_._1).filter(_.nonEmpty).toSet
    val expected = corpus.collect().flatMap { r =>
      val ts = r.getString(2).trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
      if (ts.isEmpty) None else {
        val sum = ts.groupBy(b => if (vocab(b)) b else "").map {
          case (b, xs) =>
            BigDecimal(xs.length.toDouble * lnrOf(b))
              .setScale(12, BigDecimal.RoundingMode.HALF_UP)
        }.sum
        Some(r.getLong(0) -> BigDecimal(sum.toDouble / ts.length)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
    }.toMap
    val got = StreamingDsir.scoreStream(corpus, model).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got === expected)
    // target-like docs score high, background docs low — through the stream too
    assert(got(1L) > got(5L) && got(5L) > got(3L))
  }

  test("StreamingDsir validation: empty / oversized / OOV-less models rejected") {
    import graft.streaming.StreamingDsir
    val docs = Seq((1L, "a b")).toDF("doc_id", "text")
    intercept[IllegalArgumentException](StreamingDsir.scoreStream(docs, Seq.empty))
    intercept[IllegalArgumentException](StreamingDsir.scoreStream(docs,
      (1 to 1025).map(i => (s"t$i", 0.1)) :+ (("", -0.1))))
    intercept[IllegalArgumentException](StreamingDsir.scoreStream(docs,
      Seq(("a", 0.1), ("b", -0.1)))) // no OOV bucket row
  }
}

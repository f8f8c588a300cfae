package graft

import org.apache.spark.sql.functions._

import graft.operators.Learn

/** Learned quality filtering: GD-training laws, a bit-exact naive driver
  * replay of the distributed loop, and partitioning-invariance of the
  * decimal gradient sums. */
class LearnSpec extends SparkSpec {
  import spark.implicits._

  private def toyFeatures = Seq(
    // separable-ish: y=1 rows have higher x1, lower x2
    (1L, 1.0, 1.2, 0.02, 0.5), (2L, 1.0, 0.9, 0.05, 0.4),
    (3L, 1.0, 1.5, 0.01, 0.6), (4L, 0.0, 0.2, 0.30, 0.1),
    (5L, 0.0, 0.1, 0.25, 0.0), (6L, 0.0, 0.3, 0.40, 0.2)
  ).toDF("id", "y", "x1", "x2", "x3")

  test("training reduces squared loss over iterations") {
    def loss(w: Array[Double]): Double = {
      val rows = toyFeatures.select(col("y"), col("x1"), col("x2"), col("x3")).collect()
      rows.map { r =>
        val p = w(0) + w(1) * r.getDouble(1) + w(2) * r.getDouble(2) + w(3) * r.getDouble(3)
        val e = p - r.getDouble(0); e * e
      }.sum
    }
    val w0 = Array(0.0, 0.0, 0.0, 0.0)
    val w3 = Learn.trainLinear(toyFeatures, Seq("x1", "x2", "x3"), "y", iters = 3)
    val w8 = Learn.trainLinear(toyFeatures, Seq("x1", "x2", "x3"), "y", iters = 8)
    assert(loss(w3) < loss(w0))
    assert(loss(w8) < loss(w3))
  }

  test("matches a naive driver-side GD loop with the same rounding bit-for-bit") {
    def r12(x: Double): Double =
      BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
    val rows = toyFeatures.collect().map(r =>
      (r.getDouble(1), Array(r.getDouble(2), r.getDouble(3), r.getDouble(4))))
    val n = rows.length
    var w = Array(0.0, 0.0, 0.0, 0.0)
    for (_ <- 1 to 3) {
      val g = Array.fill(4)(java.math.BigDecimal.ZERO)
      rows.foreach { case (y, x) =>
        val pred = ((w(0) + w(1) * x(0)) + w(2) * x(1)) + w(3) * x(2)
        // residual quantized to the 6-grid BEFORE the products, exactly as
        // trainLinear and the learnCtes oracle evaluate it (tie-free round12)
        val err = BigDecimal(pred - y).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        g(0) = g(0).add(java.math.BigDecimal.valueOf(r12(err)))
        for (j <- 0 until 3)
          g(j + 1) = g(j + 1).add(java.math.BigDecimal.valueOf(r12(err * x(j))))
      }
      w = Array.tabulate(4)(j => r12(w(j) - 0.5 * (g(j).doubleValue / n)))
    }
    val got = Learn.trainLinear(toyFeatures, Seq("x1", "x2", "x3"), "y", iters = 3)
    assert(got.toSeq == w.toSeq)
  }

  test("weights are invariant under repartitioning (order-free decimal sums)") {
    val a = Learn.trainLinear(toyFeatures.repartition(7), Seq("x1", "x2", "x3"), "y", 3)
    val b = Learn.trainLinear(toyFeatures.repartition(2), Seq("x1", "x2", "x3"), "y", 3)
    assert(a.toSeq == b.toSeq)
  }

  test("scoreDocuments: rational sigmoid is monotone and separates the toy corpus") {
    val docs = Seq(
      (1L, "the cat sat on the mat and it was a good day for this", "en", "s"),
      (2L, "der hund lief schnell durch den park und bellte laut dabei", "de", "s"),
      (3L, "the quick brown fox jumps over the lazy dog in the sun", "en", "s"),
      (4L, "el gato negro duerme en la casa grande cerca del rio", "es", "s")
    ).toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")))
    val out = Learn.scoreDocuments(docs, iters = 5).collect()
    assert(out.length == 4)
    val byId = out.map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    // scores in (0,1)
    assert(byId.values.forall { case (_, s) => s > 0.0 && s < 1.0 })
    // mean English score above mean non-English score after training
    val (en, non) = byId.values.partition(_._1 == 1.0)
    assert(en.map(_._2).sum / en.size > non.map(_._2).sum / non.size)
  }

  test("divergent GD fails loudly with the remedy, not a weight blow-up") {
    import org.apache.spark.sql.functions.lit
    // RMS x1 far beyond the lr=0.5 stability bound -> geometric divergence
    val wide = toyFeatures.withColumn("x1", col("x1") * lit(1000.0))
    val e = intercept[IllegalArgumentException] {
      Learn.trainLinear(wide, Seq("x1", "x2", "x3"), "y", iters = 10)
    }
    assert(e.getMessage.contains("diverged"), e.getMessage)
  }

  test("parameter validation rejects bad iters/lr/empty input") {
    intercept[IllegalArgumentException] {
      Learn.trainLinear(toyFeatures, Seq("x1"), "y", iters = -1)
    }
    intercept[IllegalArgumentException] {
      Learn.trainLinear(toyFeatures, Seq("x1"), "y", iters = 1, lr = 0.0)
    }
    intercept[IllegalArgumentException] {
      Learn.trainLinear(toyFeatures.filter(col("id") < 0), Seq("x1"), "y", 1)
    }
  }

  test("calibration table: bins partition the scored corpus, rates and " +
    "means are exact") {
    val docs = Seq(
      (1L, "the cat sat on the mat and it was a good day for this", "en", "s"),
      (2L, "der hund lief schnell durch den park und bellte laut dabei", "de", "s"),
      (3L, "the quick brown fox jumps over the lazy dog in the sun", "en", "s"),
      (4L, "el gato negro duerme en la casa grande cerca del rio", "es", "s")
    ).toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")))
    val scored = Learn.scoreDocuments(docs, iters = 5).collect()
      .map(r => (r.getDouble(1), r.getDouble(2)))
    val out = Learn.calibrationTable(docs, iters = 5, bins = 10).collect()
    // bins partition: counts sum to the corpus, positives to the labels
    assert(out.map(_.getLong(1)).sum === 4L)
    assert(out.map(_.getLong(2)).sum === scored.count(_._1 == 1.0).toLong)
    out.foreach { r =>
      val bin = r.getInt(0)
      val inBin = scored.filter(s => math.min(math.floor(s._2 * 10).toInt, 9) == bin)
      assert(inBin.length.toLong === r.getLong(1))
      // exact-decimal mean of the round-6 scores
      val want = (inBin.map(s => BigDecimal(s._2)).sum / inBin.length)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getDouble(3) === want)
      assert(r.getDouble(4) ===
        BigDecimal(inBin.count(_._1 == 1.0).toDouble / inBin.length)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    intercept[IllegalArgumentException] { Learn.calibrationTable(docs, 1, bins = 1) }
  }

  test("calibration threshold: one row, argmax F1 over occupied bin edges, " +
    "ties to the lowest edge, p/r/f1 arithmetic from round-6 operands") {
    val docs = Seq(
      (1L, "the cat sat on the mat and it was a good day for this", "en", "s"),
      (2L, "der hund lief schnell durch den park und bellte laut dabei", "de", "s"),
      (3L, "the quick brown fox jumps over the lazy dog in the sun", "en", "s"),
      (4L, "el gato negro duerme en la casa grande cerca del rio", "es", "s"),
      (5L, "a very fine day with many english stopwords in the text here", "en", "s")
    ).toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")))
    val bins = 10
    val cal = Learn.calibrationTable(docs, iters = 5, bins = bins).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    val totalPos = cal.map(_._3).sum
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // manual candidate sweep over occupied bin edges
    val cands = cal.map { case (b, _, _) =>
      val kept = cal.filter(_._1 >= b)
      val k = kept.map(_._2).sum; val kp = kept.map(_._3).sum
      val p = r6(kp.toDouble / k)
      val r = r6(if (totalPos > 0) kp.toDouble / totalPos else 0.0)
      val f1 = if (p + r > 0) r6(2.0 * p * r / (p + r)) else 0.0
      (b, p, r, f1, k, kp)
    }
    val want = cands.sortBy(c => (-c._4, c._1)).head
    val got = Learn.calibrationThreshold(docs, iters = 5, bins = bins).collect()
    assert(got.length === 1)
    val g = got.head
    assert(g.getInt(0) === want._1)
    assert(g.getDouble(1) === r6(want._1.toDouble / bins))
    assert(g.getDouble(2) === want._2) // precision
    assert(g.getDouble(3) === want._3) // recall
    assert(g.getDouble(4) === want._4) // f1
    assert((g.getLong(5), g.getLong(6)) === ((want._5, want._6)))
  }
}

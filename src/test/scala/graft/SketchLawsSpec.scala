package graft

import org.apache.spark.sql.functions._

import graft.operators.{Bloom, Sketches}

/**
 * Randomized law checks over the sketch family — seeded generators, so
 * every run exercises the same 5 corpora per law but the corpora are
 * adversarially irregular (duplicates, gaps, negative keys where legal)
 * rather than the hand-picked fixtures of the unit specs.
 */
class SketchLawsSpec extends SparkSpec {
  import spark.implicits._

  private def randomKeys(seed: Int, n: Int, domain: Long): Seq[Long] = {
    val r = new scala.util.Random(seed)
    Seq.fill(n)(r.nextLong().abs % domain)
  }

  test("bloom law sweep: no false negatives for any seed/params; merge == " +
    "direct on random splits") {
    for (seed <- 1 to 5) {
      val m = 62 * (1 << (seed % 3 + 2)) // 248..1984 bits
      val k = seed % 3 + 2
      val keys = randomKeys(seed, 150, 10000).distinct
      val df = keys.toDF("id")
      val filter = Bloom.bloomWords(df, col("id"), m, k)
      val words = Bloom.denseWords(filter, m)
      val misses = df.filter(!Bloom.containsExpr(words, col("id"), m, k)).count()
      assert(misses === 0L, s"seed=$seed m=$m k=$k: false negative")
      // random 3-way split: merged == direct
      val slices = (0 until 3).map(i =>
        Bloom.bloomWords(df.filter(pmod(col("id"), lit(3)) === i), col("id"), m, k))
      val merged = Bloom.bloomMerge(slices)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
      val direct = filter
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
      assert(merged.toSeq === direct.toSeq, s"seed=$seed: merge law broke")
    }
  }

  test("kmv law sweep: sliced merge == direct sketch; set algebra exact " +
    "below k") {
    for (seed <- 1 to 5) {
      val kk = 64 << (seed % 2) // 64 or 128
      val keys = randomKeys(seed + 100, 400, 5000)
      val df = keys.toDF("id")
      val direct = Sketches.kmvSketch(df, col("id"), kk)
        .collect().map(_.getLong(0)).sorted
      val slices = (0 until 4).map(i =>
        Sketches.kmvSketch(df.filter(pmod(col("id"), lit(4)) === i), col("id"), kk))
      val merged = Sketches.kmvMerge(slices, kk)
        .collect().map(_.getLong(0)).sorted
      assert(merged.toSeq === direct.toSeq, s"seed=$seed k=$kk: kmv merge law")
      // exact set algebra below k: two small overlapping populations
      val a = keys.distinct.take(40)
      val b = keys.distinct.slice(20, 70)
      val r = Sketches.kmvSetEstimate(
        Sketches.kmvSketch(a.toDF("id"), col("id"), 256),
        Sketches.kmvSketch(b.toDF("id"), col("id"), 256), 256)
        .collect().head
      val union = (a ++ b).distinct.size
      val inter = a.toSet.intersect(b.toSet).size
      assert(r.getAs[Long]("n_union") === union.toLong, s"seed=$seed")
      assert(r.getAs[Long]("shared") === inter.toLong, s"seed=$seed")
      assert(r.getAs[Double]("union_est") === union.toDouble, s"seed=$seed")
    }
  }

  test("cms law sweep: point estimates and join-size estimates never " +
    "undercount on random corpora") {
    for (seed <- 1 to 5) {
      val (d, w) = (seed % 3 + 2, 8 << (seed % 3)) // tight grids: collisions
      val keys = randomKeys(seed + 200, 500, 60)
      val df = keys.toDF("id")
      val cells = Sketches.countMinCells(df, col("id"), d, w)
      val probes = keys.distinct.toDF("id")
      val est = Sketches.countMinEstimate(cells, probes, "id", d, w)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      val truth = keys.groupBy(identity).view.mapValues(_.size.toLong)
      truth.foreach { case (key, n) =>
        assert(est(key) >= n, s"seed=$seed: undercounted key $key")
      }
      // join-size law against a second random population
      val other = randomKeys(seed + 300, 300, 60)
      val cellsB = Sketches.countMinCells(other.toDF("id"), col("id"), d, w)
      val jest = Sketches.cmsJoinSize(cells, cellsB, d).collect().head.getLong(0)
      val jtruth = keys.map(k2 => other.count(_ == k2).toLong).sum
      assert(jest >= jtruth, s"seed=$seed: join-size undercount ($jest < $jtruth)")
    }
  }
}

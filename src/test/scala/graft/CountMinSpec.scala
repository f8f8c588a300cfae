package graft

import org.apache.spark.sql.functions._

import graft.operators.Sketches

/** Count-min sketch: hand-computed cells, never-undercount law, merge law. */
class CountMinSpec extends SparkSpec {
  import spark.implicits._

  private val M = 1000000007L
  private def h(key: Long, r: Int, width: Int): Long = {
    val a = Seq(31L, 131L, 1031L, 8191L)(r)
    val b = Seq(17L, 29L, 101L, 3L)(r)
    (key % M * a + b) % M % width
  }

  test("countMinCells: hand-computed 2x8 grid") {
    val df = Seq(5L, 5L, 5L, 9L, 9L, 42L).toDF("k")
    val cells = Sketches.countMinCells(df, col("k"), depth = 2, width = 8)
      .collect().map(r => ((r.getInt(0), r.getLong(1)), r.getLong(2))).toMap
    val expected = Seq(5L -> 3L, 9L -> 2L, 42L -> 1L).flatMap { case (k, n) =>
      (0 until 2).map(r => ((r, h(k, r, 8)), n))
    }.groupBy(_._1).map { case (cell, xs) => (cell, xs.map(_._2).sum) }
    assert(cells === expected)
    // column sums per row == total item count (mass conservation)
    (0 until 2).foreach { r =>
      assert(cells.collect { case ((`r`, _), n) => n }.sum === 6L)
    }
  }

  test("negative keys: cells land in [0, width) and estimates never undercount") {
    // plain % keeps the dividend's sign in Spark — a negative key would
    // build a cell the estimate path never probes and return a silent 0;
    // pmod pins build and probe to the same non-negative cell
    val df = Seq(-5L, -5L, -5L, -1000000009L, 7L).toDF("k")
    val cells = Sketches.countMinCells(df, col("k"), depth = 2, width = 8)
    val got = cells.collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(got.forall { case (_, c, _) => c >= 0 && c < 8 })
    val est = Sketches.countMinEstimate(
        cells, Seq(-5L, -1000000009L).toDF("k"), "k", depth = 2, width = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(est(-5L) >= 3L)            // never undercounts
    assert(est(-1000000009L) >= 1L)
  }

  test("estimate never undercounts, and equals exact when cells are private") {
    val keys = (1L to 40L)
    val data = keys.flatMap(k => Seq.fill((k % 5 + 1).toInt)(k)).toDF("k")
    val cells = Sketches.countMinCells(data, col("k"), depth = 4, width = 64)
    val est = Sketches.countMinEstimate(cells, keys.toDF("k"), "k", depth = 4, width = 64)
    val exact = data.groupBy(col("k")).agg(count(lit(1)).as("exact"))
    val joined = est.join(exact, "k")
      .select(col("k"), col("est"), col("exact")).collect()
    assert(joined.length === 40)
    joined.foreach(r => assert(r.getLong(1) >= r.getLong(2),
      s"undercount for key ${r.getLong(0)}"))
  }

  test("absent key estimates 0 only if some row's cell is empty") {
    val data = Seq(1L, 2L, 3L).toDF("k")
    val cells = Sketches.countMinCells(data, col("k"), depth = 4, width = 64)
    // with 3 items in a 4x64 grid, an unrelated key almost surely probes an
    // empty cell in at least one row -> min is 0; key 999 verified so here
    val est = Sketches.countMinEstimate(cells, Seq(999L).toDF("k"), "k", 4, 64)
      .collect()
    assert(est.head.getLong(1) === 0L)
  }

  test("merge law: cell-wise sum of slice sketches == direct build") {
    val data = (1L to 100L).map(k => k % 17).toDF("k")
    val slices = (0 until 4).map(i =>
      Sketches.countMinCells(data.filter(col("k") % 4 === i), col("k"), 3, 16))
    val merged = Sketches.countMinMerge(slices)
      .collect().map(r => ((r.getInt(0), r.getLong(1)), r.getLong(2))).toMap
    val direct = Sketches.countMinCells(data, col("k"), 3, 16)
      .collect().map(r => ((r.getInt(0), r.getLong(1)), r.getLong(2))).toMap
    assert(merged === direct)
  }

  test("parameter validation") {
    val df = Seq(1L).toDF("k")
    intercept[IllegalArgumentException](Sketches.countMinCells(df, col("k"), 0, 8))
    intercept[IllegalArgumentException](Sketches.countMinCells(df, col("k"), 9, 8))
    intercept[IllegalArgumentException](Sketches.countMinCells(df, col("k"), 4, 1))
    intercept[IllegalArgumentException](Sketches.countMinMerge(Seq.empty))
  }
}

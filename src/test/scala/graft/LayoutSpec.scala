package graft

import org.apache.spark.sql.functions._

import graft.sources.{Layout, Tables}

/**
 * Z-order layout: per-file min-max spans must be narrow on BOTH clustered
 * dimensions simultaneously (that's the property parquet stats pruning
 * feeds on), unlike a single-column sort which only tightens one.
 */
class LayoutSpec extends SparkSpec {

  private def fileSpans(path: String, dim: String): Seq[Double] = {
    val dir = new java.io.File(path)
    dir.listFiles().filter(f => f.getName.startsWith("part-")).toSeq.map { f =>
      val r = spark.read.parquet(f.getAbsolutePath)
        .agg(min(col(dim).cast("double")), max(col(dim).cast("double"))).head()
      r.getDouble(1) - r.getDouble(0)
    }
  }

  test("interleaveBits produces the classic Morton order") {
    import spark.implicits._
    val out = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (2L, 2L), (3L, 3L))
      .toDF("x", "y")
      .select(Layout.interleaveBits(Seq(col("x"), col("y")), bits = 4).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(out == Seq(0L, 1L, 2L, 3L, 12L, 15L))
  }

  test("z-ordered files have narrow min-max spans on both dimensions") {
    val e = Tables.events(spark, Sf).select(col("user_id"), col("value"))
    val n = 8

    val zDir = java.nio.file.Files.createTempDirectory("zorder").toString
    Layout.writeZOrdered(e, Seq("user_id", "value"), zDir, numFiles = n)

    // baseline: same file count, hash layout (what a plain write produces)
    val hDir = java.nio.file.Files.createTempDirectory("hash").toString
    e.repartition(n).write.mode("overwrite").parquet(hDir)

    // data survives the layout change
    assert(spark.read.parquet(zDir).count() == e.count())

    def avg(xs: Seq[Double]) = xs.sum / xs.size
    val zU = avg(fileSpans(zDir, "user_id")); val hU = avg(fileSpans(hDir, "user_id"))
    val zV = avg(fileSpans(zDir, "value")); val hV = avg(fileSpans(hDir, "value"))
    // each file should cover a small fraction of the domain on BOTH dims;
    // hash layout covers ~the full domain in every file
    assert(zU < hU * 0.6, s"user_id spans: z=$zU vs hash=$hU")
    assert(zV < hV * 0.6, s"value spans: z=$zV vs hash=$hV")
  }

  /** Pure-Scala xy→d reference (iterative form from Wikipedia "Hilbert
    * curve") — the unrolled Column expression must agree exactly. */
  private def xy2d(bits: Int, x0: Long, y0: Long): Long = {
    var (x, y, d) = (x0, y0, 0L)
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  test("hilbertValue2D matches the reference walk and visits each cell once") {
    import spark.implicits._
    val bits = 4 // full 16×16 grid
    val grid = for (x <- 0L until 16L; y <- 0L until 16L) yield (x, y)
    val out = grid.toDF("x", "y")
      .select($"x", $"y",
        Layout.hilbertValue2D(col("x"), col("y"), bits).as("h"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
    out.foreach { case ((x, y), h) => assert(h == xy2d(bits, x, y), s"($x,$y)") }
    // a space-filling curve is a bijection onto [0, 256)
    assert(out.map(_._2).sorted.toSeq == (0L until 256L))
    // curve-adjacent cells are grid-adjacent (the locality property Z lacks)
    val byD = out.map(_.swap).toMap
    (0L until 255L).foreach { i =>
      val (x1, y1) = byD(i); val (x2, y2) = byD(i + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1, s"jump at d=$i")
    }
  }

  test("hilbert layout also tightens both dimensions vs hash layout") {
    val e = Tables.events(spark, Sf).select(col("user_id"), col("value"))
    val n = 8
    val dir = java.nio.file.Files.createTempDirectory("hilbert").toString
    Layout.writeHilbertOrdered(e, "user_id", "value", dir, numFiles = n)
    val hDir = java.nio.file.Files.createTempDirectory("hash2").toString
    e.repartition(n).write.mode("overwrite").parquet(hDir)
    assert(spark.read.parquet(dir).count() == e.count())
    def avg(xs: Seq[Double]) = xs.sum / xs.size
    val gU = avg(fileSpans(dir, "user_id")); val hU = avg(fileSpans(hDir, "user_id"))
    val gV = avg(fileSpans(dir, "value")); val hV = avg(fileSpans(hDir, "value"))
    assert(gU < hU * 0.6, s"user_id spans: hilbert=$gU vs hash=$hU")
    assert(gV < hV * 0.6, s"value spans: hilbert=$gV vs hash=$hV")
  }
}

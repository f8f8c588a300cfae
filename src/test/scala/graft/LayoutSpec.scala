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
}

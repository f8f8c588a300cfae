package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Multi-dimensional data layout for scan pruning: Z-order (Morton)
 * clustering of a table on several columns, so parquet per-file/row-group
 * min-max statistics become selective on EVERY clustered dimension at once —
 * a filter on any one of them skips most files. This is the layout step
 * behind `OPTIMIZE ZORDER BY` in lakehouse table formats, expressed as plain
 * Spark: quantize each dimension, bit-interleave the ranks, range-partition
 * and sort by the interleaved value, write.
 *
 * At 100 TB the win is at the READER: a 1000-executor scan with a predicate
 * on (say) `user_id` reads the few files whose user_id min-max overlaps,
 * instead of all files — without this, sorting by one column makes ONLY that
 * column prunable. The writer itself is one range shuffle, the same cost as
 * any global sort.
 *
 * Quantization is linear (`width_bucket` over the observed min-max, one tiny
 * driver-side min/max aggregate). For heavily skewed dimensions substitute
 * quantile boundaries; the interleave and write path are unchanged. A
 * Hilbert curve has marginally better locality but Z-order's shift/or
 * arithmetic stays fully inside codegen, which is the better trade here.
 */
object Layout {

  /** Bits per dimension (256 buckets) — 2–4 dims stay well inside a long. */
  val BitsPerDim = 8

  /** Interleave the low `bits` bits of the given non-negative rank columns
    * into a Morton code (dimension 0 owns the least-significant position of
    * each group). Pure shift/and/or Column arithmetic — codegen'd. */
  def interleaveBits(ranks: Seq[Column], bits: Int = BitsPerDim): Column =
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      ranks.zipWithIndex.foldLeft(acc) { case (a, (r, j)) =>
        a.bitwiseOR(shiftleft(
          shiftright(r, i).bitwiseAND(lit(1L)), i * ranks.size + j))
      }
    }

  /** Linear-quantized per-dimension ranks in [0, 2^bits): observed min-max,
    * `width_bucket` clamped (it is 1-based and sends v=max to buckets+1). */
  private def quantizedRanks(df: DataFrame, dims: Seq[String], bits: Int): Seq[Column] = {
    val buckets = 1 << bits
    val stats = df.select(
      dims.flatMap(d => Seq(min(col(d).cast("double")).as(s"mn_$d"),
        max(col(d).cast("double")).as(s"mx_$d"))): _*).head()
    dims.map { d =>
      val mn = stats.getAs[Double](s"mn_$d")
      val mx = stats.getAs[Double](s"mx_$d")
      least(greatest(
        width_bucket(col(d).cast("double"), lit(mn), lit(mx), lit(buckets)) - 1,
        lit(0L)), lit(buckets - 1L))
    }
  }

  /** Z-value column for `df` over `dims`: linear-quantized ranks (observed
    * min-max, `buckets` buckets) bit-interleaved into one long. */
  def zValue(df: DataFrame, dims: Seq[String], bits: Int = BitsPerDim): Column =
    interleaveBits(quantizedRanks(df, dims, bits), bits)

  /** Bits per dimension for the Hilbert walk. The unrolled rotation
    * references each round's x/y several times, so the expression TREE
    * grows ~4× per round — 6 rounds (a 64×64 grid, 4096 curve cells) plans
    * in seconds and is ample resolution for file-level clustering, while 8
    * rounds already stalls Catalyst. This is exactly the codegen trade the
    * [[zValue]] scaladoc names; Z-order stays the default for that reason. */
  val HilbertBits = 6

  /**
   * 2-D Hilbert index of two rank columns (each in [0, 2^bits)): the
   * standard xy→d walk (Wikipedia "Hilbert curve", converted from the
   * iterative C version), UNROLLED into `bits` rounds of pure
   * when/bitwise/arithmetic Column expressions — no UDF, stays inside
   * whole-stage codegen. Hilbert keeps every curve-adjacent pair of cells
   * spatially adjacent (Z-order jumps at quadrant seams), which tightens
   * per-file min-max spans for 2-D range predicates; for >2 dims or when
   * expression count matters, [[zValue]] remains the default.
   */
  def hilbertValue2D(xRank: Column, yRank: Column, bits: Int = HilbertBits): Column = {
    var x = xRank
    var y = yRank
    var d = lit(0L)
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = when(x.bitwiseAND(lit(s)) > 0, lit(1L)).otherwise(lit(0L))
      val ry = when(y.bitwiseAND(lit(s)) > 0, lit(1L)).otherwise(lit(0L))
      d = d + lit(s * s) * (lit(3L) * rx).bitwiseXOR(ry)
      // rotate the frame: flip both axes when rx=1, then swap — only when ry=0
      val fx = when(rx === 1, lit(s - 1) - x).otherwise(x)
      val fy = when(rx === 1, lit(s - 1) - y).otherwise(y)
      val nx = when(ry === 0, fy).otherwise(x)
      val ny = when(ry === 0, fx).otherwise(y)
      x = nx
      y = ny
      s >>= 1
    }
    d
  }

  /** Hilbert index column for `df` over exactly two dimensions. */
  def hilbertValue(df: DataFrame, dimX: String, dimY: String,
                   bits: Int = HilbertBits): Column = {
    val Seq(rx, ry) = quantizedRanks(df, Seq(dimX, dimY), bits)
    hilbertValue2D(rx, ry, bits)
  }

  /**
   * Write `df` clustered by Z-value over `dims` into `numFiles` files:
   * range-partition on the z-value (contiguous z-ranges per file), sort
   * within each partition, drop the helper column. One range shuffle.
   */
  def writeZOrdered(df: DataFrame, dims: Seq[String], path: String,
                    numFiles: Int): Unit =
    writeByCurve(df, zValue(df, dims), path, numFiles)

  /** [[writeZOrdered]]'s 2-D Hilbert sibling — same one-range-shuffle write,
    * tighter per-file spans (no quadrant-seam jumps); see LayoutSpec A/B. */
  def writeHilbertOrdered(df: DataFrame, dimX: String, dimY: String,
                          path: String, numFiles: Int): Unit =
    writeByCurve(df, hilbertValue(df, dimX, dimY), path, numFiles)

  private def writeByCurve(df: DataFrame, curve: Column, path: String,
                           numFiles: Int): Unit =
    df.withColumn("__z", curve)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
}

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

  /** Z-value column for `df` over `dims`: linear-quantized ranks (observed
    * min-max, `buckets` buckets) bit-interleaved into one long. */
  def zValue(df: DataFrame, dims: Seq[String], bits: Int = BitsPerDim): Column = {
    val buckets = 1 << bits
    val stats = df.select(
      dims.flatMap(d => Seq(min(col(d).cast("double")).as(s"mn_$d"),
        max(col(d).cast("double")).as(s"mx_$d"))): _*).head()
    val ranks = dims.map { d =>
      val mn = stats.getAs[Double](s"mn_$d")
      val mx = stats.getAs[Double](s"mx_$d")
      // width_bucket is 1-based and sends v=max to buckets+1; clamp to [0, buckets-1]
      least(greatest(
        width_bucket(col(d).cast("double"), lit(mn), lit(mx), lit(buckets)) - 1,
        lit(0L)), lit(buckets - 1L))
    }
    interleaveBits(ranks, bits)
  }

  /**
   * Write `df` clustered by Z-value over `dims` into `numFiles` files:
   * range-partition on the z-value (contiguous z-ranges per file), sort
   * within each partition, drop the helper column. One range shuffle.
   */
  def writeZOrdered(df: DataFrame, dims: Seq[String], path: String,
                    numFiles: Int): Unit =
    df.withColumn("__z", zValue(df, dims))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
}

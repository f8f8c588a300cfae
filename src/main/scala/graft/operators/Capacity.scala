package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Exchange/write CAPACITY ADVISOR — the sizing half of the planning loop
 * that [[JoinPlanner]] opened for strategy: before a 100 TB stage runs,
 * the two numbers that decide whether it spills or crawls are (a) how
 * many shuffle partitions its exchanges need so each fits executor
 * memory, and (b) how many output files its write should produce so the
 * table neither becomes a small-file swarm (footer-open cost dominates
 * reads — the [[graft.streaming.StreamingPipeline.compact]] failure
 * mode) nor a handful of unsplittable multi-GB files. Spark's static
 * `spark.sql.shuffle.partitions` answers neither: it is one global knob
 * while stage volumes differ by orders of magnitude, and AQE coalescing
 * only shrinks partition counts at runtime — it cannot raise a
 * too-small initial count, and it never sizes the WRITE.
 *
 * The advice derives from an exact one-pass byte accounting of the
 * frame: per row, fixed in-memory widths for fixed-width types plus
 * measured byte lengths for strings/binaries/arrays (the UnsafeRow
 * layout constants — 8-byte slots + variable sections; close enough for
 * sizing, exact as a DEFINED accounting). Everything downstream is
 * integer arithmetic on that total — `ceil(total / target)` clamped to
 * a floor/ceiling — so the full derivation (measurement included)
 * replays in any SQL engine; there is no sampling and no estimate that
 * could drift between engines.
 *
 * Scale shape: ONE narrow aggregate over the frame (count + sum of a
 * per-row expression, map-side combined) — the advisor never shuffles
 * the data it sizes; output is one row per frame.
 */
object Capacity {

  /** Sizing targets. Defaults follow the common cluster guidance:
    * ~128 MiB per shuffle partition (fits comfortably in a few-GiB
    * executor with room for the hash side), ~512 MiB per output file
    * (large enough that footers amortize, small enough to split). */
  final case class SizingTargets(
      targetPartitionBytes: Long = 128L << 20,
      targetFileBytes: Long = 512L << 20,
      minPartitions: Int = 1,
      maxPartitions: Int = 1 << 20) {
    require(targetPartitionBytes > 0 && targetFileBytes > 0,
      "sizing targets must be positive")
    require(minPartitions >= 1 && maxPartitions >= minPartitions,
      s"need 1 <= minPartitions <= maxPartitions, got [$minPartitions, $maxPartitions]")
  }

  /** Per-row byte accounting for `df`'s schema as ONE codegen'd column:
    * 8 bytes per fixed-width slot (long/double/timestamp/decimal≤18),
    * 4 for int/float/date, 1 for boolean, `octet_length + 4` for
    * strings/binaries (payload + length word), `4 + elems·width` for
    * arrays of fixed-width elements. Nulls count their slot (UnsafeRow
    * reserves it). Unsupported types abort loudly — silent zero-width
    * columns would undersize every downstream stage. */
  def rowBytes(df: DataFrame): Column = {
    def width(f: StructField): Column = f.dataType match {
      case LongType | DoubleType | TimestampType | TimestampNTZType => lit(8L)
      // compact decimals ride the 8-byte slot; precision > 18 stores a
      // 16-byte unscaled value out-of-line (UnsafeRow layout)
      case d: DecimalType => if (d.precision <= 18) lit(8L) else lit(16L)
      case IntegerType | FloatType | DateType => lit(4L)
      case ShortType => lit(2L)
      case BooleanType | ByteType => lit(1L)
      case StringType | BinaryType =>
        coalesce(octet_length(col(f.name)).cast("long"), lit(0L)) + lit(4L)
      case ArrayType(et, _) =>
        val ew: Long = et match {
          case LongType | DoubleType => 8L
          case IntegerType | FloatType => 4L
          case ShortType => 2L
          case BooleanType | ByteType => 1L
          case other => throw new IllegalArgumentException(
            s"rowBytes: unsupported array element type $other for column ${f.name}")
        }
        coalesce(size(col(f.name)).cast("long"), lit(0L)) * lit(ew) + lit(4L)
      case other => throw new IllegalArgumentException(
        s"rowBytes: unsupported type $other for column ${f.name} — " +
          "add an explicit accounting before sizing with it")
    }
    df.schema.fields.map(width).reduceLeft(_ + _)
  }

  /** One advice row for `df`: `(label, rows, total_bytes,
    * advised_shuffle_partitions, advised_files)`. The partition count is
    * `clamp(ceildiv(total_bytes, targetPartitionBytes))`; the file count
    * `max(1, ceildiv(total_bytes, targetFileBytes))` — ceildiv written as
    * `(n + d - 1) div d`, pure int64 arithmetic on the exact byte total
    * (no FP division whose rounding could differ across engines). */
  /** Exact int64 ceiling division as a Column: `(n + d - 1) div d`
    * (IntegralDivide — no FP rounding to diverge across engines). The ONE
    * spelling of the sizing arithmetic; [[JoinPlanner.sizedJoinDecision]]
    * reuses it so the two gated derivations cannot drift. */
  def ceilDiv(n: Column, d: Long): Column =
    call_function("div", n + lit(d - 1L), lit(d))

  /** `clamp(ceildiv(bytes, targetPartitionBytes))` — the advised exchange
    * partition count for a stage moving `bytes`. */
  def advisedPartitions(bytes: Column, t: SizingTargets): Column =
    greatest(lit(t.minPartitions.toLong), least(lit(t.maxPartitions.toLong),
      ceilDiv(bytes, t.targetPartitionBytes)))

  def sizeAdvice(df: DataFrame, label: String,
                 t: SizingTargets = SizingTargets()): DataFrame =
    df.agg(count(lit(1)).as("rows"),
        coalesce(sum(rowBytes(df)), lit(0L)).as("total_bytes"))
      .select(
        lit(label).as("label"),
        col("rows"),
        col("total_bytes"),
        advisedPartitions(col("total_bytes"), t)
          .as("advised_shuffle_partitions"),
        greatest(lit(1L), ceilDiv(col("total_bytes"), t.targetFileBytes))
          .as("advised_files"))
}

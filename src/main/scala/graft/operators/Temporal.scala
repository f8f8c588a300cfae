package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Temporal join operators the built-in join strategies don't cover directly:
 * as-of joins (latest right row at-or-before each left row) and range joins
 * (point-in-interval, interval-overlap).
 *
 * These are extension surface (absent in the reference, which has no join at
 * all — SURVEY.md §2.12); semantics follow the ASOF JOIN of DuckDB/QuestDB
 * and the interval joins of KDB/Flink.
 *
 * Scale design:
 *  - [[asofJoin]] is NOT a join at the physical level: both sides are
 *    union-tagged and a single hash shuffle on the key feeds a running
 *    "last right payload seen" window. One exchange, no pair explosion, no
 *    per-key quadratic blowup; skew equals data skew (same as any window).
 *    This is the plan that survives 100 TB — a join-then-filter-then-
 *    row_number formulation shuffles |L|×|matching R| intermediate pairs.
 *  - [[pointInIntervalJoin]] maps each interval to the fixed-width buckets
 *    it covers and each point to its single bucket, then equi-joins on the
 *    bucket — a cartesian-free plan whose shuffle is
 *    O(|points| + |intervals| × width/bucket). Each containing interval
 *    covers the point's bucket exactly once, so no dedup pass is needed.
 *  - [[intervalOverlapJoin]] buckets BOTH sides; a pair can then meet in
 *    several buckets, so a pair is kept only in the FIRST bucket both
 *    intervals occupy (max of the two starts' buckets) — dedup by
 *    arithmetic, not by a distinct shuffle.
 */
object Temporal {

  /**
   * For every left row, attach the latest right row with the same key and
   * `rightTs <= leftTs` (ties: a right row exactly at `leftTs` matches).
   * Right payload columns come back null when no right row precedes.
   *
   * `right` must be unique per (key, ts) — pre-aggregate if not, or the
   * matched payload is ambiguous.
   *
   * Implementation: tag right rows 0 / left rows 1, union, then a running
   * `last(<right payload>, ignoreNulls)` over
   * `partitionBy(key).orderBy(ts, tag)` — right-before-left at equal ts
   * gives the inclusive boundary. Filter back to left rows.
   */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               leftTs: String, rightTs: String,
               rightPayload: Seq[String],
               asofOut: String): DataFrame =
    asofJoin(left, right, Seq(key), leftTs, rightTs, rightPayload, asofOut)

  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               leftTs: String, rightTs: String,
               rightPayload: Seq[String]): DataFrame =
    asofJoin(left, right, Seq(key), leftTs, rightTs, rightPayload, "asof_ts")

  /** Composite-key variant: `keys` must exist under the same names on both
    * sides (alias before calling otherwise). */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String,
               rightPayload: Seq[String],
               asofOut: String = "asof_ts"): DataFrame = {
    require(keys.nonEmpty, "asofJoin needs at least one key column")
    val leftCols = left.columns.toSeq
    val keyCols = keys.zipWithIndex.map { case (k, i) => col(k).as(s"__k$i") }
    val keyRefs = keys.indices.map(i => col(s"__k$i"))
    // right side: keys, ts, payload struct; left side: payload nulled
    val payloadStruct = struct(
      (col(rightTs) +: rightPayload.map(col)).map(c => c): _*)
    val rTagged = right.select(
      keyCols ++ Seq(col(rightTs).as("__ts"), lit(0).as("__tag"),
        payloadStruct.as("__rp"),
        // left columns, nulled — resolved types via typedLit is impossible
        // here, so cast null through the left schema below at union time
        lit(null).as("__lrow")): _*)
    val lTagged = left.select(
      keyCols ++ Seq(col(leftTs).as("__ts"), lit(1).as("__tag"),
        lit(null).cast(rTagged.schema("__rp").dataType).as("__rp"),
        struct(leftCols.map(col): _*).as("__lrow")): _*)
    val unioned = lTagged.unionByName(
      rTagged.select(keyRefs ++ Seq(col("__ts"), col("__tag"),
        col("__rp"), lit(null).cast(lTagged.schema("__lrow").dataType).as("__lrow")): _*))
    val w = Window.partitionBy(keyRefs: _*)
      .orderBy(col("__ts"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = unioned
      .withColumn("__m", last(col("__rp"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
    val out = leftCols.map(c => col(s"__lrow.$c").as(c)) ++
      (col("__m").getField(rightTs).as(asofOut) +:
        rightPayload.map(p => col("__m").getField(p).as(p)))
    matched.select(out: _*)
  }

  /**
   * As-of with a tolerance: matches older than `tolerance` before the left
   * timestamp are dropped (payload nulled), e.g. "latest heartbeat within
   * 10 minutes".
   */
  def asofJoinWithin(left: DataFrame, right: DataFrame, key: String,
                     leftTs: String, rightTs: String,
                     rightPayload: Seq[String],
                     tolerance: Column,
                     asofOut: String = "asof_ts"): DataFrame = {
    val joined = asofJoin(left, right, key, leftTs, rightTs, rightPayload, asofOut)
    val inRange = col(asofOut) >= (col(leftTs) - tolerance)
    joined.select(
      (left.columns.map(col) ++
        (asofOut +: rightPayload).map(c => when(inRange, col(c)).as(c))).toSeq: _*)
  }

  /**
   * points(pointCol: timestamp) ⋈ intervals(startCol inclusive, endCol
   * exclusive): every (point row, interval row) pair with
   * `start <= point < end`. Bucketized equi-join on `floor(epoch/bucket)` —
   * each interval is exploded into the buckets it covers (`sequence`), each
   * point maps to exactly one bucket, so the join output needs no dedup.
   *
   * `bucketSeconds` should be on the order of the typical interval length:
   * too small explodes the interval side, too large degrades selectivity
   * (the residual range filter after the equi-join does the exact check).
   */
  def pointInIntervalJoin(points: DataFrame, intervals: DataFrame,
                          pointCol: String, startCol: String, endCol: String,
                          bucketSeconds: Long): DataFrame = {
    val b = lit(bucketSeconds)
    val startB = floor(unix_timestamp(col(startCol)) / b).cast("long")
    // end is exclusive, but a partial last bucket still holds interval time;
    // clamp below startB (corrupt rows with end <= start) — otherwise
    // `sequence` defaults to step -1 and explodes a descending bucket run.
    // The residual range filter still drops such rows from the output.
    val endB = greatest(startB, floor((unix_timestamp(col(endCol)) - 1) / b).cast("long"))
    val iB = intervals.withColumn("__bucket", explode(sequence(startB, endB)))
    val pB = points.withColumn("__bucket",
      floor(unix_timestamp(col(pointCol)) / b).cast("long"))
    pB.join(iB, Seq("__bucket"))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop("__bucket")
  }

  /**
   * Interval-overlap join: pairs (a, b) with
   * `aStart < bEnd && bStart < aEnd` (half-open intervals). Both sides are
   * bucketized; a qualifying pair co-occupies every bucket in the overlap,
   * so it is emitted only from the overlap's FIRST bucket
   * (`max(aStartBucket, bStartBucket)`) — constant-time arithmetic dedup.
   */
  def intervalOverlapJoin(a: DataFrame, b: DataFrame,
                          aStart: String, aEnd: String,
                          bStart: String, bEnd: String,
                          bucketSeconds: Long): DataFrame = {
    val w = lit(bucketSeconds)
    def bucketed(df: DataFrame, s: String, e: String, tag: String) =
      df.withColumn(s"__fb_$tag", floor(unix_timestamp(col(s)) / w).cast("long"))
        .withColumn(s"__bucket",
          // clamp as in pointInIntervalJoin: corrupt rows (end <= start)
          // must not trigger sequence's descending step -1 explosion
          explode(sequence(col(s"__fb_$tag"),
            greatest(col(s"__fb_$tag"),
              floor((unix_timestamp(col(e)) - 1) / w).cast("long")))))
    bucketed(a, aStart, aEnd, "a")
      .join(bucketed(b, bStart, bEnd, "b"), Seq("__bucket"))
      .filter(col(aStart) < col(bEnd) && col(bStart) < col(aEnd))
      .filter(col("__bucket") === greatest(col("__fb_a"), col("__fb_b")))
      .drop("__bucket", "__fb_a", "__fb_b")
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Approximate sketch operators for cardinality and frequency at scale
 * (extension surface — the reference has no approximate aggregates).
 *
 * Why sketches are first-class at 100 TB: exact `countDistinct`/`groupBy`
 * answers shuffle one row per distinct value; a mergeable sketch shuffles a
 * few KB per partition regardless of cardinality, and PRE-AGGREGATED sketch
 * tables (per day / per source) can be re-merged later to answer rollup
 * questions without touching raw data — the same partial/final shape as
 * [[AggCore]], applied to distinct counts.
 *
 *  - Distinct counts: Spark's built-in Apache DataSketches HLL
 *    (`hll_sketch_agg` / `hll_union_agg` / `hll_sketch_estimate`) — binary
 *    sketches are storable and mergeable across arbitrary groupings.
 *  - Heavy hitters: [[graft.plans.SpaceSavingTopK]], a custom Catalyst
 *    `TypedImperativeAggregate` (SpaceSaving / stream-summary), merged
 *    map-side like any partial aggregate.
 */
object Sketches {

  /** Per-group HLL sketch column (binary, mergeable, storable). */
  def hllSketch(child: Column, lgConfigK: Int = 12): Column =
    hll_sketch_agg(child, lit(lgConfigK))

  /** Merge stored sketches back into one estimate (re-aggregation path). */
  def hllMergedEstimate(sketch: Column): Column =
    hll_sketch_estimate(hll_union_agg(sketch, lit(false)))

  /**
   * Build a per-group sketch TABLE: one row per group with a binary sketch
   * and its estimate — the materializable artifact whose union answers any
   * coarser-grained distinct-count question later.
   */
  def distinctSketchTable(df: DataFrame, groupCols: Seq[Column], value: Column,
                          lgConfigK: Int = 12): DataFrame =
    df.groupBy(groupCols: _*)
      .agg(hllSketch(value, lgConfigK).as("sketch"))
      .withColumn("estimate", hll_sketch_estimate(col("sketch")))

  /**
   * Heavy hitters via the SpaceSaving aggregate: items whose GUARANTEED
   * count (`count_min`) may still undercount, so candidates are verified
   * against exact counts in [[verifiedHeavyHitters]]; every item with true
   * count > |df| / capacity is guaranteed present among the candidates.
   */
  def heavyHitterCandidates(df: DataFrame, item: Column, capacity: Int): DataFrame = {
    graft.plans.GraftFunctions.register(df.sparkSession)
    df.select(item.as("__item"))
      .agg(call_function("space_saving_topk", col("__item"), lit(capacity)).as("sk"))
      .select(explode(col("sk")).as("e"))
      .select(col("e.item").as("item"), col("e.count_min").as("count_min"),
        col("e.count_max").as("count_max"))
  }

  /**
   * Sketch-guided exact heavy hitters: candidates from one sketch pass, then
   * ONE semi-joined exact count pass over just the candidate keys, keeping
   * rows with exact share > `threshold` of the total. Two passes, but the
   * exact pass's shuffle carries only candidate keys (≤ capacity), not the
   * full distinct-key domain.
   */
  def verifiedHeavyHitters(df: DataFrame, item: Column, capacity: Int,
                           threshold: Double): DataFrame = {
    val cands = heavyHitterCandidates(df, item, capacity)
    val keyed = df.select(item.as("k"))
    val total = keyed.count()
    val floor = (total * threshold).toLong
    keyed.join(broadcast(cands), col("k") === col("item"), "left_semi")
      .groupBy(col("k"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > floor)
      .join(broadcast(cands), col("k") === col("item"))
      .select(col("k").as("item"), col("cnt"),
        (col("count_min") <= col("cnt") && col("cnt") <= col("count_max"))
          .as("bounds_ok"))
  }
}

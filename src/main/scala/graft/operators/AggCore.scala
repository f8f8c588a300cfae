package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/**
 * Aggregation core: the engine-side equivalent of the reference's continuous
 * windowed aggregate and its partial→final merge.
 *
 *  - [[hourlyView]] ≙ the materialized view the reference builds with
 *    `windowedBy(TimeWindows.of(1h)).aggregate(init, adder)` into a RocksDB
 *    window store (`ingestion/KafkaStreamsAggregator.java:98-105`): one
 *    `{count, sum, avg}` cell per `(key-prefix, 1-hour tumbling window)`.
 *  - [[reAgg]] ≙ the query-time merge `count=c1+c2, sum=s1+s2,
 *    avg=(s1+s2)/(c1+c2)` (`querying/util/Aggregator.java:19-29`) used to
 *    combine cells across prefixes / hosts / bbox tiles. In Spark this is just
 *    a second-level groupBy — Catalyst's partial/final HashAggregate split is
 *    the same algebra, applied automatically within each level too.
 *
 * Numeric convention: sums are computed over DECIMAL(18,4) and the result cast
 * back to DOUBLE. The inputs are 2-decimal measurements, so the decimal sum is
 * EXACT — making the result independent of partition count and add order
 * (double summation is not associative; an exact sum is the only value every
 * engine/plan agrees on, which the DuckDB correctness oracle requires and
 * which keeps results stable when the cluster re-partitions at 100 TB).
 * `avg` is always derived `sum/count` (as the reference does,
 * `KafkaStreamsAggregator.java:49-50`) — never averaged-of-averages.
 */
object AggCore {

  private val Dec = DecimalType(18, 4)

  /** Exact, order-independent sum of a 2-to-4-decimal measure, as DOUBLE. */
  def exactSum(c: Column): Column = sum(c.cast(Dec)).cast("double")

  /**
   * readings(ts, key, value) → one row per (key, hour window):
   * `(key, window_start, window_end, count, sum, avg)`.
   * `window()` is epoch-aligned tumbling, matching Kafka's
   * `TimeWindows.of(1h)` alignment (reference `KafkaStreamsAggregator.java:99`).
   */
  def hourlyView(readings: DataFrame,
                 tsCol: String = "ts",
                 keyCol: String = "key",
                 valueCol: String = "value"): DataFrame =
    readings
      .groupBy(window(col(tsCol), "1 hour").as("w"), col(keyCol).as("key"))
      .agg(
        count(lit(1)).as("count"),
        exactSum(col(valueCol)).as("sum"))
      .select(
        col("key"),
        col("w.start").as("window_start"),
        col("w.end").as("window_end"),
        col("count"),
        col("sum"),
        (col("sum") / col("count")).as("avg"))

  /**
   * Merge view cells along `groupCols` (partial→final combine): counts and
   * sums add; avg re-derives. Input must carry `count` and `sum` columns
   * (avg is recomputed, never merged — merging avgs would weight wrongly).
   */
  def reAgg(view: DataFrame, groupCols: Seq[Column]): DataFrame =
    view
      .groupBy(groupCols: _*)
      .agg(
        sum(col("count")).as("count"),
        exactSum(col("sum")).as("sum"))
      .withColumn("avg", col("sum") / col("count"))

  /** Project the client-chosen aggregate (`count` | `sum` | `avg`) — the
    * engine-side form of the reference's reflection projection
    * (`querying/QueryingService.java:205-224`). */
  def opColumn(op: String): Column = op.toLowerCase match {
    case "count" => col("count")
    case "sum"   => col("sum")
    case "avg"   => col("avg")
    case other   => throw new IllegalArgumentException(
      s"unsupported aggregate op '$other' (allowed: count, sum, avg)")
  }
}

package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Loaders for the driver-generated parquet fixtures (TESTDATA.md) and the
 * synthetic "temperature readings" view the reference-equivalent queries run
 * over.
 *
 * The reference ingests JSON `TemperatureReading` events from Kafka
 * (`model/TemperatureReading.java:6-12`); our batch-correctness fixtures are
 * the TPC-H-ish tables plus an `events` stream table
 * (event_id, ts, user_id, event_type, value, props). [[readings]] adapts
 * `events` into the reading shape the aggregation core consumes so the same
 * query builders serve both live (Kafka) and replay (parquet) paths.
 */
object Tables {

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "region")
  /**
   * `events.parquet` carries a NANOS timestamp, which Spark's parquet reader
   * rejects ([PARQUET_TYPE_ILLEGAL]) unless
   * `spark.sql.legacy.parquet.nanosAsLong=true` (runtime SQL conf, set here).
   * The raw long is converted with integer division (`div`, not `/` — double
   * division of epoch-nanos ≈1.7e18 would lose ~100 ns of precision) to a
   * microsecond TIMESTAMP. Hour-level semantics are unaffected.
   *
   * A TIMESTAMP_NTZ `ts` (parquet written with isAdjustedToUTC=false — e.g.
   * a plain-TIMESTAMP export from another engine) is normalized to an
   * instant too: every consumer here does instant arithmetic
   * (`unix_millis`/`unix_micros`), which rejects NTZ outright, and all
   * entry points run with a UTC session timezone so the cast is a
   * shift-free reinterpretation. Found by the 5× scale probe: a replicated
   * dataset written through DuckDB landed as NTZ and failed every as-of /
   * sessionization query at plan time.
   */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(spark, sfDir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }
  def documents(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "embeddings")

  /**
   * `events` viewed as sensor readings: `ts` is the event time
   * (reference `TSExtractor.java:11-22`), `key` plays the geohash role
   * (string key whose prefix is the spatial grouping unit — reference re-keys
   * on `geohash.substring(0, precision)`, `KafkaStreamsAggregator.java:94`),
   * `value` plays tempVal. Derivation is pure column arithmetic so the DuckDB
   * oracle can reproduce it exactly.
   */
  def readings(spark: SparkSession, sfDir: String): DataFrame =
    events(spark, sfDir).select(
      col("ts"),
      concat(col("event_type"), lit("_"), lpad((col("user_id") % 100).cast("string"), 2, "0"))
        .as("key"),
      col("value"))
}

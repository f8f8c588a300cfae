package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Stream-stream windowed equi-join (absent in the reference — SURVEY.md
 * §2.12; standard Structured Streaming surface provided for completeness):
 * enrich a reading stream with a second sensor stream on the same key,
 * accepting pairs whose event times differ by at most `toleranceMinutes`.
 *
 * Both sides carry watermarks, so the join state store evicts rows once the
 * watermark passes `ts ± tolerance` — state is bounded by (key cardinality ×
 * tolerance window), independent of stream length.
 */
object StreamJoins {

  /**
   * `left(ts, key, value)` ⋈ `right(ts2, key, value2)` on key with
   * `|ts − ts2| ≤ tolerance`. Inner join; both inputs must be streaming
   * DataFrames (or both batch — same plan shape works for backfills).
   */
  def enrichWithin(left: DataFrame, right: DataFrame,
                   toleranceMinutes: Int,
                   watermark: String = "30 minutes"): DataFrame = {
    val l = left.withWatermark("ts", watermark)
    val r = right
      .withColumnRenamed("ts", "ts2")
      .withColumnRenamed("value", "value2")
      .withWatermark("ts2", watermark)
    // The tolerance MUST be expressed as interval arithmetic directly on the
    // watermarked timestamp columns: Spark's StreamingJoinHelper derives the
    // state-eviction watermark from `ts2 >= ts - INTERVAL …` style
    // constraints, but cannot see through unix_micros()/casts — with those,
    // results stay correct while join state grows without bound.
    val tol = expr(s"INTERVAL $toleranceMinutes MINUTES")
    l.join(r,
      l("key") === r("key") &&
        col("ts2") >= col("ts") - tol &&
        col("ts2") <= col("ts") + tol,
      "inner")
      .select(l("key"), col("ts"), col("value"), col("ts2"), col("value2"))
  }

  /**
   * Stream-static dimension enrichment: join the stream against a small
   * batch dimension with an explicit `broadcast()` — STATELESS (no state
   * store at all: the dimension ships to every task, nothing is buffered),
   * which is why it's the right join for slowly-changing reference data at
   * any stream volume. Note a path-backed `dim` keeps the file listing it
   * was read with; to pick up a refreshed dimension without restarting,
   * re-read it by path inside `foreachBatch` (the pattern
   * [[StreamingAnnServing.serveIvfPqFromPath]] uses for its growing code
   * table).
   */
  def enrichStatic(stream: DataFrame, dim: DataFrame, key: String): DataFrame =
    stream.join(broadcast(dim), Seq(key), "left")
}

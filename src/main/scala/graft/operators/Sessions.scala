package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Gap-based sessionization over an event stream: a new session starts when
 * the gap to the user's previous event exceeds `gapMinutes`. The classic
 * lag-flag-cumsum construction — two window passes over the same
 * (user, time) partitioning, so Spark plans ONE shuffle and reuses the sort.
 *
 * (The reference has no session windows — SURVEY.md §2.12 lists them absent;
 * this is part of the engine's extended surface. For the streaming path,
 * `session_window()` in Structured Streaming covers the same semantics.)
 */
object Sessions {

  /** Per-event session ids: adds `session_id` (1-based per user). */
  def sessionize(events: DataFrame, gapMinutes: Int,
                 userCol: String = "user_id", tsCol: String = "ts",
                 tieBreak: String = "event_id"): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(tieBreak))
    val prev = lag(col(tsCol), 1).over(w)
    val gapUs = gapMinutes.toLong * 60L * 1000000L
    val newSession: Column =
      when(prev.isNull || unix_micros(col(tsCol)) - unix_micros(prev) > gapUs, 1)
        .otherwise(0)
    events
      .withColumn("new_session", newSession)
      .withColumn("session_id",
        sum(col("new_session")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
  }

  /** Per-user session stats: total events and session count. */
  def sessionStats(events: DataFrame, gapMinutes: Int,
                   userCol: String = "user_id", tsCol: String = "ts",
                   tieBreak: String = "event_id"): DataFrame =
    sessionize(events, gapMinutes, userCol, tsCol, tieBreak)
      .groupBy(col(userCol))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("new_session")).as("n_sessions"))
}

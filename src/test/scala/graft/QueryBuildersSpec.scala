package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.{AggCore, QueryBuilders}
import graft.operators.QueryBuilders.QueryError
import graft.sources.Tables

class QueryBuildersSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Long = Timestamp.valueOf(s).getTime

  lazy val readings = Seq(
    // (ts, key, value) — two keys, three hours
    ("2024-01-01 00:10:00", "u155mz", 10.0),
    ("2024-01-01 00:20:00", "u155mz", 20.0),
    ("2024-01-01 00:30:00", "u155kr", 30.0),
    ("2024-01-01 01:10:00", "u155mz", 40.0),
    ("2024-01-01 02:15:00", "u14abc", 50.0))
    .toDF("t", "key", "value")
    .select(to_timestamp($"t").as("ts"), $"key", $"value")

  lazy val view = AggCore.hourlyView(readings)

  test("hourlyView: one cell per (key, hour) with count/sum/avg") {
    val cells = view.orderBy($"key", $"window_start").collect()
    assert(cells.length == 4)
    val mz0 = cells.find(r => r.getString(0) == "u155mz"
      && r.getTimestamp(1) == Timestamp.valueOf("2024-01-01 00:00:00")).get
    assert(mz0.getLong(3) == 2)            // count
    assert(mz0.getDouble(4) == 30.0)       // sum
    assert(mz0.getDouble(5) == 15.0)       // avg
  }

  test("history merges across prefixes per window and orders by time") {
    val h = QueryBuilders.history(view, "avg", Seq("u155"),
      ts("2024-01-01 00:00:00"), ts("2024-01-01 03:00:00")).collect()
    assert(h.map(_.getTimestamp(0).toString.substring(11, 13)).toSeq == Seq("00", "01"))
    assert(h(0).getDouble(1) == 20.0) // (10+20+30)/3 across both u155* keys
    assert(h(1).getDouble(1) == 40.0)
  }

  test("history count/sum project the right aggregate") {
    val c = QueryBuilders.history(view, "count", Seq("u"),
      ts("2024-01-01 00:00:00"), ts("2024-01-01 03:00:00")).collect()
    assert(c.map(_.getLong(1)).toSeq == Seq(3L, 1L, 1L))
    val s = QueryBuilders.history(view, "sum", Seq("u155"),
      ts("2024-01-01 00:00:00"), ts("2024-01-01 03:00:00")).collect()
    assert(s.map(_.getDouble(1)).toSeq == Seq(60.0, 40.0))
  }

  test("snapshot truncates ts to the hour and orders by key") {
    val snap = QueryBuilders.snapshotByPrefixes(view, "sum", Seq("u"),
      ts("2024-01-01 00:47:33")).collect() // inside hour 00
    assert(snap.map(_.getString(0)).toSeq == Seq("u155kr", "u155mz"))
    assert(snap.map(_.getDouble(1)).toSeq == Seq(30.0, 30.0))
  }

  test("two-level reAgg equals direct aggregation (A2 merge law)") {
    val li = Tables.readings(spark, Sf)
    val direct = AggCore.hourlyView(li.withColumn("key", lit("all")))
      .select($"window_start", $"count", $"sum")
    val twoLevel = AggCore.reAgg(AggCore.hourlyView(li), Seq($"window_start"))
      .select($"window_start", $"count", $"sum")
    assert(direct.exceptAll(twoLevel).isEmpty && twoLevel.exceptAll(direct).isEmpty)
  }

  test("interval arithmetic matches calendar semantics (reference D2)") {
    val to = ts("2024-03-31 12:00:00")
    assert(QueryBuilders.fromForInterval(to, "1day") == ts("2024-03-30 12:00:00"))
    assert(QueryBuilders.fromForInterval(to, "1week") == ts("2024-03-24 12:00:00"))
    // calendar month: Mar 31 − 1 month → Feb 29 (leap year), not −30 days
    assert(QueryBuilders.fromForInterval(to, "1month") == ts("2024-02-29 12:00:00"))
    assert(QueryBuilders.fromForInterval(to, "all") == ts("1994-03-31 12:00:00"))
  }

  test("validation rejects bad op, empty prefixes, bad range, bad interval (F5)") {
    intercept[QueryError](QueryBuilders.history(view, "median", Seq("u"), 0, 1))
    intercept[QueryError](QueryBuilders.history(view, "avg", Seq(), 0, 1))
    intercept[QueryError](QueryBuilders.history(view, "avg", Seq("u"), 5, 5))
    intercept[QueryError](QueryBuilders.fromForInterval(0, "2weeks"))
    intercept[QueryError](QueryBuilders.snapshot(view, "avg", 0, -10, 0, 10, 0))
  }

  test("ops are case-insensitive and validated against the allowed set") {
    val h = QueryBuilders.history(view, "AVG", Seq("u155"),
      ts("2024-01-01 00:00:00"), ts("2024-01-01 03:00:00"))
    assert(h.columns.toSeq == Seq("window_start", "avg"))
  }

  test("toMessage builds the reference envelope shape") {
    val m = QueryBuilders.toMessage(
      QueryBuilders.history(view, "avg", Seq("u"), 0, ts("2024-01-02 00:00:00")))
    assert(m.columns == Seq("window_start", "avg"))
    assert(m.data.nonEmpty && m.data.head.length == 2)
    assert(m.metadata == Map("metric" -> "temperature"))
  }
}

package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Temporal
import graft.sources.Tables

/**
 * As-of and range joins (extension surface, SURVEY.md §2.12): each operator
 * is checked against a naive-but-obviously-correct formulation on the same
 * fixture, and the as-of plan is asserted join-free (single window pass).
 */
class TemporalSpec extends SparkSpec {
  import spark.implicits._

  private def clicks = Tables.events(spark, Sf)
    .filter(col("event_type") === "click")
    .select(col("user_id"), col("event_id"), col("ts"))

  private def purchases = Tables.events(spark, Sf)
    .filter(col("event_type") === "purchase")
    .groupBy(col("user_id"), col("ts"))
    .agg(max(col("value")).as("pvalue"))

  test("asofJoin matches the naive join/row_number formulation") {
    val viaAsof = Temporal.asofJoin(clicks, purchases, "user_id", "ts", "ts",
      Seq("pvalue"), asofOut = "pts")
      .select(col("event_id"), col("pts"), col("pvalue"))
      .orderBy(col("event_id"))
      .collect()

    // naive: theta join on key + ts>=pts, keep the latest per click
    val p = purchases.select(col("user_id").as("u2"), col("ts").as("pts"),
      col("pvalue"))
    val w = Window.partitionBy(col("event_id")).orderBy(col("pts").desc)
    val viaJoin = clicks
      .join(p, col("user_id") === col("u2") && col("ts") >= col("pts"), "left")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("event_id"), col("pts"), col("pvalue"))
      .orderBy(col("event_id"))
      .collect()

    assert(viaAsof.length == viaJoin.length && viaAsof.length > 0)
    viaAsof.zip(viaJoin).foreach { case (a, b) => assert(a == b) }
  }

  test("asofJoin physical plan has no join operator (union + one window)") {
    val plan = Temporal.asofJoin(clicks, purchases, "user_id", "ts", "ts",
      Seq("pvalue")).queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
    assert(plan.contains("Window"), plan)
  }

  test("asofJoin right row at exactly the left timestamp matches (inclusive)") {
    val l = Seq((1L, "2024-01-01 10:00:00")).toDF("k", "ts")
      .select(col("k"), to_timestamp(col("ts")).as("ts"))
    val r = Seq((1L, "2024-01-01 10:00:00", 7.0), (1L, "2024-01-01 09:00:00", 3.0))
      .toDF("k", "ts", "v")
      .select(col("k"), to_timestamp(col("ts")).as("ts"), col("v"))
    val out = Temporal.asofJoin(l, r, "k", "ts", "ts", Seq("v")).collect()
    assert(out.length == 1 && out(0).getAs[Double]("v") == 7.0)
  }

  test("asofJoin with a composite key matches per-key independent joins") {
    import spark.implicits._
    val l = Seq((1L, "x", "2024-01-01 10:00:00"), (1L, "y", "2024-01-01 10:00:00"))
      .toDF("u", "d", "ts").select($"u", $"d", to_timestamp($"ts").as("ts"))
    val r = Seq((1L, "x", "2024-01-01 09:00:00", 1.0),
      (1L, "y", "2024-01-01 09:30:00", 2.0))
      .toDF("u", "d", "ts", "v")
      .select($"u", $"d", to_timestamp($"ts").as("ts"), $"v")
    val out = Temporal.asofJoin(l, r, Seq("u", "d"), "ts", "ts", Seq("v"))
      .orderBy($"d").collect()
    assert(out.length == 2)
    assert(out(0).getAs[Double]("v") == 1.0) // (1,x) matched its own stream
    assert(out(1).getAs[Double]("v") == 2.0) // (1,y) likewise
  }

  test("asofJoinWithin nulls matches older than the tolerance") {
    val l = Seq((1L, "2024-01-01 10:00:00"), (2L, "2024-01-01 10:00:00"))
      .toDF("k", "ts").select(col("k"), to_timestamp(col("ts")).as("ts"))
    val r = Seq((1L, "2024-01-01 09:59:00", 1.0), (2L, "2024-01-01 08:00:00", 2.0))
      .toDF("k", "ts", "v")
      .select(col("k"), to_timestamp(col("ts")).as("ts"), col("v"))
    val out = Temporal.asofJoinWithin(l, r, "k", "ts", "ts", Seq("v"),
      tolerance = expr("INTERVAL 10 MINUTES"))
      .orderBy(col("k")).collect()
    assert(out(0).getAs[Double]("v") == 1.0) // 1 min old: kept
    assert(out(1).isNullAt(out(1).fieldIndex("v"))) // 2 h old: dropped
  }

  test("pointInIntervalJoin equals the theta-join formulation, without a cartesian") {
    val e = Tables.events(spark, Sf)
    val points = e.filter(col("event_type") === "click" && col("event_id") % 7 === 0)
      .select(col("event_id"), col("ts"))
    // incident windows: 4 h after each error event
    val intervals = e.filter(col("event_type") === "error")
      .select(col("event_id").as("incident_id"),
        date_trunc("second", col("ts")).as("start"))
      .withColumn("end", col("start") + expr("INTERVAL 4 HOURS"))

    val bucketed = Temporal.pointInIntervalJoin(points, intervals,
      "ts", "start", "end", bucketSeconds = 4 * 3600L)
      .select(col("event_id"), col("incident_id")).orderBy(col("event_id"), col("incident_id"))
      .collect()
    val naive = points.join(intervals,
      col("ts") >= col("start") && col("ts") < col("end"))
      .select(col("event_id"), col("incident_id")).orderBy(col("event_id"), col("incident_id"))
      .collect()
    assert(bucketed.nonEmpty && bucketed.toSeq == naive.toSeq)

    val plan = Temporal.pointInIntervalJoin(points, intervals,
      "ts", "start", "end", 4 * 3600L).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"), plan)
  }

  test("intervalOverlapJoin equals the theta join, each pair exactly once") {
    // user sessions as intervals; overlap across DIFFERENT users
    val sessions = graft.operators.Sessions
      .sessionize(Tables.events(spark, Sf), gapMinutes = 120)
      .groupBy(col("user_id"), col("session_id"))
      .agg(min(col("ts")).as("s"), max(col("ts")).as("e"))
      // half-open intervals need nonzero width; single-event sessions get 1s
      .withColumn("e", when(col("e") === col("s"), col("e") + expr("INTERVAL 1 SECOND"))
        .otherwise(col("e")))
      .filter(col("user_id") < 40)
    val a = sessions.select(col("user_id").as("ua"), col("s").as("sa"), col("e").as("ea"))
    val b = sessions.select(col("user_id").as("ub"), col("s").as("sb"), col("e").as("eb"))

    val fast = Temporal.intervalOverlapJoin(a, b, "sa", "ea", "sb", "eb",
      bucketSeconds = 3600L)
      .filter(col("ua") < col("ub"))
      .select(col("ua"), col("sa"), col("ub"), col("sb"))
    val naive = a.join(b, col("sa") < col("eb") && col("sb") < col("ea"))
      .filter(col("ua") < col("ub"))
      .select(col("ua"), col("sa"), col("ub"), col("sb"))
    assert(fast.count() > 0)
    assert(fast.count() == naive.count()) // no dup emission across buckets
    assert(fast.exceptAll(naive).isEmpty && naive.exceptAll(fast).isEmpty)
  }

  test("corrupt intervals (end <= start) do not explode the bucketized joins") {
    // end ~124 years BEFORE start: an unclamped sequence(startB, endB) with
    // bucketSeconds=1 would default to step -1 and demand ~3.9e9 elements
    // (over Spark's sequence length cap → the query would throw); clamped,
    // the corrupt row costs one bucket and the residual filter drops it
    val points = Seq((1L, "2024-03-01 12:00:00")).toDF("event_id", "p")
      .withColumn("p", to_timestamp(col("p")))
    val intervals = Seq(
      (10L, "2024-03-01 11:00:00", "2024-03-01 13:00:00"), // valid, matches
      (11L, "2024-03-01 11:00:00", "1900-01-01 00:00:00")  // corrupt
    ).toDF("incident_id", "start", "end")
      .withColumn("start", to_timestamp(col("start")))
      .withColumn("end", to_timestamp(col("end")))

    val got = Temporal.pointInIntervalJoin(points, intervals,
      "p", "start", "end", bucketSeconds = 1L)
      .select(col("incident_id")).collect().map(_.getLong(0)).toSeq
    assert(got == Seq(10L))

    val a = intervals.select(col("incident_id").as("ia"),
      col("start").as("sa"), col("end").as("ea"))
    val b = Seq((20L, "2024-03-01 12:30:00", "2024-03-01 14:00:00"))
      .toDF("ib", "sb", "eb")
      .withColumn("sb", to_timestamp(col("sb")))
      .withColumn("eb", to_timestamp(col("eb")))
    val pairs = Temporal.intervalOverlapJoin(a, b, "sa", "ea", "sb", "eb",
      bucketSeconds = 1L)
      .select(col("ia"), col("ib")).collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(pairs == Seq((10L, 20L)))
  }
}

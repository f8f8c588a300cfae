package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.EventAnalytics

class EventAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def ev(rows: (Long, String, String)*) =
    rows.map { case (u, t, at) => (u, t, ts(at)) }
      .toDF("user_id", "event_type", "ts")

  test("funnel: strict order within the per-step window") {
    val events = ev(
      // u1 converts fully: view → click (+2h) → purchase (+3h)
      (1L, "view", "2024-01-01 10:00:00"),
      (1L, "click", "2024-01-01 12:00:00"),
      (1L, "purchase", "2024-01-01 15:00:00"),
      // u2: click BEFORE the first view → not a conversion; no later click
      (2L, "click", "2024-01-01 09:00:00"),
      (2L, "view", "2024-01-01 10:00:00"),
      // u3: click outside the 24h window
      (3L, "view", "2024-01-01 10:00:00"),
      (3L, "click", "2024-01-02 11:00:00"),
      // u4: purchase before the qualifying click → stage 3 not reached
      (4L, "view", "2024-01-01 10:00:00"),
      (4L, "purchase", "2024-01-01 11:00:00"),
      (4L, "click", "2024-01-01 12:00:00"))
    val out = EventAnalytics.funnelSteps(events, Seq("view", "click", "purchase"), 24)
      .collect()
    assert(out.map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq ===
      Seq((1, "view", 4L), (2, "click", 2L), (3, "purchase", 1L)))
    // ratios: overall 1.0 / 0.5 / 0.25; step 2→3 = 0.5
    assert(out(1).getDouble(3) === 0.5 && out(2).getDouble(3) === 0.25)
    assert(out(0).isNullAt(4) && out(2).getDouble(4) === 0.5)
  }

  test("streaming funnel: in-order micro-batches emit each stage-reach exactly once") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamingFunnel
    // same fixture as the batch strict-order test, in event-time order
    val rows = Seq(
      (2L, "click", ts("2024-01-01 09:00:00")),
      (1L, "view", ts("2024-01-01 10:00:00")),
      (2L, "view", ts("2024-01-01 10:00:00")),
      (3L, "view", ts("2024-01-01 10:00:00")),
      (4L, "view", ts("2024-01-01 10:00:00")),
      (4L, "purchase", ts("2024-01-01 11:00:00")),
      (1L, "click", ts("2024-01-01 12:00:00")),
      (4L, "click", ts("2024-01-01 12:00:00")),
      (1L, "purchase", ts("2024-01-01 15:00:00")),
      (3L, "click", ts("2024-01-02 11:00:00")))
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String, Timestamp)]
    val q = StreamingFunnel.stageReaches(
        mem.toDF().toDF("user_id", "event_type", "ts").as[StreamingFunnel.FEv],
        Seq("view", "click", "purchase"), withinHours = 24)
      .writeStream.outputMode("append").format("memory")
      .queryName("sfun_out").start()
    val (b1, b2) = rows.splitAt(6)
    mem.addData(b1); q.processAllAvailable()
    mem.addData(b2); q.processAllAvailable()
    // state = one FunnelState row per user that entered the funnel
    assert(q.recentProgress.flatMap(_.stateOperators).forall(_.numRowsTotal <= 4))
    q.stop()
    val got = spark.table("sfun_out")
      .orderBy("user_id", "step_idx").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    spark.catalog.dropTempView("sfun_out")
    // u1 full funnel; u2 view only (pre-view click ignored); u3 view only
    // (window miss); u4 view + click (purchase BEFORE the qualifying
    // click never fires) — the batch operator's exact verdict: stage
    // users 4 / 2 / 1
    assert(got.toSeq === Seq(
      (1L, 1, "view"), (1L, 2, "click"), (1L, 3, "purchase"),
      (2L, 1, "view"), (3L, 1, "view"),
      (4L, 1, "view"), (4L, 2, "click")))
  }

  test("streaming funnel: expireStalled drops state past lastReach + within " +
    "and allows re-entry; default keeps first-attempt-only semantics") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamingFunnel
    // u1 views at 10:00 (within = 1h → stalled after 11:00); u9 events at
    // 13:00/14:00 advance the watermark past the deadline; u1's second
    // view at 15:00 then probes whether state survived
    val b1 = Seq((1L, "view", ts("2024-01-01 10:00:00")))
    val b2 = Seq((9L, "view", ts("2024-01-01 13:00:00")))
    val b3 = Seq((1L, "view", ts("2024-01-01 15:00:00")),
      (9L, "click", ts("2024-01-01 13:30:00")))
    def run(expire: Boolean): Seq[(Long, Int)] = {
      val mem = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, String, Timestamp)]
      val name = "sfexp_" + (if (expire) "on" else "off")
      val q = StreamingFunnel.stageReaches(
          mem.toDF().toDF("user_id", "event_type", "ts").as[StreamingFunnel.FEv],
          Seq("view", "click"), withinHours = 1,
          watermarkDelay = "0 seconds", expireStalled = expire)
        .writeStream.outputMode("append").format("memory")
        .queryName(name).start()
      Seq(b1, b2, b3).foreach { b => mem.addData(b); q.processAllAvailable() }
      q.stop()
      val got = spark.table(name).orderBy("stage_ts", "user_id").collect()
        .map(r => (r.getLong(0), r.getInt(1))).toSeq
      spark.catalog.dropTempView(name)
      got
    }
    // default: u1's 15:00 view is ignored (first-attempt-only, = batch)
    assert(run(expire = false) === Seq((1L, 1), (9L, 1), (9L, 2)))
    // expiry: u1's state was dropped once the watermark passed 11:00, so
    // the 15:00 view re-enters and re-emits stage 1
    assert(run(expire = true) === Seq((1L, 1), (9L, 1), (9L, 2), (1L, 1)))
  }

  test("funnel: an event EXACTLY at the window bound counts; at t_prev it does not") {
    val events = ev(
      (1L, "view", "2024-01-01 10:00:00"),
      (1L, "click", "2024-01-02 10:00:00"), // exactly +24h → counts (<=)
      (2L, "view", "2024-01-01 10:00:00"),
      (2L, "click", "2024-01-01 10:00:00")) // same instant → strict > drops
    val out = EventAnalytics.funnelSteps(events, Seq("view", "click"), 24).collect()
    assert(out(1).getLong(2) === 1L)
  }

  test("funnel: the stacked per-step Windows cost ONE exchange") {
    val events = ev((1L, "view", "2024-01-01 10:00:00"))
    val plan = EventAnalytics.funnelSteps(events, Seq("view", "click", "purchase"), 24)
      .queryExecution.executedPlan
    // user-partition windows share one shuffle, and the groupBy(user)
    // reuses that partitioning; the driver-small summary stages
    // (single-row agg + explode) add only a SinglePartition collapse —
    // exactly ONE wide (hash-partitioned) exchange. Match on the plan
    // STRING: SparkPlan.collect does not descend into AdaptiveSparkPlanExec,
    // so a node-level collect silently sees zero exchanges (vacuous pin).
    val s = plan.toString
    val wide = s.sliding("Exchange hashpartitioning".length)
      .count(_ == "Exchange hashpartitioning")
    assert(wide === 1, s"expected exactly 1 wide exchange, got:\n$s")
  }

  test("transition matrix: per-user sequences, tie-break by event id, row-normalized") {
    val events = Seq(
      // u1: view → click → view (ordered by ts)
      (1L, 1L, "view", "2024-01-01 10:00:00"),
      (2L, 1L, "click", "2024-01-01 11:00:00"),
      (3L, 1L, "view", "2024-01-01 12:00:00"),
      // u2: two SAME-timestamp events — order fixed by event_id (4 then 5)
      (4L, 2L, "view", "2024-01-01 10:00:00"),
      (5L, 2L, "click", "2024-01-01 10:00:00"),
      // u3: single event → no transition
      (6L, 3L, "view", "2024-01-01 10:00:00"))
      .map { case (e, u, t, at) => (e, u, t, ts(at)) }
      .toDF("event_id", "user_id", "event_type", "ts")
    val out = EventAnalytics.transitionMatrix(events).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    // transitions: u1 view→click, click→view; u2 view→click
    assert(out.toSeq === Seq(
      ("click", "view", 1L, 1.0),
      ("view", "click", 2L, 1.0)))
  }

  test("cohort retention: month-index cohorts, offset-0 size, exact ratios") {
    val facts = Seq(
      (1L, "2024-01-05"), (1L, "2024-02-10"), (1L, "2024-02-11"), // dup month collapses
      (2L, "2024-01-20"), (3L, "2024-01-31"),
      (4L, "2023-12-31"), (4L, "2024-02-01") // year boundary: offset 2
    ).map { case (u, d) => (u, java.sql.Date.valueOf(d)) }.toDF("u", "d")
    val out = EventAnalytics.cohortRetention(facts, "u", "d")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getLong(3), r.getDouble(4)))
    assert(out.toSeq === Seq(
      (2023, 12, 0, 1L, 1.0), (2023, 12, 2, 1L, 1.0),
      (2024, 1, 0, 3L, 1.0), (2024, 1, 1, 1L, round(1.0 / 3, 6))))
  }

  test("volume anomalies: MAD threshold flags only the outlier day") {
    // per-day counts: 10,10,12,12,14,14,100 → med 12, |dev| = 2,2,0,0,2,2,88
    // → MAD 2, threshold 3·2 = 6 → only the 100-count day flags
    val counts = Seq(10, 10, 12, 12, 14, 14, 100)
    val events = counts.zipWithIndex.flatMap { case (n, d) =>
      (1 to n).map(i => (1L, "view", ts(f"2024-01-${d + 1}%02d 10:00:${i % 60}%02d")))
    }.toDF("user_id", "event_type", "ts")
    val out = EventAnalytics.volumeAnomalies(events).collect()
    assert(out.count(_.getBoolean(5)) === 1)
    val anom = out.find(_.getBoolean(5)).get
    assert(anom.getLong(1) === 100L && anom.getDouble(2) === 12.0 &&
      anom.getDouble(3) === 2.0 && anom.getDouble(4) === 44.0)
    // a 2-off day is under the 6-count threshold
    assert(out.filter(_.getLong(1) === 10L).forall(!_.getBoolean(5)))
  }

  test("volume anomalies: MAD = 0 → any deviation flags, score is null") {
    val counts = Seq(5, 5, 5, 9)
    val events = counts.zipWithIndex.flatMap { case (n, d) =>
      (1 to n).map(i => (1L, "view", ts(f"2024-01-${d + 1}%02d 10:00:${i % 60}%02d")))
    }.toDF("user_id", "event_type", "ts")
    val out = EventAnalytics.volumeAnomalies(events).collect()
    assert(out.forall(_.isNullAt(4)))
    assert(out.filter(_.getLong(1) === 9L).forall(_.getBoolean(5)))
    assert(out.filter(_.getLong(1) === 5L).forall(!_.getBoolean(5)))
  }

  test("streaming anomaly score: two micro-batches, final day = batch verdict") {
    implicit val sqlCtx = spark.sqlContext
    // counts per day: 10,10,12,12,14,14,100 (the batch fixture) → med 12,
    // MAD 2, threshold 6 → only day 7 flags; rows split mid-day so one
    // window accumulates across batches
    val counts = Seq(10, 10, 12, 12, 14, 14, 100)
    val rows = counts.zipWithIndex.flatMap { case (n, d) =>
      (1 to n).map(i => (ts(f"2024-01-${d + 1}%02d 10:00:${i % 60}%02d"), i.toLong))
    }
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(java.sql.Timestamp, Long)]
    val out = graft.streaming.StreamingAnomaly.scoreStream(
      mem.toDF().toDF("ts", "event_id"), med = 12.0, mad = 2.0)
    val q = out.writeStream.outputMode("complete").format("memory")
      .queryName("sas_out").start()
    val (b1, b2) = rows.splitAt(rows.length / 2)
    mem.addData(b1); q.processAllAvailable()
    mem.addData(b2); q.processAllAvailable()
    q.stop()
    val got = spark.table("sas_out").collect()
      .map(r => (r.getLong(1), if (r.isNullAt(2)) -1.0 else r.getDouble(2),
        r.getBoolean(3)))
    spark.catalog.dropTempView("sas_out")
    assert(got.length === 7 && got.map(_._1).sum === counts.sum.toLong)
    assert(got.count(_._3) === 1)
    assert(got.find(_._3).get === ((100L, 44.0, true)))
  }

  test("volume trend: exact OLS slope on a linear ramp, null on one day") {
    // 'up' ramps 2,4,6,8 over 4 days → slope exactly 2; 'one' sits on a
    // single day → zero denominator → null slope
    val events = (0 until 4).flatMap { d =>
      (1 to 2 * (d + 1)).map(i =>
        (1L, "up", ts(f"2024-02-${d + 1}%02d 08:00:${i % 60}%02d")))
    } ++ Seq((1L, "one", ts("2024-02-01 09:00:00")),
      (2L, "one", ts("2024-02-01 10:00:00")))
    val out = EventAnalytics.volumeTrend(events.toDF("user_id", "event_type", "ts"))
      .collect()
    val one = out.find(_.getString(0) == "one").get
    assert(one.getLong(1) === 1L && one.getLong(2) === 2L && one.isNullAt(3))
    val up = out.find(_.getString(0) == "up").get
    assert(up.getLong(1) === 4L && up.getLong(2) === 20L &&
      up.getDouble(3) === 2.0)
  }

  test("decayed scores: shared weight table, exact micro-unit sums") {
    // half-life 1 day: weights 1, 0.5, 0.25 — 'hot' has 10 events today,
    // 'cold' 10 events two days ago: decayed 10.0 vs 2.5, flipping the
    // raw-count tie
    val events =
      (1 to 10).map(i => (1L, "hot", ts(f"2024-02-03 08:00:${i % 60}%02d"))) ++
      (1 to 10).map(i => (1L, "cold", ts(f"2024-02-01 08:00:${i % 60}%02d")))
    val out = EventAnalytics.decayedTypeScores(events.toDF("user_id", "event_type", "ts"),
        halfLifeDays = 1, maxAgeDays = 60)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq === Seq(("hot", 10L, 10.0), ("cold", 10L, 2.5)))
    // the weight table itself: exact micro-units, halving per half-life
    val w = EventAnalytics.decayWeightsMicro(7, 14)
    assert(w(0) === 1000000L && w(7) === 500000L && w(14) === 250000L)
    assert(w.sliding(2).forall { case Seq(a, b) => b < a })
  }

  test("basket lift: exact co-occurrence ratios; oversized baskets drop " +
    "whole; duplicate items collapse") {
    // baskets: 1{a,b} 2{a,b} 3{a} 4{b,c} — n=4, a:3 b:3 c:1,
    // ab:2 → lift 2·4/9; bc:1 → 4/3; ac:0 (absent)
    val items = Seq(
      (1L, "a"), (1L, "b"), (1L, "b"), // dup item collapses
      (2L, "a"), (2L, "b"),
      (3L, "a"),
      (4L, "b"), (4L, "c")).toDF("bk", "it")
    val out = EventAnalytics.basketLift(items, "bk", "it")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq === Seq(
      ("a", "b", 2L, 2.0 * 4 / 9), ("b", "c", 1L, 4.0 / 3)))
    // a 3-item basket past the cap contributes NO pairs but still counts
    // in N and the marginals (it is a real basket; only its pair fan-out
    // is refused)
    val withBig = items.unionByName(
      Seq((5L, "a"), (5L, "b"), (5L, "c")).toDF("bk", "it"))
    val capped = EventAnalytics.basketLift(withBig, "bk", "it", maxBasketSize = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(capped.toSeq === Seq(("a", "b", 2L), ("b", "c", 1L)))
    intercept[IllegalArgumentException] {
      EventAnalytics.basketLift(items, "bk", "it", maxBasketSize = 1)
    }
  }

  private def round(x: Double, n: Int): Double =
    BigDecimal(x).setScale(n, BigDecimal.RoundingMode.HALF_UP).toDouble
}

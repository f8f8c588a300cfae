package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Event-sequence analytics over an events table (event_id, ts, user_id,
 * event_type, value, props — TESTDATA.md): ordered conversion funnels and
 * cohort retention. The classic product-analytics pair, and — for a
 * training-data pipeline — the shape of any "did ingest reach stage k
 * within the window" audit over a pipeline-event log.
 *
 * Scale shape (both operators): ONE shuffle on the entity key, then every
 * per-entity step is a Window over that same partitioning — Catalyst plans
 * a single Exchange + Sort and stacks the Window operators on top of it
 * (pinned in EventAnalyticsSpec), so the sequential "first B after A"
 * dependency costs no extra shuffles. The per-entity state is k timestamps
 * (funnel) or one month index (cohort), so no partition outgrows memory no
 * matter how active one user is. Final aggregates reduce to stage/cohort
 * cardinality — driver-small by construction.
 *
 * Determinism: all comparisons are on exact timestamps / integer month
 * indexes; the only doubles are final ratio divisions, round(…, 6) — the
 * repo-wide cross-engine convention.
 */
object EventAnalytics {

  /**
   * Ordered conversion funnel: for each user, stage 1 fires at the first
   * `steps(0)` event; stage i fires at the first `steps(i-1)` event
   * STRICTLY after stage i-1 and within `withinHours` of it. Output: one
   * row per stage — (step_idx, stage, users, conv_from_first,
   * conv_from_prev), ordered by step_idx.
   *
   * The strict-sequence semantics ("click after the view, purchase after
   * that click") is what windowed conditional aggregation alone cannot
   * express; chaining Windows over one user partitioning expresses it in
   * a single pass.
   */
  def funnelSteps(events: DataFrame, steps: Seq[String], withinHours: Int,
                  tsCol: String = "ts", userCol: String = "user_id",
                  typeCol: String = "event_type"): DataFrame = {
    require(steps.size >= 2, s"funnelSteps: need >= 2 steps, got ${steps.size}")
    require(steps.distinct.size == steps.size, "funnelSteps: steps must be distinct")
    require(withinHours > 0, s"funnelSteps: withinHours must be positive, got $withinHours")

    val w = Window.partitionBy(col(userCol))
    // type-pruned scan: only funnel stages survive to the shuffle
    val base = events.filter(col(typeCol).isin(steps: _*))
      .select(col(userCol), col(typeCol), col(tsCol))

    // t1 = first stage-0 event; t_i = first stage-(i-1) event in
    // (t_{i-1}, t_{i-1} + withinHours]. Each step is a Window over the SAME
    // partitioning — one Exchange total.
    val staged = steps.zipWithIndex.foldLeft(base) { case (df, (stage, i)) =>
      val cond =
        if (i == 0) col(typeCol) === stage
        else col(typeCol) === stage &&
          col(tsCol) > col(s"_t$i") &&
          col(tsCol) <= col(s"_t$i") + expr(s"INTERVAL $withinHours HOURS")
      df.withColumn(s"_t${i + 1}", min(when(cond, col(tsCol))).over(w))
    }

    val k = steps.size
    // per-user stage timestamps are window-constants; max() just reads them
    val perUser = staged.groupBy(col(userCol))
      .agg(max(col("_t1")).as("_t1"),
        (2 to k).map(i => max(col(s"_t$i")).as(s"_t$i")): _*)
    // count() skips nulls → users reaching each stage; ONE driver-small row
    val summary = perUser.agg(count(col("_t1")).as("u1"),
      (2 to k).map(i => count(col(s"_t$i")).as(s"u$i")): _*)

    def ratio(num: Column, den: Column): Column =
      when(den > 0, round(num.cast("double") / den, 6)).otherwise(lit(null).cast("double"))

    val rows = steps.zipWithIndex.map { case (stage, i0) =>
      val i = i0 + 1
      struct(
        lit(i).as("step_idx"),
        lit(stage).as("stage"),
        col(s"u$i").as("users"),
        ratio(col(s"u$i"), col("u1")).as("conv_from_first"),
        (if (i == 1) lit(null).cast("double")
         else ratio(col(s"u$i"), col(s"u${i - 1}"))).as("conv_from_prev"))
    }
    summary.select(explode(array(rows: _*)).as("r"))
      .select(col("r.step_idx"), col("r.stage"), col("r.users"),
        col("r.conv_from_first"), col("r.conv_from_prev"))
      .orderBy(col("step_idx"))
  }

  /**
   * First-order Markov transition matrix over each user's time-ordered
   * event sequence: counts and row-normalized probabilities of
   * cur → next. The third member of the event family (funnel = "did the
   * path happen", retention = "did the user come back", transitions =
   * "where do users go next") and the input of any next-event model.
   *
   * Determinism: the sequence order is (ts, tieCol) — `tieCol` must make
   * the per-user order total (a unique event id), or same-timestamp
   * neighbors would make lead() engine-dependent. prob is one IEEE
   * division of two exact int64 counts, round(…, 6) — the repo-wide
   * cross-engine convention.
   *
   * Scale shape: ONE user-keyed shuffle for the sequence Window, then an
   * aggregate to the |types|²-bounded (cur, next) table; the
   * row-normalizing Window runs over that tiny table, not the raw events.
   */
  def transitionMatrix(events: DataFrame, userCol: String = "user_id",
                       tsCol: String = "ts", typeCol: String = "event_type",
                       tieCol: String = "event_id"): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
    val wCur = Window.partitionBy(col("cur"))
    events.select(col(userCol), col(typeCol).as("cur"), col(tsCol), col(tieCol))
      .withColumn("nxt", lead(col("cur"), 1).over(w))
      .filter(col("nxt").isNotNull)
      .groupBy(col("cur"), col("nxt")).agg(count(lit(1)).as("cnt"))
      .withColumn("prob",
        round(col("cnt").cast("double") / sum(col("cnt")).over(wCur), 6))
      .orderBy(col("cur"), col("nxt"))
  }

  /**
   * Monthly cohort retention: cohort = calendar month of the entity's
   * first fact; for every later month with activity, the share of the
   * cohort still active. Month arithmetic is on the integer index
   * `year*12 + (month-1)` — exact in any engine, no interval/timezone
   * semantics to align. Output: (cohort_year, cohort_month, month_offset,
   * users, retention), ordered.
   *
   * Offset 0 always exists for every cohort (the first fact itself), so
   * the cohort-size Window lookup never misses.
   */
  def cohortRetention(facts: DataFrame, userCol: String, dateCol: String): DataFrame = {
    val m = (year(col(dateCol)) * 12 + (month(col(dateCol)) - 1)).cast("int")
    val wUser = Window.partitionBy(col("u"))
    // null dates would yield NULL month_offset rows whose sort placement
    // differs across engines (Spark NULLS FIRST vs DuckDB NULLS LAST) —
    // a dateless fact carries no cohort signal, so drop it up front
    val active = facts.filter(col(dateCol).isNotNull)
      .select(col(userCol).as("u"), m.as("m"))
      .withColumn("cm", min(col("m")).over(wUser))
      .select(col("u"), col("cm"), (col("m") - col("cm")).as("off"))
      .distinct() // one row per (user, active month)
    val counts = active.groupBy(col("cm"), col("off"))
      .agg(count(lit(1)).as("users"))
    val wCohort = Window.partitionBy(col("cm"))
    counts
      .withColumn("csz", max(when(col("off") === 0, col("users"))).over(wCohort))
      .select(
        floor(col("cm") / 12).cast("int").as("cohort_year"),
        (col("cm") % 12 + 1).cast("int").as("cohort_month"),
        col("off").as("month_offset"),
        col("users"),
        round(col("users").cast("double") / col("csz"), 6).as("retention"))
      .orderBy(col("cohort_year"), col("cohort_month"), col("month_offset"))
  }

  /**
   * Robust daily-volume anomaly detection: flag days whose event count
   * deviates from the corpus median by more than `madK` × MAD (median
   * absolute deviation) — the monitoring primitive a pipeline runs over
   * its own ingest log to catch feed outages and duplication storms.
   * Median/MAD, not mean/stddev: one broken day cannot drag the baseline
   * toward itself.
   *
   * Output: one row per day — (day, cnt, med, mad, dev_score, anomaly),
   * dev_score = |cnt − med| / MAD rounded to 6 (NULL when MAD = 0, in
   * which case ANY deviation flags — `|cnt − med| > k·0`).
   *
   * Scale shape: ONE corpus shuffle (map-side-combined groupBy to the
   * calendar-bounded daily frame, localCheckpointed so the med / MAD /
   * scoring consumers cannot fork the corpus scan), then two 1-row
   * aggregates broadcast back over |days| rows. Exactness: counts are
   * longs; exact-percentile medians of longs are .0/.5 halves (IEEE-
   * exact), so every comparison replays bit-for-bit in DuckDB.
   */
  def volumeAnomalies(events: DataFrame, madK: Double = 3.0,
                      tsCol: String = "ts"): DataFrame = {
    require(madK > 0, s"volumeAnomalies: madK must be positive, got $madK")
    val daily = events
      .groupBy(to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint()
    val med = daily.agg(percentile(col("cnt"), lit(0.5)).as("med"))
    val scored = daily.crossJoin(broadcast(med))
    val mad = scored
      .agg(percentile(abs(col("cnt") - col("med")), lit(0.5)).as("mad"))
    scored.crossJoin(broadcast(mad))
      .select(col("day"), col("cnt"), col("med"), col("mad"),
        when(col("mad") === 0, lit(null).cast("double"))
          .otherwise(round(abs(col("cnt") - col("med")) / col("mad"), 6))
          .as("dev_score"),
        (abs(col("cnt") - col("med")) > lit(madK) * col("mad")).as("anomaly"))
      .orderBy(col("day"))
  }

  /**
   * Per-type daily-volume TREND line: ordinary-least-squares slope of the
   * daily event count over the day index — "is this feed growing,
   * flat, or decaying", the forward-looking companion to
   * [[volumeAnomalies]]' outlier view. slope =
   * (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²) with x = days since the corpus's
   * first day, y = daily count — every sum an exact int64 (calendar-
   * bounded magnitudes), so the single rounded division is the only IEEE
   * step and the whole table replays in DuckDB.
   *
   * Scale shape: one map-side-combined groupBy to the |types|×|days|
   * daily grid, a 1-row min-day broadcast, then a |types|-row aggregate.
   * Output: (event_type, n_days, total, slope) — slope NULL when every
   * observation sits on one day (zero denominator).
   */
  def volumeTrend(events: DataFrame, typeCol: String = "event_type",
                  tsCol: String = "ts"): DataFrame = {
    val daily = events
      .groupBy(col(typeCol), to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("y"))
    val d0 = daily.agg(min(col("day")).as("d0"))
    daily.crossJoin(broadcast(d0))
      .select(col(typeCol), datediff(col("day"), col("d0")).cast("long").as("x"),
        col("y"))
      .groupBy(col(typeCol))
      .agg(count(lit(1)).as("n_days"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .select(col(typeCol), col("n_days"), col("sy").as("total"),
        when(col("n_days") * col("sxx") === col("sx") * col("sx"),
          lit(null).cast("double"))
          .otherwise(round(
            (col("n_days") * col("sxy") - col("sx") * col("sy")).cast("double") /
              (col("n_days") * col("sxx") - col("sx") * col("sx")).cast("double"),
            6)).as("slope"))
      .orderBy(col(typeCol))
  }

  /**
   * Market-basket association LIFT over (basket, item) rows: for every
   * unordered item pair, `lift = (n_ab·N) / (n_a·n_b)` with n_x = baskets
   * containing x, n_ab = baskets containing both, N = total baskets —
   * lift > 1 means the pair co-occurs more than independence predicts.
   * DECLARED SEMANTICS of the size cap: the marginals n_a/n_b and the
   * total N count ALL baskets, while n_ab counts only kept (≤
   * `maxBasketSize`) baskets — pairs whose items appear in oversized
   * (dropped) baskets are therefore biased DOWNWARD relative to the pure
   * independence formula. This is intentional: the cap bounds the
   * quadratic pair fan-out, and under-reporting a hot pair is the safe
   * direction for an association screen; the oracle replays the identical
   * convention. (This is the "customers who bought X also bought Y"
   * primitive, and for a training-data pipeline the "sources that
   * co-occur in dup clusters" shape.)
   * Operands are exact integers, so the single IEEE division per
   * pair replays with no rounding (the [[volumeTrend]]/dow-lift
   * convention).
   *
   * Scale shape: ONE distinct shuffle to (basket, item) pairs
   * (localCheckpointed — marginals, sizes and the self-join must not
   * re-derive it), a basket-keyed self-join whose fan-out is bounded by
   * `maxBasketSize` (oversized baskets drop WHOLE — the entity-blocking
   * cap discipline; a single pathological basket cannot go quadratic),
   * and |items|-row marginals broadcast back. Output ≤ |items|² rows:
   * (item_a, item_b, n_ab, lift), item_a < item_b, ordered by the pair.
   */
  def basketLift(items: DataFrame, basketCol: String, itemCol: String,
                 maxBasketSize: Int = 256): DataFrame = {
    require(maxBasketSize >= 2,
      s"basketLift: maxBasketSize must be >= 2, got $maxBasketSize")
    val b = items.select(col(basketCol).as("bk"), col(itemCol).as("it"))
      .distinct().localCheckpoint()
    val total = b.select(col("bk")).distinct()
      .agg(count(lit(1)).as("n_baskets"))
    val marg = b.groupBy(col("it")).agg(count(lit(1)).as("n_i"))
    val kept = b.join(
      b.groupBy(col("bk")).agg(count(lit(1)).as("sz"))
        .filter(col("sz") <= maxBasketSize).select(col("bk")),
      Seq("bk"))
    val pairs = kept.as("x")
      .join(kept.as("y"),
        col("x.bk") === col("y.bk") && col("x.it") < col("y.it"))
      .groupBy(col("x.it").as("item_a"), col("y.it").as("item_b"))
      .agg(count(lit(1)).as("n_ab"))
    pairs
      .join(broadcast(marg.select(col("it").as("item_a"), col("n_i").as("n_a"))),
        Seq("item_a"))
      .join(broadcast(marg.select(col("it").as("item_b"), col("n_i").as("n_b"))),
        Seq("item_b"))
      .crossJoin(broadcast(total))
      .select(col("item_a"), col("item_b"), col("n_ab"),
        ((col("n_ab") * col("n_baskets")).cast("double") /
          (col("n_a") * col("n_b")).cast("double")).as("lift"))
      .orderBy(col("item_a"), col("item_b"))
  }

  /** Exponential-decay weights as 1e-6-unit integers:
    * w(d) = round6(0.5^(d / halfLife)) for day ages 0..maxAge — computed
    * ONCE driver-side so the engine column expression and the SQL oracle
    * consume the SAME literal numbers (no cross-engine pow). */
  def decayWeightsMicro(halfLifeDays: Int, maxAgeDays: Int): IndexedSeq[Long] = {
    require(halfLifeDays > 0, s"decayWeightsMicro: halfLifeDays must be positive, got $halfLifeDays")
    require(maxAgeDays >= 0, s"decayWeightsMicro: maxAgeDays must be >= 0, got $maxAgeDays")
    (0 to maxAgeDays).map { d =>
      java.math.BigDecimal.valueOf(math.pow(0.5, d.toDouble / halfLifeDays))
        .setScale(6, java.math.RoundingMode.HALF_UP)
        .movePointRight(6).longValueExact()
    }
  }

  /**
   * Time-decayed activity score per event type — "what is trending NOW":
   * each day's count weighted by [[decayWeightsMicro]] (half-life decay
   * against the corpus's LAST day; ages past `maxAgeDays` contribute
   * zero), summed as exact integer micro-units. A recency-weighted
   * ranking that a uniform count can't give, with none of `exp()`'s
   * cross-engine hazard — the weight table is data, not math, on both
   * sides.
   *
   * Scale shape: same one-shuffle daily grid as [[volumeTrend]], a 1-row
   * max-day broadcast, |types|-row output (event_type, raw_n,
   * decayed) ordered by decayed score descending.
   */
  def decayedTypeScores(events: DataFrame, halfLifeDays: Int = 7,
                        maxAgeDays: Int = 60,
                        typeCol: String = "event_type",
                        tsCol: String = "ts"): DataFrame = {
    val w = decayWeightsMicro(halfLifeDays, maxAgeDays)
    val arr = typedlit(w)
    val daily = events
      .groupBy(col(typeCol), to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("y"))
    val ref = daily.agg(max(col("day")).as("ref"))
    daily.crossJoin(broadcast(ref))
      .select(col(typeCol), col("y"),
        datediff(col("ref"), col("day")).cast("int").as("age"))
      .groupBy(col(typeCol))
      .agg(sum(col("y")).as("raw_n"),
        sum(when(col("age") <= maxAgeDays,
          col("y") * element_at(arr, col("age") + 1)).otherwise(0L))
          .as("units"))
      .select(col(typeCol), col("raw_n"),
        round(col("units").cast("double") / 1e6, 6).as("decayed"))
      .orderBy(col("decayed").desc, col(typeCol))
  }
}

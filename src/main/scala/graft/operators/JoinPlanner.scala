package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Estimate-before-you-shuffle JOIN PLANNING: the automatic strategy
 * chooser that closes the loop between the planner DIAGNOSTICS
 * ([[Sketches.cmsJoinSize]] — the CMS inner-product join-size bound;
 * [[Skew.keySkewProfile]] — hot-key shares) and the REMEDIES
 * ([[Skew.saltedJoin]], [[Bloom.prunedJoin]], broadcast). At 100 TB the
 * wrong join strategy is the difference between minutes and hours — a
 * skewed key pins one reducer, a selective dim read through a plain
 * shuffle drags the whole fact table across the exchange, a
 * broadcastable dim shuffled anyway pays two sorts — and the inputs
 * needed to pick correctly are KB-sized artifacts (two CMS cell tables,
 * a top-k skew profile, two row counts) that an ingest pipeline builds
 * once per table and merges incrementally, never the join itself.
 *
 * Decision rule, in precedence order (first match wins):
 *  1. `dim_rows ≤ broadcastMaxDimRows`      → '''broadcast''' (no
 *     exchange at all beats every other remedy when the dim fits);
 *  2. `top_share ≥ skewShareMin`            → '''salted''' (the hot
 *     fact key would pin one reducer; spread it over `salt` partitions);
 *  3. `est_selectivity ≤ bloomSelectivityMax` → '''bloom_pruned''' (most
 *     fact rows have NO match — drop them with a codegen'd scan
 *     predicate BEFORE the exchange);
 *  4. otherwise                             → '''plain''' (the join is
 *     dense and balanced; Spark's sort-merge + AQE is the right tool).
 *
 * `est_selectivity = round6(est_join_size / fact_rows)` — an UPPER bound
 * on the matching-row fraction when dim keys are unique (the CMS
 * inner-product never undercounts), so the bloom branch can only be
 * chosen conservatively: a fixed-size sketch over a bigger corpus gives
 * a looser bound, degrading gracefully toward 'plain', never toward a
 * wrong prune. Every number in the decision row is an exact count or a
 * round-6 ratio of exact counts — the whole derivation, CASE included,
 * replays in DuckDB (the `join_choice_decision` gate).
 *
 * Chosen-strategy RESULT IDENTITY is structural, not statistical: all
 * four strategies return exactly `fact ⋈ dim` (broadcast is a hint;
 * salting is an equi-join refinement that drops its salt; the bloom
 * prune has no false negatives and the join discards false positives) —
 * so the chooser can never change answers, only costs (the
 * `join_choice_exec` gate hash-matches the plain join's aggregate).
 */
object JoinPlanner {

  /** Decision thresholds + remedy parameters. Defaults suit the test
    * scale; a deployment tunes `broadcastMaxDimRows` to its broadcast
    * memory budget and `skewShareMin` to its reducer-imbalance
    * tolerance. `cmsDepth`/`cmsWidth` size the join-size sketch —
    * bigger width = tighter selectivity bound = more bloom-prune
    * opportunities detected. */
  final case class JoinThresholds(
      broadcastMaxDimRows: Long = 100000L,
      skewShareMin: Double = 0.05,
      bloomSelectivityMax: Double = 0.25,
      salt: Int = 8,
      bloomMBits: Int = 62 * 2048,
      bloomNumHashes: Int = 4,
      cmsDepth: Int = 4,
      cmsWidth: Int = 4096) {
    require(broadcastMaxDimRows >= 0, "broadcastMaxDimRows must be >= 0")
    require(skewShareMin > 0.0 && skewShareMin <= 1.0,
      s"skewShareMin must be in (0, 1], got $skewShareMin")
    require(bloomSelectivityMax >= 0.0,
      s"bloomSelectivityMax must be >= 0, got $bloomSelectivityMax")
    require(salt >= 2, s"salt must be >= 2, got $salt")
  }

  /** The chosen plan: the decision inputs (exact counts + round-6
    * ratios), the strategy, and the resulting joined frame. */
  final case class JoinPlan(
      strategy: String,
      factRows: Long,
      dimRows: Long,
      topShare: Double,
      estJoinSize: Long,
      estSelectivity: Double,
      result: DataFrame)

  /**
   * The decision ROW as a DataFrame — one row: (fact_rows, dim_rows,
   * top_share, est_join_size, est_selectivity, strategy). Derivation:
   * two exact counts, the rank-1 share from [[Skew.keySkewProfile]],
   * the never-undercounting [[Sketches.cmsJoinSize]] bound from two
   * `depth·width`-bounded cell tables, one round-6 division, one CASE
   * over literal thresholds — fully SQL-replayable. The corpus-sized
   * passes here (counts, CMS builds, the skew profile's one groupBy)
   * are what a 100 TB deployment would maintain incrementally as
   * mergeable per-ingest artifacts ([[Sketches.countMinMerge]]); the
   * inline form exists so the gate can replay the whole chain.
   */
  /** The CMS cell build casts its key to long ([[Sketches.countMinCells]]);
    * a string key would cast to NULL, never equi-join in the inner
    * product, and collapse the bound to 0 — flipping the never-undercount
    * guarantee into a guaranteed undercount that force-picks
    * 'bloom_pruned' for every string-keyed join. String keys (URLs,
    * doc ids) are therefore xxhash64'd first: hash collisions can only
    * MERGE distinct keys into one cell, which inflates the inner product —
    * the bound stays an upper bound, degrading toward 'plain', never
    * toward a wrong prune. */
  private def sketchKey(df: DataFrame, key: String): Column =
    df.schema(key).dataType match {
      case org.apache.spark.sql.types.StringType => xxhash64(col(key))
      case _ => col(key)
    }

  def joinDecision(fact: DataFrame, dim: DataFrame, factKey: String,
                   dimKey: String, th: JoinThresholds): DataFrame = {
    val factRows = fact.agg(count(lit(1)).cast("long").as("fact_rows"))
    val dimRows = dim.agg(count(lit(1)).cast("long").as("dim_rows"))
    val top = Skew.keySkewProfile(fact, factKey, topK = 1)
      .select(col("share").as("top_share"))
    val est = Sketches.cmsJoinSize(
      Sketches.countMinCells(fact, sketchKey(fact, factKey), th.cmsDepth, th.cmsWidth),
      Sketches.countMinCells(dim, sketchKey(dim, dimKey), th.cmsDepth, th.cmsWidth),
      th.cmsDepth)
    factRows
      .crossJoin(broadcast(dimRows))
      .crossJoin(broadcast(top))
      .crossJoin(broadcast(est))
      .withColumn("est_selectivity",
        round(col("est_join_size").cast("double") / col("fact_rows"), 6))
      .withColumn("strategy",
        when(col("dim_rows") <= th.broadcastMaxDimRows, "broadcast")
          .when(col("top_share") >= th.skewShareMin, "salted")
          .when(col("est_selectivity") <= th.bloomSelectivityMax, "bloom_pruned")
          .otherwise("plain"))
  }

  /**
   * [[joinDecision]] extended with the exchange-sizing half
   * ([[Capacity]]): exact byte accounting of both join inputs plus the
   * advised partition count for the join's shuffle exchange —
   * `clamp(ceildiv(fact_bytes + dim_bytes, targetPartitionBytes))`, the
   * initial count AQE can only coalesce DOWN from (a too-small static
   * `spark.sql.shuffle.partitions` is unfixable at runtime; a sized one
   * costs nothing). When the strategy is 'broadcast' no exchange runs
   * and `dim_bytes` is instead the payload the driver must hold — the
   * number to check against the broadcast memory budget. Everything
   * added is int64 arithmetic on exact sums, so the gate replays
   * sketches, byte accounting and ceildiv in one chain.
   */
  def sizedJoinDecision(fact: DataFrame, dim: DataFrame, factKey: String,
                        dimKey: String, th: JoinThresholds,
                        t: Capacity.SizingTargets = Capacity.SizingTargets()): DataFrame = {
    val fb = fact.agg(
      coalesce(sum(Capacity.rowBytes(fact)), lit(0L)).as("fact_bytes"))
    val db = dim.agg(
      coalesce(sum(Capacity.rowBytes(dim)), lit(0L)).as("dim_bytes"))
    joinDecision(fact, dim, factKey, dimKey, th)
      .crossJoin(broadcast(fb))
      .crossJoin(broadcast(db))
      .withColumn("advised_shuffle_partitions",
        Capacity.advisedPartitions(col("fact_bytes") + col("dim_bytes"), t))
  }

  /** Sketch-bundle shape: CMS grid dimensions plus the breadth of the
    * per-slice hot-key candidate list. `topK` bounds the topk component at
    * `topK` rows PER APPENDED SLICE (KB-sized at any setting); the merged
    * top-1 count is exact whenever the table's hottest key ranks within
    * every slice's top-`topK` (always true when `topK` >= the per-slice
    * distinct-key count), and a LOWER bound otherwise — see
    * [[joinDecisionFromProfiles]] for the degrade direction. */
  final case class ProfileParams(depth: Int = 4, width: Int = 4096,
                                 topK: Int = 64, kmvK: Int = 256) {
    require(topK >= 1, s"ProfileParams: topK must be >= 1, got $topK")
    require(kmvK >= 2, s"ProfileParams: kmvK must be >= 2, got $kmvK")
  }

  /**
   * Persist the per-table sketch BUNDLE the planner decides from — the
   * artifact an ingest pipeline maintains per table so that every later
   * join decision costs zero corpus passes:
   *
   *  - `cells/`  — the CMS cell table ([[Sketches.countMinCells]], string
   *    keys xxhash64'd exactly as [[joinDecision]] does) feeding the
   *    never-undercounting join-size bound;
   *  - `topk/`   — this slice's `topK` hottest sketch-keys with EXACT
   *    counts (TakeOrdered — per-partition heaps, no global sort),
   *    feeding the salted-join trigger;
   *  - `stats/`  — one row: exact row count + [[Capacity.rowBytes]]
   *    total + the sketch shape, feeding sizing and load-time shape
   *    validation.
   *
   * Every component is MERGEABLE by construction: cells sum cell-wise
   * ([[Sketches.countMinMerge]] — CMS(A ⊎ B) is exactly the one-shot
   * sketch of A ∪ B), stats sum row-wise, and topk counts sum per key
   * (exactness precondition on [[ProfileParams.topK]]). So
   * [[appendTableProfile]] just adds delta files — no base rewrite, no
   * read-modify-write — and the loader folds the pile.
   *
   * Three narrow map-side-combined passes over the slice, each shuffling
   * rows bounded by the sketch shape (depth·width cells / topK keys /
   * 1 stat row), never by the slice.
   */
  def saveTableProfile(df: DataFrame, key: String, path: String,
                       p: ProfileParams = ProfileParams()): Unit =
    writeTableProfile(df, key, path, p, "overwrite")

  /** Add an ingest slice's profile as delta files (no base rewrite) —
    * the bundle must be written with the SAME depth/width as the base
    * ([[loadTableProfile]] validates; a shape mix cannot merge). */
  def appendTableProfile(df: DataFrame, key: String, path: String,
                         p: ProfileParams = ProfileParams()): Unit =
    writeTableProfile(df, key, path, p, "append")

  private def writeTableProfile(df: DataFrame, key: String, path: String,
                                p: ProfileParams, mode: String): Unit = {
    // three bundle components, one slice scan: the cells/topk/stats
    // derivations would each re-read the ingest batch otherwise
    val slice = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val k = sketchKey(slice, key)
      Sketches.countMinCells(slice, k, p.depth, p.width)
        .write.mode(mode).parquet(s"$path/cells")
      slice.select(k.as("k"))
        .groupBy(col("k")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("k").asc).limit(p.topK)
        .write.mode(mode).parquet(s"$path/topk")
      // the 4th mergeable component: the slice's KMV distinct-count
      // sketch over the SAME sketch key (k-min commutes with union, so
      // the loader's kmvMerge over slices IS the one-shot sketch — the
      // pinned SketchLawsSpec law; string keys ride the xxhash64 first,
      // where a collision can only merge two keys = undercount by at
      // most the 2^-64 collision mass)
      Sketches.kmvSketch(slice.select(k.as("k")), col("k"), p.kmvK)
        .write.mode(mode).parquet(s"$path/kmv")
      slice.agg(count(lit(1)).as("rows"),
          coalesce(sum(Capacity.rowBytes(slice)), lit(0L)).as("bytes"))
        .select(col("rows"), col("bytes"), lit(p.depth).as("depth"),
          lit(p.width).as("width"), lit(p.topK).as("top_k"),
          lit(p.kmvK).as("kmv_k"))
        .write.mode(mode).parquet(s"$path/stats")
    } finally slice.unpersist()
  }

  /** A loaded (still-lazy) profile: merged cell table, raw per-slice topk
    * rows, the folded KMV distinct sketch, 1-row summed stats frame, and
    * the validated sketch shape. */
  final case class TableProfile(cells: DataFrame, topk: DataFrame,
                                kmv: DataFrame, stats: DataFrame,
                                depth: Int, width: Int, kmvK: Int)

  /** Load a profile bundle, folding accumulated deltas: cells via
    * [[Sketches.countMinMerge]] (cell-wise sum), the KMV component via
    * [[Sketches.kmvMerge]] (k-min of the union — exactly the one-shot
    * sketch), stats by summing slice rows. The sketch shape is validated
    * across slices (bounded collect over the slice-count-sized stats
    * table); a depth/width/kmvK mix aborts — sketches of different
    * shapes share no hash family or k-floor to merge under. */
  def loadTableProfile(spark: org.apache.spark.sql.SparkSession,
                       path: String): TableProfile = {
    val st = spark.read.parquet(s"$path/stats")
    val shapes = st.select(col("depth"), col("width"), col("top_k"), col("kmv_k"))
      .distinct().collect()
    require(shapes.length == 1,
      s"table profile at $path mixes sketch shapes " +
        shapes.map(r => s"${r.getInt(0)}x${r.getInt(1)}/t${r.getInt(2)}/k${r.getInt(3)}")
          .sorted.mkString(",") +
        " — rebuild with one ProfileParams; mixed-shape sketches cannot merge")
    val kmvK = shapes(0).getInt(3)
    TableProfile(
      Sketches.countMinMerge(Seq(spark.read.parquet(s"$path/cells"))),
      spark.read.parquet(s"$path/topk"),
      Sketches.kmvMerge(Seq(spark.read.parquet(s"$path/kmv")), kmvK),
      st.agg(sum(col("rows")).as("rows"), sum(col("bytes")).as("bytes")),
      shapes(0).getInt(0), shapes(0).getInt(1), kmvK)
  }

  /**
   * Compact a profile bundle: fold the save + delta pile into ONE merged
   * generation at `dst`. The bundle is the one artifact family whose
   * compaction IS its merge semantics: cells collapse to the summed grid
   * (≤ depth·width rows forever after), kmv to the k-min of the union
   * (exactly the one-shot sketch), stats to one summed row, and topk to
   * the merged per-key sums truncated back to `topK`. Under per-micro-
   * batch maintenance ([[appendTableProfile]] from `foreachBatch`) the
   * pile otherwise grows one file set per trigger — unbounded listing
   * cost for an artifact whose information content is fixed-size.
   *
   * Decision preservation: every decision input derives from the MERGED
   * components, so a decision from `dst` equals a decision from the
   * loaded pile UNCONDITIONALLY — the merged top-1 count survives any
   * topK ≥ 1 truncation. (Future appends after compaction re-enter the
   * standing topK-coverage precondition, exactly as appends to a fresh
   * save do.) Audited: summed rows/bytes must match the pile's.
   */
  def compactTableProfile(spark: org.apache.spark.sql.SparkSession,
                          src: String, dst: String): Unit = {
    require(src != dst, "compactTableProfile: dst must be a fresh path")
    val st = spark.read.parquet(s"$src/stats")
    val shapes = st.select(col("depth"), col("width"), col("top_k"), col("kmv_k"))
      .distinct().collect()
    require(shapes.length == 1,
      s"compactTableProfile: profile at $src mixes sketch shapes — " +
        "nothing well-formed to fold")
    val (depth, width, topK, kmvK) =
      (shapes(0).getInt(0), shapes(0).getInt(1), shapes(0).getInt(2), shapes(0).getInt(3))
    val prof = loadTableProfile(spark, src)
    prof.cells.write.mode("overwrite").parquet(s"$dst/cells")
    prof.topk.groupBy(col("k")).agg(sum(col("cnt")).as("cnt"))
      .orderBy(col("cnt").desc, col("k").asc).limit(topK)
      .write.mode("overwrite").parquet(s"$dst/topk")
    prof.kmv.write.mode("overwrite").parquet(s"$dst/kmv")
    prof.stats
      .select(col("rows"), col("bytes"), lit(depth).as("depth"),
        lit(width).as("width"), lit(topK).as("top_k"), lit(kmvK).as("kmv_k"))
      .write.mode("overwrite").parquet(s"$dst/stats")
    val pre = prof.stats.collect()(0)
    val post = loadTableProfile(spark, dst).stats.collect()(0)
    require(pre.getAs[Long]("rows") == post.getAs[Long]("rows") &&
        pre.getAs[Long]("bytes") == post.getAs[Long]("bytes"),
      s"compactTableProfile: summed stats changed ($pre -> $post) — " +
        "the source changed mid-compaction; re-run")
  }

  /**
   * DISTINCT-KEY advice from a persisted bundle alone — the aggregation
   * planner's twin of [[joinDecisionFromProfiles]]: before committing to
   * a `groupBy(key)` over a 100 TB table, the two artifact-derivable
   * numbers that size it are the exchange volume (exact byte total) and
   * the OUTPUT cardinality (the KMV distinct estimate — whether the
   * grouped result is broadcastable, driver-collectable, or itself a
   * big table). One row: `(rows, bytes, k, n, hk, estimate)` — the
   * [[Sketches.kmvEstimate]] columns joined with the exact stats; the
   * whole derivation (md5 k-min chain included) replays in SQL, and the
   * merge law holds exactly (k-min commutes with union), so advice from
   * merged deltas equals advice from a one-shot scan.
   */
  def profileDistinctAdvice(spark: org.apache.spark.sql.SparkSession,
                            path: String): DataFrame = {
    val prof = loadTableProfile(spark, path)
    prof.stats.crossJoin(broadcast(Sketches.kmvEstimate(prof.kmv, prof.kmvK)))
      .select(col("rows"), col("bytes"), col("k"), col("n"), col("hk"),
        col("estimate"))
  }

  /**
   * The COMPLETE planner row from two persisted bundles alone — the
   * [[sizedJoinDecision]] columns (strategy + exchange sizing) with ZERO
   * passes over fact or dim: every input is a KB-sized artifact read
   * (depth·width cells, slices·topK hot keys, slice stats). This is the
   * deployment shape the inline [[joinDecision]] exists to gate: ingest
   * maintains each table's bundle incrementally ([[appendTableProfile]]
   * per batch), and join planning — including planning the SAME join
   * repeatedly under different thresholds or against many candidate dims
   * — never touches the data again.
   *
   * MERGE LAW (the `join_profile_decision` gate replays it): because
   * cells, stats, and (under the [[ProfileParams.topK]] precondition)
   * the top-1 count all merge exactly, the decision row from a profile
   * built as save + N delta-appends over a partition of the table is
   * IDENTICAL to [[sizedJoinDecision]] run one-shot over the whole
   * table. When the precondition fails (a slice whose top-`topK` list
   * misses the global hottest key), the merged top count is a lower
   * bound, so `top_share` can only sink — the decision degrades from
   * 'salted' toward 'bloom_pruned'/'plain', never conversely; and since
   * every strategy returns identical rows ([[chooseJoin]]'s structural
   * identity), a degraded decision costs time, never correctness.
   */
  def joinDecisionFromProfiles(spark: org.apache.spark.sql.SparkSession,
                               factPath: String, dimPath: String,
                               th: JoinThresholds,
                               t: Capacity.SizingTargets = Capacity.SizingTargets()): DataFrame = {
    val f = loadTableProfile(spark, factPath)
    val d = loadTableProfile(spark, dimPath)
    require(f.depth == d.depth && f.width == d.width,
      s"joinDecisionFromProfiles: sketch shapes differ (fact ${f.depth}x${f.width}, " +
        s"dim ${d.depth}x${d.width}) — the inner product needs one hash family")
    val est = Sketches.cmsJoinSize(f.cells, d.cells, f.depth)
    val top = f.topk
      .groupBy(col("k")).agg(sum(col("cnt")).as("cnt"))
      .agg(coalesce(max(col("cnt")), lit(0L)).as("top_cnt"))
    f.stats.select(col("rows").as("fact_rows"), col("bytes").as("fact_bytes"))
      .crossJoin(broadcast(
        d.stats.select(col("rows").as("dim_rows"), col("bytes").as("dim_bytes"))))
      .crossJoin(broadcast(top))
      .crossJoin(broadcast(est))
      .withColumn("top_share",
        round(col("top_cnt").cast("double") / col("fact_rows"), 6))
      .withColumn("est_selectivity",
        round(col("est_join_size").cast("double") / col("fact_rows"), 6))
      .withColumn("strategy",
        when(col("dim_rows") <= th.broadcastMaxDimRows, "broadcast")
          .when(col("top_share") >= th.skewShareMin, "salted")
          .when(col("est_selectivity") <= th.bloomSelectivityMax, "bloom_pruned")
          .otherwise("plain"))
      .withColumn("advised_shuffle_partitions",
        Capacity.advisedPartitions(col("fact_bytes") + col("dim_bytes"), t))
      .select(col("fact_rows"), col("dim_rows"), col("top_share"),
        col("est_join_size"), col("est_selectivity"), col("strategy"),
        col("fact_bytes"), col("dim_bytes"), col("advised_shuffle_partitions"))
  }

  /**
   * KEY-OVERLAP advice from two persisted bundles — the third planner
   * signal the KMV component unlocks ([[Sketches.kmvSetEstimate]], the
   * theta-sketch set algebra on the exact-replay substrate): estimated
   * union size, Jaccard, and intersection of two tables' key sets with
   * zero corpus passes. The referential-health read: a fact profiled on
   * its FK against its dim's PK should show `inter_est ≈` the fact's
   * distinct count — a Jaccard collapse between ingest epochs means
   * orphaned fact keys (a broken upstream feed) caught from KB-sized
   * artifacts BEFORE any join runs and reports empty. Both bundles must
   * share `kmvK` (k-min sets of different k have no common floor).
   */
  def profileOverlapAdvice(spark: org.apache.spark.sql.SparkSession,
                           pathA: String, pathB: String): DataFrame = {
    val a = loadTableProfile(spark, pathA)
    val b = loadTableProfile(spark, pathB)
    require(a.kmvK == b.kmvK,
      s"profileOverlapAdvice: kmvK differs (${a.kmvK} vs ${b.kmvK}) — " +
        "k-min sets of different k cannot intersect soundly; rebuild one side")
    Sketches.kmvSetEstimate(a.kmv, b.kmv, a.kmvK)
  }

  /**
   * APPLY the advised exchange sizing ([[sizedJoinDecision]] /
   * [[joinDecisionFromProfiles]]'s `advised_shuffle_partitions`) to a
   * plain equi-join: both sides are hash-repartitioned on their keys to
   * exactly `advised` partitions, which satisfies the join's
   * distribution requirement — Spark reuses the two explicit exchanges
   * instead of inserting its own at the static
   * `spark.sql.shuffle.partitions` (the one global knob the advice
   * exists to override per-stage; an explicit numPartitions is also
   * exempt from AQE coalescing, which can only shrink counts anyway —
   * the advice guards the too-SMALL direction AQE cannot fix). Result
   * rows are the plain join's; only the exchange width changes.
   */
  def advisedExchangeJoin(fact: DataFrame, dim: DataFrame,
                          factKey: String, dimKey: String,
                          advised: Int): DataFrame = {
    require(advised >= 1, s"advisedExchangeJoin: advised must be >= 1, got $advised")
    val f = fact.repartition(advised, col(factKey))
    val d = dim.repartition(advised, col(dimKey))
    f.join(d, f(factKey) === d(dimKey)).drop(d(dimKey))
  }

  /**
   * [[chooseJoin]] fed by persisted bundles: the decision comes from
   * [[joinDecisionFromProfiles]] (zero corpus passes — the 1-row collect
   * reads artifacts only), then the chosen strategy runs on the actual
   * frames. The strategies' structural result identity is unchanged; only
   * the decision inputs moved from inline scans to artifacts, so a stale
   * bundle can mis-cost a join but never corrupt it.
   */
  def chooseJoinFromProfiles(fact: DataFrame, dim: DataFrame,
                             factKey: String, dimKey: String,
                             factProfile: String, dimProfile: String,
                             th: JoinThresholds = JoinThresholds(),
                             factSaltCols: Seq[String] = Nil): JoinPlan = {
    require(factKey != dimKey,
      s"chooseJoinFromProfiles: fact and dim key columns must be named " +
        s"differently (both '$factKey') — rename one side first")
    require(!fact.columns.contains(dimKey) && !dim.columns.contains(factKey),
      "chooseJoinFromProfiles: key names must be unique across both sides " +
        "(see chooseJoin) — rename first; strategy branches would otherwise " +
        "diverge in schema")
    val rows = joinDecisionFromProfiles(fact.sparkSession,
      factProfile, dimProfile, th).collect()
    require(rows.nonEmpty && rows(0).getAs[Long]("fact_rows") > 0L,
      "chooseJoinFromProfiles: empty fact profile — nothing to join")
    val dcs = rows(0)
    val strategy = dcs.getAs[String]("strategy")
    val result = runStrategy(fact, dim, factKey, dimKey, th, factSaltCols, strategy)
    JoinPlan(strategy,
      dcs.getAs[Long]("fact_rows"), dcs.getAs[Long]("dim_rows"),
      dcs.getAs[Double]("top_share"), dcs.getAs[Long]("est_join_size"),
      dcs.getAs[Double]("est_selectivity"), result)
  }

  /** The one strategy-dispatch implementation shared by [[chooseJoin]]
    * and [[chooseJoinFromProfiles]] — result identity across strategies
    * is proven once, here. */
  private def runStrategy(fact: DataFrame, dim: DataFrame, factKey: String,
                          dimKey: String, th: JoinThresholds,
                          factSaltCols: Seq[String], strategy: String): DataFrame =
    strategy match {
      case "broadcast" =>
        fact.join(broadcast(dim), fact(factKey) === dim(dimKey))
          .drop(dim(dimKey))
      case "salted" =>
        val saltCols = if (factSaltCols.nonEmpty) factSaltCols
                       else fact.columns.toSeq
        Skew.saltedJoin(fact, dim.withColumnRenamed(dimKey, factKey),
          factKey, th.salt, saltCols)
      case "bloom_pruned" =>
        Bloom.prunedJoin(fact, dim, factKey, dimKey,
          th.bloomMBits, th.bloomNumHashes).drop(dimKey)
      case _ =>
        fact.join(dim, fact(factKey) === dim(dimKey)).drop(dim(dimKey))
    }

  /**
   * Pick and RUN the strategy: inner equi-join `fact(factKey) =
   * dim(dimKey)`, returned with the dim's key column dropped (the key
   * survives once, as `factKey`) — the same rows under every strategy.
   * The decision row is a bounded 1-row collect (the codebook-collect
   * discipline: model-sized state driver-side, corpus-sized work
   * distributed). `factSaltCols` seeds the deterministic salt when the
   * salted branch fires (stable across task retries, which `rand()` is
   * not). The default — every fact column — is the always-correct
   * fallback, but it hashes the ENTIRE row per row: on a wide fact table
   * (long strings, arrays) that is a second full-row pass just to derive
   * one salt byte. Pass a narrow, stable column subset (an id column, or
   * the join key plus a timestamp) whenever one exists — ANY subset
   * yields a correct join (the salt only spreads rows; the equi-join
   * condition is unchanged), and a subset that distinguishes the hot
   * key's rows spreads them just as uniformly at a fraction of the
   * hashing cost.
   */
  def chooseJoin(fact: DataFrame, dim: DataFrame, factKey: String,
                 dimKey: String, th: JoinThresholds = JoinThresholds(),
                 factSaltCols: Seq[String] = Nil): JoinPlan = {
    require(factKey != dimKey,
      s"chooseJoin: fact and dim key columns must be named differently " +
        s"(both '$factKey') — rename one side first")
    // schema identity across strategies needs the key names to be unique
    // across BOTH sides: the bloom branch drops dimKey by NAME (it would
    // take a same-named fact column with it), and the salted branch
    // renames dimKey→factKey (ambiguous if dim already has a factKey
    // column). Fail loudly instead of letting the picked strategy decide
    // whether the schema survives.
    require(!fact.columns.contains(dimKey),
      s"chooseJoin: fact already has a column named '$dimKey' (the dim key) — " +
        "rename it first; strategy branches would otherwise diverge in schema")
    require(!dim.columns.contains(factKey),
      s"chooseJoin: dim already has a column named '$factKey' (the fact key) — " +
        "rename it first; strategy branches would otherwise diverge in schema")
    val rows = joinDecision(fact, dim, factKey, dimKey, th).collect()
    require(rows.nonEmpty,
      "chooseJoin: empty fact side — no decision row (nothing to join)")
    val d = rows(0)
    val strategy = d.getAs[String]("strategy")
    val result = runStrategy(fact, dim, factKey, dimKey, th, factSaltCols, strategy)
    JoinPlan(strategy,
      d.getAs[Long]("fact_rows"), d.getAs[Long]("dim_rows"),
      d.getAs[Double]("top_share"), d.getAs[Long]("est_join_size"),
      d.getAs[Double]("est_selectivity"), result)
  }
}

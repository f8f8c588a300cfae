package graft

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.{GeoFunctions, TextFunctions, VectorFunctions}
import graft.operators._
import graft.sources.Tables

/**
 * Driver contract (see SURVEY.md §7 + builder prompt): every implemented
 * operator from SURVEY.md §2 surfaces as a named query over the driver's
 * parquet fixtures, each with an equivalent DuckDB oracle SQL where the
 * semantics are ANSI-SQL-expressible.
 *
 * Numeric parity convention (shared with [[operators.AggCore]]): double
 * measures are summed as DECIMAL(18,4) (exact for the 2-decimal inputs) and
 * cast back to DOUBLE, making results independent of partition/add order —
 * the only way a distributed sum can hash-match a single-threaded oracle.
 * Every query ends in a deterministic ORDER BY (ties broken by id columns).
 */
object SparkEntry {

  private val Dec = DecimalType(18, 4)
  private def dsum(c: Column): Column = sum(c.cast(Dec)).cast("double")

  // epoch-ms anchors inside the events table's span (2024-01-01 .. 2024-01-30 UTC)
  private val Jan05 = 1704412800000L
  private val Jan12 = 1705017600000L
  private val Jan30 = 1706572800000L
  private val Jan10_0745 = 1704872700000L

  /** Shared DuckDB view of `events` as readings (must mirror
    * [[Tables.readings]] exactly). */
  private val ReadingsCte =
    "WITH r AS (SELECT ts, event_type || '_' || lpad(CAST(user_id % 100 AS VARCHAR), 2, '0') AS key, value FROM events)"

  /** Oracle for `geo_history_avg`, built at call time: the query synthesizes
    * only 10 distinct points (`user_id % 10`), so their precision-6 geohashes
    * and the bbox cover's prefix ranges are deterministic CONSTANTS — inlined
    * here as a CASE map + OR-of-ranges. The geohash kernel itself is verified
    * independently by GeohashSpec golden vectors; this gate checks the
    * scan/filter/agg semantics end-to-end in DuckDB. */
  private def geoHistoryAvgOracle: String = {
    val caseArms = (0 until 10).map { m =>
      val h = graft.geo.Geohash.encode(-40.0 + m * 8.0, -60.0 + m * 12.0, 6)
      s"WHEN $m THEN '$h'"
    }.mkString(" ")
    val pred = GeoFunctions.coverBoundingBox(30.0, -55.0, -35.0, 40.0).map { p =>
      GeoFunctions.stringSuccessor(p) match {
        case Some(su) => s"(key >= '$p' AND key < '$su')"
        case None     => s"(key >= '$p')"
      }
    }.mkString(" OR ")
    s"""WITH g AS (SELECT ts,
       |  CASE CAST(user_id % 10 AS INT) $caseArms END AS key, value FROM events)
       |SELECT date_trunc('hour', ts) AS window_start,
       |       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS "avg"
       |FROM g
       |WHERE ($pred)
       |  AND date_trunc('hour', ts) BETWEEN TIMESTAMP '2024-01-05 00:00:00' AND TIMESTAMP '2024-01-30 00:00:00'
       |GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** DuckDB cosine of two double-list columns — the exact expression shape
    * of the engine's sequential-double kernel (shared by every ANN oracle). */
  private def duckCos(a: String, b: String): String =
    s"list_sum(list_transform(range(1, len($a) + 1), i -> $a[i] * $b[i]))" +
      s" / (sqrt(list_sum(list_transform($a, x -> x * x)))" +
      s" * sqrt(list_sum(list_transform($b, x -> x * x))))"

  /** Oracle for `ann_ivf_topk`: a FULL independent IVF replay in DuckDB.
    * The coarse-centroid pick is `ORDER BY md5(cast(id as varchar)), id` —
    * the same deterministic, engine-replayable order
    * [[Similarity.buildIvfIndex]] uses — so DuckDB re-derives the
    * centroids, every list assignment, the query probes and the final
    * re-rank from the parquet table alone (no engine-fed constants, valid
    * at every scale factor). Assignment/probe rank on raw cosine with
    * ties to the lower list id, exactly like the `vec_top_centroids`
    * kernel; the final cosine is rounded to 6 with id tie-break like
    * every ANN path. */
  private def annIvfTopkOracle: String = {
    val (nlist, nprobe, k) = (16, 4, 5)
    s"""WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e FROM embeddings),
       |ck AS (SELECT vec_id, md5(CAST(vec_id AS VARCHAR)) AS h FROM embeddings
       |       ORDER BY h, vec_id LIMIT $nlist),
       |cents AS (
       |  SELECT (ROW_NUMBER() OVER (ORDER BY ck.h, ck.vec_id)) - 1 AS list_id, v.e AS ce
       |  FROM ck JOIN v ON v.vec_id = ck.vec_id),
       |ccos AS (
       |  SELECT v.vec_id, c.list_id, ${duckCos("v.e", "c.ce")} AS cos
       |  FROM v, cents c),
       |assign AS (
       |  SELECT vec_id, list_id FROM (
       |    SELECT vec_id, list_id,
       |           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC, list_id ASC) AS rn
       |    FROM ccos) WHERE rn = 1),
       |probe AS (
       |  SELECT vec_id AS qid, list_id FROM (
       |    SELECT vec_id, list_id,
       |           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC, list_id ASC) AS rn
       |    FROM ccos WHERE vec_id < 8) WHERE rn <= $nprobe),
       |cand AS (
       |  SELECT p.qid, a.vec_id AS cid
       |  FROM probe p JOIN assign a ON a.list_id = p.list_id
       |  WHERE a.vec_id <> p.qid),
       |s AS (
       |  SELECT cand.qid, cand.cid, round(${duckCos("q.e", "c.e")}, 6) AS cos
       |  FROM cand JOIN v q ON q.vec_id = cand.qid JOIN v c ON c.vec_id = cand.cid),
       |r AS (SELECT qid, cid, cos,
       |             ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, cid ASC) AS rnk
       |      FROM s)
       |SELECT qid, rnk, cid, cos FROM r WHERE rnk <= $k ORDER BY qid, rnk""".stripMargin
  }

  /** Oracle for `ann_lsh_topk`: a full independent SRP-LSH replay. The ±1
    * hyperplane tables are pure functions of (seed, bit, dim) via splitmix64
    * — recomputed HERE at oracle-build time (not fed from the engine's
    * run) and inlined as literal lists, so DuckDB re-derives every bucket,
    * the candidate union over all hash tables, and the exact cosine
    * re-rank from the parquet table + the published sign function alone. */
  private def annLshTopkOracle: String = {
    val (dim, nBits, probes, k) = (64, 8, 4, 5)
    def bucketExpr(seed: Int): String = {
      val signs = VectorFunctions.srpSigns(nBits, dim, seed)
      (0 until nBits).map { b =>
        val s = signs(b).map(x => if (x > 0) "1" else "-1").mkString(",")
        s"(CASE WHEN list_sum(list_transform(range(1, len(e) + 1), i -> e[i] * ([$s])[i])) >= 0 THEN ${1L << b} ELSE 0 END)"
      }.mkString("\n    + ")
    }
    val tables = (0 until probes).map(t =>
      s"  SELECT vec_id, e, $t AS tbl,\n    ${bucketExpr(t)} AS bucket FROM v")
      .mkString("\nUNION ALL\n")
    s"""WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e FROM embeddings),
       |b AS (
       |$tables),
       |cand AS (
       |  SELECT DISTINCT q.vec_id AS qid, c.vec_id AS cid
       |  FROM b q JOIN b c ON c.tbl = q.tbl AND c.bucket = q.bucket
       |  WHERE q.vec_id < 8 AND c.vec_id <> q.vec_id),
       |s AS (
       |  SELECT cand.qid, cand.cid, round(${duckCos("q.e", "c.e")}, 6) AS cos
       |  FROM cand JOIN v q ON q.vec_id = cand.qid JOIN v c ON c.vec_id = cand.cid),
       |r AS (SELECT qid, cid, cos,
       |             ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, cid ASC) AS rnk
       |      FROM s)
       |SELECT qid, rnk, cid, cos FROM r WHERE rnk <= $k ORDER BY qid, rnk""".stripMargin
  }

  /** Documents ∪ deterministic 75%-token-prefix copies (ids +100000) — the
    * near-dup fixture the dedup demos run on (the raw synthetic docs share
    * no near-dups, so operators would trivially return 0 rows). */
  private def docsWithNearDups(docs: DataFrame): DataFrame = {
    val t = split(trim(lower(col("text"))), "\\s+")
    val truncated = docs.select(
      (col("doc_id") + 100000).as("doc_id"),
      concat_ws(" ", slice(t, lit(1), greatest(floor(size(t) * 3 / 4).cast("int"), lit(1))))
        .as("text"))
    docs.select(col("doc_id"), col("text")).union(truncated)
  }

  /** Embeddings ∪ exact copies (ids +1000000): near-dup fixture for the
    * vector-dedup demo. */
  private def embsWithDups(embs: DataFrame): DataFrame =
    embs.select(col("vec_id"), col("embedding"))
      .union(embs.select((col("vec_id") + 1000000).as("vec_id"), col("embedding")))

  /** Stage counts of the curation funnel — recomputed by EVERY caller.
    * `curation_funnel` and `curation_funnel_check` each run the full
    * dedup→LSH→quality pipeline: the check is an independent re-derivation
    * (two runs must agree, so banding nondeterminism would surface as a gate
    * disagreement), and each query's bench timing measures real pipeline
    * work in isolation (a shared memo made the second timing fake). */
  private def computeFunnelStages(s: SparkSession, dir: String): Seq[(String, Long)] =
    Curation.funnel(docsWithNearDups(Tables.documents(s, dir)),
      Curation.Config(nearDupThreshold = 0.6, minQuality = 0.1))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. Q-H1: hourly avg
    * over all key prefixes, one week. */
  def entry(spark: SparkSession): DataFrame = {
    val view = AggCore.hourlyView(Tables.readings(spark, "/root/testdata/sf0.001"))
    QueryBuilders.history(view, "avg",
      Seq("click", "error", "purchase", "signup", "view"), Jan05, Jan12)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ------------------------------------------------ reference query surface
    "h1_history_avg" -> ((s, dir) => {
      val view = AggCore.hourlyView(Tables.readings(s, dir))
      QueryBuilders.history(view, "avg", Seq("cl", "vi"), Jan05, Jan12)
    }),
    "h2_history_count_interval" -> ((s, dir) => {
      val view = AggCore.hourlyView(Tables.readings(s, dir))
      QueryBuilders.historyInterval(view, "count", Seq("purchase", "signup"), Jan30, "1week")
    }),
    "h3_history_sum" -> ((s, dir) => {
      val view = AggCore.hourlyView(Tables.readings(s, dir))
      QueryBuilders.history(view, "sum", Seq("error"), Jan05, Jan30)
    }),
    "s1_snapshot_sum" -> ((s, dir) => {
      val view = AggCore.hourlyView(Tables.readings(s, dir))
      QueryBuilders.snapshotByPrefixes(view, "sum",
        Seq("click_1", "purchase_0", "view"), Jan10_0745)
    }),
    "hview_cells" -> ((s, dir) => {
      AggCore.hourlyView(Tables.readings(s, dir))
        .select(col("key"), col("window_start"), col("count"), col("sum"), col("avg"))
        .orderBy(col("key"), col("window_start"))
    }),
    "reagg_daily" -> ((s, dir) => {
      // two-level partial/final re-agg (A2): hourly view → daily — must equal
      // the oracle's single-level daily aggregation
      val view = AggCore.hourlyView(Tables.readings(s, dir))
      AggCore.reAgg(view, Seq(date_trunc("day", col("window_start")).as("day")))
        .select(col("day"), col("count"), col("sum"), col("avg"))
        .orderBy(col("day"))
    }),

    // ------------------------------------------------ batch-relational (§2.13)
    "q1_agg" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") <= lit(Timestamp.valueOf("1998-09-02 00:00:00")))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          round(sum(col("l_extendedprice").cast(Dec) * (lit(1).cast(Dec) - col("l_discount").cast(Dec))), 4)
            .cast("double").as("sum_disc_price"),
          (dsum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),
    "filter_project" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .filter(col("l_quantity") >= 45 && col("l_returnflag") === "R")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_extendedprice"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),
    "join_broadcast_segment" -> ((s, dir) => {
      // small dim (customer) broadcast into the fact scan — no shuffle join
      Tables.orders(s, dir)
        .join(broadcast(Tables.customer(s, dir)), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(dsum(col("o_totalprice")).as("total_price"), count(lit(1)).as("n_orders"))
        .orderBy(col("c_mktsegment"))
    }),
    "join3_nation_revenue" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      val o = Tables.orders(s, dir)
      val c = Tables.customer(s, dir)
      val n = Tables.nation(s, dir)
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(
          round(sum(col("l_extendedprice").cast(Dec) * (lit(1).cast(Dec) - col("l_discount").cast(Dec))), 4)
            .cast("double").as("revenue"),
          count(lit(1)).as("n_lines"))
        .orderBy(col("n_name"))
    }),
    "semi_join_big_customers" -> ((s, dir) => {
      val big = Tables.orders(s, dir).filter(col("o_totalprice") > 450000.0)
      Tables.customer(s, dir)
        .join(big, col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }),
    "anti_join_no_big_order" -> ((s, dir) => {
      Tables.customer(s, dir)
        .join(Tables.orders(s, dir).filter(col("o_totalprice") > 450000.0),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }),
    "topk_orders_per_priority" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      Tables.orders(s, dir)
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .select(col("o_orderpriority"), col("rnk"), col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_orderpriority"), col("rnk"))
    }),
    "distinct_orders_per_flag" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_orderkey")).as("distinct_orders"), count(lit(1)).as("n_lines"))
        .orderBy(col("l_returnflag"))
    }),
    "rollup_flag_status" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n_lines"), dsum(col("l_quantity")).as("sum_qty"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
    }),
    "window_daily_running" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val daily = Tables.events(s, dir)
        .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      daily
        .withColumn("prev_n", lag(col("n"), 1).over(w))
        .withColumn("running_n", sum(col("n")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .orderBy(col("event_type"), col("day"))
    }),
    "prefix_range_source" -> ((s, dir) => {
      // sargable prefix predicate (F1 / GH3): src1 → [src1, src2)
      Tables.documents(s, dir)
        .filter(GeoFunctions.prefixPredicate(col("source"), Seq("src1")))
        .groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
        .orderBy(col("source"))
    }),

    // ------------------------------------------------ text analysis (M6)
    "text_metrics" -> ((s, dir) => {
      TextAnalysis.docMetrics(Tables.documents(s, dir))
        .select(col("doc_id"), col("n_tokens"), col("mean_token_len"),
          col("punct_ratio"), col("stopword_ratio"), col("quality"))
        .orderBy(col("doc_id"))
    }),
    "lang_confusion" -> ((s, dir) => {
      TextAnalysis.langConfusion(Tables.documents(s, dir))
        .orderBy(col("lang"), col("lang_pred"))
    }),
    "vocab_top50" -> ((s, dir) => {
      TextAnalysis.vocabulary(Tables.documents(s, dir))
        .orderBy(col("freq").desc, col("token").asc).limit(50)
    }),
    "fingerprints_md5" -> ((s, dir) => {
      Tables.documents(s, dir)
        .select(col("doc_id"), TextFunctions.fingerprint(col("text")).as("fp_md5"))
        .orderBy(col("doc_id"))
    }),
    "exact_dedup" -> ((s, dir) => {
      Dedup.exactDedup(docsWithNearDups(Tables.documents(s, dir)))
        .orderBy(col("fp"))
    }),

    // ------------------------------------------------ vectors / similarity (M6)
    "embed_norms" -> ((s, dir) => {
      Similarity.norms(Tables.embeddings(s, dir)).orderBy(col("vec_id"))
    }),
    "ann_brute_topk" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      Similarity.bruteForceTopK(e, e.filter(col("vec_id") < 8), k = 5)
        .orderBy(col("qid"), col("rnk"))
    }),

    "json_props_sum" -> ((s, dir) => {
      // JSON scalar extraction (props = {"k": int}) — SURVEY §2.12 class
      Tables.events(s, dir)
        .groupBy(col("event_type"))
        .agg(sum(get_json_object(col("props"), "$.k").cast("long")).as("sum_k"),
          count(lit(1)).as("n"))
        .orderBy(col("event_type"))
    }),
    "percentile_qty" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(
          round(percentile(col("l_quantity"), lit(0.5)), 6).as("q50"),
          round(percentile(col("l_quantity"), lit(0.95)), 6).as("q95"))
        .orderBy(col("l_returnflag"))
    }),
    "except_users" -> ((s, dir) => {
      val e = Tables.events(s, dir)
      e.filter(col("event_type") === "purchase" && col("value") > 100)
        .select(col("user_id")).distinct()
        .except(e.filter(col("event_type") === "click" && col("value") > 200)
          .select(col("user_id")).distinct())
        .orderBy(col("user_id"))
    }),
    "cube_flag_status" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n_lines"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
    }),
    "stats_per_flag" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(
          round(stddev_samp(col("l_quantity")), 6).as("sd_qty"),
          round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qty_price"))
        .orderBy(col("l_returnflag"))
    }),
    "sessionize_users" -> ((s, dir) => {
      Sessions.sessionStats(Tables.events(s, dir), gapMinutes = 120)
        .orderBy(col("user_id"))
    }),
    "date_parts_orders" -> ((s, dir) => {
      Tables.orders(s, dir)
        .groupBy(year(col("o_orderdate")).cast("long").as("y"),
          month(col("o_orderdate")).cast("long").as("m"))
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total"))
        .orderBy(col("y"), col("m"))
    }),
    "string_funcs_customer" -> ((s, dir) => {
      Tables.customer(s, dir)
        .filter(col("c_custkey") < 100)
        .select(col("c_custkey"),
          upper(col("c_name")).as("uname"),
          length(col("c_name")).cast("long").as("name_len"),
          substring(col("c_name"), 1, 8).as("name_prefix"),
          concat(col("c_mktsegment"), lit("#"), col("c_custkey").cast("string")).as("tag"))
        .orderBy(col("c_custkey"))
    }),

    "hopping_click_counts" -> ((s, dir) => {
      // 1h windows sliding every 15min — each event lands in 4 windows
      Tables.events(s, dir)
        .filter(col("event_type") === "click")
        .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .select(col("w.start").as("window_start"), col("n"), col("sum_value"))
        .orderBy(col("window_start"))
    }),
    "session_window_users" -> ((s, dir) => {
      // Spark's native session_window ≡ the lag-cumsum sessionization oracle
      Tables.events(s, dir)
        .groupBy(session_window(col("ts"), "120 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n"))
        .groupBy(col("user_id"))
        .agg(sum(col("n")).as("n_events"), count(lit(1)).as("n_sessions"))
        .orderBy(col("user_id"))
    }),

    "topk_custom_operator" -> ((s, dir) => {
      // same semantics as topk_orders_per_priority, executed by the custom
      // heap-based TopKPerKey physical operator (no per-partition sort)
      graft.plans.TopK.perKey(Tables.orders(s, dir), k = 3,
        Seq(col("o_orderpriority")),
        Seq(col("o_totalprice").desc, col("o_orderkey").asc))
        .select(col("o_orderpriority"), col("rnk"), col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_orderpriority"), col("rnk"))
    }),
    "pivot_status_by_flag" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .pivot("l_linestatus", Seq("F", "O"))
        .count()
        .na.fill(0L)
        .orderBy(col("l_returnflag"))
    }),
    "minmax_dates_per_priority" -> ((s, dir) => {
      Tables.orders(s, dir)
        .groupBy(col("o_orderpriority"))
        .agg(min(col("o_orderdate")).as("first_order"),
          max(col("o_orderdate")).as("last_order"),
          count(lit(1)).as("n"))
        .orderBy(col("o_orderpriority"))
    }),
    "moving_avg_daily" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val daily = Tables.events(s, dir)
        .groupBy(date_trunc("day", col("ts")).as("day"))
        .agg(count(lit(1)).as("n"))
      val w = Window.orderBy(col("day")).rowsBetween(-6, 0)
      daily.withColumn("ma7", round(avg(col("n")).over(w), 6))
        .orderBy(col("day"))
    }),

    // ---------------------------------- non-SQL-expressible (rows-only checks)
    "minhash_lsh_dedup" -> ((s, dir) => {
      Dedup.minHashLsh(docsWithNearDups(Tables.documents(s, dir)), threshold = 0.6)
        .orderBy(col("a"), col("b"))
    }),
    "simhash_dedup" -> ((s, dir) => {
      Dedup.simHashDedup(docsWithNearDups(Tables.documents(s, dir)), maxHamming = 8)
        .orderBy(col("a"), col("b"))
    }),
    "ngram_jaccard_pairs" -> ((s, dir) => {
      // exact pairwise Jaccard is inherently quadratic in shingle collisions:
      // bounded scope here (every 5th doc); minhash_lsh_dedup is the scale path
      Dedup.ngramJaccardPairs(
        docsWithNearDups(Tables.documents(s, dir).filter(col("doc_id") % 5 === 0)),
        threshold = 0.5)
        .orderBy(col("a"), col("b"))
    }),
    "embedding_near_dup" -> ((s, dir) => {
      Dedup.embeddingNearDup(embsWithDups(Tables.embeddings(s, dir)), dim = 64, threshold = 0.95)
        .orderBy(col("a"), col("b"))
    }),
    "ann_lsh_topk" -> ((s, dir) => {
      // row contents oracle-checked: the DuckDB side re-derives the SRP
      // buckets from the published splitmix64 sign function (inlined as
      // literals at oracle-build time) and replays candidates + re-rank
      val e = Tables.embeddings(s, dir)
      Similarity.lshTopK(e, e.filter(col("vec_id") < 8), k = 5, dim = 64)
        .orderBy(col("qid"), col("rnk"))
    }),
    "ann_ivf_topk" -> ((s, dir) => {
      // row contents oracle-checked: the md5-order centroid pick is
      // engine-replayable, so DuckDB re-derives centroids, assignment,
      // probes and re-rank from the parquet table alone (kmeansIters=0
      // here by design — the replay must not depend on engine state)
      val e = Tables.embeddings(s, dir)
      Similarity.ivfTopK(e, e.filter(col("vec_id") < 8), k = 5)
        .orderBy(col("qid"), col("rnk"))
    }),
    "curation_funnel" -> ((s, dir) => {
      // end-to-end curation: exact dedup -> minhash near-dedup -> quality/lang
      import s.implicits._
      computeFunnelStages(s, dir).toDF("stage", "n_docs").orderBy(col("stage"))
    }),
    "multimodal_features" -> ((s, dir) => {
      // every output column is a DETERMINISTIC function of the payload bytes
      // (= UTF-8 text), so the whole row — polynomial checksum included — is
      // DuckDB-oracle-checked. The normalized folded-histogram feature is
      // inverted back to integer byte counts (counts_j = f_j · n_bytes / Σf,
      // exact because Σcounts = n_bytes and fp error ≪ 0.5), gating the
      // decode→histogram→L2-normalize path end-to-end.
      val feats = Multimodal.extractFeatures(Multimodal.syntheticMedia(Tables.documents(s, dir)))
        .toDF()
      val fsum = aggregate(col("feature"), lit(0.0d), (acc, f) => acc + f.cast("double"))
      feats.select(
        col("media_id"), col("kind"), col("n_bytes"), col("checksum"),
        size(col("feature")).cast("long").as("feature_dim"),
        when(fsum > 0, concat_ws(",", transform(col("feature"),
          f => round(f.cast("double") * col("n_bytes") / fsum).cast("long"))))
          .otherwise(concat_ws(",",
            transform(col("feature"), _ => lit(0L)))).as("hist"))
        .orderBy(col("media_id"))
    }),
    "geo_history_avg" -> ((s, dir) => {
      // geohash-keyed slice of the reference pipeline: synth coordinates from
      // user_id, encode at precision 6, bbox → cover prefixes → history
      // user_id % 10 spreads points identically at every scale factor
      graft.plans.GraftFunctions.register(s)
      val r = Tables.events(s, dir).select(
        col("ts"),
        GeoFunctions.geohash_encode(
          lit(-40.0) + (col("user_id") % 10).cast("double") * 8.0,
          lit(-60.0) + (col("user_id") % 10).cast("double") * 12.0,
          lit(6)).as("key"),
        col("value"))
      val view = AggCore.hourlyView(r)
      val prefixes = GeoFunctions.coverBoundingBox(30.0, -55.0, -35.0, 40.0)
      QueryBuilders.history(view, "avg", prefixes, Jan05, Jan30)
    }),

    // -------------------------------------------- curation sampling (oracle)
    "token_budget_sample" -> ((s, dir) => {
      // distributed two-pass prefix sum (no single-partition window) — the
      // oracle replays the same hash-order cumsum as one DuckDB window
      Curation.sampleToTokenBudget(Tables.documents(s, dir), tokenBudget = 15000L)
        .select(col("doc_id"), col("n_tokens"))
        .orderBy(col("doc_id"))
    }),

    // ------------------------------- approximate-vs-exact recall gates (M6)
    "ann_lsh_recall" -> ((s, dir) => {
      // gate: MEAN recall@5 of SRP-LSH vs the exact brute-force baseline —
      // a recall collapse (broken bucketing/re-rank) flips recall_ok and
      // fails the hash check. The fixture's embeddings are random (near-
      // orthogonal, the hardest case for angle-LSH), so the gated variant
      // widens candidate generation (3-bit buckets × 8 tables); threshold
      // 0.5 sits well below measured recall but far above a collapse.
      val e = Tables.embeddings(s, dir)
      val q = e.filter(col("vec_id") < 8)
      val brute = Similarity.bruteForceTopK(e, q, k = 5).select(col("qid"), col("cid"))
      val lsh = Similarity.lshTopK(e, q, k = 5, dim = 64, nBits = 3, probes = 8)
        .select(col("qid").as("q2"), col("cid").as("c2"))
      brute.join(lsh, col("qid") === col("q2") && col("cid") === col("c2"), "left")
        .agg(countDistinct(col("qid")).as("n_queries"),
          (count(col("c2")).cast("double") / count(lit(1))).as("recall"))
        .select(col("n_queries"), (col("recall") >= 0.5).as("recall_ok"))
    }),
    "ann_ivf_recall" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      val q = e.filter(col("vec_id") < 8)
      val brute = Similarity.bruteForceTopK(e, q, k = 5).select(col("qid"), col("cid"))
      val ivf = Similarity.ivfTopK(e, q, k = 5, nlist = 16, nprobe = 8, kmeansIters = 2)
        .select(col("qid").as("q2"), col("cid").as("c2"))
      brute.join(ivf, col("qid") === col("q2") && col("cid") === col("c2"), "left")
        .agg(countDistinct(col("qid")).as("n_queries"),
          (count(col("c2")).cast("double") / count(lit(1))).as("recall"))
        .select(col("n_queries"), (col("recall") >= 0.5).as("recall_ok"))
    }),
    // ---------------------------------------- temporal joins (M7, oracle)
    "asof_last_purchase" -> ((s, dir) => {
      // as-of join: each click joined to the user's latest purchase at or
      // before it — single shuffle union+window plan (Temporal.asofJoin),
      // checked against DuckDB's native ASOF LEFT JOIN
      val e = Tables.events(s, dir)
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id"), col("ts"))
      val purchases = e.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("value")).as("pvalue"))
      Temporal.asofJoin(clicks, purchases, "user_id", "ts", "ts",
        Seq("pvalue"), asofOut = "pts")
        .select(col("user_id"), col("event_id"),
          unix_millis(col("ts")).as("click_ms"),
          unix_millis(col("pts")).as("purchase_ms"),
          round(col("pvalue"), 6).as("pvalue"))
        .orderBy(col("user_id"), col("click_ms"), col("event_id"))
    }),
    "range_join_incidents" -> ((s, dir) => {
      // point-in-interval range join: clicks inside 4 h incident windows
      // opened by error events — bucketized equi-join, no cartesian
      val e = Tables.events(s, dir)
      val points = e.filter(col("event_type") === "click" && col("event_id") % 7 === 0)
        .select(col("event_id"), col("ts"))
      val intervals = e.filter(col("event_type") === "error")
        .select(col("event_id").as("incident_id"),
          date_trunc("second", col("ts")).as("start"))
        .withColumn("end", col("start") + expr("INTERVAL 4 HOURS"))
      Temporal.pointInIntervalJoin(points, intervals, "ts", "start", "end",
        bucketSeconds = 4 * 3600L)
        .select(col("event_id"), col("incident_id"))
        .orderBy(col("event_id"), col("incident_id"))
    }),

    // ------------------------------------------- sketch aggregates (oracle)
    "heavy_hitters" -> ((s, dir) => {
      // SpaceSaving TypedImperativeAggregate candidates + one exact pass over
      // candidate keys only; result = exactly the keys with share > 3%
      // (retention guarantee makes this deterministic), exact counts, and a
      // gated assertion that the sketch bounds bracket the true count
      val keyed = Tables.events(s, dir).select(
        when(col("event_id") % 10 < 3, concat(lit("hot_"), col("event_id") % 7))
          .otherwise(concat(lit("cold_"), col("event_id") % 2000)).as("k"))
      Sketches.verifiedHeavyHitters(keyed, col("k"), capacity = 64, threshold = 0.03)
        .orderBy(col("item"))
    }),
    "hll_daily_users" -> ((s, dir) => {
      // mergeable per-day HLL sketch table; est_ok gates the estimate against
      // the exact per-day distinct (computed exactly Spark-side)
      val e = Tables.events(s, dir)
        .select(date_trunc("day", col("ts")).as("day"), col("user_id"))
      val table = Sketches.distinctSketchTable(e, Seq(col("day")),
        col("user_id").cast("string"))
      val exact = e.groupBy(col("day")).agg(countDistinct(col("user_id")).as("n_exact"))
      table.join(exact, "day")
        .select(col("day"), col("n_exact"),
          (abs(col("estimate") - col("n_exact")) <=
            col("n_exact").cast("double") * 0.05).as("est_ok"))
        .orderBy(col("day"))
    }),
    "hll_union_total" -> ((s, dir) => {
      // re-aggregation path: union the stored per-day sketches into a total
      // distinct estimate — no second pass over raw rows
      val e = Tables.events(s, dir)
        .select(date_trunc("day", col("ts")).as("day"), col("user_id"))
      val table = Sketches.distinctSketchTable(e, Seq(col("day")),
        col("user_id").cast("string"))
      val merged = table.agg(
        Sketches.hllMergedEstimate(col("sketch")).as("est"))
      val exact = e.agg(countDistinct(col("user_id")).as("n_exact"))
      merged.crossJoin(exact)
        .select(col("n_exact"),
          (abs(col("est") - col("n_exact")) <=
            col("n_exact").cast("double") * 0.05).as("est_ok"))
    }),

    // --------------------------------- training-data curation ops (oracle)
    "stratified_sample" -> ((s, dir) => {
      // exact-fraction per-source sample in deterministic md5 order;
      // binary-exact fractions (0.5/0.25/0.125) so ceil() agrees bit-for-bit
      // with the DuckDB oracle
      Curation.stratifiedSampleExact(Tables.documents(s, dir), "source",
        Map("src0" -> 0.5, "src1" -> 0.25), defaultFraction = 0.125)
        .select(col("doc_id"), col("source"))
        .orderBy(col("doc_id"))
    }),
    "mix_sources" -> ((s, dir) => {
      // training-mixture construction: largest corpus matching the target
      // weights that availability supports (binding source sets the total)
      Curation.mixToWeights(Tables.documents(s, dir), "source",
        Map("src0" -> 0.5, "src1" -> 0.25, "src2" -> 0.25))
        .groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
        .orderBy(col("source"))
    }),
    "pii_redact" -> ((s, dir) => {
      // deterministic synthetic PII injected per doc, then scrubbed by the
      // RE2-compatible regexp_replace chain (no UDF in the scan)
      val d = Tables.documents(s, dir)
      val polluted = concat(
        lit("contact user"), col("doc_id").cast("string"),
        lit("@mail"), (col("doc_id") % 7).cast("string"), lit(".com via 10."),
        (col("doc_id") % 256).cast("string"), lit(".0."),
        (col("doc_id") % 100).cast("string"), lit(" or 555-"),
        lpad((col("doc_id") % 1000).cast("string"), 3, "0"), lit("-"),
        lpad((col("doc_id") % 10000).cast("string"), 4, "0"), lit(" "),
        substring(col("text"), 1, 40))
      d.select(col("doc_id"), TextFunctions.redactPii(polluted).as("redacted"))
        .orderBy(col("doc_id"))
    }),
    "contamination_check" -> ((s, dir) => {
      // eval-leakage scan: distinct 5-gram overlap of each training doc with
      // the benchmark slice (doc_id % 97 == 0) via inverted-index join
      val d = Tables.documents(s, dir)
      TextAnalysis.contamination(
        d.filter(col("doc_id") % 97 =!= 0), d.filter(col("doc_id") % 97 === 0),
        shingleN = 5)
        .orderBy(col("train_id"))
    }),
    "repetition_metrics" -> ((s, dir) => {
      // Gopher-style intra-doc repetition signals
      TextAnalysis.repetitionMetrics(Tables.documents(s, dir))
        .orderBy(col("doc_id"))
    }),

    "line_dedup" -> ((s, dir) => {
      // corpus-level boilerplate-line removal: rebuild each doc as a shared
      // header + 8-token body lines + shared footer; dedupLines must strip
      // exactly the lines repeated across >= 2 docs (header/footer + any
      // naturally colliding body lines) and keep the rest in order. The
      // rebuilt text is md5'd so the oracle hash-checks content, not size.
      val t = TextFunctions.tokens(col("text"))
      val body = transform(
        sequence(lit(0), ((size(t) - 1) / 8).cast("int")),
        i => concat_ws(" ", slice(t, i * 8 + 1, lit(8))))
      val fixture = Tables.documents(s, dir).select(col("doc_id"),
        concat_ws("\n", concat(
          array(lit("=== shared boilerplate header ===")), body,
          array(lit("--- shared footer: all rights reserved ---")))).as("text"))
      TextAnalysis.dedupLines(fixture, minDocs = 2)
        .select(col("doc_id"), md5(col("text")).as("text_md5"),
          col("n_lines_kept"), col("n_lines_dropped"))
        .orderBy(col("doc_id"))
    }),

    "span_dedup" -> ((s, dir) => {
      // cross-document repeated-span removal (exact-substring rule): every
      // doc gets a shared 13-token license header and 14-token warranty
      // footer; every 8-token window interior to either block repeats across
      // all docs, so removeRepeatedSpans must cut both blocks (plus any
      // naturally repeated 8-token runs in the bodies — the oracle recomputes
      // the whole rule, nothing is hand-predicted). Rebuilt text is md5'd so
      // content, order and case preservation are all hash-checked.
      val header = "permission is hereby granted free of charge to any person obtaining a copy"
      val footer = "the software is provided as is without warranty of any kind express or implied"
      val fixture = Tables.documents(s, dir).select(col("doc_id"),
        concat_ws(" ", lit(header), col("text"), lit(footer)).as("text"))
      TextAnalysis.removeRepeatedSpans(fixture, windowTokens = 8, minDocs = 2)
        .select(col("doc_id"), md5(col("text")).as("text_md5"),
          col("n_tokens_kept"), col("n_tokens_dropped"))
        .orderBy(col("doc_id"))
    }),

    "gopher_rules" -> ((s, dir) => {
      // explicit Gopher rule filter; thresholds tuned so the sf corpus
      // exercises both keep outcomes (short docs fail min_words)
      TextAnalysis.gopherRules(Tables.documents(s, dir), minWords = 30)
        .orderBy(col("doc_id"))
    }),

    "pack_sequences" -> ((s, dir) => {
      // concat-then-chunk training-sequence packing over the distributed
      // hash-order prefix sum (2048-token sequences)
      Curation.packSequences(Tables.documents(s, dir), seqTokens = 2048L)
        .select(col("doc_id"), col("n_tokens"), col("seq_first"), col("seq_last"))
        .orderBy(col("doc_id"))
    }),

    "incremental_dedup_recall" -> ((s, dir) => {
      // new batch = exact copies of every 37th doc (shifted ids); the stored
      // band index must find EVERY exact cross-pair with jaccard >= 0.95
      // (identical signatures collide in all bands) — n_exact is the true
      // DuckDB-checked value, n_missed = 0 gates the index path's recall
      val corpus = Tables.documents(s, dir)
      val newBatch = corpus.filter(col("doc_id") % 37 === 0)
        .withColumn("doc_id", col("doc_id") + 1000000L)
      val idx = Dedup.buildBandIndex(corpus)
      val found = Dedup.nearDupsAgainstIndex(newBatch, idx, corpus, threshold = 0.95)
        .select(col("new_id"), col("corpus_id"), lit(1).as("hit"))
      val sh = (d: DataFrame, id: String, shc: String) => d.select(
        col("doc_id").as(id),
        array_distinct(TextFunctions.shingles(col("text"), 3)).as(shc))
        .filter(size(col(shc)) > 0)
      // ground truth WITHOUT a batch×corpus cross join: jaccard ≥ 0.95 > 0
      // implies ≥ 1 shared shingle, so an inverted-index equi-join generates
      // every qualifying pair; a size-ratio cull (min/max bounds jaccard)
      // runs before the exact intersect. Same result set, linear in shared-
      // shingle collisions instead of quadratic in corpus size.
      val shn = sh(newBatch, "na", "sa")
      val shc2 = sh(corpus, "nb", "sb")
      val candPairs = shn.select(col("na"), explode(col("sa")).as("g"))
        .join(shc2.select(col("nb"), explode(col("sb")).as("g")), "g")
        .select(col("na"), col("nb")).distinct()
      val exact = candPairs
        .join(shn, "na").join(shc2, "nb")
        .filter(least(size(col("sa")), size(col("sb"))).cast("double") /
          greatest(size(col("sa")), size(col("sb"))).cast("double") >= 0.95)
        .withColumn("inter", size(array_intersect(col("sa"), col("sb"))).cast("double"))
        .withColumn("jac", col("inter") /
          (size(col("sa")) + size(col("sb")) - col("inter")).cast("double"))
        .filter(col("jac") >= 0.95)
        .select(col("na"), col("nb"))
      exact.join(found,
        col("na") === col("new_id") && col("nb") === col("corpus_id"), "left")
        .agg(count(lit(1)).as("n_exact"),
          count(when(col("hit").isNull, 1)).as("n_missed"))
    }),

    "decontaminate_count" -> ((s, dir) => {
      // corpus remaining per source after dropping docs sharing any 5-gram
      // with the benchmark slice — the filter a pre-training run applies
      val d = Tables.documents(s, dir)
      TextAnalysis.decontaminate(
        d.filter(col("doc_id") % 97 =!= 0), d.filter(col("doc_id") % 97 === 0),
        shingleN = 5)
        .groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
        .orderBy(col("source"))
    }),
    "asof_within_tolerance" -> ((s, dir) => {
      // as-of with a 6 h staleness bound: matches older than the tolerance
      // come back null (served-value freshness semantics)
      val e = Tables.events(s, dir)
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id"), col("ts"))
      val purchases = e.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("value")).as("pvalue"))
      Temporal.asofJoinWithin(clicks, purchases, "user_id", "ts", "ts",
        Seq("pvalue"), tolerance = expr("INTERVAL 6 HOURS"), asofOut = "pts")
        .select(col("user_id"), col("event_id"),
          unix_millis(col("ts")).as("click_ms"),
          unix_millis(col("pts")).as("purchase_ms"),
          round(col("pvalue"), 6).as("pvalue"))
        .orderBy(col("user_id"), col("click_ms"), col("event_id"))
    }),

    "approx_quantile_rank" -> ((s, dir) => {
      // percentile_approx (KLL-style mergeable quantile sketch) gated by RANK
      // error: the fraction of rows at or below the approximate p50 must sit
      // within ±5% of 0.5 per group (plus discrete-value mass at the cut,
      // hence the asymmetric upper bound)
      val li = Tables.lineitem(s, dir)
      val appr = li.groupBy(col("l_returnflag"))
        .agg(percentile_approx(col("l_quantity"), lit(0.5), lit(10000)).as("p50"))
      li.join(appr, "l_returnflag")
        .groupBy(col("l_returnflag"))
        .agg(avg(when(col("l_quantity") <= col("p50"), 1.0).otherwise(0.0)).as("frac"))
        .select(col("l_returnflag"),
          (col("frac") >= 0.45 && col("frac") <= 0.60).as("rank_ok"))
        .orderBy(col("l_returnflag"))
    }),

    "embedding_near_dup_recall" -> ((s, dir) => {
      // SRP-LSH near-dup pairs vs EXACT all-pairs cosine ≥ 0.95 on a bounded
      // slice (≤500 vectors at any sf) — n_exact is a true DuckDB oracle
      // value; n_missed = 0 asserts the LSH path finds every exact pair
      val base = Tables.embeddings(s, dir).filter(col("vec_id") < 250)
      val fixture = embsWithDups(base)
      val v = fixture.select(col("vec_id").as("id"), col("embedding").as("v"))
      // n_boundary guards the float-threshold comparison: Spark and DuckDB
      // may accumulate the cosine sums in different orders, so a pair within
      // 1e-9 of the 0.95 cut could flake n_exact between engines — assert
      // (on BOTH sides) that the fixture has no such pair
      val pairsCos = v.select(col("id").as("a"), col("v").as("va"))
        .crossJoin(v.select(col("id").as("b"), col("v").as("vb")))
        .filter(col("a") < col("b"))
        .withColumn("cos", VectorFunctions.cosine(col("va"), col("vb")))
      val exact = pairsCos.filter(col("cos") >= 0.95).select(col("a"), col("b"))
      val found = Dedup.embeddingNearDup(fixture, dim = 64, threshold = 0.95)
        .select(col("a").as("fa"), col("b").as("fb"), lit(1).as("hit"))
      exact.join(found, col("a") === col("fa") && col("b") === col("fb"), "left")
        .agg(count(lit(1)).as("n_exact"),
          count(when(col("hit").isNull, 1)).as("n_missed"))
        .crossJoin(pairsCos.agg(
          count(when(abs(col("cos") - 0.95) < 1e-9, 1)).as("n_boundary")))
    }),

    "minhash_lsh_recall" -> ((s, dir) => {
      // identical normalized text ⇒ identical shingle set ⇒ identical MinHash
      // signature ⇒ collision in EVERY band ⇒ the pair MUST be found (jaccard
      // = 1). Expected set = identical-fingerprint pairs with ≥ 3 tokens
      // (shorter docs have no 3-shingles and are filtered from the LSH input);
      // n_exact is the DuckDB-checked value, n_missed = 0 gates recall.
      val corpus = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      val fixture = corpus.union(
        corpus.filter(col("doc_id") % 23 === 0)
          .select((col("doc_id") + 500000).as("doc_id"), col("text")))
      val found = Dedup.minHashLsh(fixture, threshold = 0.999)
        .select(col("a").as("fa"), col("b").as("fb"), lit(1).as("hit"))
      val fp = fixture
        .filter(size(TextFunctions.tokens(col("text"))) >= 3)
        .select(col("doc_id"), TextFunctions.fingerprint(col("text")).as("fp"))
      val exact = fp.select(col("fp"), col("doc_id").as("a"))
        .join(fp.select(col("fp"), col("doc_id").as("b")), "fp")
        .filter(col("a") < col("b"))
        .select(col("a"), col("b"))
      exact.join(found, col("a") === col("fa") && col("b") === col("fb"), "left")
        .agg(count(lit(1)).as("n_exact"),
          count(when(col("hit").isNull, 1)).as("n_missed"))
    }),

    "simhash_recall" -> ((s, dir) => {
      // identical normalized text ⇒ identical token multiset ⇒ identical
      // 64-bit simhash ⇒ hamming 0 ⇒ collision in every band; all identical-
      // fingerprint pairs must surface. No token-count filter: simhash is
      // defined for every doc.
      val corpus = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      val fixture = corpus.union(
        corpus.filter(col("doc_id") % 23 === 0)
          .select((col("doc_id") + 500000).as("doc_id"), col("text")))
      val found = Dedup.simHashDedup(fixture, maxHamming = 3)
        .select(col("a").as("fa"), col("b").as("fb"), lit(1).as("hit"))
      val fp = fixture.select(col("doc_id"), TextFunctions.fingerprint(col("text")).as("fp"))
      val exact = fp.select(col("fp"), col("doc_id").as("a"))
        .join(fp.select(col("fp"), col("doc_id").as("b")), "fp")
        .filter(col("a") < col("b"))
        .select(col("a"), col("b"))
      exact.join(found, col("a") === col("fa") && col("b") === col("fb"), "left")
        .agg(count(lit(1)).as("n_exact"),
          count(when(col("hit").isNull, 1)).as("n_missed"))
    }),

    "minhash_lsh_precision" -> ((s, dir) => {
      // PRECISION gate for the LSH pair set (recall's dual): every reported
      // pair must sit in the EXACT Jaccard pair set at the same threshold —
      // reported ⊆ exact, n_violations = 0. The exact set is DuckDB-checked
      // (n_exact). Bounded scope (every 5th doc, the ngram_jaccard_pairs
      // fixture): the exact verifier is a gate path, not the scale path.
      val fixture = docsWithNearDups(
        Tables.documents(s, dir).filter(col("doc_id") % 5 === 0))
      val reported = Dedup.minHashLsh(fixture, threshold = 0.6)
        .select(col("a"), col("b"))
      val exact = Dedup.ngramJaccardPairs(fixture, threshold = 0.6)
        .select(col("a").as("ea"), col("b").as("eb"))
      exact.agg(count(lit(1)).as("n_exact"))
        .crossJoin(
          reported.join(exact,
            col("a") === col("ea") && col("b") === col("eb"), "left_anti")
            .agg(count(lit(1)).as("n_violations")))
    }),

    "simhash_precision" -> ((s, dir) => {
      // PRECISION gate for the SimHash pair set: recompute each reported
      // pair's Hamming distance from raw text through an INDEPENDENT path
      // (Spark's bit_count over xor, not TextFunctions.hamming64) and assert
      // it both matches the reported distance and respects the bound.
      val fixture = docsWithNearDups(Tables.documents(s, dir))
      val reported = Dedup.simHashDedup(fixture, maxHamming = 8)
      val sigs = fixture.select(col("doc_id"),
        TextFunctions.simHash64(TextFunctions.tokens(col("text"))).as("sig"))
      // n_dup_pairs pins a REAL DuckDB value: identical normalized text ⇒
      // identical tokens ⇒ identical simhash ⇒ hamming 0 ⇒ the pair MUST be
      // reported, so the reported-pair subset with equal fingerprints equals
      // the fixture's exact-duplicate pair count, which DuckDB computes
      // independently from md5 — a simhash bug dropping such a pair FAILs
      // the hash compare instead of passing a literal-only oracle.
      val fps = fixture.select(col("doc_id"),
        TextFunctions.fingerprint(col("text")).as("fp"))
      reported
        .join(sigs.select(col("doc_id").as("a"), col("sig").as("siga")), "a")
        .join(sigs.select(col("doc_id").as("b"), col("sig").as("sigb")), "b")
        .join(fps.select(col("doc_id").as("a"), col("fp").as("fpa")), "a")
        .join(fps.select(col("doc_id").as("b"), col("fp").as("fpb")), "b")
        .withColumn("h2", bit_count(col("siga").bitwiseXOR(col("sigb"))).cast("int"))
        .agg(
          (count(lit(1)) > 0).as("nonempty"),
          count(when(col("h2") =!= col("hamming") || col("h2") > 8, 1))
            .as("n_violations"),
          count(when(col("fpa") === col("fpb"), 1)).as("n_dup_pairs"))
    }),

    "embedding_near_dup_precision" -> ((s, dir) => {
      // PRECISION gate for SRP-LSH near-dup pairs: reported ⊆ exact all-pairs
      // cosine ≥ 0.95 on the bounded recall-fixture slice; n_exact is the
      // DuckDB-checked value, n_violations = 0 asserts no spurious pair.
      val base = Tables.embeddings(s, dir).filter(col("vec_id") < 250)
      val fixture = embsWithDups(base)
      val v = fixture.select(col("vec_id").as("id"), col("embedding").as("v"))
      // n_boundary: see embedding_near_dup_recall — no pair may sit within
      // 1e-9 of the threshold, or cross-engine fp accumulation could flake
      val pairsCos = v.select(col("id").as("ea"), col("v").as("va"))
        .crossJoin(v.select(col("id").as("eb"), col("v").as("vb")))
        .filter(col("ea") < col("eb"))
        .withColumn("cos", VectorFunctions.cosine(col("va"), col("vb")))
      val exact = pairsCos.filter(col("cos") >= 0.95).select(col("ea"), col("eb"))
      val reported = Dedup.embeddingNearDup(fixture, dim = 64, threshold = 0.95)
        .select(col("a"), col("b"))
      exact.agg(count(lit(1)).as("n_exact"))
        .crossJoin(
          reported.join(exact,
            col("a") === col("ea") && col("b") === col("eb"), "left_anti")
            .agg(count(lit(1)).as("n_violations")))
        .crossJoin(pairsCos.agg(
          count(when(abs(col("cos") - 0.95) < 1e-9, 1)).as("n_boundary")))
    }),

    "mix_upsample" -> ((s, dir) => {
      // exact-count mixing WITH up-sampling (epoch replication): src0 is
      // repeated whole epochs to 1500 rows, src1 truncated to 100 — replica
      // set hash-checked row for row (copy index included)
      Curation.mixToTargetCounts(Tables.documents(s, dir), "source",
        Map("src0" -> 1500L, "src1" -> 100L))
        .orderBy(col("doc_id"), col("source"), col("copy"))
    }),

    "interval_overlap_pairs" -> ((s, dir) => {
      // bucketized interval-overlap join (first-shared-bucket arithmetic
      // dedup, no distinct) must equal DuckDB's theta join on the same
      // intervals (error 4h-windows x click 1h-windows)
      val ev = Tables.events(s, dir)
      val a = ev.filter(col("event_type") === "error")
        .select(col("event_id").as("a_id"), date_trunc("second", col("ts")).as("a_s"))
        .withColumn("a_e", col("a_s") + expr("INTERVAL 4 HOURS"))
      val b = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("b_id"), date_trunc("second", col("ts")).as("b_s"))
        .withColumn("b_e", col("b_s") + expr("INTERVAL 1 HOUR"))
      Temporal.intervalOverlapJoin(a, b, "a_s", "a_e", "b_s", "b_e",
        bucketSeconds = 2 * 3600L)
        .select(col("a_id"), col("b_id"))
        .orderBy(col("a_id"), col("b_id"))
    }),

    "salted_join_agg" -> ((s, dir) => {
      // the skew-mitigation path must be value-identical to the plain join:
      // deterministic fact salting × dim replication, then the same
      // aggregate — hash-checked against DuckDB's direct join
      val fact = Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_custkey").as("custkey"), col("o_totalprice"))
      val dim = Tables.customer(s, dir)
        .select(col("c_custkey").as("custkey"), col("c_mktsegment"))
      Skew.saltedJoin(fact, dim, "custkey", salt = 8, factUniqueCols = Seq("o_orderkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
        .orderBy(col("c_mktsegment"))
    }),

    "hash_sample" -> ((s, dir) => {
      // the stateless shuffle-free sampler (the 100 TB path): keep iff the
      // first 32 md5 bits fall under fraction × 2^32. Binary-exact fractions
      // make the thresholds integer-exact on both engines, so membership is
      // hash-checked row for row
      Curation.stratifiedSampleHash(Tables.documents(s, dir), "source",
        Map("src0" -> 0.5, "src1" -> 0.25), defaultFraction = 0.125)
        .select(col("doc_id"), col("source"))
        .orderBy(col("doc_id"))
    }),

    "weighted_sample" -> ((s, dir) => {
      // A-Res weighted sampling, weight = n_chars + 1 (longer docs more
      // likely; 10 of each source's 25): hash-derived uniforms make the WHOLE
      // sample deterministic,
      // so the oracle reproduces it row for row, not statistically
      Curation.weightedSampleHash(Tables.documents(s, dir), "source",
        col("n_chars").cast("double") + 1.0, k = 10)
        .select(col("doc_id"), col("source"), col("n_chars"))
        .orderBy(col("doc_id"))
    }),

    "streaming_heavy_hitters" -> ((s, dir) => {
      // the STREAMING sketch path gated against plain SQL: 40 distinct keys
      // under capacity 64 keep SpaceSaving exact (no evictions, merges
      // included), so the windowed top-k emitted after two real micro-batches
      // must hash-match DuckDB's exact per-window counts
      import s.implicits._
      implicit val sqlCtx = s.sqlContext
      val rows = Tables.events(s, dir)
        .filter(col("event_id") % 50 === 0)
        .select(col("ts"), concat(lit("k_"), col("event_id") % 40).as("k"))
        .as[(java.sql.Timestamp, String)].collect()
      val mem = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(java.sql.Timestamp, String)]
      val out = graft.streaming.StreamingHeavyHitters.windowedTopK(
        mem.toDF().toDF("ts", "k"), col("k"), "1 hour", capacity = 64)
      val name = "shh_" + java.util.UUID.randomUUID().toString.replace("-", "")
      val q = out.writeStream.outputMode("complete").format("memory")
        .queryName(name).start()
      val (b1, b2) = rows.splitAt(rows.length / 2)
      mem.addData(b1.toIndexedSeq); q.processAllAvailable()
      mem.addData(b2.toIndexedSeq); q.processAllAvailable()
      q.stop()
      s.table(name)
        .select(col("window_start"), explode(col("topk")).as("e"))
        .select(col("window_start"), col("e.item").as("item"),
          col("e.count_min").as("cnt"))
        .orderBy(col("window_start"), col("item"))
    }),

    "decontaminate_bloom" -> ((s, dir) => {
      // Bloom decontamination is shuffle-free (broadcast filter in the scan);
      // its guarantee is NO false negatives: every doc the exact inverted-
      // index path flags must be dropped by the Bloom path too. FPs only
      // over-drop clean docs (≤ fpp), which this gate tolerates by design.
      val docs = Tables.documents(s, dir)
      val bench = docs.filter(col("doc_id") % 97 === 0)
      val train = docs.filter(col("doc_id") % 97 =!= 0)
      val keptBloom = TextAnalysis.decontaminateBloom(train, bench, shingleN = 5)
        .select(col("doc_id").as("bk"))
      val keptExact = TextAnalysis.decontaminate(train, bench, shingleN = 5)
        .select(col("doc_id").as("ek"))
      val contaminated = train.select(col("doc_id"))
        .join(keptExact, col("doc_id") === col("ek"), "left_anti")
      contaminated.join(keptBloom, col("doc_id") === col("bk"), "left")
        .agg(count(lit(1)).as("n_contaminated"),
          count(col("bk")).as("n_contaminated_kept"))
    }),

    "multimodal_frame_sample" -> ((s, dir) => {
      // frame-index sampling is pure metadata arithmetic → exactly
      // oracle-able even though frame DECODE sits behind the labeled stub
      val m = Multimodal.syntheticMedia(Tables.documents(s, dir))
      Multimodal.sampleFrames(m, stride = 4)
        .select(col("media_id"),
          col("n_frames").cast("long").as("n_frames"),
          size(col("frame_idx")).cast("long").as("n_sampled"),
          concat_ws(",", col("frame_idx")).as("frames"))
        .orderBy(col("media_id"))
    }),

    "ann_sq8_recall" -> ((s, dir) => {
      // recall@5 of the SQ8-quantized brute-force path vs the float baseline:
      // reconstruction error ≤ half a step per dim keeps top-k near-exact on
      // random embeddings; 0.8 sits far below measured, far above a collapse
      val e = Tables.embeddings(s, dir)
      val q = e.filter(col("vec_id") < 8)
      val brute = Similarity.bruteForceTopK(e, q, k = 5).select(col("qid"), col("cid"))
      val sq8 = Similarity.quantizedTopK(Quantization.quantizeSQ8(e), q, k = 5)
        .select(col("qid").as("q2"), col("cid").as("c2"))
      brute.join(sq8, col("qid") === col("q2") && col("cid") === col("c2"), "left")
        .agg(countDistinct(col("qid")).as("n_queries"),
          (count(col("c2")).cast("double") / count(lit(1))).as("recall"))
        .select(col("n_queries"), (col("recall") >= 0.8).as("recall_ok"))
    }),

    "ann_pq_recall" -> ((s, dir) => {
      // PQ (m=8, ksub=64, 32x compression, 2 bounded Lloyd iterations) vs
      // the float baseline. Measured on this corpus with refined codebooks:
      // ADC-only recall@5 ~0.3 (vs ~0.01 random floor — near-random gaussian
      // embeddings are the WORST case for PQ), re-rank (shortlist 50) ~0.85;
      // gates at 0.1 / 0.5 sit far below measured, far above collapse.
      // VectorExprSpec pins refined >= sampled recall on the same fixture.
      // n_dup_exact is exact: planted duplicate queries
      // (identical vectors) MUST recover their source at cos 1.0 through
      // the ADC shortlist -> re-rank path — a sharp, deterministic property,
      // not a statistical one.
      val e = Tables.embeddings(s, dir)
      val q = e.filter(col("vec_id") < 8)
      val brute = Similarity.bruteForceTopK(e, q, k = 5).select(col("qid"), col("cid"))
      def recallOf(df: DataFrame) = {
        val hits = df.select(col("qid").as("q2"), col("cid").as("c2"))
        brute.join(hits, col("qid") === col("q2") && col("cid") === col("c2"), "left")
          .agg((count(col("c2")).cast("double") / count(lit(1))).as("r"))
          .head().getDouble(0)
      }
      val adc = recallOf(Similarity.pqTopK(e, q, k = 5, m = 8, ksub = 64, kmeansIters = 2))
      val rr = recallOf(Similarity.pqTopK(e, q, k = 5, m = 8, ksub = 64, shortlist = 50,
        kmeansIters = 2))
      val dupQ = e.filter(col("vec_id") < 8)
        .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
      val corpus = e.select(col("vec_id"), col("embedding")).union(dupQ)
      val nDup = Similarity.pqTopK(corpus, dupQ, k = 1, m = 8, ksub = 64, shortlist = 20,
        kmeansIters = 2)
        .filter(col("rnk") === 1 && col("cid") === col("qid") - 1000000L &&
          col("cos") === 1.0)
        .count()
      import s.implicits._
      Seq((8L, adc >= 0.1, rr >= 0.5, nDup))
        .toDF("n_queries", "adc_ok", "rerank_ok", "n_dup_exact")
    }),

    "ann_ivfpq_recall" -> ((s, dir) => {
      // the full production composition: IVF probe pruning × PQ codes × ADC
      // × exact re-rank, both quantizers k-means-refined (2 bounded Lloyd
      // iterations). Measured recall@5 ~0.78 refined vs ~0.63 sampled
      // (nlist=16, nprobe=8, m=8, ksub=64, shortlist=50) on the near-random
      // corpus — the compounded IVF+PQ loss; gate at 0.25 (vs 0.01 random
      // floor). Planted identical queries must come back exactly (same
      // list, shortlisted, cos 1.0).
      val e = Tables.embeddings(s, dir)
      val q = e.filter(col("vec_id") < 8)
      val brute = Similarity.bruteForceTopK(e, q, k = 5).select(col("qid"), col("cid"))
      val ipq = Similarity.ivfPqTopK(e, q, k = 5, nlist = 16, nprobe = 8,
        m = 8, ksub = 64, shortlist = 50, kmeansIters = 2)
        .select(col("qid").as("q2"), col("cid").as("c2"))
      val recall = brute
        .join(ipq, col("qid") === col("q2") && col("cid") === col("c2"), "left")
        .agg((count(col("c2")).cast("double") / count(lit(1))).as("r"))
        .head().getDouble(0)
      val dupQ = e.filter(col("vec_id") < 8)
        .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
      val corpus = e.select(col("vec_id"), col("embedding")).union(dupQ)
      val nDup = Similarity.ivfPqTopK(corpus, dupQ, k = 1, nlist = 16, nprobe = 4,
        m = 8, ksub = 64, shortlist = 20, kmeansIters = 2)
        .filter(col("rnk") === 1 && col("cid") === col("qid") - 1000000L &&
          col("cos") === 1.0)
        .count()
      import s.implicits._
      Seq((8L, recall >= 0.25, nDup)).toDF("n_queries", "recall_ok", "n_dup_exact")
    }),

    "dup_clusters" -> ((s, dir) => {
      // connected components over the DETERMINISTIC exact-Jaccard pair set
      // (same edges as ngram_jaccard_pairs, oracle-matched), checked against
      // a DuckDB recursive-CTE transitive closure: every doc labeled with
      // the min id reachable through near-dup edges
      val pairs = Dedup.ngramJaccardPairs(
        docsWithNearDups(Tables.documents(s, dir).filter(col("doc_id") % 5 === 0)),
        threshold = 0.5)
      Dedup.dupClusters(pairs)
        .select(col("id"), col("cluster_rep"))
        .orderBy(col("id"))
    }),

    "dedup_representatives" -> ((s, dir) => {
      // the dedup END-PRODUCT: longest-text-wins canonical doc per cluster
      // (truncated +100000 copies must lose to their sources) + singletons;
      // oracle recomputes closure + argmax in DuckDB
      val base = docsWithNearDups(
        Tables.documents(s, dir).filter(col("doc_id") % 5 === 0))
      val pairs = Dedup.ngramJaccardPairs(base, threshold = 0.5)
      Dedup.keepRepresentatives(base, pairs)
        .orderBy(col("doc_id"))
    }),

    "chunk_documents" -> ((s, dir) => {
      // sliding token-window chunking (64-token chunks, 16 overlap): chunk
      // boundaries AND per-chunk content digests hash-checked against DuckDB
      Curation.chunkDocuments(Tables.documents(s, dir), chunkTokens = 64, overlapTokens = 16)
        .orderBy(col("doc_id"), col("chunk_id"))
    }),

    "quantize_embeddings" -> ((s, dir) => {
      // SQ8 per-vector affine quantization: min/scale exactly oracle-checked
      // (float→double casts are exact); recon_ok bounds every dimension's
      // reconstruction error by half a quantization step
      val e = Tables.embeddings(s, dir)
      val q = Quantization.quantizeSQ8(e)
      e.join(q, "vec_id")
        .select(
          col("vec_id"),
          col("q_min"),
          col("q_scale"),
          size(col("codes")).cast("long").as("n_dims"),
          (Quantization.reconstructionError(
            col("embedding"), col("codes"), col("q_min"), col("q_scale")) <=
            col("q_scale") / 2 + lit(1e-9)).as("recon_ok"))
        .orderBy(col("vec_id"))
    }),

    "curation_funnel_check" -> ((s, dir) => {
      // gates the funnel's exactly-oracle-able stages (input count, exact-
      // dedup survivor count — both plain SQL over the same fixture) plus
      // monotonicity/nonemptiness of the LSH-dependent later stages (those
      // counts depend on MinHash banding, so they gate as booleans).
      // Runs the whole dedup→LSH→quality pipeline itself: an independent
      // second derivation of the sibling gate's counts, honestly timed.
      import s.implicits._
      val m = computeFunnelStages(s, dir).toMap
      Seq((m("0_input"), m("1_exact_dedup"),
        m("2_near_dedup") <= m("1_exact_dedup"),
        m("3_quality_lang") <= m("2_near_dedup"),
        m("3_quality_lang") > 0L))
        .toDF("n_input", "n_exact_kept", "neardup_monotone", "quality_monotone", "nonempty")
    })
  )

  def oracleSql: Map[String, String] = Map(
    "h1_history_avg" ->
      s"""$ReadingsCte
         |SELECT date_trunc('hour', ts) AS window_start,
         |       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS "avg"
         |FROM r
         |WHERE ((key >= 'cl' AND key < 'cm') OR (key >= 'vi' AND key < 'vj'))
         |  AND date_trunc('hour', ts) BETWEEN TIMESTAMP '2024-01-05 00:00:00' AND TIMESTAMP '2024-01-12 00:00:00'
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "h2_history_count_interval" ->
      s"""$ReadingsCte
         |SELECT date_trunc('hour', ts) AS window_start, COUNT(*) AS "count"
         |FROM r
         |WHERE ((key >= 'purchase' AND key < 'purchasf') OR (key >= 'signup' AND key < 'signuq'))
         |  AND date_trunc('hour', ts) BETWEEN TIMESTAMP '2024-01-23 00:00:00' AND TIMESTAMP '2024-01-30 00:00:00'
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "h3_history_sum" ->
      s"""$ReadingsCte
         |SELECT date_trunc('hour', ts) AS window_start,
         |       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS "sum"
         |FROM r
         |WHERE key >= 'error' AND key < 'erros'
         |  AND date_trunc('hour', ts) BETWEEN TIMESTAMP '2024-01-05 00:00:00' AND TIMESTAMP '2024-01-30 00:00:00'
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "s1_snapshot_sum" ->
      s"""$ReadingsCte
         |SELECT key, CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS "sum"
         |FROM r
         |WHERE date_trunc('hour', ts) = TIMESTAMP '2024-01-10 07:00:00'
         |  AND ((key >= 'click_1' AND key < 'click_2') OR (key >= 'purchase_0' AND key < 'purchase_1') OR (key >= 'view' AND key < 'viex'))
         |GROUP BY key ORDER BY key""".stripMargin,
    "hview_cells" ->
      s"""$ReadingsCte
         |SELECT key, date_trunc('hour', ts) AS window_start, COUNT(*) AS "count",
         |       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS "sum",
         |       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS "avg"
         |FROM r GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "reagg_daily" ->
      s"""$ReadingsCte
         |SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS "day", COUNT(*) AS "count",
         |       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS "sum",
         |       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS "avg"
         |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,
    "geo_history_avg" -> geoHistoryAvgOracle,
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
        |       CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))), 4) AS DOUBLE) AS sum_disc_price,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_qty,
        |       COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem WHERE l_quantity >= 45 AND l_returnflag = 'R'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "join_broadcast_segment" ->
      """SELECT c_mktsegment,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_price,
        |       COUNT(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "join3_nation_revenue" ->
      """SELECT n_name,
        |       CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))), 4) AS DOUBLE) AS revenue,
        |       COUNT(*) AS n_lines
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "semi_join_big_customers" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 450000.0)
        |ORDER BY c_custkey""".stripMargin,
    "anti_join_no_big_order" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 450000.0)
        |ORDER BY c_custkey""".stripMargin,
    "topk_orders_per_priority" ->
      """SELECT o_orderpriority, rnk, o_orderkey, o_totalprice FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |         ROW_NUMBER() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
        |  FROM orders)
        |WHERE rnk <= 3 ORDER BY o_orderpriority, rnk""".stripMargin,
    "distinct_orders_per_flag" ->
      """SELECT l_returnflag, COUNT(DISTINCT l_orderkey) AS distinct_orders, COUNT(*) AS n_lines
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "rollup_flag_status" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n_lines,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,
    "window_daily_running" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS "day", COUNT(*) AS n
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type, "day", n,
        |       LAG(n, 1) OVER (PARTITION BY event_type ORDER BY "day") AS prev_n,
        |       CAST(SUM(n) OVER (PARTITION BY event_type ORDER BY "day" ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_n
        |FROM daily ORDER BY event_type, "day"""".stripMargin,
    "prefix_range_source" ->
      """SELECT source, COUNT(*) AS n_docs FROM documents
        |WHERE source >= 'src1' AND source < 'src2'
        |GROUP BY source ORDER BY source""".stripMargin,
    "text_metrics" ->
      """SELECT doc_id,
        |  len(string_split_regex(trim(lower(text)), '\s+')) AS n_tokens,
        |  round(CAST(list_sum(list_transform(string_split_regex(trim(lower(text)), '\s+'), t -> len(t))) AS DOUBLE)
        |        / greatest(len(string_split_regex(trim(lower(text)), '\s+')), 1), 6) AS mean_token_len,
        |  round(CAST(len(regexp_replace(text, '[^.,;:!?''"()\[\]-]', '', 'g')) AS DOUBLE)
        |        / greatest(len(text), 1), 6) AS punct_ratio,
        |  round(CAST(len(list_intersect(list_distinct(string_split_regex(trim(lower(text)), '\s+')),
        |        ['the','a','an','and','or','of','to','in','is','it','that','with','for','on','as','at','by','this','be'])) AS DOUBLE)
        |        / greatest(len(list_distinct(string_split_regex(trim(lower(text)), '\s+'))), 1), 6) AS stopword_ratio,
        |  round(
        |    least(CAST(len(text) AS DOUBLE) / 500.0, 1.0) * 0.4
        |    + (1.0 - least(round(CAST(len(regexp_replace(text, '[^.,;:!?''"()\[\]-]', '', 'g')) AS DOUBLE) / greatest(len(text), 1), 6) * 5.0, 1.0)) * 0.3
        |    + least(round(CAST(len(list_intersect(list_distinct(string_split_regex(trim(lower(text)), '\s+')),
        |        ['the','a','an','and','or','of','to','in','is','it','that','with','for','on','as','at','by','this','be'])) AS DOUBLE)
        |        / greatest(len(list_distinct(string_split_regex(trim(lower(text)), '\s+'))), 1), 6) * 4.0, 1.0) * 0.3, 6) AS quality
        |FROM documents ORDER BY doc_id""".stripMargin,
    "lang_confusion" ->
      """WITH s AS (
        |  SELECT lang,
        |    len(list_intersect(list_distinct(string_split_regex(trim(lower(text)), '\s+')), ['der','die','das','und','nicht','ist','ich','ein','mit','für'])) AS s_de,
        |    len(list_intersect(list_distinct(string_split_regex(trim(lower(text)), '\s+')), ['the','and','not','is','a','of','to','in','that','with'])) AS s_en,
        |    len(list_intersect(list_distinct(string_split_regex(trim(lower(text)), '\s+')), ['el','la','los','las','y','no','es','un','una','con'])) AS s_es,
        |    len(list_intersect(list_distinct(string_split_regex(trim(lower(text)), '\s+')), ['le','la','les','et','ne','pas','est','un','une','avec'])) AS s_fr,
        |    len(list_intersect(list_distinct(string_split_regex(trim(lower(text)), '\s+')), ['的','是','不','了','在','人','有','我','他','这'])) AS s_zh
        |  FROM documents),
        |p AS (
        |  SELECT lang,
        |    CASE WHEN s_de = 0 AND s_en = 0 AND s_es = 0 AND s_fr = 0 AND s_zh = 0 THEN 'und'
        |         WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr AND s_de >= s_zh THEN 'de'
        |         WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
        |         WHEN s_es >= s_fr AND s_es >= s_zh THEN 'es'
        |         WHEN s_fr >= s_zh THEN 'fr'
        |         ELSE 'zh' END AS lang_pred
        |  FROM s)
        |SELECT lang, lang_pred, COUNT(*) AS n FROM p GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "vocab_top50" ->
      """SELECT token, COUNT(*) AS freq FROM (
        |  SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS token FROM documents)
        |WHERE token <> '' GROUP BY token ORDER BY freq DESC, token ASC LIMIT 50""".stripMargin,
    "fingerprints_md5" ->
      """SELECT doc_id, md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fp_md5
        |FROM documents ORDER BY doc_id""".stripMargin,
    "exact_dedup" ->
      """WITH d AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 100000 AS doc_id,
        |         array_to_string(list_slice(string_split_regex(trim(lower(text)), '\s+'), 1,
        |           greatest(CAST(floor(len(string_split_regex(trim(lower(text)), '\s+')) * 3 / 4) AS INT), 1)), ' ') AS text
        |  FROM documents)
        |SELECT md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fp,
        |       MIN(doc_id) AS keep_id, COUNT(*) AS n_dups
        |FROM d GROUP BY 1 ORDER BY 1""".stripMargin,
    "embed_norms" ->
      """SELECT vec_id,
        |  round(sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS norm
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    "ann_brute_topk" ->
      """WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e FROM embeddings),
        |q AS (SELECT vec_id AS qid, e AS qe FROM v WHERE vec_id < 8),
        |s AS (
        |  SELECT qid, v.vec_id AS cid,
        |    round(
        |      list_sum(list_transform(range(1, len(qe) + 1), i -> qe[i] * e[i]))
        |      / (sqrt(list_sum(list_transform(qe, x -> x * x))) * sqrt(list_sum(list_transform(e, x -> x * x)))), 6) AS cos
        |  FROM q, v WHERE v.vec_id <> qid),
        |r AS (SELECT qid, cid, cos, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, cid ASC) AS rnk FROM s)
        |SELECT qid, rnk, cid, cos FROM r WHERE rnk <= 5 ORDER BY qid, rnk""".stripMargin,
    "ann_ivf_topk" -> annIvfTopkOracle,
    "ann_lsh_topk" -> annLshTopkOracle,
    "json_props_sum" ->
      """SELECT event_type, CAST(SUM(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS sum_k, COUNT(*) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "percentile_qty" ->
      """SELECT l_returnflag, round(quantile_cont(l_quantity, 0.5), 6) AS q50,
        |       round(quantile_cont(l_quantity, 0.95), 6) AS q95
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "except_users" ->
      """SELECT user_id FROM (
        |  SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase' AND value > 100
        |  EXCEPT
        |  SELECT DISTINCT user_id FROM events WHERE event_type = 'click' AND value > 200)
        |ORDER BY user_id""".stripMargin,
    "cube_flag_status" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n_lines
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,
    "stats_per_flag" ->
      """SELECT l_returnflag, round(stddev_samp(l_quantity), 6) AS sd_qty,
        |       round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "sessionize_users" ->
      """WITH e AS (
        |  SELECT user_id, ts,
        |    CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |           OR ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) > INTERVAL 120 MINUTE
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM events)
        |SELECT user_id, COUNT(*) AS n_events, CAST(SUM(new_session) AS BIGINT) AS n_sessions
        |FROM e GROUP BY user_id ORDER BY user_id""".stripMargin,
    "date_parts_orders" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS y, CAST(month(o_orderdate) AS BIGINT) AS m,
        |       COUNT(*) AS n_orders,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
        |FROM orders GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "string_funcs_customer" ->
      """SELECT c_custkey, upper(c_name) AS uname, CAST(len(c_name) AS BIGINT) AS name_len,
        |       substring(c_name, 1, 8) AS name_prefix,
        |       c_mktsegment || '#' || CAST(c_custkey AS VARCHAR) AS tag
        |FROM customer WHERE c_custkey < 100 ORDER BY c_custkey""".stripMargin,
    "hopping_click_counts" ->
      """WITH h AS (
        |  SELECT time_bucket(INTERVAL '15 minutes', ts) - k * INTERVAL '15 minutes' AS window_start, value
        |  FROM events, generate_series(0, 3) t(k)
        |  WHERE event_type = 'click')
        |SELECT window_start, COUNT(*) AS n,
        |       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM h GROUP BY 1 ORDER BY 1""".stripMargin,
    // NOTE boundary semantics: Spark's session_window is [start, start+gap),
    // so an event EXACTLY gap after its predecessor opens a NEW session — the
    // oracle's lag rule uses >= to match (unlike sessionize_users, whose
    // lag-cumsum operator uses strict > and keeps boundary-equal gaps in the
    // same session; both conventions are valid, each oracle mirrors its own).
    "session_window_users" ->
      """WITH e AS (
        |  SELECT user_id, ts,
        |    CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |           OR ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) >= INTERVAL 120 MINUTE
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM events)
        |SELECT user_id, COUNT(*) AS n_events, CAST(SUM(new_session) AS BIGINT) AS n_sessions
        |FROM e GROUP BY user_id ORDER BY user_id""".stripMargin,
    "topk_custom_operator" ->
      """SELECT o_orderpriority, rnk, o_orderkey, o_totalprice FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |         ROW_NUMBER() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
        |  FROM orders)
        |WHERE rnk <= 3 ORDER BY o_orderpriority, rnk""".stripMargin,
    "pivot_status_by_flag" ->
      """SELECT l_returnflag,
        |       COUNT(*) FILTER (l_linestatus = 'F') AS F,
        |       COUNT(*) FILTER (l_linestatus = 'O') AS O
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "minmax_dates_per_priority" ->
      """SELECT o_orderpriority, min(o_orderdate) AS first_order, max(o_orderdate) AS last_order,
        |       COUNT(*) AS n
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "moving_avg_daily" ->
      """WITH d AS (
        |  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS "day", COUNT(*) AS n
        |  FROM events GROUP BY 1)
        |SELECT "day", n,
        |       round(AVG(n) OVER (ORDER BY "day" ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 6) AS ma7
        |FROM d ORDER BY "day"""".stripMargin,
    "token_budget_sample" ->
      """WITH t AS (
        |  SELECT doc_id,
        |         CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS BIGINT) AS n_tokens,
        |         md5(CAST(doc_id AS VARCHAR)) AS h
        |  FROM documents),
        |c AS (SELECT doc_id, n_tokens, SUM(n_tokens) OVER (ORDER BY h, doc_id) AS cum FROM t)
        |SELECT doc_id, n_tokens FROM c WHERE cum <= 15000 ORDER BY doc_id""".stripMargin,
    "ngram_jaccard_pairs" ->
      """WITH src AS (SELECT doc_id, text FROM documents WHERE doc_id % 5 = 0),
        |d0 AS (
        |  SELECT doc_id, text FROM src
        |  UNION ALL
        |  SELECT doc_id + 100000 AS doc_id,
        |         array_to_string(list_slice(string_split_regex(trim(lower(text)), '\s+'), 1,
        |           greatest(CAST(floor(len(string_split_regex(trim(lower(text)), '\s+')) * 3 / 4) AS INT), 1)), ' ') AS text
        |  FROM src),
        |s AS (
        |  SELECT doc_id,
        |         list_distinct(list_transform(range(1, len(string_split_regex(trim(lower(text)), '\s+')) - 1),
        |           i -> array_to_string((string_split_regex(trim(lower(text)), '\s+'))[i:i+2], ' '))) AS sh
        |  FROM d0
        |  WHERE len(string_split_regex(trim(lower(text)), '\s+')) >= 3),
        |p AS (
        |  SELECT a.doc_id AS a, b.doc_id AS b,
        |         len(list_intersect(a.sh, b.sh)) AS inter, len(a.sh) AS na, len(b.sh) AS nb
        |  FROM s a, s b WHERE a.doc_id < b.doc_id)
        |SELECT a, b, round(CAST(inter AS DOUBLE) / (na + nb - inter), 6) AS jaccard
        |FROM p WHERE CAST(inter AS DOUBLE) / (na + nb - inter) >= 0.5
        |ORDER BY a, b""".stripMargin,
    "asof_last_purchase" ->
      """WITH c AS (SELECT user_id, event_id, ts FROM events WHERE event_type = 'click'),
        |p AS (SELECT user_id, ts, MAX(value) AS pvalue
        |      FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
        |SELECT c.user_id, c.event_id, epoch_ms(c.ts) AS click_ms,
        |       epoch_ms(p.ts) AS purchase_ms, round(p.pvalue, 6) AS pvalue
        |FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.ts >= p.ts
        |ORDER BY c.user_id, click_ms, c.event_id""".stripMargin,
    "range_join_incidents" ->
      """WITH pt AS (SELECT event_id, ts FROM events
        |            WHERE event_type = 'click' AND event_id % 7 = 0),
        |i AS (SELECT event_id AS incident_id, date_trunc('second', ts) AS s,
        |             date_trunc('second', ts) + INTERVAL 4 HOUR AS e
        |      FROM events WHERE event_type = 'error')
        |SELECT pt.event_id, i.incident_id
        |FROM pt JOIN i ON pt.ts >= i.s AND pt.ts < i.e
        |ORDER BY 1, 2""".stripMargin,
    "stratified_sample" ->
      """WITH t AS (
        |  SELECT doc_id, source,
        |         ROW_NUMBER() OVER (PARTITION BY source
        |           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn,
        |         COUNT(*) OVER (PARTITION BY source) AS n
        |  FROM documents)
        |SELECT doc_id, source FROM t
        |WHERE rn <= ceil(CASE source WHEN 'src0' THEN 0.5 WHEN 'src1' THEN 0.25
        |                 ELSE 0.125 END * n)
        |ORDER BY doc_id""".stripMargin,
    "mix_sources" ->
      """WITH a AS (
        |  SELECT source, COUNT(*) AS n FROM documents
        |  WHERE source IN ('src0', 'src1', 'src2') GROUP BY source),
        |w AS (SELECT source, n,
        |        CASE source WHEN 'src0' THEN CAST(0.5 AS DOUBLE)
        |                    WHEN 'src1' THEN CAST(0.25 AS DOUBLE)
        |                    ELSE CAST(0.25 AS DOUBLE) END AS wt
        |      FROM a),
        |t AS (SELECT MIN(CAST(n AS DOUBLE) / wt) AS target FROM w),
        |lim AS (SELECT source, CAST(floor(wt * target) AS BIGINT) AS take FROM w, t),
        |r AS (SELECT doc_id, source,
        |        ROW_NUMBER() OVER (PARTITION BY source
        |          ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        |      FROM documents WHERE source IN ('src0', 'src1', 'src2'))
        |SELECT r.source, CAST(COUNT(*) AS BIGINT) AS n_docs
        |FROM r JOIN lim ON r.source = lim.source
        |WHERE r.rn <= lim.take GROUP BY r.source ORDER BY r.source""".stripMargin,
    "pii_redact" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    'contact user' || CAST(doc_id AS VARCHAR) || '@mail' ||
        |    CAST(doc_id % 7 AS VARCHAR) || '.com via 10.' ||
        |    CAST(doc_id % 256 AS VARCHAR) || '.0.' ||
        |    CAST(doc_id % 100 AS VARCHAR) || ' or 555-' ||
        |    lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-' ||
        |    lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' ' ||
        |    substr(text, 1, 40) AS t
        |  FROM documents)
        |SELECT doc_id,
        |  regexp_replace(regexp_replace(regexp_replace(t,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
        |    '\d{3}-\d{3}-\d{4}', '[PHONE]', 'g'),
        |    '(\d{1,3}\.){3}\d{1,3}', '[IP]', 'g') AS redacted
        |FROM p ORDER BY doc_id""".stripMargin,
    "contamination_check" ->
      """WITH tok AS (
        |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id,
        |         list_distinct(list_transform(range(1, len(w) - 3),
        |           i -> array_to_string(w[i:i+4], ' '))) AS s
        |  FROM tok WHERE len(w) >= 5),
        |b AS (SELECT DISTINCT unnest(s) AS g FROM sh WHERE doc_id % 97 = 0),
        |t AS (SELECT doc_id, unnest(s) AS g FROM sh WHERE doc_id % 97 <> 0)
        |SELECT t.doc_id AS train_id, CAST(COUNT(DISTINCT t.g) AS BIGINT) AS n_shared
        |FROM t JOIN b ON t.g = b.g
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "repetition_metrics" ->
      """WITH w AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS g
        |  FROM documents),
        |wc AS (SELECT doc_id, g, COUNT(*) AS c FROM w WHERE g <> '' GROUP BY 1, 2),
        |ws AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n, MAX(c) AS tp,
        |              COUNT(*) AS d FROM wc GROUP BY 1),
        |bg AS (
        |  SELECT doc_id, unnest(list_transform(range(1, len(w)),
        |           i -> array_to_string(w[i:i+1], ' '))) AS g
        |  FROM (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w
        |        FROM documents)
        |  WHERE len(w) >= 2),
        |bc AS (SELECT doc_id, g, COUNT(*) AS c FROM bg GROUP BY 1, 2),
        |bs AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n, MAX(c) AS tp
        |       FROM bc GROUP BY 1)
        |SELECT ws.doc_id,
        |       ws.n AS n_words,
        |       round(CAST(ws.d AS DOUBLE) / ws.n, 6) AS distinct_word_ratio,
        |       round(CAST(ws.tp AS DOUBLE) / ws.n, 6) AS top_word_frac,
        |       round(CAST(coalesce(bs.tp, 0) AS DOUBLE) /
        |             greatest(coalesce(bs.n, 0), 1), 6) AS top_bigram_frac
        |FROM ws LEFT JOIN bs ON ws.doc_id = bs.doc_id
        |ORDER BY ws.doc_id""".stripMargin,
    "line_dedup" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t FROM documents),
        |fx AS (
        |  SELECT doc_id,
        |         list_prepend('=== shared boilerplate header ===',
        |           list_append(
        |             list_transform(range(0, (len(t) - 1) // 8 + 1),
        |               i -> array_to_string(list_slice(t, CAST(i*8+1 AS INT), CAST(i*8+8 AS INT)), ' ')),
        |             '--- shared footer: all rights reserved ---')) AS ls
        |  FROM toks),
        |l AS (SELECT doc_id, ls, unnest(range(1, len(ls) + 1)) AS pos FROM fx),
        |ll AS (SELECT doc_id, CAST(pos AS INT) AS pos, ls[CAST(pos AS INT)] AS line FROM l),
        |rep AS (SELECT trim(line) AS k FROM ll GROUP BY 1 HAVING COUNT(DISTINCT doc_id) >= 2),
        |kept AS (SELECT doc_id, pos, line FROM ll WHERE trim(line) NOT IN (SELECT k FROM rep)),
        |agg AS (SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text2,
        |               CAST(COUNT(*) AS BIGINT) AS n_kept
        |        FROM kept GROUP BY doc_id),
        |n AS (SELECT doc_id, CAST(len(ls) AS BIGINT) AS n_lines FROM fx)
        |SELECT n.doc_id,
        |       md5(coalesce(agg.text2, '')) AS text_md5,
        |       coalesce(agg.n_kept, 0) AS n_lines_kept,
        |       n.n_lines - coalesce(agg.n_kept, 0) AS n_lines_dropped
        |FROM n LEFT JOIN agg ON n.doc_id = agg.doc_id
        |ORDER BY n.doc_id""".stripMargin,
    "span_dedup" ->
      """WITH fx AS (
        |  SELECT doc_id,
        |         'permission is hereby granted free of charge to any person obtaining a copy'
        |           || ' ' || text || ' ' ||
        |         'the software is provided as is without warranty of any kind express or implied' AS text
        |  FROM documents),
        |toks AS (
        |  -- Java-trim edge strip first (all chars <= 0x20), mirroring the
        |  -- engine's kernel-aligned tokenization exactly
        |  SELECT doc_id,
        |         list_filter(string_split_regex(
        |           regexp_replace(text, '^[\x00-\x20]+|[\x00-\x20]+$', '', 'g'),
        |           '\s+'), t -> t <> '') AS ts
        |  FROM fx),
        |lt AS (SELECT doc_id, ts, list_transform(ts, t -> lower(t)) AS lts FROM toks),
        |w0s AS (SELECT doc_id, lts,
        |               unnest(range(0, greatest(len(lts) - 7, 0))) AS i
        |        FROM lt),
        |wins AS (SELECT doc_id, CAST(i AS INT) AS w0,
        |                md5(array_to_string(
        |                  list_slice(lts, CAST(i + 1 AS INT), CAST(i + 8 AS INT)), ' ')) AS wh
        |         FROM w0s),
        |rep AS (SELECT wh FROM wins GROUP BY wh HAVING COUNT(DISTINCT doc_id) >= 2),
        |mk0 AS (SELECT doc_id, w0, unnest(range(0, 8)) AS j
        |        FROM wins WHERE wh IN (SELECT wh FROM rep)),
        |marked AS (SELECT DISTINCT doc_id, w0 + CAST(j AS INT) AS pos FROM mk0),
        |tp0 AS (SELECT doc_id, ts, unnest(range(0, len(ts))) AS p FROM toks),
        |tp AS (SELECT doc_id, CAST(p AS INT) AS pos, ts[CAST(p + 1 AS INT)] AS tok FROM tp0),
        |kept AS (SELECT t.doc_id, t.pos, t.tok FROM tp t
        |         WHERE NOT EXISTS (SELECT 1 FROM marked m
        |                           WHERE m.doc_id = t.doc_id AND m.pos = t.pos)),
        |agg AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS t2,
        |               CAST(COUNT(*) AS BIGINT) AS n_kept
        |        FROM kept GROUP BY doc_id),
        |n AS (SELECT doc_id, CAST(len(ts) AS BIGINT) AS n FROM toks)
        |SELECT n.doc_id, md5(coalesce(agg.t2, '')) AS text_md5,
        |       coalesce(agg.n_kept, 0) AS n_tokens_kept,
        |       n.n - coalesce(agg.n_kept, 0) AS n_tokens_dropped
        |FROM n LEFT JOIN agg ON n.doc_id = agg.doc_id
        |ORDER BY n.doc_id""".stripMargin,
    "gopher_rules" ->
      """WITH base AS (
        |  SELECT doc_id, coalesce(text, '') AS text,
        |         list_filter(string_split_regex(coalesce(text, ''), '\s+'), t -> t <> '') AS ws,
        |         string_split(coalesce(text, ''), chr(10)) AS ls
        |  FROM documents),
        |m AS (
        |  SELECT doc_id,
        |    CAST(len(ws) AS BIGINT) AS n_words,
        |    round(CAST(list_sum(list_transform(ws, w -> len(w))) AS DOUBLE)
        |          / greatest(len(ws), 1), 6) AS mean_word_len,
        |    round(CAST((len(text) - len(replace(text, '#', '')))
        |            + (len(text) - len(replace(text, '...', ''))) // 3 AS DOUBLE)
        |          / greatest(len(ws), 1), 6) AS symbol_word_ratio,
        |    round(CAST(len(list_filter(ls, l -> regexp_matches(ltrim(l), '^[-*•]'))) AS DOUBLE)
        |          / greatest(len(ls), 1), 6) AS bullet_line_frac,
        |    round(CAST(len(list_filter(ls, l -> regexp_matches(rtrim(l), '(\.\.\.|…)$'))) AS DOUBLE)
        |          / greatest(len(ls), 1), 6) AS ellipsis_line_frac,
        |    round(CAST(len(list_filter(ws, w -> regexp_matches(w, '[A-Za-z]'))) AS DOUBLE)
        |          / greatest(len(ws), 1), 6) AS alpha_word_frac,
        |    CAST(len(list_intersect(list_distinct(list_transform(ws, w -> lower(w))),
        |         ['the', 'be', 'to', 'of', 'and', 'that', 'have', 'with'])) AS BIGINT) AS stopword_hits
        |  FROM base)
        |SELECT *,
        |       (n_words BETWEEN 30 AND 100000
        |        AND mean_word_len BETWEEN 3.0 AND 10.0
        |        AND symbol_word_ratio <= 0.1
        |        AND bullet_line_frac <= 0.9
        |        AND ellipsis_line_frac <= 0.3
        |        AND alpha_word_frac >= 0.8
        |        AND stopword_hits >= 2) AS keep
        |FROM m ORDER BY doc_id""".stripMargin,
    "pack_sequences" ->
      """WITH t AS (
        |  SELECT doc_id,
        |         CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS BIGINT) AS n_tokens,
        |         md5(CAST(doc_id AS VARCHAR)) AS h
        |  FROM documents),
        |c AS (SELECT doc_id, n_tokens,
        |        SUM(n_tokens) OVER (ORDER BY h, doc_id) AS cum FROM t)
        |SELECT doc_id, n_tokens,
        |       CAST((cum - n_tokens) // 2048 AS BIGINT) AS seq_first,
        |       CAST((cum - 1) // 2048 AS BIGINT) AS seq_last
        |FROM c WHERE n_tokens > 0 ORDER BY doc_id""".stripMargin,
    "mix_upsample" ->
      """WITH d AS (
        |  SELECT doc_id, source,
        |         ROW_NUMBER() OVER (PARTITION BY source
        |           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn,
        |         COUNT(*) OVER (PARTITION BY source) AS n
        |  FROM documents WHERE source IN ('src0', 'src1')),
        |t AS (SELECT *, CASE source WHEN 'src0' THEN 1500 ELSE 100 END AS need FROM d),
        |r AS (SELECT *, unnest(range(0, CAST(ceil(CAST(need AS DOUBLE) / n) AS BIGINT))) AS copy
        |      FROM t)
        |SELECT doc_id, source, CAST(copy AS BIGINT) AS copy
        |FROM r WHERE copy * n + rn <= need
        |ORDER BY doc_id, source, copy""".stripMargin,
    "interval_overlap_pairs" ->
      """WITH a AS (
        |  SELECT event_id AS a_id, date_trunc('second', ts) AS s,
        |         date_trunc('second', ts) + INTERVAL 4 HOUR AS e
        |  FROM events WHERE event_type = 'error'),
        |b AS (
        |  SELECT event_id AS b_id, date_trunc('second', ts) AS s,
        |         date_trunc('second', ts) + INTERVAL 1 HOUR AS e
        |  FROM events WHERE event_type = 'click')
        |SELECT a_id, b_id FROM a JOIN b ON a.s < b.e AND b.s < a.e
        |ORDER BY 1, 2""".stripMargin,
    "salted_join_agg" ->
      """SELECT c_mktsegment,
        |       COUNT(*) AS n,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "hash_sample" ->
      """SELECT doc_id, source FROM documents
        |WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
        |      < CAST((CASE source WHEN 'src0' THEN 0.5 WHEN 'src1' THEN 0.25
        |               ELSE 0.125 END) * 4294967296 AS BIGINT)
        |ORDER BY doc_id""".stripMargin,
    "weighted_sample" ->
      """WITH d AS (
        |  SELECT doc_id, source, n_chars,
        |         round(pow(
        |           (CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13)) AS BIGINT) + 1)
        |             / 4503599627370496.0,
        |           1.0 / (n_chars + 1.0)), 12) AS k
        |  FROM documents),
        |r AS (SELECT doc_id, source, n_chars,
        |             ROW_NUMBER() OVER (PARTITION BY source
        |               ORDER BY k DESC, doc_id) AS rn
        |      FROM d)
        |SELECT doc_id, source, n_chars FROM r WHERE rn <= 10 ORDER BY doc_id""".stripMargin,
    "streaming_heavy_hitters" ->
      """WITH e AS (
        |  SELECT date_trunc('hour', ts) AS ws, 'k_' || (event_id % 40) AS item
        |  FROM events WHERE event_id % 50 = 0)
        |SELECT ws AS window_start, item, CAST(COUNT(*) AS BIGINT) AS cnt
        |FROM e GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "decontaminate_bloom" ->
      """WITH tok AS (
        |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, list_distinct(list_transform(range(1, len(w) - 3),
        |           i -> array_to_string(w[i:i+4], ' '))) AS s
        |  FROM tok WHERE len(w) >= 5),
        |b AS (SELECT DISTINCT unnest(s) AS g FROM sh WHERE doc_id % 97 = 0),
        |flagged AS (
        |  SELECT DISTINCT sh.doc_id FROM sh, unnest(sh.s) AS u(g)
        |  WHERE sh.doc_id % 97 <> 0 AND u.g IN (SELECT g FROM b))
        |SELECT CAST((SELECT COUNT(*) FROM flagged) AS BIGINT) AS n_contaminated,
        |       CAST(0 AS BIGINT) AS n_contaminated_kept""".stripMargin,
    "multimodal_frame_sample" ->
      """SELECT doc_id AS media_id,
        |       CAST(n_chars % 100 AS BIGINT) AS n_frames,
        |       CAST(coalesce(len(range(0, n_chars % 100, 4)), 0) AS BIGINT) AS n_sampled,
        |       coalesce(array_to_string(range(0, n_chars % 100, 4), ','), '') AS frames
        |FROM documents ORDER BY media_id""".stripMargin,
    "ann_sq8_recall" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS n_queries, true AS recall_ok
        |FROM embeddings WHERE vec_id < 8""".stripMargin,
    "ann_pq_recall" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS n_queries, true AS adc_ok, true AS rerank_ok,
        |       CAST(COUNT(*) AS BIGINT) AS n_dup_exact
        |FROM embeddings WHERE vec_id < 8""".stripMargin,
    "ann_ivfpq_recall" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS n_queries, true AS recall_ok,
        |       CAST(COUNT(*) AS BIGINT) AS n_dup_exact
        |FROM embeddings WHERE vec_id < 8""".stripMargin,
    "dup_clusters" ->
      """WITH RECURSIVE src AS (SELECT doc_id, text FROM documents WHERE doc_id % 5 = 0),
        |d0 AS (
        |  SELECT doc_id, text FROM src
        |  UNION ALL
        |  SELECT doc_id + 100000 AS doc_id,
        |         array_to_string(list_slice(string_split_regex(trim(lower(text)), '\s+'), 1,
        |           greatest(CAST(floor(len(string_split_regex(trim(lower(text)), '\s+')) * 3 / 4) AS INT), 1)), ' ') AS text
        |  FROM src),
        |s AS (
        |  SELECT doc_id,
        |         list_distinct(list_transform(range(1, len(string_split_regex(trim(lower(text)), '\s+')) - 1),
        |           i -> array_to_string((string_split_regex(trim(lower(text)), '\s+'))[i:i+2], ' '))) AS sh
        |  FROM d0
        |  WHERE len(string_split_regex(trim(lower(text)), '\s+')) >= 3),
        |p AS (
        |  SELECT a.doc_id AS a, b.doc_id AS b
        |  FROM s a, s b
        |  WHERE a.doc_id < b.doc_id
        |    AND CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        |        / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.5),
        |e AS (SELECT a, b FROM p UNION SELECT b, a FROM p),
        |reach(id, r) AS (
        |  SELECT a AS id, a AS r FROM e
        |  UNION
        |  SELECT e.a AS id, reach.r FROM e JOIN reach ON reach.id = e.b)
        |SELECT id, MIN(r) AS cluster_rep FROM reach GROUP BY id ORDER BY id""".stripMargin,
    "dedup_representatives" ->
      """WITH RECURSIVE src AS (SELECT doc_id, text FROM documents WHERE doc_id % 5 = 0),
        |d0 AS (
        |  SELECT doc_id, text FROM src
        |  UNION ALL
        |  SELECT doc_id + 100000 AS doc_id,
        |         array_to_string(list_slice(string_split_regex(trim(lower(text)), '\s+'), 1,
        |           greatest(CAST(floor(len(string_split_regex(trim(lower(text)), '\s+')) * 3 / 4) AS INT), 1)), ' ') AS text
        |  FROM src),
        |s AS (
        |  SELECT doc_id,
        |         list_distinct(list_transform(range(1, len(string_split_regex(trim(lower(text)), '\s+')) - 1),
        |           i -> array_to_string((string_split_regex(trim(lower(text)), '\s+'))[i:i+2], ' '))) AS sh
        |  FROM d0
        |  WHERE len(string_split_regex(trim(lower(text)), '\s+')) >= 3),
        |p AS (
        |  SELECT a.doc_id AS a, b.doc_id AS b
        |  FROM s a, s b
        |  WHERE a.doc_id < b.doc_id
        |    AND CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        |        / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.5),
        |e AS (SELECT a, b FROM p UNION SELECT b, a FROM p),
        |reach(id, r) AS (
        |  SELECT a AS id, a AS r FROM e
        |  UNION
        |  SELECT e.a AS id, reach.r FROM e JOIN reach ON reach.id = e.b),
        |labels AS (SELECT id, MIN(r) AS cl FROM reach GROUP BY id),
        |member AS (SELECT d.doc_id, len(d.text) AS l, lab.cl
        |           FROM d0 d JOIN labels lab ON lab.id = d.doc_id),
        |w AS (SELECT doc_id, cl,
        |             ROW_NUMBER() OVER (PARTITION BY cl ORDER BY l DESC, doc_id ASC) AS rn,
        |             COUNT(*) OVER (PARTITION BY cl) AS n_cluster
        |      FROM member),
        |kept AS (
        |  SELECT doc_id, cl AS cluster_rep, CAST(n_cluster AS BIGINT) AS n_cluster
        |  FROM w WHERE rn = 1
        |  UNION ALL
        |  SELECT doc_id, doc_id AS cluster_rep, CAST(1 AS BIGINT) AS n_cluster
        |  FROM d0 WHERE doc_id NOT IN (SELECT id FROM labels))
        |SELECT doc_id, cluster_rep, n_cluster FROM kept ORDER BY doc_id""".stripMargin,
    "chunk_documents" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w FROM documents),
        |k AS (
        |  SELECT doc_id, w, len(w) AS n,
        |         greatest((len(w) - 16 + 47) // 48, 1) AS nk
        |  FROM t),
        |c AS (SELECT doc_id, w, n, unnest(range(0, nk)) AS chunk_id FROM k)
        |SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
        |       CAST(chunk_id * 48 AS BIGINT) AS tok_start,
        |       CAST(least(64, n - chunk_id * 48) AS BIGINT) AS chunk_tokens,
        |       md5(array_to_string(list_slice(w, CAST(chunk_id * 48 + 1 AS INT),
        |         CAST(chunk_id * 48 + least(64, n - chunk_id * 48) AS INT)), ' ')) AS chunk_md5
        |FROM c ORDER BY doc_id, chunk_id""".stripMargin,
    "quantize_embeddings" ->
      """SELECT vec_id,
        |       CAST(list_min(embedding) AS DOUBLE) AS q_min,
        |       CASE WHEN list_max(embedding) > list_min(embedding)
        |            THEN (CAST(list_max(embedding) AS DOUBLE) - CAST(list_min(embedding) AS DOUBLE)) / 255.0
        |            ELSE 0.0 END AS q_scale,
        |       CAST(len(embedding) AS BIGINT) AS n_dims,
        |       true AS recon_ok
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    "curation_funnel_check" ->
      """WITH d AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 100000 AS doc_id,
        |         array_to_string(list_slice(string_split_regex(trim(lower(text)), '\s+'), 1,
        |           greatest(CAST(floor(len(string_split_regex(trim(lower(text)), '\s+')) * 3 / 4) AS INT), 1)), ' ') AS text
        |  FROM documents)
        |SELECT CAST((SELECT COUNT(*) FROM d) AS BIGINT) AS n_input,
        |       CAST((SELECT COUNT(DISTINCT md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'))) FROM d) AS BIGINT) AS n_exact_kept,
        |       true AS neardup_monotone, true AS quality_monotone, true AS nonempty""".stripMargin,
    "minhash_lsh_recall" ->
      """WITH f AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 500000 AS doc_id, text FROM documents WHERE doc_id % 23 = 0),
        |fp AS (
        |  SELECT doc_id, md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fp
        |  FROM f
        |  WHERE len(string_split_regex(trim(lower(text)), '\s+')) >= 3)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_exact, CAST(0 AS BIGINT) AS n_missed
        |FROM fp a JOIN fp b ON a.fp = b.fp AND a.doc_id < b.doc_id""".stripMargin,
    "simhash_recall" ->
      """WITH f AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 500000 AS doc_id, text FROM documents WHERE doc_id % 23 = 0),
        |fp AS (
        |  SELECT doc_id, md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fp
        |  FROM f)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_exact, CAST(0 AS BIGINT) AS n_missed
        |FROM fp a JOIN fp b ON a.fp = b.fp AND a.doc_id < b.doc_id""".stripMargin,
    "incremental_dedup_recall" ->
      """WITH sh AS (
        |  SELECT doc_id,
        |         list_distinct(list_transform(range(1, len(w) - 1),
        |           i -> array_to_string(w[i:i+2], ' '))) AS s
        |  FROM (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w
        |        FROM documents)
        |  WHERE len(w) >= 3),
        |newb AS (SELECT doc_id + 1000000 AS doc_id, s FROM sh WHERE doc_id % 37 = 0),
        |p AS (
        |  SELECT a.doc_id AS na, b.doc_id AS nb,
        |         len(list_intersect(a.s, b.s)) AS inter, len(a.s) AS la, len(b.s) AS lb
        |  FROM newb a, sh b)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_exact, CAST(0 AS BIGINT) AS n_missed
        |FROM p
        |WHERE CAST(inter AS DOUBLE) / (la + lb - inter) >= 0.95""".stripMargin,
    "decontaminate_count" ->
      """WITH tok AS (
        |  SELECT doc_id, source, string_split_regex(trim(lower(text)), '\s+') AS w
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, list_distinct(list_transform(range(1, len(w) - 3),
        |           i -> array_to_string(w[i:i+4], ' '))) AS s
        |  FROM tok WHERE len(w) >= 5),
        |b AS (SELECT DISTINCT unnest(s) AS g FROM sh WHERE doc_id % 97 = 0),
        |flagged AS (
        |  SELECT DISTINCT sh.doc_id FROM sh, unnest(sh.s) AS u(g)
        |  WHERE sh.doc_id % 97 <> 0 AND u.g IN (SELECT g FROM b))
        |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
        |FROM documents
        |WHERE doc_id % 97 <> 0 AND doc_id NOT IN (SELECT doc_id FROM flagged)
        |GROUP BY source ORDER BY source""".stripMargin,
    "asof_within_tolerance" ->
      """WITH c AS (SELECT user_id, event_id, ts FROM events WHERE event_type = 'click'),
        |p AS (SELECT user_id, ts, MAX(value) AS pvalue
        |      FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
        |j AS (
        |  SELECT c.user_id, c.event_id, c.ts AS cts, p.ts AS pts, p.pvalue
        |  FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.ts >= p.ts)
        |SELECT user_id, event_id, epoch_ms(cts) AS click_ms,
        |       CASE WHEN pts >= cts - INTERVAL 6 HOUR THEN epoch_ms(pts) END AS purchase_ms,
        |       CASE WHEN pts >= cts - INTERVAL 6 HOUR THEN round(pvalue, 6) END AS pvalue
        |FROM j ORDER BY user_id, click_ms, event_id""".stripMargin,
    "approx_quantile_rank" ->
      """SELECT l_returnflag, true AS rank_ok
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "heavy_hitters" ->
      """WITH k AS (
        |  SELECT CASE WHEN event_id % 10 < 3 THEN 'hot_' || (event_id % 7)
        |              ELSE 'cold_' || (event_id % 2000) END AS k
        |  FROM events),
        |c AS (SELECT k, COUNT(*) AS cnt FROM k GROUP BY k),
        |t AS (SELECT CAST(SUM(cnt) * 0.03 AS BIGINT) AS floor_cnt FROM c)
        |SELECT k AS item, cnt, true AS bounds_ok
        |FROM c, t WHERE cnt > floor_cnt ORDER BY item""".stripMargin,
    "hll_daily_users" ->
      """SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS "day",
        |       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact,
        |       true AS est_ok
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "hll_union_total" ->
      """SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact, true AS est_ok
        |FROM events""".stripMargin,
    "ann_lsh_recall" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS n_queries, true AS recall_ok
        |FROM embeddings WHERE vec_id < 8""".stripMargin,
    "ann_ivf_recall" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS n_queries, true AS recall_ok
        |FROM embeddings WHERE vec_id < 8""".stripMargin,
    "minhash_lsh_precision" ->
      """WITH src AS (SELECT doc_id, text FROM documents WHERE doc_id % 5 = 0),
        |d0 AS (
        |  SELECT doc_id, text FROM src
        |  UNION ALL
        |  SELECT doc_id + 100000 AS doc_id,
        |         array_to_string(list_slice(string_split_regex(trim(lower(text)), '\s+'), 1,
        |           greatest(CAST(floor(len(string_split_regex(trim(lower(text)), '\s+')) * 3 / 4) AS INT), 1)), ' ') AS text
        |  FROM src),
        |s AS (
        |  SELECT doc_id,
        |         list_distinct(list_transform(range(1, len(string_split_regex(trim(lower(text)), '\s+')) - 1),
        |           i -> array_to_string((string_split_regex(trim(lower(text)), '\s+'))[i:i+2], ' '))) AS sh
        |  FROM d0
        |  WHERE len(string_split_regex(trim(lower(text)), '\s+')) >= 3),
        |p AS (
        |  SELECT len(list_intersect(a.sh, b.sh)) AS inter, len(a.sh) AS na, len(b.sh) AS nb
        |  FROM s a, s b WHERE a.doc_id < b.doc_id)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_exact, CAST(0 AS BIGINT) AS n_violations
        |FROM p WHERE CAST(inter AS DOUBLE) / (na + nb - inter) >= 0.6""".stripMargin,
    "simhash_precision" ->
      """WITH src AS (SELECT doc_id, text FROM documents),
        |d0 AS (
        |  SELECT doc_id, text FROM src
        |  UNION ALL
        |  SELECT doc_id + 100000 AS doc_id,
        |         array_to_string(list_slice(string_split_regex(trim(lower(text)), '\s+'), 1,
        |           greatest(CAST(floor(len(string_split_regex(trim(lower(text)), '\s+')) * 3 / 4) AS INT), 1)), ' ') AS text
        |  FROM src),
        |f AS (SELECT doc_id, md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fp FROM d0)
        |SELECT true AS nonempty, CAST(0 AS BIGINT) AS n_violations,
        |       CAST((SELECT COUNT(*) FROM f a JOIN f b ON a.fp = b.fp AND a.doc_id < b.doc_id) AS BIGINT) AS n_dup_pairs""".stripMargin,
    "embedding_near_dup_precision" ->
      """WITH base AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 250),
        |v AS (
        |  SELECT vec_id AS id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e FROM base
        |  UNION ALL
        |  SELECT vec_id + 1000000 AS id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e FROM base),
        |p AS (
        |  SELECT a.id AS ida, b.id AS idb,
        |    list_sum(list_transform(range(1, len(a.e) + 1), i -> a.e[i] * b.e[i]))
        |      / (sqrt(list_sum(list_transform(a.e, x -> x * x))) * sqrt(list_sum(list_transform(b.e, x -> x * x)))) AS cos
        |  FROM v a, v b WHERE a.id < b.id)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_exact, CAST(0 AS BIGINT) AS n_violations,
        |       CAST((SELECT COUNT(*) FROM p WHERE abs(cos - 0.95) < 1e-9) AS BIGINT) AS n_boundary
        |FROM p WHERE cos >= 0.95""".stripMargin,
    "multimodal_features" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id,
        |         CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        |         hex(encode(text)) AS hx,
        |         CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
        |  FROM documents),
        |b AS (
        |  SELECT media_id, kind, n_bytes,
        |         coalesce(list_transform(range(0, CAST(n_bytes AS INT)), i ->
        |           CAST(('0x' || substr(hx, CAST(2*i+1 AS INT), 2)) AS INT)), []) AS bytes
        |  FROM m),
        |c AS (
        |  SELECT media_id, kind, n_bytes, bytes,
        |         list_reduce(list_prepend(CAST(1125899906842597 AS HUGEINT),
        |             list_transform(bytes, x -> CAST(x AS HUGEINT))),
        |           (acc, x) -> (31*acc + x) % CAST('18446744073709551616' AS HUGEINT)) AS cs
        |  FROM b)
        |SELECT media_id, kind, n_bytes,
        |       CAST(CASE WHEN cs >= CAST('9223372036854775808' AS HUGEINT)
        |                 THEN cs - CAST('18446744073709551616' AS HUGEINT) ELSE cs END AS BIGINT) AS checksum,
        |       CAST(16 AS BIGINT) AS feature_dim,
        |       array_to_string(list_transform(range(0, 16), j ->
        |         len(list_filter(bytes, x -> x % 16 = j))), ',') AS hist
        |FROM c ORDER BY media_id""".stripMargin,
    "embedding_near_dup_recall" ->
      """WITH base AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 250),
        |v AS (
        |  SELECT vec_id AS id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e FROM base
        |  UNION ALL
        |  SELECT vec_id + 1000000 AS id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e FROM base),
        |p AS (
        |  SELECT a.id AS ida, b.id AS idb,
        |    list_sum(list_transform(range(1, len(a.e) + 1), i -> a.e[i] * b.e[i]))
        |      / (sqrt(list_sum(list_transform(a.e, x -> x * x))) * sqrt(list_sum(list_transform(b.e, x -> x * x)))) AS cos
        |  FROM v a, v b WHERE a.id < b.id)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_exact, CAST(0 AS BIGINT) AS n_missed,
        |       CAST((SELECT COUNT(*) FROM p WHERE abs(cos - 0.95) < 1e-9) AS BIGINT) AS n_boundary
        |FROM p WHERE cos >= 0.95""".stripMargin
  )
}

package graft

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.{GeoFunctions, TextFunctions, VectorFunctions}
import graft.operators._
import graft.sources.Tables

/**
 * Shared fixture builders, numeric-parity helpers and engine-replayable
 * oracle fragments used by [[Queries]], [[Gates]] and [[Oracles]] — split
 * out of the driver-contract object so each query family lives in one
 * focused file while [[SparkEntry]] keeps the unchanged public surface.
 */
private[graft] object Fixtures {


  val Dec = DecimalType(18, 4)
  def dsum(c: Column): Column = sum(c.cast(Dec)).cast("double")

  // epoch-ms anchors inside the events table's span (2024-01-01 .. 2024-01-30 UTC)
  val Jan05 = 1704412800000L
  val Jan12 = 1705017600000L
  val Jan30 = 1706572800000L
  val Jan10_0745 = 1704872700000L

  /** Shared DuckDB view of `events` as readings (must mirror
    * [[Tables.readings]] exactly). */
  val ReadingsCte =
    "WITH r AS (SELECT ts, event_type || '_' || lpad(CAST(user_id % 100 AS VARCHAR), 2, '0') AS key, value FROM events)"

  /** Oracle for `geo_history_avg`, built at call time: the query synthesizes
    * only 10 distinct points (`user_id % 10`), so their precision-6 geohashes
    * and the bbox cover's prefix ranges are deterministic CONSTANTS — inlined
    * here as a CASE map + OR-of-ranges. The geohash kernel itself is verified
    * independently by GeohashSpec golden vectors; this gate checks the
    * scan/filter/agg semantics end-to-end in DuckDB. */
  def geoHistoryAvgOracle: String = {
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
  def duckCos(a: String, b: String): String =
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
  def annIvfTopkOracle: String = {
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

  /** Oracle for `pagerank_trade`: a full replay of the damped power
    * iteration — every iteration's per-edge contributions rounded to 12
    * decimals, summed as DECIMAL(30,12) (exact, order-free), update
    * re-rounded to 12 — so ranks are bit-identical to the engine's at
    * every step. Iterations unrolled as CTEs (no reliance on recursive
    * aggregation); the damping literal is written `0.85` and the teleport
    * term `(1.0 - 0.85) / cnt`, the exact IEEE expression the operator
    * evaluates. */
  def pagerankTradeOracle: String = {
    val iters = 3
    val iterCtes = (1 to iters).map { k =>
      s"""pr$k AS (
         |  SELECT nn.node,
         |         round((1.0 - 0.85) / (SELECT cnt FROM ncnt) + 0.85 * COALESCE(s.c, 0.0), 12) AS pr
         |  FROM nodes nn LEFT JOIN (
         |    SELECT e.dst AS node,
         |           CAST(SUM(CAST(round(p.pr / o.deg, 12) AS DECIMAL(30,12))) AS DOUBLE) AS c
         |    FROM pr${k - 1} p JOIN outdeg o ON o.src = p.node JOIN edges e ON e.src = p.node
         |    GROUP BY e.dst) s ON s.node = nn.node)""".stripMargin
    }
    s"""WITH oc AS (
       |  SELECT DISTINCT o_custkey AS ck, l_suppkey AS sk
       |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
       |edges AS (
       |  SELECT CAST(ck AS BIGINT) AS src, -1 - CAST(sk AS BIGINT) AS dst FROM oc
       |  UNION
       |  SELECT -1 - CAST(sk AS BIGINT), CAST(ck AS BIGINT) FROM oc),
       |nodes AS (SELECT DISTINCT src AS node FROM edges UNION SELECT DISTINCT dst FROM edges),
       |ncnt AS (SELECT COUNT(*) AS cnt FROM nodes),
       |outdeg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
       |pr0 AS (SELECT node, round(1.0 / (SELECT cnt FROM ncnt), 12) AS pr FROM nodes),
       |${iterCtes.mkString(",\n")}
       |SELECT node, pr FROM pr$iters ORDER BY node""".stripMargin
  }

  /** Oracle for `pagerank_dangling`: the [[pagerankTradeOracle]] replay on
    * the DIRECTED 1995 slice (suppliers are sinks) with the dangling-mass
    * opt-in — per iteration `dsh = round12(Σdec(pr_sink)/n)` (sum exact as
    * DECIMAL(30,12), division and round on the double), update
    * `round12(tp + 0.85·(csum + dsh))`, the exact IEEE shapes the
    * operator evaluates on both branches. */
  def pagerankDanglingOracle: String = {
    val iters = 2
    val iterCtes = (1 to iters).map { k =>
      s"""dm$k AS (
         |  SELECT round(COALESCE(CAST(SUM(CAST(pr AS DECIMAL(30,12))) AS DOUBLE), 0.0)
         |               / (SELECT cnt FROM ncnt), 12) AS dsh
         |  FROM pr${k - 1} WHERE node IN (SELECT node FROM dang)),
         |pr$k AS (
         |  SELECT nn.node,
         |         round((1.0 - 0.85) / (SELECT cnt FROM ncnt)
         |               + 0.85 * (COALESCE(s.c, 0.0) + (SELECT dsh FROM dm$k)), 12) AS pr
         |  FROM nodes nn LEFT JOIN (
         |    SELECT e.dst AS node,
         |           CAST(SUM(CAST(round(p.pr / o.deg, 12) AS DECIMAL(30,12))) AS DOUBLE) AS c
         |    FROM pr${k - 1} p JOIN outdeg o ON o.src = p.node JOIN edges e ON e.src = p.node
         |    GROUP BY e.dst) s ON s.node = nn.node)""".stripMargin
    }
    s"""WITH edges AS (
       |  SELECT DISTINCT CAST(o_custkey AS BIGINT) AS src,
       |         -1 - CAST(l_suppkey AS BIGINT) AS dst
       |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
       |  WHERE year(o_orderdate) = 1995),
       |nodes AS (SELECT DISTINCT src AS node FROM edges UNION SELECT DISTINCT dst FROM edges),
       |ncnt AS (SELECT COUNT(*) AS cnt FROM nodes),
       |outdeg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
       |dang AS (SELECT node FROM nodes WHERE node NOT IN (SELECT src FROM outdeg)),
       |pr0 AS (SELECT node, round(1.0 / (SELECT cnt FROM ncnt), 12) AS pr FROM nodes),
       |${iterCtes.mkString(",\n")}
       |SELECT node, pr FROM pr$iters ORDER BY node""".stripMargin
  }

  /** Oracle for `pagerank_weighted`: the [[pagerankTradeOracle]] replay
    * with weight-proportional splitting — contribution
    * `round(pr · (CAST(w AS DOUBLE) / Σw), 12)`, the exact IEEE shape the
    * operator evaluates; Σw cast back to BIGINT (DuckDB SUM(BIGINT) widens
    * to HUGEINT, Spark keeps LONG). */
  def pagerankWeightedOracle: String = {
    val iters = 2
    val iterCtes = (1 to iters).map { k =>
      s"""pr$k AS (
         |  SELECT nn.node,
         |         round((1.0 - 0.85) / (SELECT cnt FROM ncnt) + 0.85 * COALESCE(s.c, 0.0), 12) AS pr
         |  FROM nodes nn LEFT JOIN (
         |    SELECT e.dst AS node,
         |           CAST(SUM(CAST(round(p.pr * (CAST(e.w AS DOUBLE) / o.deg), 12) AS DECIMAL(30,12))) AS DOUBLE) AS c
         |    FROM pr${k - 1} p JOIN outdeg o ON o.src = p.node JOIN edges e ON e.src = p.node
         |    GROUP BY e.dst) s ON s.node = nn.node)""".stripMargin
    }
    s"""WITH pw AS (
       |  SELECT o_custkey AS ck, l_suppkey AS sk, COUNT(*) AS w
       |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
       |  WHERE year(o_orderdate) = 1995
       |  GROUP BY 1, 2),
       |edges AS (
       |  SELECT CAST(ck AS BIGINT) AS src, -1 - CAST(sk AS BIGINT) AS dst, w FROM pw
       |  UNION ALL
       |  SELECT -1 - CAST(sk AS BIGINT), CAST(ck AS BIGINT), w FROM pw),
       |nodes AS (SELECT DISTINCT src AS node FROM edges UNION SELECT DISTINCT dst FROM edges),
       |ncnt AS (SELECT COUNT(*) AS cnt FROM nodes),
       |outdeg AS (SELECT src, CAST(SUM(w) AS BIGINT) AS deg FROM edges GROUP BY src),
       |pr0 AS (SELECT node, round(1.0 / (SELECT cnt FROM ncnt), 12) AS pr FROM nodes),
       |${iterCtes.mkString(",\n")}
       |SELECT node, pr FROM pr$iters ORDER BY node""".stripMargin
  }

  /** Shared feature + GD-iteration CTEs for the `quality_lr_*` oracles: a
    * full replay of [[operators.Learn]]'s distributed training — the
    * text_metrics-proven feature expressions, then `iters` unrolled
    * gradient steps with round-12 contributions summed as DECIMAL(30,12)
    * and the update `round(w - lr*(g/n), 12)`, every arithmetic shape
    * (left-associated predictor, `g/n` before `lr*`, subtraction last)
    * written exactly as the engine evaluates it. */
  private def learnCtes(iters: Int): String = {
    val lr = "0.5"
    // the fixed left-associated predictor over a row of f joined with w{k}
    val pred = "b + w1 * x1 + w2 * x2 + w3 * x3"
    val stops = "['the','a','an','and','or','of','to','in','is','it','that'," +
      "'with','for','on','as','at','by','this','be']"
    // the residual is 6-grid-quantized BEFORE the per-row products (the
    // pca operand discipline, mirrored in Learn.trainLinear): err and x_j
    // both on the 6-decimal grid make each round12 land tie-free
    val iterCtes = (1 to iters).map { k =>
      s"""g$k AS (SELECT
         |  CAST(SUM(CAST(round(round($pred - y, 6), 12) AS DECIMAL(30,12))) AS DOUBLE) AS g0,
         |  CAST(SUM(CAST(round(round($pred - y, 6) * x1, 12) AS DECIMAL(30,12))) AS DOUBLE) AS g1,
         |  CAST(SUM(CAST(round(round($pred - y, 6) * x2, 12) AS DECIMAL(30,12))) AS DOUBLE) AS g2,
         |  CAST(SUM(CAST(round(round($pred - y, 6) * x3, 12) AS DECIMAL(30,12))) AS DOUBLE) AS g3
         |  FROM f, w${k - 1}),
         |w$k AS (SELECT
         |  round(b - $lr * (g0 / (SELECT cnt FROM ncnt)), 12) AS b,
         |  round(w1 - $lr * (g1 / (SELECT cnt FROM ncnt)), 12) AS w1,
         |  round(w2 - $lr * (g2 / (SELECT cnt FROM ncnt)), 12) AS w2,
         |  round(w3 - $lr * (g3 / (SELECT cnt FROM ncnt)), 12) AS w3
         |  FROM w${k - 1}, g$k)""".stripMargin
    }
    s"""WITH f AS (
       |  SELECT doc_id, source,
       |    CAST(CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS DOUBLE) AS y,
       |    round(CAST(len(string_split_regex(trim(lower(text)), '\\s+')) AS DOUBLE) / 100.0, 6) AS x1,
       |    round(CAST(len(regexp_replace(text, '[^.,;:!?''"()\\[\\]-]', '', 'g')) AS DOUBLE)
       |          / greatest(len(text), 1), 6) AS x2,
       |    round(CAST(len(list_intersect(list_distinct(string_split_regex(trim(lower(text)), '\\s+')),
       |          $stops)) AS DOUBLE)
       |          / greatest(len(list_distinct(string_split_regex(trim(lower(text)), '\\s+'))), 1), 6) AS x3
       |  FROM documents),
       |ncnt AS (SELECT COUNT(*) AS cnt FROM f),
       |w0 AS (SELECT CAST(0.0 AS DOUBLE) AS b, CAST(0.0 AS DOUBLE) AS w1,
       |              CAST(0.0 AS DOUBLE) AS w2, CAST(0.0 AS DOUBLE) AS w3),
       |${iterCtes.mkString(",\n")}""".stripMargin
  }

  // ------------------------------------------------------------- phash
  // SQL replay of [[operators.Multimodal.dHash64]] over the generator's
  // cycled-text PNG pixel formulas: byte i of the decoded RGB stream is
  // text byte (i mod L) (0 for empty text), luma is the integer
  // 299r+587g+114b, the 9×8 NN grid indexes with integer division, and
  // the 64 bits assemble into a SIGNED BIGINT via the two's-complement
  // k=63 term — every step exact integer arithmetic, no float anywhere.

  /** Pixel-byte expression over (hx, ilen); `perturb` replays the planted
    * near-dup fixture (first byte nudged +1 mod 256). */
  private def phashByte(i: String, perturb: Boolean): String = {
    val base = s"(CASE WHEN ilen > 0 THEN CAST(('0x' || substr(hx, CAST(2*(($i) % ilen)+1 AS INT), 2)) AS INT) ELSE 0 END)"
    if (!perturb) base
    else {
      val b0 = "(CASE WHEN ilen > 0 THEN CAST(('0x' || substr(hx, 1, 2)) AS INT) ELSE 0 END)"
      s"(CASE WHEN ($i) = 0 THEN ($b0 + 1) % 256 ELSE $base END)"
    }
  }

  /** Integer luma ×1000 of pixel index `p` (row-major RGB). */
  private def phashLuma(p: String, perturb: Boolean): String =
    s"(299*${phashByte(s"3*($p)", perturb)} + 587*${phashByte(s"3*($p)+1", perturb)} + 114*${phashByte(s"3*($p)+2", perturb)})"

  /** The 64-bit dHash as one aggregate expression over rows (media_id, k)
    * joined with the per-image (hx, ilen, w, h). */
  private def phashAgg(perturb: Boolean): String = {
    val pL = "((((k//8)*h)//8)*w + (((k%8)*w)//9))"
    val pR = "((((k//8)*h)//8)*w + ((((k%8)+1)*w)//9))"
    s"""CAST(SUM(CASE WHEN ${phashLuma(pR, perturb)} > ${phashLuma(pL, perturb)}
       |  THEN CASE WHEN k = 63 THEN CAST('-9223372036854775808' AS BIGINT)
       |            ELSE (CAST(1 AS BIGINT) << CAST(k AS INT)) END
       |  ELSE CAST(0 AS BIGINT) END) AS BIGINT)""".stripMargin
  }

  /** Shared CTEs: per-PNG-image generator params ⨯ bit index k, then the
    * original (`ph`) and planted-perturbed (`php`) hash tables.
    * `recursive` emits `WITH RECURSIVE` so a closure CTE can follow. */
  private def phashCtes(withPlanted: Boolean, recursive: Boolean = false): String = {
    val planted = if (!withPlanted) ""
    else s""",
       |php AS (SELECT media_id, ${phashAgg(perturb = true)} AS phash
       |        FROM px GROUP BY media_id)""".stripMargin
    s"""WITH ${if (recursive) "RECURSIVE " else ""}m AS (
       |  SELECT doc_id AS media_id, hex(encode(text)) AS hx,
       |         CAST(octet_length(encode(text)) AS INT) AS ilen,
       |         CAST(n_chars % 24 + 1 AS INT) AS w,
       |         CAST(n_chars % 8 + 1 AS INT) AS h
       |  FROM documents WHERE doc_id % 3 = 0 AND doc_id % 2 = 0),
       |px AS MATERIALIZED (
       |  SELECT media_id, hx, ilen, w, h, CAST(t.k AS INT) AS k
       |  FROM m, range(0, 64) t(k)),
       |ph AS (SELECT media_id, ${phashAgg(perturb = false)} AS phash
       |       FROM px GROUP BY media_id)$planted""".stripMargin
  }

  /** Oracle for `image_phash`: the dHash of every PNG image, bit-exact. */
  def imagePhashOracle: String =
    s"""${phashCtes(withPlanted = false)}
       |SELECT media_id, phash FROM ph ORDER BY media_id""".stripMargin

  /** Oracle for `phash_near_dup`: exhaustive Hamming≤3 self-join over the
    * replayed hashes of originals ∪ planted copies (ids +600000) — the
    * banded Spark join is EXACTLY this relation (4 bands > 3 bits). */
  def phashNearDupOracle: String =
    s"""${phashCtes(withPlanted = true)},
       |allph AS (SELECT media_id, phash FROM ph
       |          UNION ALL SELECT media_id + 600000, phash FROM php),
       |pairs AS (
       |  SELECT x.media_id AS a, y.media_id AS b,
       |         CAST(bit_count(xor(x.phash, y.phash)) AS INT) AS hamming
       |  FROM allph x JOIN allph y ON x.media_id < y.media_id)
       |SELECT a, b, hamming FROM pairs WHERE hamming <= 3 ORDER BY a, b""".stripMargin

  // ------------------------------------------------------------- ahash
  // SQL replay of [[operators.Multimodal.aHash64]] over the generator's
  // synthetic PCM (`v_i = (b[i mod L]·251 + 7i + 17) mod 2¹⁶`, the
  // multimodal_features formula): 65 integer-boundary windows, exact
  // energy sums, bit w = window w+1 strictly louder — assembled into a
  // signed BIGINT exactly like the image phash replay.

  /** Shared CTEs: per-audio generator params ⨯ window, correlated sample
    * expansion with original (`v`) and first-sample-perturbed (`vp`)
    * values, energies, and hash tables `ah` (+ `ahp` when planted). */
  private def ahashCtes(withPlanted: Boolean): String = {
    val b = "(CASE WHEN ilen > 0 THEN CAST(('0x' || substr(hx, CAST(2*((i) % ilen)+1 AS INT), 2)) AS INT) ELSE 0 END)"
    val v = s"(($b*251 + i*7 + 17) % 65536)"
    def hashAgg(col: String) =
      s"""CAST(SUM(CASE WHEN b.$col > a.$col
         |  THEN CASE WHEN a.w = 63 THEN CAST('-9223372036854775808' AS BIGINT)
         |            ELSE (CAST(1 AS BIGINT) << CAST(a.w AS INT)) END
         |  ELSE CAST(0 AS BIGINT) END) AS BIGINT)""".stripMargin
    val planted = if (!withPlanted) ""
    else s""",
       |ahp AS (SELECT a.media_id, ${hashAgg("enp")} AS phash
       |        FROM en a JOIN en b ON b.media_id = a.media_id AND b.w = a.w + 1
       |        WHERE a.w < 64 GROUP BY a.media_id)""".stripMargin
    s"""WITH am AS (
       |  SELECT doc_id AS media_id, hex(encode(text)) AS hx,
       |         CAST(octet_length(encode(text)) AS INT) AS ilen,
       |         CAST(n_chars % 200 + 50 AS INT) AS ns
       |  FROM documents WHERE doc_id % 3 = 1),
       |wn AS (
       |  SELECT media_id, hx, ilen, ns, CAST(t.w AS INT) AS w
       |  FROM am, range(0, 65) t(w)),
       |samp AS MATERIALIZED (
       |  SELECT media_id, w, $v AS v,
       |         CASE WHEN i = 0 THEN ($v + 1) % 65536 ELSE $v END AS vp
       |  FROM wn, unnest(generate_series(CAST((w*ns)//65 AS BIGINT),
       |                                  CAST(((w+1)*ns)//65 - 1 AS BIGINT))) t(i)),
       |en AS MATERIALIZED (
       |  SELECT wn.media_id, wn.w,
       |         COALESCE(s.en, 0) AS en, COALESCE(s.enp, 0) AS enp
       |  FROM wn LEFT JOIN (
       |    SELECT media_id, w, SUM(v) AS en, SUM(vp) AS enp
       |    FROM samp GROUP BY media_id, w) s
       |  ON s.media_id = wn.media_id AND s.w = wn.w),
       |ah AS (SELECT a.media_id, ${hashAgg("en")} AS phash
       |       FROM en a JOIN en b ON b.media_id = a.media_id AND b.w = a.w + 1
       |       WHERE a.w < 64 GROUP BY a.media_id)$planted""".stripMargin
  }

  /** Oracle for `audio_ahash`: the energy-delta hash of every synthetic
    * WAV, bit-exact from the PCM formulas. */
  def audioAhashOracle: String =
    s"""${ahashCtes(withPlanted = false)}
       |SELECT media_id, phash FROM ah ORDER BY media_id""".stripMargin

  /** Oracle for `ahash_near_dup`: exhaustive Hamming≤3 self-join over the
    * replayed hashes of originals ∪ planted one-LSB-perturbed copies
    * (ids +700000) — the banded Spark join is exactly this relation. */
  def ahashNearDupOracle: String =
    s"""${ahashCtes(withPlanted = true)},
       |allah AS (SELECT media_id, phash FROM ah
       |          UNION ALL SELECT media_id + 700000, phash FROM ahp),
       |pairs AS (
       |  SELECT x.media_id AS a, y.media_id AS b,
       |         CAST(bit_count(xor(x.phash, y.phash)) AS INT) AS hamming
       |  FROM allah x JOIN allah y ON x.media_id < y.media_id)
       |SELECT a, b, hamming FROM pairs WHERE hamming <= 3 ORDER BY a, b""".stripMargin

  // ------------------------------------------------------------- vhash
  // SQL replay of the video member of the delta-hash family:
  // per-frame energies (Σ unsigned plane bytes of each FRAME block, the
  // multimodal_frame_checksums byte formulas) → the 65-window delta hash
  // over the frame-energy sequence.

  /** Shared CTEs: per-video generator params → per-frame energies (`fe`,
    * with the frame-0 byte-0 perturbation as `enp`) → windowed energies
    * (`we`) → hash tables `vh` (+ `vhp` when planted). */
  private def vhashCtes(withPlanted: Boolean): String = {
    val b = "(CASE WHEN ilen > 0 THEN CAST(('0x' || substr(hx, CAST(2*((f*3*vw*vh + i) % ilen)+1 AS INT), 2)) AS INT) ELSE 0 END)"
    val b0 = "(CASE WHEN ilen > 0 THEN CAST(('0x' || substr(hx, 1, 2)) AS INT) ELSE 0 END)"
    def hashAgg(c: String) =
      s"""CAST(SUM(CASE WHEN b.$c > a.$c
         |  THEN CASE WHEN a.w = 63 THEN CAST('-9223372036854775808' AS BIGINT)
         |            ELSE (CAST(1 AS BIGINT) << CAST(a.w AS INT)) END
         |  ELSE CAST(0 AS BIGINT) END) AS BIGINT)""".stripMargin
    val planted = if (!withPlanted) ""
    else s""",
       |vhp AS (SELECT a.media_id, ${hashAgg("enp")} AS phash
       |        FROM we a JOIN we b ON b.media_id = a.media_id AND b.w = a.w + 1
       |        WHERE a.w < 64 GROUP BY a.media_id)""".stripMargin
    s"""WITH vm AS (
       |  SELECT doc_id AS media_id, hex(encode(text)) AS hx,
       |         CAST(octet_length(encode(text)) AS INT) AS ilen,
       |         CAST(n_chars % 16 + 1 AS INT) AS vw,
       |         CAST(n_chars % 8 + 1 AS INT) AS vh,
       |         CAST(n_chars % 100 AS INT) AS nf
       |  FROM documents WHERE doc_id % 3 = 2 AND n_chars % 100 >= 1),
       |fr AS (
       |  SELECT media_id, hx, ilen, vw, vh, nf, CAST(t.f AS INT) AS f
       |  FROM vm, unnest(generate_series(0, CAST(nf - 1 AS BIGINT))) t(f)),
       |fe AS MATERIALIZED (
       |  SELECT media_id, nf, f,
       |         SUM($b) AS en,
       |         SUM($b) + CASE WHEN f = 0 THEN (($b0 + 1) % 256 - $b0) ELSE 0 END AS enp
       |  FROM fr, unnest(generate_series(0, CAST(3*vw*vh - 1 AS BIGINT))) t(i)
       |  GROUP BY media_id, nf, f, hx, ilen),
       |vwn AS (SELECT media_id, CAST(t.w AS INT) AS w FROM vm, range(0, 65) t(w)),
       |we AS MATERIALIZED (
       |  SELECT vwn.media_id, vwn.w,
       |         COALESCE(SUM(fe.en), 0) AS en, COALESCE(SUM(fe.enp), 0) AS enp
       |  FROM vwn LEFT JOIN fe ON fe.media_id = vwn.media_id
       |    AND fe.f >= (vwn.w*fe.nf)//65 AND fe.f < ((vwn.w+1)*fe.nf)//65
       |  GROUP BY vwn.media_id, vwn.w),
       |vh AS (SELECT a.media_id, ${hashAgg("en")} AS phash
       |       FROM we a JOIN we b ON b.media_id = a.media_id AND b.w = a.w + 1
       |       WHERE a.w < 64 GROUP BY a.media_id)$planted""".stripMargin
  }

  /** Oracle for `video_vhash`: the frame-energy delta hash of every
    * synthetic Y4M with ≥1 frame, bit-exact. */
  def videoVhashOracle: String =
    s"""${vhashCtes(withPlanted = false)}
       |SELECT media_id, phash FROM vh ORDER BY media_id""".stripMargin

  /** Oracle for `vhash_near_dup`: exhaustive Hamming≤3 self-join over
    * originals ∪ planted frame-0 sub-pixel-perturbed copies (+800000). */
  def vhashNearDupOracle: String =
    s"""${vhashCtes(withPlanted = true)},
       |allvh AS (SELECT media_id, phash FROM vh
       |          UNION ALL SELECT media_id + 800000, phash FROM vhp),
       |pairs AS (
       |  SELECT x.media_id AS a, y.media_id AS b,
       |         CAST(bit_count(xor(x.phash, y.phash)) AS INT) AS hamming
       |  FROM allvh x JOIN allvh y ON x.media_id < y.media_id)
       |SELECT a, b, hamming FROM pairs WHERE hamming <= 3 ORDER BY a, b""".stripMargin

  /** Oracle for `streaming_phash_flag`: the streamed planted copies
    * (ids +600000) crossed against the stored originals — every pair
    * within Hamming 3, replayed exhaustively; the stateless
    * lowest-matching-band join must emit exactly this set. */
  def streamingPhashFlagOracle: String =
    s"""${phashCtes(withPlanted = true)}
       |SELECT p.media_id + 600000 AS media_id, o.media_id AS dup_of,
       |       CAST(bit_count(xor(p.phash, o.phash)) AS INT) AS hamming
       |FROM php p, ph o
       |WHERE bit_count(xor(p.phash, o.phash)) <= 3
       |ORDER BY media_id, dup_of""".stripMargin

  /** Oracle for `phash_keep`: the [[phashNearDupOracle]] pair replay
    * extended with the transitive closure ([[semanticDedupKeepOracle]]'s
    * recursive CTE) — survivors are every PNG id (original ∪ planted) not
    * a non-minimal member of a Hamming≤3 cluster. */
  def phashKeepOracle: String =
    s"""${phashCtes(withPlanted = true, recursive = true)},
       |allph AS (SELECT media_id, phash FROM ph
       |          UNION ALL SELECT media_id + 600000, phash FROM php),
       |p AS (SELECT x.media_id AS a, y.media_id AS b
       |      FROM allph x JOIN allph y ON x.media_id < y.media_id
       |      WHERE bit_count(xor(x.phash, y.phash)) <= 3),
       |eg AS (SELECT a, b FROM p UNION SELECT b, a FROM p),
       |reach(id, r) AS (
       |  SELECT a AS id, a AS r FROM eg
       |  UNION
       |  SELECT eg.a AS id, reach.r FROM eg JOIN reach ON reach.id = eg.b),
       |losers AS (
       |  SELECT id FROM (SELECT id, MIN(r) AS rep FROM reach GROUP BY id)
       |  WHERE id <> rep)
       |SELECT media_id FROM allph
       |WHERE media_id NOT IN (SELECT id FROM losers)
       |ORDER BY media_id""".stripMargin

  /** Oracle for `zorder_value`: the Morton interleave replayed as plain
    * BIGINT shift/and/or — dimension 0 (partkey rank) owns the
    * least-significant position of each bit group, exactly like
    * [[sources.Layout.interleaveBits]]. */
  def zorderValueOracle: String = {
    val bits = (0 until 8).flatMap { i =>
      Seq("l_partkey", "l_suppkey").zipWithIndex.map { case (c, j) =>
        s"(((($c % 256)::BIGINT >> $i) & 1) << ${i * 2 + j})"
      }
    }
    s"""SELECT l_orderkey, l_linenumber,
       |  ${bits.mkString(" | ")} AS zval
       |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin
  }

  /** Oracle for `quality_lr_train`: all 3 GD iterations replayed, final
    * weights named like the engine's output rows. */
  def qualityLrTrainOracle: String =
    s"""${learnCtes(3)}
       |SELECT feature, weight FROM (
       |  SELECT 'bias' AS feature, b AS weight FROM w3
       |  UNION ALL SELECT 'x1_tokens', w1 FROM w3
       |  UNION ALL SELECT 'x2_punct', w2 FROM w3
       |  UNION ALL SELECT 'x3_stop', w3 FROM w3)
       |ORDER BY feature""".stripMargin

  /** Oracle for `quality_lr_scores`: the trained weights applied through
    * the rational sigmoid `round6(0.5 + 0.5*(z/(1+|z|)))` — exp is not
    * cross-engine exact, the rational link is. */
  def qualityLrScoresOracle: String =
    s"""${learnCtes(3)}
       |SELECT doc_id, y AS label,
       |  round(0.5 + 0.5 * ((b + w1 * x1 + w2 * x2 + w3 * x3) / (1.0 + abs(b + w1 * x1 + w2 * x2 + w3 * x3))), 6) AS score,
       |  CASE WHEN round(0.5 + 0.5 * ((b + w1 * x1 + w2 * x2 + w3 * x3) / (1.0 + abs(b + w1 * x1 + w2 * x2 + w3 * x3))), 6) >= 0.5
       |       THEN 1 ELSE 0 END AS pred_label
       |FROM f, w3 ORDER BY doc_id""".stripMargin

  /** Oracle for `quality_weighted_sample`: the [[qualityLrScoresOracle]]
    * scoring replay composed with the `weighted_sample` A-ExpJ draw —
    * weight = the round-6 calibrated score floored at 1e-6 (a strongly
    * negative predictor quantizes the sigmoid to exactly 0.0; the floor
    * mirrors the engine so the draw stays defined and row-exact), key
    * `round(pow(u, 1.0/greatest(score, 1e-6)), 12)` in the exact shapes
    * the engine evaluates (u = (52-bit md5 prefix + 1) / 2⁵²). */
  def qualityWeightedSampleOracle: String =
    s"""${learnCtes(3)},
       |sc AS (SELECT doc_id, source,
       |         round(0.5 + 0.5 * ((b + w1 * x1 + w2 * x2 + w3 * x3) / (1.0 + abs(b + w1 * x1 + w2 * x2 + w3 * x3))), 6) AS score
       |       FROM f, w3),
       |dk AS (SELECT doc_id, source, score,
       |         round(pow(
       |           (CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13)) AS BIGINT) + 1)
       |             / 4503599627370496.0,
       |           1.0 / greatest(score, 0.000001)), 12) AS k
       |       FROM sc),
       |rk AS (SELECT doc_id, source, score,
       |         ROW_NUMBER() OVER (PARTITION BY source ORDER BY k DESC, doc_id) AS rn
       |       FROM dk)
       |SELECT doc_id, source, score FROM rk WHERE rn <= 10 ORDER BY doc_id""".stripMargin

  /** Oracle for `streaming_quality_score`: [[qualityLrScoresOracle]]
    * restricted to the streamed id slice — training still sees the FULL
    * corpus (the engine trains batch-side before streaming). */
  def streamingQualityScoreOracle: String =
    s"""${learnCtes(3)}
       |SELECT doc_id, y AS label,
       |  round(0.5 + 0.5 * ((b + w1 * x1 + w2 * x2 + w3 * x3) / (1.0 + abs(b + w1 * x1 + w2 * x2 + w3 * x3))), 6) AS score,
       |  CASE WHEN round(0.5 + 0.5 * ((b + w1 * x1 + w2 * x2 + w3 * x3) / (1.0 + abs(b + w1 * x1 + w2 * x2 + w3 * x3))), 6) >= 0.5
       |       THEN 1 ELSE 0 END AS pred_label
       |FROM f, w3 WHERE doc_id < 100 ORDER BY doc_id""".stripMargin

  /** Oracle for `quality_calibration`: the [[qualityLrScoresOracle]]
    * score replay binned into 0.002-wide buckets (score 1.0 clamps into bin 499) with
    * exact-decimal per-bin mean scores. */
  def qualityCalibrationOracle: String =
    s"""${learnCtes(3)},
       |sc AS (SELECT doc_id, y,
       |  round(0.5 + 0.5 * ((b + w1 * x1 + w2 * x2 + w3 * x3) / (1.0 + abs(b + w1 * x1 + w2 * x2 + w3 * x3))), 6) AS score
       |  FROM f, w3),
       |bn AS (SELECT least(CAST(floor(score * 500) AS INT), 499) AS bin, y, score FROM sc)
       |SELECT bin, COUNT(*) AS n, CAST(SUM(y) AS BIGINT) AS positives,
       |  round(CAST(SUM(CAST(score AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6) AS mean_score,
       |  round(SUM(y) / CAST(COUNT(*) AS DOUBLE), 6) AS pos_rate
       |FROM bn GROUP BY bin ORDER BY bin""".stripMargin

  /** Oracle for `calibration_threshold`: the [[qualityCalibrationOracle]]
    * bin table extended with suffix sums over occupied bins, round-6
    * precision/recall, F1 from the round-6 operands, and the argmax-F1 /
    * lowest-edge tie-break pick — the full decision replayed in SQL. */
  def calibrationThresholdOracle: String =
    s"""${learnCtes(3)},
       |sc AS (SELECT doc_id, y,
       |  round(0.5 + 0.5 * ((b + w1 * x1 + w2 * x2 + w3 * x3) / (1.0 + abs(b + w1 * x1 + w2 * x2 + w3 * x3))), 6) AS score
       |  FROM f, w3),
       |cal AS (
       |  SELECT least(CAST(floor(score * 500) AS INT), 499) AS bin,
       |         COUNT(*) AS n, CAST(SUM(y) AS BIGINT) AS positives
       |  FROM sc GROUP BY 1),
       |tot AS (SELECT CAST(SUM(positives) AS BIGINT) AS total_pos FROM cal),
       |cand AS (
       |  SELECT bin, round(CAST(bin AS DOUBLE) / 500, 6) AS threshold,
       |         CAST(SUM(n) OVER (ORDER BY bin DESC) AS BIGINT) AS kept,
       |         CAST(SUM(positives) OVER (ORDER BY bin DESC) AS BIGINT) AS kept_pos
       |  FROM cal),
       |pr AS (
       |  SELECT bin, threshold, kept, kept_pos,
       |         round(CAST(kept_pos AS DOUBLE) / kept, 6) AS "precision",
       |         round(CASE WHEN total_pos > 0
       |                    THEN CAST(kept_pos AS DOUBLE) / total_pos
       |                    ELSE 0.0 END, 6) AS recall
       |  FROM cand, tot),
       |f1t AS (
       |  SELECT bin, threshold, "precision", recall,
       |         CASE WHEN "precision" + recall > 0
       |              THEN round(2.0 * "precision" * recall / ("precision" + recall), 6)
       |              ELSE 0.0 END AS f1,
       |         kept, kept_pos
       |  FROM pr)
       |SELECT bin, threshold, "precision", recall, f1, kept, kept_pos
       |FROM f1t ORDER BY f1 DESC, bin ASC LIMIT 1""".stripMargin

  /** Oracle for `trigram_search`: trigram postings, needle-gram
    * intersection, and the exact contains verify — gram list derived from
    * the SAME needle string the engine query uses. */
  def trigramSearchOracle(needle: String): String = {
    val grams = needle.toLowerCase.sliding(3).toSeq.distinct
    val vals = grams.map(g => s"('${g.replace("'", "''")}')").mkString(", ")
    val lit = needle.toLowerCase.replace("'", "''")
    s"""WITH g(gram) AS (VALUES $vals),
       |p AS MATERIALIZED (
       |  SELECT DISTINCT doc_id,
       |         unnest(list_transform(range(1, greatest(len(t) - 1, 1)),
       |                               i -> substr(t, CAST(i AS INT), 3))) AS gram
       |  FROM (SELECT doc_id, lower(text) AS t FROM documents) d),
       |cand AS (
       |  SELECT doc_id FROM p JOIN g USING (gram)
       |  GROUP BY doc_id HAVING COUNT(DISTINCT gram) = ${grams.size})
       |SELECT d.doc_id,
       |       position('$lit' IN lower(d.text)) > 0 AS verified
       |FROM documents d JOIN cand USING (doc_id)
       |ORDER BY d.doc_id""".stripMargin
  }

  /** Shared CTEs for the `pca_*` oracles: clean vectors → positional
    * explode with 6-decimal input quantization (products of 6-decimal
    * values are EXACT 12-decimal grid values, so the per-row round12 is
    * engine-agnostic — see [[operators.Pca.moments]]) → decimal-exact mean
    * and second-moment sums → `cov_ij = round12(s_ij/n - μ_i μ_j)` →
    * `iters` power iterates from the deterministic `round12(1/√d)` start.
    * sqrt is IEEE-correctly-rounded, so the normalization (and therefore
    * every iterate, sign included) replays the driver arithmetic
    * bit-for-bit. */
  /** Power-iterate CTE chain over `matrix` (columns i, j, c) with CTE
    * names `<prefix>0..<prefix>iters` — the quantized-operand iterate
    * shape [[operators.Pca.powerIteration]] evaluates. */
  private def pcaIterCtes(matrix: String, prefix: String, dim: Int, iters: Int): String = {
    val p0 = s"""${prefix}0 AS (SELECT i, round(1.0 / sqrt(CAST($dim AS DOUBLE)), 12) AS pv FROM mu)"""
    val its = (1 to iters).map { k =>
      s"""${prefix}y$k AS MATERIALIZED (SELECT c.i, CAST(SUM(CAST(round(round(c.c, 6) * round(p.pv, 6), 12) AS DECIMAL(30,12))) AS DOUBLE) AS y
         |  FROM $matrix c JOIN $prefix${k - 1} p ON p.i = c.j GROUP BY c.i),
         |${prefix}n$k AS (SELECT round(sqrt(CAST(SUM(CAST(round(y * y, 12) AS DECIMAL(30,12))) AS DOUBLE)), 12) AS nv FROM ${prefix}y$k),
         |$prefix$k AS MATERIALIZED (SELECT i, round(y / (SELECT nv FROM ${prefix}n$k), 12) AS pv FROM ${prefix}y$k)""".stripMargin
    }
    (p0 +: its).mkString(",\n")
  }

  private def pcaCtes(dim: Int, iters: Int,
                      from: String = "embeddings"): String = {
    s"""WITH v AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
       |  FROM $from
       |  WHERE len(embedding) = $dim
       |    AND len(list_filter(embedding, x -> isnan(x) OR isinf(x))) = 0),
       |ncnt AS (SELECT COUNT(*) AS cnt FROM v),
       |ex AS MATERIALIZED (SELECT vec_id, CAST(t.i - 1 AS INT) AS i, round(e[CAST(t.i AS INT)], 6) AS x
       |       FROM v, range(1, ${dim + 1}) t(i)),
       |mu AS (SELECT i, round(CAST(SUM(CAST(round(x, 12) AS DECIMAL(30,12))) AS DOUBLE)
       |                       / (SELECT cnt FROM ncnt), 12) AS mu
       |       FROM ex GROUP BY i),
       |sp AS MATERIALIZED (SELECT a.i, b.i AS j, CAST(SUM(CAST(round(a.x * b.x, 12) AS DECIMAL(30,12))) AS DOUBLE) AS s
       |       FROM ex a JOIN ex b ON a.vec_id = b.vec_id GROUP BY a.i, b.i),
       |cov AS MATERIALIZED (SELECT s.i, s.j, round(s.s / (SELECT cnt FROM ncnt) - m1.mu * m2.mu, 12) AS c
       |        FROM sp s JOIN mu m1 ON m1.i = s.i JOIN mu m2 ON m2.i = s.j),
       |${pcaIterCtes("cov", "p", dim, iters)}""".stripMargin
  }

  /** Oracle for `pca_power_component`: the third power iterate (i, loading). */
  def pcaPowerComponentOracle: String =
    s"""${pcaCtes(64, 3)}
       |SELECT i, pv AS loading FROM p3 ORDER BY i""".stripMargin

  /** Oracle for `pca_moments_append`: the engine derives the component
    * from MERGED persisted moment artifacts (base + the %37 shifted-id
    * delta); integer moment sums are additive, so the merged derivation
    * must equal a from-scratch power chain over the UNION — which is what
    * this replays ([[pcaCtes]] with the union source). */
  def pcaMomentsAppendOracle: String =
    s"""${pcaCtes(64, 3,
           from = """(SELECT vec_id, embedding FROM embeddings
                     | UNION ALL
                     | SELECT vec_id + 1000000, embedding FROM embeddings
                     | WHERE vec_id % 37 = 0)""".stripMargin)}
       |SELECT i, pv AS loading FROM p3 ORDER BY i""".stripMargin

  /** Oracle for `pca_second_component`: Hotelling deflation replayed —
    * Rayleigh quotient λ from the converged first iterate, then
    * `C' = round12(c6 − round12(λ6 · round12(v6 v6ᵀ)))` and a fresh power
    * chain over C' (the quantized-operand shapes of
    * [[operators.Pca.deflate]], term for term). */
  def pcaSecondComponentOracle: String =
    s"""${pcaCtes(64, 3)},
       |yv AS MATERIALIZED (SELECT c.i, CAST(SUM(CAST(round(round(c.c, 6) * round(p.pv, 6), 12) AS DECIMAL(30,12))) AS DOUBLE) AS y
       |  FROM cov c JOIN p3 p ON p.i = c.j GROUP BY c.i),
       |lam AS (SELECT CAST(SUM(CAST(round(round(p.pv, 6) * y.y, 12) AS DECIMAL(30,12))) AS DOUBLE) AS l
       |  FROM yv y JOIN p3 p ON p.i = y.i),
       |cov2 AS MATERIALIZED (SELECT c.i, c.j,
       |    round(round(c.c, 6) - round(round((SELECT l FROM lam), 6) * round(round(pa.pv, 6) * round(pb.pv, 6), 12), 12), 12) AS c
       |  FROM cov c JOIN p3 pa ON pa.i = c.i JOIN p3 pb ON pb.i = c.j),
       |${pcaIterCtes("cov2", "q", 64, 3)}
       |SELECT i, pv AS loading FROM q3 ORDER BY i""".stripMargin

  /** Oracle for `pca_variance_share`: the Rayleigh quotient λ (from the
    * converged first iterate, [[pcaSecondComponentOracle]]'s lam CTE) over
    * the exact-decimal covariance trace. */
  def pcaVarianceShareOracle: String =
    s"""${pcaCtes(64, 3)},
       |yv AS MATERIALIZED (SELECT c.i, CAST(SUM(CAST(round(round(c.c, 6) * round(p.pv, 6), 12) AS DECIMAL(30,12))) AS DOUBLE) AS y
       |  FROM cov c JOIN p3 p ON p.i = c.j GROUP BY c.i),
       |lam AS (SELECT CAST(SUM(CAST(round(round(p.pv, 6) * y.y, 12) AS DECIMAL(30,12))) AS DOUBLE) AS l
       |  FROM yv y JOIN p3 p ON p.i = y.i),
       |tr AS (SELECT CAST(SUM(CAST(c AS DECIMAL(30,12))) AS DOUBLE) AS t FROM cov WHERE i = j)
       |SELECT (SELECT l FROM lam) AS lambda, (SELECT t FROM tr) AS trace,
       |       round((SELECT l FROM lam) / (SELECT t FROM tr), 6) AS share""".stripMargin

  /** Oracle for `pca_project`: every clean vector's exact-decimal dot
    * product against the third power iterate. */
  def pcaProjectOracle: String =
    s"""${pcaCtes(64, 3)},
       |p6 AS (SELECT i, round(pv, 6) AS pv6 FROM p3)
       |SELECT ex.vec_id,
       |       round(CAST(SUM(CAST(round(ex.x * p.pv6, 12) AS DECIMAL(30,12))) AS DOUBLE), 12) AS proj
       |FROM ex JOIN p6 p ON p.i = ex.i
       |GROUP BY ex.vec_id ORDER BY ex.vec_id""".stripMargin

  /** Oracle for `streaming_pca_project`: the [[pcaProjectOracle]] replay
    * restricted to the streamed id slice — the component still derives
    * from the FULL corpus (the engine reloads the persisted full-corpus
    * moment artifact before streaming). */
  def streamingPcaProjectOracle: String =
    s"""${pcaCtes(64, 3)},
       |p6 AS (SELECT i, round(pv, 6) AS pv6 FROM p3)
       |SELECT ex.vec_id,
       |       round(CAST(SUM(CAST(round(ex.x * p.pv6, 12) AS DECIMAL(30,12))) AS DOUBLE), 12) AS proj
       |FROM ex JOIN p6 p ON p.i = ex.i
       |WHERE ex.vec_id % 5 = 0
       |GROUP BY ex.vec_id ORDER BY ex.vec_id""".stripMargin

  /** Oracle for `trending_decay`: the SAME driver-computed micro-unit
    * weight table ([[operators.EventAnalytics.decayWeightsMicro]])
    * embedded as VALUES — weights are shared data, not replayed math, so
    * there is no cross-engine pow anywhere. */
  def trendingDecayOracle: String = {
    val wt = operators.EventAnalytics.decayWeightsMicro(7, 60)
      .zipWithIndex.map { case (w, d) => s"($d, $w)" }.mkString(", ")
    s"""WITH wt(age, w) AS (VALUES $wt),
       |d AS MATERIALIZED (
       |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS "day", COUNT(*) AS y
       |  FROM events GROUP BY 1, 2),
       |x AS (SELECT event_type, y,
       |        date_diff('day', "day", (SELECT MAX("day") FROM d)) AS age
       |      FROM d),
       |a AS (SELECT x.event_type, CAST(SUM(x.y) AS BIGINT) AS raw_n,
       |        CAST(SUM(CASE WHEN x.age <= 60 THEN x.y * wt.w ELSE 0 END) AS BIGINT) AS units
       |      FROM x LEFT JOIN wt ON wt.age = x.age GROUP BY 1)
       |SELECT event_type, raw_n,
       |       round(CAST(units AS DOUBLE) / 1e6, 6) AS decayed
       |FROM a ORDER BY decayed DESC, event_type""".stripMargin
  }

  /** Oracle for `hits_trade`: both HITS iterations replayed — authority
    * raw sums from hub scores over out-edges, hub raw sums from authority
    * scores over in-edges, each L2-normalized
    * (`round12(√Σ round12(raw²))`, sqrt IEEE-exact) and re-rounded, the
    * exact shapes [[operators.Graph.hits]] evaluates. */
  def hitsTradeOracle: String = {
    val iters = 2
    val iterCtes = (1 to iters).map { k =>
      s"""ar$k AS MATERIALIZED (
         |  SELECT e.dst AS node, CAST(SUM(CAST(round(p.hub, 12) AS DECIMAL(30,12))) AS DOUBLE) AS raw
         |  FROM h${k - 1} p JOIN edges e ON e.src = p.node GROUP BY e.dst),
         |an$k AS (SELECT round(sqrt(CAST(SUM(CAST(round(raw * raw, 12) AS DECIMAL(30,12))) AS DOUBLE)), 12) AS nv FROM ar$k),
         |a$k AS MATERIALIZED (
         |  SELECT nn.node, round(COALESCE(r.raw, 0.0) / (SELECT nv FROM an$k), 12) AS auth
         |  FROM nodes nn LEFT JOIN ar$k r ON r.node = nn.node),
         |hr$k AS MATERIALIZED (
         |  SELECT e.src AS node, CAST(SUM(CAST(round(p.auth, 12) AS DECIMAL(30,12))) AS DOUBLE) AS raw
         |  FROM a$k p JOIN edges e ON e.dst = p.node GROUP BY e.src),
         |hn$k AS (SELECT round(sqrt(CAST(SUM(CAST(round(raw * raw, 12) AS DECIMAL(30,12))) AS DOUBLE)), 12) AS nv FROM hr$k),
         |h$k AS MATERIALIZED (
         |  SELECT nn.node, round(COALESCE(r.raw, 0.0) / (SELECT nv FROM hn$k), 12) AS hub
         |  FROM nodes nn LEFT JOIN hr$k r ON r.node = nn.node)""".stripMargin
    }
    s"""WITH oc AS (
       |  SELECT DISTINCT o_custkey AS ck, l_suppkey AS sk
       |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
       |  WHERE year(o_orderdate) = 1995),
       |edges AS (SELECT CAST(ck AS BIGINT) AS src, -1 - CAST(sk AS BIGINT) AS dst FROM oc),
       |nodes AS (SELECT DISTINCT src AS node FROM edges UNION SELECT DISTINCT dst FROM edges),
       |ncnt AS (SELECT COUNT(*) AS cnt FROM nodes),
       |h0 AS (SELECT node, round(1.0 / sqrt(CAST((SELECT cnt FROM ncnt) AS DOUBLE)), 12) AS hub FROM nodes),
       |${iterCtes.mkString(",\n")}
       |SELECT h$iters.node, h$iters.hub, a$iters.auth
       |FROM h$iters JOIN a$iters USING (node) ORDER BY node""".stripMargin
  }

  /** Oracle for `mmr_select`: every greedy MMR step replayed — step 1 is
    * the pure-relevance argmax, step m ≥ 2 scores
    * `round6(0.5·rel − 0.5·greatest(cos6 to each selected))` over the
    * not-yet-selected pool with ties to the lower id, exactly the shapes
    * [[operators.Similarity.mmrSelect]] evaluates. */
  def mmrSelectOracle: String = {
    val k = 5
    val steps = (2 to k).map { m =>
      val prev = 1 until m
      s"""b$m AS MATERIALIZED (SELECT b.id, b.e, b.rel,
         |    greatest(${prev.map(j => s"round(${duckCos("b.e", s"s$j.e")}, 6)").mkString(", ")}) AS ms
         |  FROM base b, ${prev.map(j => s"s$j").mkString(", ")}
         |  WHERE b.id NOT IN (${prev.map(j => s"s$j.id").mkString(", ")})),
         |s$m AS MATERIALIZED (SELECT id, e, round(0.5 * rel - 0.5 * ms, 6) AS s
         |  FROM b$m ORDER BY s DESC, id LIMIT 1)""".stripMargin
    }
    s"""WITH v AS MATERIALIZED (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
       |  FROM embeddings
       |  WHERE len(embedding) = 64
       |    AND len(list_filter(embedding, x -> isnan(x) OR isinf(x))) = 0),
       |q AS (SELECT e FROM v WHERE vec_id = 0),
       |base AS MATERIALIZED (SELECT v.vec_id AS id, v.e, round(${duckCos("v.e", "q.e")}, 6) AS rel
       |  FROM v, q WHERE v.vec_id > 0),
       |s1 AS MATERIALIZED (SELECT id, e, rel AS s FROM base ORDER BY rel DESC, id LIMIT 1),
       |${steps.mkString(",\n")}
       |SELECT rnk, id, score FROM (
       |  ${(1 to k).map(m => s"SELECT $m AS rnk, id, s AS score FROM s$m").mkString("\n  UNION ALL ")})
       |ORDER BY rnk""".stripMargin
  }

  /** Oracle for `ann_then_mmr`: the [[annIvfTopkOracle]] derivation
    * (centroid pick, assignment, probes) restricted to the vec_id-0
    * query and ranked to a top-50 shortlist, composed with the
    * [[mmrSelectOracle]] greedy replay whose base is that shortlist —
    * the full ANN→rerank pipeline re-derived from the parquet table. */
  def annThenMmrOracle: String = {
    val (nlist, nprobe, kAnn, k) = (16, 4, 50, 5)
    val steps = (2 to k).map { m =>
      val prev = 1 until m
      s"""b$m AS MATERIALIZED (SELECT b.id, b.e, b.rel,
         |    greatest(${prev.map(j => s"round(${duckCos("b.e", s"s$j.e")}, 6)").mkString(", ")}) AS ms
         |  FROM base b, ${prev.map(j => s"s$j").mkString(", ")}
         |  WHERE b.id NOT IN (${prev.map(j => s"s$j.id").mkString(", ")})),
         |s$m AS MATERIALIZED (SELECT id, e, round(0.5 * rel - 0.5 * ms, 6) AS s
         |  FROM b$m ORDER BY s DESC, id LIMIT 1)""".stripMargin
    }
    s"""WITH v AS MATERIALIZED (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e FROM embeddings),
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
       |    FROM ccos WHERE vec_id = 0) WHERE rn <= $nprobe),
       |cand AS (
       |  SELECT p.qid, a.vec_id AS cid
       |  FROM probe p JOIN assign a ON a.list_id = p.list_id
       |  WHERE a.vec_id <> p.qid),
       |scand AS (
       |  SELECT cand.cid, round(${duckCos("q.e", "c.e")}, 6) AS cos
       |  FROM cand JOIN v q ON q.vec_id = cand.qid JOIN v c ON c.vec_id = cand.cid),
       |short AS (SELECT cid FROM (
       |    SELECT cid, ROW_NUMBER() OVER (ORDER BY cos DESC, cid ASC) AS rnk FROM scand)
       |  WHERE rnk <= $kAnn),
       |qv AS (SELECT e FROM v WHERE vec_id = 0),
       |base AS MATERIALIZED (SELECT v.vec_id AS id, v.e, round(${duckCos("v.e", "qv.e")}, 6) AS rel
       |  FROM v, qv WHERE v.vec_id IN (SELECT cid FROM short)),
       |s1 AS MATERIALIZED (SELECT id, e, rel AS s FROM base ORDER BY rel DESC, id LIMIT 1),
       |${steps.mkString(",\n")}
       |SELECT rnk, id, score FROM (
       |  ${(1 to k).map(m => s"SELECT $m AS rnk, id, s AS score FROM s$m").mkString("\n  UNION ALL ")})
       |ORDER BY rnk""".stripMargin
  }

  /** Oracle for `pagerank_personalized`: the [[pagerankTradeOracle]]
    * replay with the teleport term and start vector restricted to the
    * seed set (nation-7 customers) — isolated seeds and zero-start
    * non-seeds included, the exact CASE shapes the operator evaluates. */
  def pagerankPersonalizedOracle: String = {
    val iters = 2
    val tp = "CASE WHEN nn.node IN (SELECT node FROM seeds) " +
      "THEN (1.0 - 0.85) / (SELECT cnt FROM scnt) ELSE 0.0 END"
    val iterCtes = (1 to iters).map { k =>
      s"""pr$k AS (
         |  SELECT nn.node,
         |         round($tp + 0.85 * COALESCE(s.c, 0.0), 12) AS pr
         |  FROM nodes nn LEFT JOIN (
         |    SELECT e.dst AS node,
         |           CAST(SUM(CAST(round(p.pr / o.deg, 12) AS DECIMAL(30,12))) AS DOUBLE) AS c
         |    FROM pr${k - 1} p JOIN outdeg o ON o.src = p.node JOIN edges e ON e.src = p.node
         |    GROUP BY e.dst) s ON s.node = nn.node)""".stripMargin
    }
    s"""WITH oc AS (
       |  SELECT DISTINCT o_custkey AS ck, l_suppkey AS sk
       |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
       |  WHERE year(o_orderdate) = 1996),
       |edges AS (
       |  SELECT CAST(ck AS BIGINT) AS src, -1 - CAST(sk AS BIGINT) AS dst FROM oc
       |  UNION
       |  SELECT -1 - CAST(sk AS BIGINT), CAST(ck AS BIGINT) FROM oc),
       |seeds AS (SELECT CAST(c_custkey AS BIGINT) AS node FROM customer WHERE c_nationkey = 7),
       |scnt AS (SELECT COUNT(*) AS cnt FROM seeds),
       |nodes AS (SELECT DISTINCT src AS node FROM edges
       |          UNION SELECT DISTINCT dst FROM edges
       |          UNION SELECT node FROM seeds),
       |outdeg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
       |pr0 AS (SELECT node,
       |          CASE WHEN node IN (SELECT node FROM seeds)
       |               THEN round(1.0 / (SELECT cnt FROM scnt), 12) ELSE 0.0 END AS pr
       |        FROM nodes),
       |${iterCtes.mkString(",\n")}
       |SELECT node, pr FROM pr$iters ORDER BY node""".stripMargin
  }

  /** Oracle for `label_propagation`: the 1996 both-direction trade-edge
    * derivation (cf. [[pagerankPersonalizedOracle]]) + all 3 synchronous
    * LPA rounds — per round, in-neighbor label counts and the
    * (count DESC, label ASC) row_number argmax, with a left join keeping
    * the previous label for nodes the round leaves unlabeled (on the
    * both-direction graph every node has in-edges, so the branch is
    * structural, exactly like the engine's coalesce). `l{k}` is
    * referenced by both the next round's count and its keep-previous
    * join, hence MATERIALIZED. */
  /** The synchronous-LPA round CTE chain shared by the graph and dedup
    * community oracles: expects `edges(src, dst)` and `nodes(node)` CTEs
    * upstream, produces `l0..l{iters}` (id, lbl). Per round: in-neighbor
    * label counts, the (count DESC, label ASC) row_number argmax, and a
    * keep-previous left join — exactly [[operators.Graph.labelPropagation]]. */
  private def lpaRoundCtes(iters: Int, vote: String = "COUNT(*)"): String = {
    val l0 = """l0 AS MATERIALIZED (SELECT node AS id, node AS lbl FROM nodes)"""
    val rounds = (1 to iters).map { k =>
      s"""c$k AS (SELECT e.dst AS id, l.lbl, $vote AS c
         |  FROM edges e JOIN l${k - 1} l ON l.id = e.src GROUP BY 1, 2),
         |l$k AS MATERIALIZED (
         |  SELECT n.node AS id, COALESCE(a.lbl, p.lbl) AS lbl
         |  FROM nodes n JOIN l${k - 1} p ON p.id = n.node
         |  LEFT JOIN (SELECT id, lbl FROM (
         |      SELECT id, lbl,
         |             ROW_NUMBER() OVER (PARTITION BY id ORDER BY c DESC, lbl ASC) AS rn
         |      FROM c$k) WHERE rn = 1) a ON a.id = n.node)""".stripMargin
    }
    (l0 +: rounds).mkString(",\n")
  }

  def labelPropagationOracle: String = {
    val iters = 3
    s"""WITH oc AS (
       |  SELECT DISTINCT o_custkey AS ck, l_suppkey AS sk
       |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
       |  WHERE year(o_orderdate) = 1996),
       |edges AS MATERIALIZED (
       |  SELECT CAST(ck AS BIGINT) AS src, -1 - CAST(sk AS BIGINT) AS dst FROM oc
       |  UNION
       |  SELECT -1 - CAST(sk AS BIGINT), CAST(ck AS BIGINT) FROM oc),
       |nodes AS MATERIALIZED (SELECT DISTINCT src AS node FROM edges
       |          UNION SELECT DISTINCT dst FROM edges),
       |${lpaRoundCtes(iters)}
       |SELECT id AS node, lbl AS label FROM l$iters ORDER BY node""".stripMargin
  }

  /** Oracle for `label_propagation_weighted`: the weighted 1995 edge
    * derivation (lineitem count per (customer, supplier), both
    * directions — the `pagerank_weighted` slice) + 2 LPA rounds with
    * votes = SUM of integer edge weights instead of COUNT(*); argmax,
    * tie-break and keep-previous shapes identical to the unweighted
    * replay. */
  def labelPropagationWeightedOracle: String = {
    val iters = 2
    s"""WITH pw AS (
       |  SELECT o_custkey AS ck, l_suppkey AS sk, COUNT(*) AS w
       |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
       |  WHERE year(o_orderdate) = 1995 GROUP BY 1, 2),
       |edges AS MATERIALIZED (
       |  SELECT CAST(ck AS BIGINT) AS src, -1 - CAST(sk AS BIGINT) AS dst, w FROM pw
       |  UNION ALL
       |  SELECT -1 - CAST(sk AS BIGINT), CAST(ck AS BIGINT), w FROM pw),
       |nodes AS MATERIALIZED (SELECT DISTINCT src AS node FROM edges
       |          UNION SELECT DISTINCT dst FROM edges),
       |${lpaRoundCtes(iters, vote = "CAST(SUM(e.w) AS BIGINT)")}
       |SELECT id AS node, lbl AS label FROM l$iters ORDER BY node""".stripMargin
  }

  /** Oracle for `dup_communities`: the dup_clusters near-dup pair
    * derivation (planted 3/4-truncations, 2-gram exact Jaccard >= 0.5)
    * re-expressed as a both-direction edge set, then [[lpaRoundCtes]] —
    * LPA applied to the dedup domain, every round replayed. */
  def dupCommunitiesOracle: String = {
    val iters = 2
    s"""WITH src AS (SELECT doc_id, text FROM documents WHERE doc_id % 5 = 0),
       |d0 AS (
       |  SELECT doc_id, text FROM src
       |  UNION ALL
       |  SELECT doc_id + 100000 AS doc_id,
       |         array_to_string(list_slice(string_split_regex(trim(lower(text)), '\\s+'), 1,
       |           greatest(CAST(floor(len(string_split_regex(trim(lower(text)), '\\s+')) * 3 / 4) AS INT), 1)), ' ') AS text
       |  FROM src),
       |sh AS (
       |  SELECT doc_id,
       |         list_distinct(list_transform(range(1, len(string_split_regex(trim(lower(text)), '\\s+')) - 1),
       |           i -> array_to_string((string_split_regex(trim(lower(text)), '\\s+'))[i:i+2], ' '))) AS sh
       |  FROM d0
       |  WHERE len(string_split_regex(trim(lower(text)), '\\s+')) >= 3),
       |p AS (
       |  SELECT a.doc_id AS a, b.doc_id AS b
       |  FROM sh a, sh b
       |  WHERE a.doc_id < b.doc_id
       |    AND CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
       |        / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.5),
       |edges AS MATERIALIZED (SELECT a AS src, b AS dst FROM p UNION SELECT b, a FROM p),
       |nodes AS MATERIALIZED (SELECT DISTINCT src AS node FROM edges
       |          UNION SELECT DISTINCT dst FROM edges),
       |${lpaRoundCtes(iters)}
       |SELECT id AS node, lbl AS label FROM l$iters ORDER BY node""".stripMargin
  }

  /** Shared CTE chain for the entity-resolution oracles
    * (`entity_match_pairs`, `entity_resolution`): the distinct part-name
    * dictionary (whitespace-collapsed lower-trimmed names with counts and
    * min-id reps), multi-key blocking (prefix-3 and '$'-prefixed
    * suffix-3; names shorter than 3 block on themselves), the
    * block-size-1000 coverage cap, and the distinct candidate pair set —
    * the exact EntityResolution.fuzzyMatchPairs pipeline. Multiply
    * referenced frames are AS MATERIALIZED (DuckDB re-inlines otherwise). */
  def entityCandCtes: String =
    """names AS MATERIALIZED (
      |  SELECT regexp_replace(trim(lower(p_name)), '\s+', ' ', 'g') AS nm,
      |         COUNT(*) AS cnt, MIN(CAST(p_partkey AS BIGINT)) AS rep
      |  FROM part
      |  WHERE regexp_replace(trim(lower(p_name)), '\s+', ' ', 'g') <> ''
      |  GROUP BY 1),
      |blk AS (
      |  SELECT nm, cnt, rep, substr(nm, 1, 3) AS bk FROM names
      |  UNION ALL
      |  SELECT nm, cnt, rep,
      |         '$' || CASE WHEN length(nm) >= 3
      |                     THEN substr(nm, length(nm) - 2, 3) ELSE nm END AS bk
      |  FROM names),
      |capped AS MATERIALIZED (
      |  SELECT nm, cnt, rep, bk FROM (
      |    SELECT *, COUNT(*) OVER (PARTITION BY bk) AS bsz FROM blk)
      |  WHERE bsz <= 1000),
      |cand AS MATERIALIZED (
      |  SELECT DISTINCT a.nm AS nm_a, b.nm AS nm_b,
      |         a.cnt AS cnt_a, b.cnt AS cnt_b,
      |         a.rep AS rep_a, b.rep AS rep_b
      |  FROM capped a JOIN capped b ON a.bk = b.bk AND a.nm < b.nm)""".stripMargin

  /** Oracle for `trade_components`: the strong-1995-trade pair set
    * (>= 2 lineitems per (customer, supplier)) closed transitively with a
    * recursive CTE — min reachable id per node, the dup_clusters oracle
    * shape on a second domain. The thresholded graph is hundreds of
    * pairs at any gate scale, so the closure is cheap. */
  def tradeComponentsOracle: String =
    """WITH RECURSIVE p AS (
      |  SELECT CAST(o_custkey AS BIGINT) AS a, -1 - CAST(l_suppkey AS BIGINT) AS b
      |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
      |  WHERE year(o_orderdate) = 1995
      |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
      |e AS (SELECT a, b FROM p UNION SELECT b, a FROM p),
      |reach(id, r) AS (
      |  SELECT a AS id, a AS r FROM e
      |  UNION
      |  SELECT e.a AS id, reach.r FROM e JOIN reach ON reach.id = e.b)
      |SELECT id, MIN(r) AS cluster_rep FROM reach GROUP BY id ORDER BY id""".stripMargin

  /** Oracle for `supplier_triangles`: the co-occurrence graph (supplier
    * pairs sharing >= 3 distinct 1995 customers) closed into canonical
    * u<v<w triangles by a three-way self-join, unnested to per-node
    * counts, with the engine's exact coefficient shape
    * `round6(2.0·t / (d·(d−1.0)))`. Orientation-free here — the replay
    * uses id-canonical edges; triangle membership is
    * orientation-independent, so the counts agree with the engine's
    * degree-ordered enumeration. */
  def supplierTrianglesOracle: String =
    """WITH p AS (
      |  SELECT DISTINCT o_custkey AS ck, l_suppkey AS sk
      |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
      |  WHERE year(o_orderdate) = 1995),
      |cp AS MATERIALIZED (
      |  SELECT CAST(a.sk AS BIGINT) AS u, CAST(b.sk AS BIGINT) AS v
      |  FROM p a JOIN p b ON a.ck = b.ck AND a.sk < b.sk
      |  GROUP BY 1, 2 HAVING COUNT(*) >= 3),
      |deg AS (SELECT n, COUNT(*) AS d FROM (
      |    SELECT u AS n FROM cp UNION ALL SELECT v FROM cp) GROUP BY n),
      |tri AS MATERIALIZED (
      |  SELECT t1.u AS a, t1.v AS b, t2.v AS c
      |  FROM cp t1 JOIN cp t2 ON t2.u = t1.v
      |       JOIN cp t3 ON t3.u = t1.u AND t3.v = t2.v),
      |tc AS (SELECT n, COUNT(*) AS t FROM (
      |    SELECT a AS n FROM tri UNION ALL SELECT b FROM tri
      |    UNION ALL SELECT c FROM tri) GROUP BY n)
      |SELECT deg.n AS node, COALESCE(tc.t, 0) AS triangles,
      |       CASE WHEN deg.d < 2 THEN 0.0
      |            ELSE round(2.0 * COALESCE(tc.t, 0) / (deg.d * (deg.d - 1.0)), 6)
      |       END AS coeff
      |FROM deg LEFT JOIN tc ON tc.n = deg.n
      |ORDER BY node""".stripMargin

  /** Oracle for `bpe_first_merge`: full DuckDB replay of BPE training's
    * rank-0 selection — word dictionary (whitespace tokens of the
    * trimmed/lowercased text), per-position adjacent symbol pairs over
    * (chars + end-of-word marker U+E000 = chr(57344)) weighted by word
    * frequency, argmax by (freq DESC, left ASC, right ASC) under the
    * binary collation. Marker code points (chr(57344)) are stripped from
    * words and empties dropped — exactly the engine's initialSymbols
    * normalization, so corpora containing the marker stay oracle-equal. The trainer's `maxWords` cap never binds at gate
    * scale, so the unbounded dictionary here is the same dictionary. */
  def bpeFirstMergeOracle: String =
    """WITH w AS (
      |  SELECT word, COUNT(*) AS freq FROM (
      |    SELECT replace(unnest(regexp_split_to_array(trim(lower(text)), '\s+')),
      |           chr(57344), '') AS word
      |    FROM documents) t
      |  WHERE word <> '' GROUP BY word),
      |p AS (
      |  SELECT substr(word, CAST(i AS INT), 1) AS l,
      |         CASE WHEN i = length(word) THEN chr(57344)
      |              ELSE substr(word, CAST(i AS INT) + 1, 1) END AS r,
      |         freq
      |  FROM (SELECT word, freq,
      |               unnest(generate_series(1, CAST(length(word) AS BIGINT))) AS i
      |        FROM w))
      |SELECT l AS merge_left, r AS merge_right, CAST(SUM(freq) AS BIGINT) AS pair_freq
      |FROM p GROUP BY l, r
      |ORDER BY pair_freq DESC, merge_left ASC, merge_right ASC LIMIT 1""".stripMargin

  /** Oracle for `bpe_pack`: a FULL replay of train(1 merge) → encode →
    * pack. Rank 0's (l, r) argmax is the [[bpeFirstMergeOracle]]
    * derivation; with a single merge the iterative encoder provably
    * converges in one leftmost-non-overlapping pass (the merged symbol
    * l‖r can never re-form the (l, r) pair), so per-word token count =
    * cp_len(word) + 1 − (len(w‖marker) − len(replace(w‖marker, l‖r, '')))/2
    * — SQL `replace` IS the leftmost-non-overlapping single scan. The
    * packing is the `pack_sequences` cumsum/chunk arithmetic at 512. */
  def bpePackOracle: String =
    """WITH w AS (
      |  SELECT word, COUNT(*) AS freq FROM (
      |    SELECT replace(unnest(regexp_split_to_array(trim(lower(text)), '\s+')),
      |           chr(57344), '') AS word
      |    FROM documents) t
      |  WHERE word <> '' GROUP BY word),
      |p AS (
      |  SELECT substr(word, CAST(i AS INT), 1) AS l,
      |         CASE WHEN i = length(word) THEN chr(57344)
      |              ELSE substr(word, CAST(i AS INT) + 1, 1) END AS r,
      |         freq
      |  FROM (SELECT word, freq,
      |               unnest(generate_series(1, CAST(length(word) AS BIGINT))) AS i
      |        FROM w)),
      |m1 AS (
      |  SELECT l || r AS pat FROM (
      |    SELECT l, r, SUM(freq) AS pf FROM p GROUP BY l, r
      |    ORDER BY pf DESC, l ASC, r ASC LIMIT 1)),
      |dw AS (
      |  SELECT doc_id,
      |         replace(unnest(regexp_split_to_array(trim(lower(text)), '\s+')),
      |                 chr(57344), '') AS word
      |  FROM documents),
      |dn AS (
      |  SELECT d.doc_id,
      |         CAST(SUM(length(d.word) + 1
      |           - (length(d.word || chr(57344))
      |              - length(replace(d.word || chr(57344), m.pat, ''))) // 2
      |         ) AS BIGINT) AS n_tokens
      |  FROM dw d, m1 m WHERE d.word <> ''
      |  GROUP BY d.doc_id),
      |c AS (SELECT doc_id, n_tokens,
      |        SUM(n_tokens) OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS cum
      |      FROM dn)
      |SELECT doc_id, n_tokens,
      |       CAST((cum - n_tokens) // 512 AS BIGINT) AS seq_first,
      |       CAST((cum - 1) // 512 AS BIGINT) AS seq_last
      |FROM c WHERE n_tokens > 0 ORDER BY doc_id""".stripMargin

  /** Oracle for `streaming_bpe_tokens`: the [[bpePackOracle]] chain
    * (rank-0 merge argmax over the FULL corpus, leftmost-non-overlapping
    * replace arithmetic per word) truncated at per-doc token counts and
    * restricted to the streamed id slice. */
  def streamingBpeTokensOracle: String =
    """WITH w AS (
      |  SELECT word, COUNT(*) AS freq FROM (
      |    SELECT replace(unnest(regexp_split_to_array(trim(lower(text)), '\s+')),
      |           chr(57344), '') AS word
      |    FROM documents) t
      |  WHERE word <> '' GROUP BY word),
      |p AS (
      |  SELECT substr(word, CAST(i AS INT), 1) AS l,
      |         CASE WHEN i = length(word) THEN chr(57344)
      |              ELSE substr(word, CAST(i AS INT) + 1, 1) END AS r,
      |         freq
      |  FROM (SELECT word, freq,
      |               unnest(generate_series(1, CAST(length(word) AS BIGINT))) AS i
      |        FROM w)),
      |m1 AS (
      |  SELECT l || r AS pat FROM (
      |    SELECT l, r, SUM(freq) AS pf FROM p GROUP BY l, r
      |    ORDER BY pf DESC, l ASC, r ASC LIMIT 1)),
      |dw AS (
      |  SELECT doc_id,
      |         replace(unnest(regexp_split_to_array(trim(lower(text)), '\s+')),
      |                 chr(57344), '') AS word
      |  FROM documents WHERE doc_id % 3 = 0),
      |dn AS (
      |  SELECT d.doc_id,
      |         CAST(SUM(length(d.word) + 1
      |           - (length(d.word || chr(57344))
      |              - length(replace(d.word || chr(57344), m.pat, ''))) // 2
      |         ) AS BIGINT) AS n_tokens
      |  FROM dw d, m1 m WHERE d.word <> ''
      |  GROUP BY d.doc_id)
      |SELECT doc_id, n_tokens FROM dn WHERE n_tokens > 0
      |ORDER BY doc_id""".stripMargin

  /** Oracle for `bpe_fertility`: the [[bpePackOracle]] train(1 merge) →
    * per-word subword-count replay, rolled up per language — fertility =
    * Σ subwords / Σ words, exact integer sums + one double division. */
  def bpeFertilityOracle: String =
    """WITH w AS (
      |  SELECT word, COUNT(*) AS freq FROM (
      |    SELECT replace(unnest(regexp_split_to_array(trim(lower(text)), '\s+')),
      |           chr(57344), '') AS word
      |    FROM documents) t
      |  WHERE word <> '' GROUP BY word),
      |p AS (
      |  SELECT substr(word, CAST(i AS INT), 1) AS l,
      |         CASE WHEN i = length(word) THEN chr(57344)
      |              ELSE substr(word, CAST(i AS INT) + 1, 1) END AS r,
      |         freq
      |  FROM (SELECT word, freq,
      |               unnest(generate_series(1, CAST(length(word) AS BIGINT))) AS i
      |        FROM w)),
      |m1 AS (
      |  SELECT l || r AS pat FROM (
      |    SELECT l, r, SUM(freq) AS pf FROM p GROUP BY l, r
      |    ORDER BY pf DESC, l ASC, r ASC LIMIT 1)),
      |dw AS (
      |  SELECT lang,
      |         replace(unnest(regexp_split_to_array(trim(lower(text)), '\s+')),
      |                 chr(57344), '') AS word
      |  FROM documents),
      |f AS (
      |  SELECT lang,
      |         length(word) + 1
      |           - (length(word || chr(57344))
      |              - length(replace(word || chr(57344), m.pat, ''))) // 2 AS sub
      |  FROM dw, m1 m WHERE word <> '')
      |SELECT lang,
      |       round(CAST(SUM(sub) AS DOUBLE) / COUNT(*), 6) AS fertility,
      |       CAST(COUNT(*) AS BIGINT) AS n_words,
      |       CAST(SUM(sub) AS BIGINT) AS n_subwords
      |FROM f GROUP BY lang ORDER BY lang""".stripMargin

  /** Shared DuckDB replay of robust winnowing (k=8, w=4) over a
    * `(doc_id, text)` relation named `src`: the fingerprint normalization,
    * per-position Karp-Rabin polynomial gram hashes (the exact integer
    * arithmetic of [[graft.plans.TextKernels.winnowSelect]], unrolled —
    * every intermediate < 2^63 so DuckDB's overflow-checking BIGINT
    * multiply never trips), per-window minima via a
    * ROWS frame computed over ALL gram rows then filtered to window starts
    * (full windows, plus the single short-doc window when n < w), the
    * rightmost-position tie-break as a max(p) join back on the window
    * minimum, selections dedup'd. `h` (referenced twice) and `sel`
    * (referenced up to twice by the spans oracle) are AS MATERIALIZED —
    * DuckDB re-inlines multiply-referenced CTEs combinatorially otherwise.
    * Yields `sel(doc_id, pos, fp)`. */
  def winnowSelCtes(sfx: String = ""): String = {
    // (((c1·B + c2) % M)·B + c3) % M … — matches the kernel exactly: the
    // first term skips the mod (codepoints < 2^21 < M). `sfx` renames every
    // CTE (src$sfx … sel$sfx) so two chains — e.g. stored corpus + streamed
    // copies in the streaming-flag oracle — coexist in one query.
    val fpExpr = (1 until 8).foldLeft(
      "CAST(ascii(substr(nm, CAST(p AS INT), 1)) AS BIGINT)") { (e, i) =>
      s"(($e * ${graft.plans.TextKernels.WinnowBase} + " +
        s"ascii(substr(nm, CAST(p AS INT) + $i, 1))) % " +
        s"${graft.plans.TextKernels.WinnowMod})"
    }
    s"""nm$sfx AS (
      |  SELECT doc_id, regexp_replace(trim(lower(text)), '\\s+', ' ', 'g') AS nm
      |  FROM src$sfx),
      |d$sfx AS (SELECT doc_id, nm, CAST(length(nm) - 7 AS INT) AS n
      |      FROM nm$sfx WHERE length(nm) >= 8),
      |h$sfx AS MATERIALIZED (
      |  SELECT doc_id, n, CAST(p AS INT) AS p,
      |         $fpExpr AS fp
      |  FROM (SELECT doc_id, nm, n,
      |               unnest(generate_series(1, CAST(n AS BIGINT))) AS p
      |        FROM d$sfx)),
      |ws$sfx AS MATERIALIZED (
      |  SELECT doc_id, i, mn FROM (
      |    SELECT doc_id, n, p AS i,
      |           min(fp) OVER (PARTITION BY doc_id ORDER BY p
      |                         ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS mn
      |    FROM h$sfx)
      |  WHERE i <= greatest(n - 3, 1)),
      |sel$sfx AS MATERIALIZED (
      |  SELECT DISTINCT doc_id, pos, fp FROM (
      |    SELECT w.doc_id, w.i, max(g.p) AS pos, w.mn AS fp
      |    FROM ws$sfx w JOIN h$sfx g ON g.doc_id = w.doc_id
      |                  AND g.p >= w.i AND g.p <= w.i + 3
      |                  AND g.fp = w.mn
      |    GROUP BY w.doc_id, w.i, w.mn))""".stripMargin
  }

  /** Oracle for `winnow_fingerprints`: [[winnowSelCtes]] over the raw
    * documents table — every selected (pos, fp) of every doc. */
  def winnowFingerprintsOracle: String =
    s"""WITH src AS (SELECT doc_id, text FROM documents),
       |${winnowSelCtes()}
       |SELECT doc_id, pos, fp FROM sel ORDER BY doc_id, pos""".stripMargin

  /** Oracle for `winnow_matches`: the near-dup fixture replay feeding
    * [[winnowSelCtes]], then the distinct-fingerprint inverted index with
    * the df ∈ [2, 20] cut and the >= 2 shared-count pair report. */
  def winnowMatchesOracle: String =
    s"""WITH src AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + 100000 AS doc_id,
       |         array_to_string(list_slice(string_split_regex(trim(lower(text)), '\\s+'), 1,
       |           greatest(CAST(floor(len(string_split_regex(trim(lower(text)), '\\s+')) * 3 / 4) AS INT), 1)), ' ') AS text
       |  FROM documents),
       |${winnowSelCtes()},
       |fps AS MATERIALIZED (SELECT DISTINCT doc_id AS id, fp FROM sel),
       |kept AS (SELECT fp FROM (SELECT fp, COUNT(*) AS df FROM fps GROUP BY fp)
       |         WHERE df >= 2 AND df <= 20),
       |fk AS MATERIALIZED (SELECT id, fps.fp FROM fps JOIN kept USING (fp))
       |SELECT a.id AS id_a, b.id AS id_b, CAST(COUNT(*) AS BIGINT) AS n_shared
       |FROM fk a JOIN fk b ON a.fp = b.fp AND a.id < b.id
       |GROUP BY a.id, b.id
       |HAVING COUNT(*) >= 2
       |ORDER BY id_a, id_b""".stripMargin

  /** Oracle for `winnow_spans`: the near-dup fixture replay feeding
    * [[winnowSelCtes]], then the matches report's pair qualification
    * (df ∈ [2, 20] cut, >= 2 shared) and the gaps-and-islands span
    * collapse — island = per-doc selection index − rank among the pair's
    * shared selections, grouped to (min pos, max pos, count). */
  def winnowSpansOracle: String =
    s"""WITH src AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + 100000 AS doc_id,
       |         array_to_string(list_slice(string_split_regex(trim(lower(text)), '\\s+'), 1,
       |           greatest(CAST(floor(len(string_split_regex(trim(lower(text)), '\\s+')) * 3 / 4) AS INT), 1)), ' ') AS text
       |  FROM documents),
       |${winnowSelCtes()},
       |fps AS MATERIALIZED (SELECT DISTINCT doc_id AS id, fp FROM sel),
       |kept AS (SELECT fp FROM (SELECT fp, COUNT(*) AS df FROM fps GROUP BY fp)
       |         WHERE df >= 2 AND df <= 20),
       |fk AS MATERIALIZED (SELECT id, fps.fp FROM fps JOIN kept USING (fp)),
       |pairs AS (
       |  SELECT a.id AS id_a, b.id AS id_b
       |  FROM fk a JOIN fk b ON a.fp = b.fp AND a.id < b.id
       |  GROUP BY a.id, b.id HAVING COUNT(*) >= 2),
       |si AS MATERIALIZED (
       |  SELECT doc_id AS id, pos, fp,
       |         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS sidx
       |  FROM sel),
       |sh AS (
       |  SELECT DISTINCT a.id AS id_a, b.id AS id_b, a.pos, a.sidx
       |  FROM si a
       |  JOIN fk b ON a.fp = b.fp AND a.id < b.id
       |  JOIN pairs p ON p.id_a = a.id AND p.id_b = b.id),
       |isl AS (
       |  SELECT id_a, id_b, pos, sidx,
       |         sidx - ROW_NUMBER() OVER (PARTITION BY id_a, id_b ORDER BY sidx) AS island
       |  FROM sh)
       |SELECT id_a, id_b,
       |       CAST(MIN(pos) AS INT) AS span_start,
       |       CAST(MAX(pos) AS INT) AS span_end,
       |       CAST(COUNT(*) AS BIGINT) AS n_fps
       |FROM isl GROUP BY id_a, id_b, island
       |ORDER BY id_a, id_b, span_start""".stripMargin

  /** Shared replay for the winnow flaggers: TWO [[winnowSelCtes]] chains —
    * a caller-supplied stored-corpus relation (df <= 20 cut only: a stored
    * fingerprint unique in the corpus still pairs with an incoming copy)
    * and the flagged 75%-prefix copies of the first 500 docs — then the
    * distinct shared-kept-fingerprint count per (incoming, stored) pair
    * with the >= 2 floor. The stateless min-shared-fp emission + in-row
    * intersect count must equal this aggregate. */
  def winnowFlagOracle(storedSrcSql: String): String =
    s"""WITH src AS ($storedSrcSql),
       |${winnowSelCtes()},
       |stored AS (SELECT DISTINCT doc_id AS dup_of, fp FROM sel),
       |keptf AS (SELECT fp FROM (SELECT fp, COUNT(*) AS c FROM stored GROUP BY fp)
       |          WHERE c <= 20),
       |kept AS MATERIALIZED (SELECT dup_of, stored.fp FROM stored JOIN keptf USING (fp)),
       |src2 AS (
       |  SELECT doc_id + 100000 AS doc_id,
       |         array_to_string(list_slice(string_split_regex(trim(lower(text)), '\\s+'), 1,
       |           greatest(CAST(floor(len(string_split_regex(trim(lower(text)), '\\s+')) * 3 / 4) AS INT), 1)), ' ') AS text
       |  FROM documents WHERE doc_id < 500),
       |${winnowSelCtes("2")},
       |inc AS (SELECT DISTINCT doc_id, fp FROM sel2)
       |SELECT i.doc_id, k.dup_of, CAST(COUNT(*) AS BIGINT) AS n_shared
       |FROM inc i JOIN kept k ON i.fp = k.fp
       |GROUP BY i.doc_id, k.dup_of
       |HAVING COUNT(*) >= 2
       |ORDER BY doc_id, dup_of""".stripMargin

  /** Oracle for `streaming_winnow_flag`: [[winnowFlagOracle]] with the raw
    * documents table as the stored corpus. */
  def streamingWinnowFlagOracle: String =
    winnowFlagOracle("SELECT doc_id, text FROM documents")

  /** Oracle for `winnow_index_flag`: [[winnowFlagOracle]] with the stored
    * corpus = documents ∪ the APPENDED ingest batch (exact copies of every
    * 37th doc, ids +1000000 — identical text ⇒ identical fingerprints, so
    * those fps' stored df doubles and the df <= 20 cut sees the merged
    * set, exactly what the persisted save→append→load path must produce). */
  def winnowIndexFlagOracle: String =
    winnowFlagOracle(
      """SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000 AS doc_id, text FROM documents
        |  WHERE doc_id % 37 = 0""".stripMargin)

  /** Shared DuckDB CTE chain re-deriving the spherical-k-means state from
    * the parquet table alone (the [[annIvfTopkOracle]] derivation, split
    * out for the clustering oracles): md5-order centroid pick, per-vector
    * assignment by raw cosine with lower-list-id tie-break — exactly the
    * `vec_top_centroids` kernel's semantics. Ends with an `assign` CTE of
    * (vec_id, list_id, cos). */
  def kmeansAssignCtes(nlist: Int): String =
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
       |  SELECT vec_id, list_id, cos FROM (
       |    SELECT vec_id, list_id, cos,
       |           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC, list_id ASC) AS rn
       |    FROM ccos) WHERE rn = 1)""".stripMargin

  /** Oracle for `embedding_clusters`: full independent k-means assignment
    * replay — centroids, assignment and the rounded member-to-centroid
    * cosine all re-derived in DuckDB (no engine-fed constants). */
  def embeddingClustersOracle: String =
    s"""${kmeansAssignCtes(16)}
       |SELECT vec_id, CAST(list_id AS INT) AS list_id,
       |       round(cos, 6) AS cos_centroid
       |FROM assign ORDER BY vec_id""".stripMargin

  /** Oracle for `streaming_cluster_assign`: the [[embeddingClustersOracle]]
    * derivation (centroids from the FULL table — the batch-trained
    * quantizer) restricted to the streamed id range; streamed ≡ batch
    * assignment is thereby pinned by DuckDB, not assumed. */
  def streamingClusterAssignOracle: String =
    s"""${kmeansAssignCtes(16)}
       |SELECT vec_id, CAST(list_id AS INT) AS list_id,
       |       round(cos, 6) AS cos_centroid
       |FROM assign WHERE vec_id < 120 ORDER BY vec_id""".stripMargin

  /** Oracle for `cluster_sizes`: per-cluster count + decimal-exact mean of
    * the rounded-6 cosines (sum as DECIMAL, one double division — the dsum
    * convention, partition-order-free on both engines). */
  def clusterSizesOracle: String =
    s"""${kmeansAssignCtes(16)}
       |SELECT CAST(list_id AS INT) AS list_id, COUNT(*) AS n,
       |       CAST(SUM(CAST(round(cos, 6) AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS mean_cos
       |FROM assign GROUP BY list_id ORDER BY list_id""".stripMargin

  /** The SRP bucket of double-list column `e` as DuckDB SQL: the ±1 sign
    * table is recomputed from the published splitmix64 function at
    * oracle-build time and inlined as literals — shared by the
    * `ann_lsh_topk` and `embedding_near_dup` replays. */
  def srpBucketSql(nBits: Int, dim: Int, seed: Int): String = {
    val signs = VectorFunctions.srpSigns(nBits, dim, seed)
    (0 until nBits).map { b =>
      val s = signs(b).map(x => if (x > 0) "1" else "-1").mkString(",")
      s"(CASE WHEN list_sum(list_transform(range(1, len(e) + 1), i -> e[i] * ([$s])[i])) >= 0 THEN ${1L << b} ELSE 0 END)"
    }.mkString("\n    + ")
  }

  /** Oracle for `ann_lsh_topk`: a full independent SRP-LSH replay — DuckDB
    * re-derives every bucket ([[srpBucketSql]] sign tables, one per hash
    * table), the candidate union across tables, and the exact cosine
    * re-rank from the parquet table + the published sign function alone. */
  def annLshTopkOracle: String = {
    val (dim, nBits, probes, k) = (64, 8, 4, 5)
    val tables = (0 until probes).map(t =>
      s"  SELECT vec_id, e, $t AS tbl,\n    ${srpBucketSql(nBits, dim, t)} AS bucket FROM v")
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

  /** Oracle for `embedding_near_dup`: full SRP-LSH near-dup replay over the
    * dup fixture (embeddings ∪ exact copies) — one inlined sign table
    * (seed 0, nBits 12), bucket self-join, exact cosine ≥ threshold. The
    * threshold compare uses RAW cosine like the engine; the fixture is
    * boundary-safe by construction (pairs are either exact duplicates at
    * cos ~1.0 or near-orthogonal random vectors ≪ 0.95 — the precision
    * gate's n_boundary column pins that emptiness in DuckDB). */
  def embeddingNearDupOracle: String = {
    val (dim, nBits, threshold) = (64, 12, 0.95)
    s"""WITH base AS (
       |  SELECT vec_id, embedding FROM embeddings
       |  UNION ALL
       |  SELECT vec_id + 1000000 AS vec_id, embedding FROM embeddings),
       |v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e FROM base),
       |b AS (
       |  SELECT vec_id, e,
       |    ${srpBucketSql(nBits, dim, 0)} AS bucket FROM v),
       |s AS (
       |  SELECT DISTINCT l.vec_id AS a, r.vec_id AS b,
       |         round(${duckCos("l.e", "r.e")}, 6) AS cos
       |  FROM b l JOIN b r ON l.bucket = r.bucket
       |  WHERE l.vec_id < r.vec_id AND ${duckCos("l.e", "r.e")} >= $threshold)
       |SELECT a, b, cos FROM s ORDER BY a, b""".stripMargin
  }

  /** Oracle for `semantic_dedup`: DuckDB re-derives the SemDeDup cluster
    * assignment (md5-order centroid pick + argmax cosine, exactly like the
    * `ann_ivf_topk` replay) over the dup fixture, then verifies pairwise
    * cosine within each cluster — the full algorithm, no engine-fed
    * constants. */
  def semanticDedupOracle: String = {
    val (nlist, threshold) = (16, 0.95)
    s"""WITH base AS (
       |  SELECT vec_id, embedding FROM embeddings
       |  UNION ALL
       |  SELECT vec_id + 1000000 AS vec_id, embedding FROM embeddings),
       |v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e FROM base),
       |ck AS (SELECT vec_id, md5(CAST(vec_id AS VARCHAR)) AS h FROM base
       |       ORDER BY h, vec_id LIMIT $nlist),
       |cents AS (
       |  SELECT CAST((ROW_NUMBER() OVER (ORDER BY ck.h, ck.vec_id)) - 1 AS INT) AS cluster_id,
       |         v.e AS ce
       |  FROM ck JOIN v ON v.vec_id = ck.vec_id),
       |ccos AS (
       |  SELECT v.vec_id, c.cluster_id, ${duckCos("v.e", "c.ce")} AS cos
       |  FROM v, cents c),
       |assign AS (
       |  SELECT vec_id, cluster_id FROM (
       |    SELECT vec_id, cluster_id,
       |           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC, cluster_id ASC) AS rn
       |    FROM ccos) WHERE rn = 1),
       |s AS (
       |  SELECT la.vec_id AS a, lb.vec_id AS b,
       |         round(${duckCos("va.e", "vb.e")}, 6) AS cos, la.cluster_id
       |  FROM assign la JOIN assign lb ON la.cluster_id = lb.cluster_id
       |                                AND la.vec_id < lb.vec_id
       |       JOIN v va ON va.vec_id = la.vec_id
       |       JOIN v vb ON vb.vec_id = lb.vec_id
       |  WHERE ${duckCos("va.e", "vb.e")} >= $threshold)
       |SELECT a, b, cos, cluster_id FROM s ORDER BY a, b""".stripMargin
  }

  /** Oracle for `semantic_dedup_keep`: the [[semanticDedupOracle]] pair
    * replay extended with the transitive closure (same recursive CTE as the
    * `dup_clusters` oracle) — survivors are every fixture id that is not a
    * non-minimal member of a near-dup cluster. */
  def semanticDedupKeepOracle: String = {
    val (nlist, threshold) = (16, 0.95)
    s"""WITH RECURSIVE base AS (
       |  SELECT vec_id, embedding FROM embeddings
       |  UNION ALL
       |  SELECT vec_id + 1000000 AS vec_id, embedding FROM embeddings),
       |v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e FROM base),
       |ck AS (SELECT vec_id, md5(CAST(vec_id AS VARCHAR)) AS h FROM base
       |       ORDER BY h, vec_id LIMIT $nlist),
       |cents AS (
       |  SELECT CAST((ROW_NUMBER() OVER (ORDER BY ck.h, ck.vec_id)) - 1 AS INT) AS cluster_id,
       |         v.e AS ce
       |  FROM ck JOIN v ON v.vec_id = ck.vec_id),
       |ccos AS (
       |  SELECT v.vec_id, c.cluster_id, ${duckCos("v.e", "c.ce")} AS cos
       |  FROM v, cents c),
       |assign AS (
       |  SELECT vec_id, cluster_id FROM (
       |    SELECT vec_id, cluster_id,
       |           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC, cluster_id ASC) AS rn
       |    FROM ccos) WHERE rn = 1),
       |p AS (
       |  SELECT la.vec_id AS a, lb.vec_id AS b
       |  FROM assign la JOIN assign lb ON la.cluster_id = lb.cluster_id
       |                                AND la.vec_id < lb.vec_id
       |       JOIN v va ON va.vec_id = la.vec_id
       |       JOIN v vb ON vb.vec_id = lb.vec_id
       |  WHERE ${duckCos("va.e", "vb.e")} >= $threshold),
       |eg AS (SELECT a, b FROM p UNION SELECT b, a FROM p),
       |reach(id, r) AS (
       |  SELECT a AS id, a AS r FROM eg
       |  UNION
       |  SELECT eg.a AS id, reach.r FROM eg JOIN reach ON reach.id = eg.b),
       |losers AS (
       |  SELECT id FROM (SELECT id, MIN(r) AS rep FROM reach GROUP BY id)
       |  WHERE id <> rep)
       |SELECT vec_id FROM base
       |WHERE vec_id NOT IN (SELECT id FROM losers)
       |ORDER BY vec_id""".stripMargin
  }

  /** The deterministic 75%-token-prefix copies half of [[docsWithNearDups]]
    * on its own (ids +100000) — callers amortizing the base-corpus half of
    * a derivation (e.g. cached winnow fingerprints) pay only this half. */
  def nearDupCopies(docs: DataFrame): DataFrame = {
    val t = split(trim(lower(col("text"))), "\\s+")
    docs.select(
      (col("doc_id") + 100000).as("doc_id"),
      concat_ws(" ", slice(t, lit(1), greatest(floor(size(t) * 3 / 4).cast("int"), lit(1))))
        .as("text"))
  }

  /** Documents ∪ deterministic 75%-token-prefix copies (ids +100000) — the
    * near-dup fixture the dedup demos run on (the raw synthetic docs share
    * no near-dups, so operators would trivially return 0 rows). */
  def docsWithNearDups(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text")).union(nearDupCopies(docs))

  /** Embeddings ∪ exact copies (ids +1000000): near-dup fixture for the
    * vector-dedup demo. */
  def embsWithDups(embs: DataFrame): DataFrame =
    embs.select(col("vec_id"), col("embedding"))
      .union(embs.select((col("vec_id") + 1000000).as("vec_id"), col("embedding")))

  /** ANN append-drift ingest batch: 256 exact copies of vector 0 under
    * distinct ids (2_000_000 + j). Encoded against a stale quantizer the
    * whole clump lands in ONE list (identical vectors share an
    * assignment), pushing it past any reasonable oversize factor — the
    * deterministic trigger for
    * [[graft.operators.Similarity.maintainIvfPq]]. */
  def annDriftClump(embs: DataFrame): DataFrame =
    embs.filter(col("vec_id") === 0)
      .select(col("embedding"), explode(sequence(lit(0L), lit(255L))).as("j"))
      .select((lit(2000000L) + col("j")).as("vec_id"), col("embedding"))

  /** DuckDB replay of the windowed-Gear CDC cut positions + chunk spans
    * over a `(doc_id, text)` relation named `src`: the 256-entry gear
    * table is recomputed from the published splitmix64 function at
    * oracle-build time and inlined as unsigned HUGEINT literals (the SRP
    * sign-table precedent), each boundary is an INDEPENDENT 16-byte
    * windowed sum (position independence is part of the operator's
    * contract — it is what makes the replay possible at all), and chunk
    * md5s hash the HEX slice of the byte stream (DuckDB md5 takes VARCHAR
    * only). Yields a relation (doc_id, chunk_idx, start, len, chunk_md5).
    * Shared by the `cdc_chunks` and `cdc_dedup` oracles. */
  def cdcChunksSql(maskBits: Int): String = {
    val gear = (0 until 256)
      .map(b => java.lang.Long.toUnsignedString(graft.plans.TextKernels.gearConstant(b)))
      .mkString("[", ",", "]")
    val bound = java.math.BigInteger.TWO.pow(64 - maskBits).toString
    s"""b AS (
       |  SELECT doc_id, hex(encode(text)) AS hx,
       |         CAST(octet_length(encode(text)) AS INT) AS n
       |  FROM src WHERE octet_length(encode(text)) > 0),
       |cuts AS (
       |  SELECT doc_id, hx, n,
       |    list_filter(range(15, n), i ->
       |      (list_sum(list_transform(range(0, 16), j ->
       |         list_extract($gear,
       |           CAST(('0x' || substr(hx, 2 * CAST(i - j AS INT) + 1, 2)) AS INT) + 1)
       |         * (1 << CAST(j AS INT))))
       |       % CAST('18446744073709551616' AS HUGEINT))
       |      < CAST('$bound' AS HUGEINT)) AS cs
       |  FROM b),
       |spans AS (
       |  SELECT doc_id, hx,
       |    list_prepend(0, list_transform(cs, c -> CAST(c AS INT) + 1)) AS starts,
       |    list_append(list_transform(cs, c -> CAST(c AS INT)), n - 1) AS ends
       |  FROM cuts),
       |exploded AS (
       |  SELECT doc_id, hx,
       |    unnest(list_transform(range(1, len(starts) + 1), k ->
       |      {'idx': k - 1, 's': starts[CAST(k AS INT)],
       |       'l': ends[CAST(k AS INT)] - starts[CAST(k AS INT)] + 1})) AS c
       |  FROM spans),
       |chunks AS (
       |  SELECT doc_id, CAST(c.idx AS INT) AS chunk_idx, CAST(c.s AS INT) AS start,
       |         CAST(c.l AS INT) AS len,
       |         md5(substr(hx, 2 * CAST(c.s AS INT) + 1, 2 * CAST(c.l AS INT))) AS chunk_md5
       |  FROM exploded WHERE c.l > 0)""".stripMargin
  }

  /** Stage counts of the curation funnel — recomputed by EVERY caller
    * (no memo here: the `curation_funnel` query runs the full
    * dedup→LSH→quality pipeline through this on every call, so its bench
    * timing IS the pipeline's build cost). The `curation_funnel_check`
    * gate instead consumes the per-JVM [[FunnelArtifacts]] cache and spends
    * its timed window on the pinned checks against the cached frames. */
  def computeFunnelStages(s: SparkSession, dir: String): Seq[(String, Long)] =
    Curation.funnel(docsWithNearDups(Tables.documents(s, dir)),
      Curation.Config(nearDupThreshold = 0.6, minQuality = 0.1))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Fuzzy entity resolution / record linkage: find raw rows whose NAME
 * strings denote the same real-world entity despite typos and variant
 * spellings, via multi-key blocking + Levenshtein edit distance. The
 * classic data-curation primitive (dedup a customer/vendor/author master
 * list before joining facts against it) — for a training pipeline, the
 * step that collapses "cold anvil" / "old anvil" source labels into one
 * provenance entity.
 *
 * Scale shape — the design point is that entity NAMES are a vocabulary,
 * not a corpus: the first (and only corpus-sized) stage is a map-side-
 * combined groupBy to the distinct-name dictionary (|V| rows, with counts
 * and a min-id representative). Everything downstream — blocking, the
 * candidate self-join, edit distances, connected components — runs on |V|
 * rows, so a 100 TB fact table with a 10^6-name vocabulary pays one
 * aggregation shuffle and then pennies. Blocking bounds the candidate set:
 * names pair only within a shared prefix-k OR suffix-k block (two keys
 * catch both head and tail typos; single-key prefix blocking misses
 * "blue bolt" vs "old bolt"), and any block larger than `maxBlockSize`
 * is dropped whole (the same documented coverage-cap discipline as
 * Dedup.minHashLsh's bucket cap) so an adversarial million-"aaa…" input
 * degrades coverage, not the cluster.
 *
 * Determinism: edit distance is exact integer; representatives are min
 * ids; clustering is the hash-min fixpoint of [[Dedup.dupClusters]] —
 * every output value replays in DuckDB SQL (`levenshtein` + recursive
 * CTE closure).
 */
object EntityResolution {

  /**
   * The distinct-name dictionary: (nm, cnt, rep) with `nm` the
   * whitespace-collapsed lower-trimmed name, `cnt` its raw-row support,
   * `rep` the minimum id carrying it. ONE corpus shuffle (partial agg
   * map-side); everything else in this family consumes these |V| rows.
   */
  def nameDictionary(df: DataFrame, idCol: String, nameCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("id"),
        regexp_replace(trim(lower(col(nameCol))), "\\s+", " ").as("nm"))
      .filter(col("nm") =!= "")
      .groupBy(col("nm"))
      .agg(count(lit(1)).as("cnt"), min(col("id")).as("rep"))

  /** Dictionary rows exploded to their two blocking keys. Suffix keys are
    * '$'-prefixed so the two key spaces cannot collide ("abc…" prefix vs
    * "…abc" suffix are different candidate sets). Names shorter than
    * `blockLen` block on themselves in both spaces. */
  private def blocked(names: DataFrame, blockLen: Int): DataFrame = {
    val pre = names.withColumn("bk", substring(col("nm"), 1, blockLen))
    val suf = names.withColumn("bk",
      concat(lit("$"), substring(col("nm"), -blockLen, blockLen)))
    pre.unionByName(suf)
  }

  /**
   * The space-tagged blocked dictionary index for STREAM-side matching:
   * (nm, cnt, rep, bk, space) with space 'p' (bk = prefix-`blockLen`) or
   * 's' (bk = raw suffix-`blockLen`; the explicit space column replaces
   * the '$' sentinel). Blocks larger than `maxBlockSize` within a key
   * space are dropped whole — the same coverage cap as
   * [[fuzzyMatchPairs]]. |V|·2 rows; callers cache it per corpus epoch
   * (the StreamingPhashDedup.bandedIndex deployment shape).
   */
  def blockedDictionary(df: DataFrame, idCol: String, nameCol: String,
                        blockLen: Int = 3,
                        maxBlockSize: Int = 1000): DataFrame =
    capBlocks(spaceBlocked(df, idCol, nameCol, blockLen), maxBlockSize)

  /**
   * The UNCAPPED space-tagged blocked dictionary — the persistable unit
   * of the dictionary lifecycle ([[graft.streaming.StreamingEntity]]
   * save/append/load): (nm, cnt, rep, bk, space) with both key spaces,
   * no block cap. The cap belongs at index-BUILD time over the whole
   * loaded set ([[capBlocks]], the StreamingWinnow df-cut discipline), so
   * delta-appended names participate in block-size suppression exactly
   * as if the dictionary had been rebuilt.
   */
  def spaceBlocked(df: DataFrame, idCol: String, nameCol: String,
                   blockLen: Int = 3): DataFrame = {
    require(blockLen >= 1,
      s"spaceBlocked: blockLen must be >= 1, got $blockLen")
    val names = nameDictionary(df, idCol, nameCol)
    val pre = names
      .withColumn("bk", substring(col("nm"), 1, blockLen))
      .withColumn("space", lit("p"))
    val suf = names
      .withColumn("bk", substring(col("nm"), -blockLen, blockLen))
      .withColumn("space", lit("s"))
    pre.unionByName(suf)
  }

  /** Drop whole blocks larger than `maxBlockSize` within a key space —
    * the coverage cap shared by [[blockedDictionary]] and the
    * load-time path of a persisted dictionary. Runs on |V|·2 rows. */
  def capBlocks(blockedRows: DataFrame, maxBlockSize: Int): DataFrame = {
    require(maxBlockSize >= 1,
      s"capBlocks: maxBlockSize must be >= 1, got $maxBlockSize")
    blockedRows
      .withColumn("bsz", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("space"), col("bk"))))
      .filter(col("bsz") <= maxBlockSize)
      .drop("bsz")
  }

  /**
   * Candidate pairs within `maxDist` edits: (nm_a, nm_b, dist, cnt_a,
   * cnt_b, rep_a, rep_b), nm_a < nm_b. A pair found by both blocking keys
   * is emitted once (distinct over the name pair BEFORE the levenshtein
   * filter, so the distance is computed once per candidate). Blocks
   * larger than `maxBlockSize` are dropped whole — coverage cap, reported
   * by [[fuzzyMatchReport]].
   */
  def fuzzyMatchPairs(df: DataFrame, idCol: String, nameCol: String,
                      maxDist: Int = 3, blockLen: Int = 3,
                      maxBlockSize: Int = 1000): DataFrame = {
    require(maxDist >= 1, s"fuzzyMatchPairs: maxDist must be >= 1, got $maxDist")
    require(blockLen >= 1, s"fuzzyMatchPairs: blockLen must be >= 1, got $blockLen")
    require(maxBlockSize >= 2,
      s"fuzzyMatchPairs: maxBlockSize must be >= 2, got $maxBlockSize")
    val names = nameDictionary(df, idCol, nameCol)
    val blk = blocked(names, blockLen)
    // block-size cap over the |V|-sized blocked frame (vocab-cheap)
    val capped = blk
      .withColumn("bsz", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("bk"))))
      .filter(col("bsz") <= maxBlockSize)
      .drop("bsz")
    val a = capped.select(col("bk"), col("nm").as("nm_a"),
      col("cnt").as("cnt_a"), col("rep").as("rep_a"))
    val b = capped.select(col("bk"), col("nm").as("nm_b"),
      col("cnt").as("cnt_b"), col("rep").as("rep_b"))
    a.join(b, Seq("bk"))
      .filter(col("nm_a") < col("nm_b"))
      .drop("bk")
      // a pair blocked by BOTH keys must count once; cnt/rep are
      // functionally dependent on the name, so row-distinct == pair-distinct
      .distinct()
      .withColumn("dist", levenshtein(col("nm_a"), col("nm_b")))
      .filter(col("dist") <= maxDist)
      .select(col("nm_a"), col("nm_b"), col("dist"),
        col("cnt_a"), col("cnt_b"), col("rep_a"), col("rep_b"))
  }

  /**
   * Sorted-neighborhood record linkage (Hernández & Stolfo 1995), the
   * complementary candidate generator to [[fuzzyMatchPairs]]' key
   * blocking: sort the distinct names, compare each with its next
   * `windowSize − 1` lexicographic neighbors, keep pairs within
   * `maxDist` edits. Catches same-prefix clusters that straddle a
   * blocking-key boundary; misses what key blocking catches (first-char
   * typos jump far in sort order) — production pipelines run both and
   * union, which is exactly composing this with [[fuzzyMatchPairs]].
   *
   * Output: (nm_a, nm_b, dist, gap) — gap = sort-order distance (1 =
   * adjacent).
   *
   * Scale shape — a DISTRIBUTED global sort, never a single-partition
   * Window: the |V|-row dictionary is range-partitioned on the name, each
   * row gets a global contiguous sort index as (rows in earlier ranges) +
   * per-range row_number — the per-range offsets are a ≤P-row aggregate
   * (P = numPartitions), prefix-summed on that tiny frame and broadcast
   * back — and neighbor pairs come from an EQUI-JOIN on idx_b = idx_a +
   * gap (gap ∈ [1, windowSize−1]). Every corpus-independent stage is
   * |V|-parallel; no stage funnels the dictionary through one task. The
   * index-join formulation also sidesteps the boundary-strip edge cases
   * of per-partition leads (a range shorter than windowSize−1 rows would
   * need neighbors from TWO ranges ahead; an equi-join on the global
   * index cannot miss a pair by construction). O(|V|·w) candidates.
   */
  def sortedNeighborhoodPairs(df: DataFrame, idCol: String, nameCol: String,
                              windowSize: Int = 3,
                              maxDist: Int = 3,
                              numPartitions: Option[Int] = None): DataFrame = {
    require(windowSize >= 2,
      s"sortedNeighborhoodPairs: windowSize must be >= 2, got $windowSize")
    require(maxDist >= 1,
      s"sortedNeighborhoodPairs: maxDist must be >= 1, got $maxDist")
    numPartitions.foreach(p => require(p >= 1,
      s"sortedNeighborhoodPairs: numPartitions must be >= 1, got $p"))
    val names = nameDictionary(df, idCol, nameCol)
    // pin the range partitioning (pid assignment feeds the offset
    // aggregate AND the indexed frame — fork severing, and sampling-based
    // range boundaries must not be recomputed differently per consumer)
    val parted = numPartitions.map(p => names.repartitionByRange(p, col("nm")))
      .getOrElse(names.repartitionByRange(col("nm")))
      .withColumn("pid", spark_partition_id())
      .localCheckpoint()
    // rows per range → exclusive prefix sum: a ≤P-row frame, so the
    // global Window here is bounded by construction, not corpus-sized
    val wPid = org.apache.spark.sql.expressions.Window.orderBy(col("pid"))
      .rowsBetween(Long.MinValue, -1)
    val offsets = parted.groupBy(col("pid")).agg(count(lit(1)).as("n"))
      .withColumn("off", coalesce(sum(col("n")).over(wPid), lit(0L)))
      .select(col("pid"), col("off"))
    val wLocal = org.apache.spark.sql.expressions.Window
      .partitionBy(col("pid")).orderBy(col("nm"))
    val indexed = parted.join(broadcast(offsets), Seq("pid"))
      .withColumn("idx", col("off") + row_number().over(wLocal))
      .select(col("nm"), col("idx"))
      .localCheckpoint() // both join sides read the materialized index
    val lhs = indexed.select(col("nm").as("nm_a"), col("idx"),
        explode(sequence(lit(1), lit(windowSize - 1))).as("gap"))
      .withColumn("idx_b", col("idx") + col("gap"))
    lhs.join(indexed.select(col("nm").as("nm_b"), col("idx").as("idx_b")),
        Seq("idx_b"))
      .withColumn("dist", levenshtein(col("nm_a"), col("nm_b")))
      .filter(col("dist") <= maxDist)
      .select(col("nm_a"), col("nm_b"), col("dist"), col("gap").cast("int").as("gap"))
  }

  /**
   * Canonical entity assignment: transitive closure of the fuzzy-match
   * graph. Every dictionary name maps to `entity` = the minimum rep id
   * reachable through matches (its own rep when unmatched — singletons
   * are entities too). Output: (nm, entity, cnt). Closure is the
   * hash-min + pointer-doubling fixpoint of [[Dedup.dupClusters]], run
   * on the |matched names|-sized pair graph.
   */
  def resolveEntities(df: DataFrame, idCol: String, nameCol: String,
                      maxDist: Int = 3, blockLen: Int = 3,
                      maxBlockSize: Int = 1000): DataFrame = {
    val names = nameDictionary(df, idCol, nameCol)
    val pairs = fuzzyMatchPairs(df, idCol, nameCol, maxDist, blockLen,
        maxBlockSize)
      .select(col("rep_a").as("a"), col("rep_b").as("b"))
    val labels = Dedup.dupClusters(pairs)
      .select(col("id").as("rep"), col("cluster_rep"))
    names.join(labels, Seq("rep"), "left")
      .select(col("nm"),
        coalesce(col("cluster_rep"), col("rep")).as("entity"),
        col("cnt"))
  }
}

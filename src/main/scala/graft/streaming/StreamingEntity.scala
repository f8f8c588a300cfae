package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Streaming entity resolution: fuzzy-match incoming (id, name) records
 * against a STORED name dictionary — the serving path of
 * [[graft.operators.EntityResolution]] (new vendor/customer/source
 * records flagged against the master list at ingest, the
 * StreamingPhashDedup deployment shape).
 *
 * Stateless by construction: the dictionary index is a static frame
 * (built once per corpus epoch via
 * [[graft.operators.EntityResolution.blockedDictionary]], cached by the
 * caller), and each micro-batch runs two stream-static EQUI-joins — the
 * prefix-key space and the suffix-key space — so there is no streaming
 * state store, no watermark, and exactly-once emission per
 * (record, dictionary name) pair. A candidate caught by BOTH keys is
 * emitted once by arithmetic, not by a stateful distinct: the suffix
 * join excludes pairs whose prefix keys already agree (the
 * StreamingWinnow minimum-shared-fingerprint idiom).
 *
 * Scale shape: per batch O(|batch| + matches) after the equi-joins; the
 * dictionary side is |V|·2 rows (vocab-bounded) and broadcast-eligible.
 */
object StreamingEntity {

  /**
   * Persist a blocked name dictionary as the on-disk master-list
   * artifact: (nm, cnt, rep, bk, space) rows — the UNCAPPED
   * [[graft.operators.EntityResolution.spaceBlocked]] output —
   * range-partitioned and sorted by (space, bk), so a flag join's probe
   * prunes row groups via parquet min/max stats on the block key. |V|·2
   * rows regardless of corpus size; corpus text/ids are never needed
   * again at flag time.
   */
  def saveDictionary(blockedRows: DataFrame, path: String): Unit =
    blockedRows.select(col("nm"), col("cnt"), col("rep"),
        col("bk"), col("space"))
      .repartitionByRange(col("space"), col("bk"))
      .sortWithinPartitions(col("space"), col("bk"), col("nm"))
      .write.mode("overwrite").parquet(path)

  /** Append an ingest batch's blocked dictionary rows as delta files
    * with the same per-file sort (the BM25 segment-append discipline —
    * no rewrite of existing files). A name present in both the stored
    * set and a delta yields duplicate rows on disk; [[loadDictionary]]
    * merges them (sum counts, min rep) and applies the block cap over
    * the WHOLE merged set, so appends compose exactly as a rebuild. */
  def appendDictionary(blockedRows: DataFrame, path: String): Unit =
    blockedRows.select(col("nm"), col("cnt"), col("rep"),
        col("bk"), col("space"))
      .repartitionByRange(col("space"), col("bk"))
      .sortWithinPartitions(col("space"), col("bk"), col("nm"))
      .write.mode("append").parquet(path)

  /**
   * Load a stored dictionary back into the [[flagAgainstIndex]] index
   * shape: merge duplicate (nm, bk, space) rows across base + deltas
   * (counts are additive; the representative is the minimum id — the
   * same aggregation a from-scratch
   * [[graft.operators.EntityResolution.nameDictionary]] build performs),
   * then the whole-block cap. `localCheckpoint`ed: in a stream-static
   * join the static subplan re-executes per micro-batch, so without
   * severing it each batch would re-pay the merge aggregation.
   */
  def loadDictionary(spark: org.apache.spark.sql.SparkSession,
                     path: String, maxBlockSize: Int = 1000): DataFrame =
    graft.operators.EntityResolution.capBlocks(
        spark.read.parquet(path)
          .groupBy(col("nm"), col("bk"), col("space"))
          .agg(sum(col("cnt")).as("cnt"), min(col("rep")).as("rep")),
        maxBlockSize)
      .select(col("nm"), col("cnt"), col("rep"), col("bk"), col("space"))
      .localCheckpoint()

  /**
   * Compact a dictionary artifact: fold the base [[saveDictionary]] plus
   * accumulated [[appendDictionary]] delta files into ONE merged
   * generation at `dst` — the fold IS the duplicate-(nm, bk, space)
   * merge [[loadDictionary]] performs (counts sum, representative =
   * minimum id), written back UNCAPPED with the standard (space, bk)
   * range layout, so the artifact stays |V|·2 rows forever after no
   * matter how many ingest batches were appended. The whole-block cap
   * still applies at load time over the merged set, so an index built
   * from `dst` equals one built from the pile by construction. Audited:
   * the merged row set of `dst` must checksum-match the merged pile
   * (xor of per-row hashes — order-free), failing loudly if the source
   * changed mid-compaction. Production shape: fresh path +
   * [[graft.operators.Generations]] pointer flip.
   */
  def compactDictionary(spark: org.apache.spark.sql.SparkSession,
                        src: String, dst: String): Unit = {
    require(src != dst, "compactDictionary: dst must be a fresh path")
    def merged(path: String): DataFrame =
      spark.read.parquet(path)
        .groupBy(col("nm"), col("bk"), col("space"))
        .agg(sum(col("cnt")).as("cnt"), min(col("rep")).as("rep"))
        .select(col("nm"), col("cnt"), col("rep"), col("bk"), col("space"))
    def chk(df: DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)).as("n"),
        coalesce(call_function("bit_xor",
          xxhash64(col("nm"), col("bk"), col("space"), col("cnt"), col("rep"))),
          lit(0L)).as("x")).collect()(0)
      (r.getLong(0), r.getLong(1))
    }
    merged(src)
      .repartitionByRange(col("space"), col("bk"))
      .sortWithinPartitions(col("space"), col("bk"), col("nm"))
      .write.mode("overwrite").parquet(dst)
    // both audits AFTER the write (src re-read detects a mid-compaction
    // append — the compactBandIndex contract), fanned out against each
    // other (guide §2.6)
    var pre: (Long, Long) = null
    var post: (Long, Long) = null
    graft.operators.Jobs.concurrently(
      () => pre = chk(merged(src)),
      () => post = chk(spark.read.parquet(dst)))
    require(pre == post,
      s"compactDictionary: merged dictionary changed ($pre -> $post) — the " +
        "source changed mid-compaction; re-run")
  }

  /**
   * Flag a stream of (idCol, nameCol) rows against a blocked dictionary
   * index (columns nm/cnt/rep/bk/space from `blockedDictionary` with the
   * same `blockLen`). Emits (id, nm_in, match_nm, dist, rep) for every
   * dictionary name within `maxDist` edits of the normalized incoming
   * name — dist 0 is an exact hit, so the flagger doubles as the
   * known-entity lookup.
   */
  def flagAgainstIndex(stream: DataFrame, idx: DataFrame,
                       maxDist: Int = 3, blockLen: Int = 3,
                       idCol: String = "id",
                       nameCol: String = "name"): DataFrame = {
    require(maxDist >= 0,
      s"flagAgainstIndex: maxDist must be >= 0, got $maxDist")
    val q = stream.select(col(idCol).cast("long").as("id"),
        regexp_replace(trim(lower(col(nameCol))), "\\s+", " ").as("nm_in"))
      .filter(col("nm_in") =!= "")
      .withColumn("pk", substring(col("nm_in"), 1, blockLen))
      .withColumn("sk", substring(col("nm_in"), -blockLen, blockLen))
    val dict = idx.select(col("bk"), col("space"),
      col("nm").as("match_nm"), col("rep"))
    val j1 = q.join(dict.filter(col("space") === "p"),
      col("pk") === col("bk"))
    // prefix-mismatch filter = the arithmetic dedup: anything the prefix
    // join already emitted is excluded here
    val j2 = q.join(dict.filter(col("space") === "s"),
        col("sk") === col("bk"))
      .filter(substring(col("nm_in"), 1, blockLen)
        =!= substring(col("match_nm"), 1, blockLen))
    j1.unionByName(j2)
      .withColumn("dist", levenshtein(col("nm_in"), col("match_nm")))
      .filter(col("dist") <= maxDist)
      .select(col("id"), col("nm_in"), col("match_nm"), col("dist"),
        col("rep"))
  }
}

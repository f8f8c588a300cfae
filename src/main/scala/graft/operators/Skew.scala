package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Skew-mitigation utilities for joins whose key distribution is heavy-tailed
 * (at 100 TB a single hot key can pin one reducer for hours; AQE's skew-join
 * split only kicks in for sort-merge joins after runtime stats — explicit
 * salting is the deterministic tool when the skew is known).
 *
 * Pattern: FACT side gets a deterministic salt in [0, salt); DIM side is
 * replicated `salt`× with every salt value; the join key becomes
 * (key, salt) — the hot key's rows spread over `salt` reducers.
 */
object Skew {

  /** Add `_salt` ∈ [0, salt) to the (large, skewed) side — deterministic
    * per-row hash, stable across retries (no rand(): a recomputed task must
    * salt identically or the join drops/duplicates rows). */
  def saltFact(fact: DataFrame, salt: Int, uniqueCols: Seq[String]): DataFrame =
    fact.withColumn("_salt", pmod(xxhash64(uniqueCols.map(col): _*), lit(salt)).cast("int"))

  /** Replicate the (small) side `salt`× with each salt value. */
  def replicateDim(dim: DataFrame, salt: Int): DataFrame =
    dim.withColumn("_salt", explode(array((0 until salt).map(lit): _*)))

  /**
   * Salted equi-join: `fact ⋈ dim ON fact(key)=dim(key)` with the hot-key
   * rows spread over `salt` partitions. Result = plain inner join result
   * (the `_salt` column is dropped). `numPartitions` additionally sizes
   * the join's exchange explicitly (the [[JoinPlanner.advisedExchangeJoin]]
   * discipline applied to the salted shape: both sides hash-repartition
   * on `(key, _salt)` to exactly that width, which satisfies the join's
   * distribution requirement, so Spark reuses the sized exchanges instead
   * of inserting its own at the static `spark.sql.shuffle.partitions`);
   * None keeps the static conf. Either way the result rows are identical.
   */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, salt: Int,
                 factUniqueCols: Seq[String],
                 numPartitions: Option[Int] = None): DataFrame = {
    require(numPartitions.forall(_ >= 1),
      s"saltedJoin: numPartitions must be >= 1, got $numPartitions")
    val f0 = saltFact(fact, salt, factUniqueCols)
    val d0 = replicateDim(dim, salt)
    val (f, d) = numPartitions match {
      case Some(n) => (f0.repartition(n, col(key), col("_salt")),
        d0.repartition(n, col(key), col("_salt")))
      case None => (f0, d0)
    }
    f.join(d, Seq(key, "_salt")).drop("_salt")
  }

  /**
   * Key-skew PROFILE — the "should I salt this join" diagnostic, run
   * BEFORE committing to a shuffle on `key`: the top-`topK` hottest keys
   * with their exact counts and corpus shares, plus the totals needed to
   * read them (total rows, distinct keys, and the uniform-share
   * baseline). A key whose share ≫ 1/distinct is the reducer that pins a
   * 100 TB stage.
   *
   * Scale shape: ONE map-side-combined count per key, then
   * `orderBy().limit(topK)` — Spark plans it as TakeOrdered: O(n log k)
   * per-partition heaps merged on the driver, NO global sort and no
   * single-partition Window anywhere (the rank is assigned on the
   * already-k-row result); totals are a second 1-row aggregate of the
   * same counts frame (localCheckpointed — the corpus scan must not
   * fork). Shares are exact-integer ratios rounded once — full SQL
   * replay.
   *
   * Output: (rnk, key, cnt, share, total_rows, distinct_keys,
   * uniform_share) ordered by rank; ties break on the key ascending.
   */
  def keySkewProfile(df: DataFrame, key: String, topK: Int = 20): DataFrame = {
    require(topK >= 1, s"keySkewProfile: topK must be >= 1, got $topK")
    val counts = df.groupBy(col(key)).agg(count(lit(1)).as("cnt"))
      .localCheckpoint()
    val totals = counts.agg(sum(col("cnt")).as("total_rows"),
      count(lit(1)).as("distinct_keys"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("cnt").desc, col(key).asc)
    counts
      .orderBy(col("cnt").desc, col(key).asc).limit(topK)
      .withColumn("rnk", row_number().over(w)) // k-row frame: bounded
      .crossJoin(broadcast(totals))
      .select(col("rnk"), col(key), col("cnt"),
        round(col("cnt").cast("double") / col("total_rows"), 6).as("share"),
        col("total_rows"), col("distinct_keys"),
        round(lit(1.0) / col("distinct_keys"), 6).as("uniform_share"))
      .orderBy(col("rnk"))
  }
}

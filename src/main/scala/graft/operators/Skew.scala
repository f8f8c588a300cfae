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
   * (the `_salt` column is dropped).
   */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, salt: Int,
                 factUniqueCols: Seq[String]): DataFrame =
    saltFact(fact, salt, factUniqueCols)
      .join(replicateDim(dim, salt), Seq(key, "_salt"))
      .drop("_salt")
}

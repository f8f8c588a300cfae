package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Dense-vector column math over `array<float>` embedding columns
 * (TESTDATA.md `embeddings.parquet`), built on Spark's higher-order array
 * expressions (`zip_with`/`aggregate`/`transform`) — evaluated per-row on
 * executors, no UDF serialization, no driver involvement.
 *
 * All arithmetic is promoted to DOUBLE (float32 inputs are exact in float64)
 * and accumulated left-to-right so results are bit-reproducible across
 * engines — required for DuckDB-oracle parity and stable top-k ranking.
 */
object VectorFunctions {

  private def asD(v: Column): Column = v.cast("array<double>")

  /** Σ aᵢ·bᵢ, accumulated sequentially in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(asD(a), asD(b), (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** Σ aᵢ² (sequential). */
  def norm2Sq(a: Column): Column =
    aggregate(asD(a), lit(0.0), (acc, x) => acc + x * x)

  /** ‖a‖₂. */
  def norm2(a: Column): Column = sqrt(norm2Sq(a))

  /** Cosine similarity; 0 when either vector is all-zero. */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val na = norm2(a)
    val nb = norm2(b)
    when(na === 0.0 || nb === 0.0, lit(0.0)).otherwise(d / (na * nb))
  }

  /** Squared L2 distance Σ (aᵢ−bᵢ)². */
  def l2Sq(a: Column, b: Column): Column =
    aggregate(zip_with(asD(a), asD(b), (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x)

  /**
   * Sign bits of `nBits` pseudo-random hyperplane projections → one LONG
   * bucket key (signed random projection LSH for cosine). Hyperplane
   * component h(b, i) is a deterministic pseudo-random ±value derived from
   * xxhash64(b, i) — executor-side, no stored model, identical across runs
   * and engines. Near-parallel vectors collide with high probability.
   */
  def srpBucket(v: Column, nBits: Int, dim: Int, seed: Int = 0): Column = {
    val vd = asD(v)
    val bits = (0 until nBits).map { b =>
      // projection = Σ vᵢ · sign(xxhash64(seed, b, i)): ±1 components
      val proj = aggregate(
        zip_with(vd, sequence(lit(0), lit(dim - 1)),
          (x, i) => when(xxhash64(lit(seed), lit(b), i) % 2 === 0, x).otherwise(-x)),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, lit(1L << b)).otherwise(lit(0L))
    }
    bits.reduce((a: Column, c: Column) => a.bitwiseOR(c))
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/**
 * Scalar (SQ8) embedding quantization: per-vector min/max affine map to
 * 8-bit codes. At 100 TB of embeddings this is the difference between an
 * ANN corpus that fits executor memory and one that doesn't — 4× smaller
 * than float32 with a per-dimension reconstruction error bounded by half a
 * quantization step (`(max−min)/2·255`), which preserves cosine top-k
 * ordering for all but adversarially-close neighbors (re-rank survivors
 * against the float column when exactness matters).
 *
 * All column math uses built-in higher-order functions (codegen'd, no UDF);
 * this is a one-shot transformation pass, not a hot inner loop. Codes are
 * stored as `array<smallint>` (parquet has no unsigned byte; 0..255 fits).
 *
 * The gate (`quantize_embeddings`) emits the exactly-SQL-checkable per-vector
 * min/max plus a `recon_ok` boolean asserting every dimension reconstructs
 * within half a step — a broken scale or rounding flips the hash.
 */
object Quantization {

  /** (vec_id, codes: array<smallint>, q_min: double, q_scale: double). */
  def quantizeSQ8(embs: DataFrame,
                  idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val v = col(vecCol)
    val mn = array_min(v).cast("double")
    val mx = array_max(v).cast("double")
    // degenerate constant vector → scale 0; codes all 0, dequant returns mn
    val scale = when(mx > mn, (mx - mn) / lit(255.0)).otherwise(lit(0.0))
    embs.select(
      col(idCol),
      col(vecCol),
      mn.as("q_min"),
      scale.as("q_scale"))
      .withColumn("codes", transform(col(vecCol), x =>
        when(col("q_scale") === 0.0, lit(0))
          .otherwise(round((x.cast("double") - col("q_min")) / col("q_scale")))
          .cast("smallint")))
      .select(col(idCol), col("codes"), col("q_min"), col("q_scale"))
  }

  /** Reconstruct doubles from codes: `q_min + code × q_scale`. */
  def dequantize(codes: Column, qMin: Column, qScale: Column): Column =
    transform(codes, c => qMin + c.cast("double") * qScale)

  /** Reconstruct as `array<float>` — the element type the native
    * `vec_dot`/`vec_cosine` Catalyst expressions read in place, so a
    * quantized corpus scores through the same codegen'd path as floats. */
  def dequantizeF(codes: Column, qMin: Column, qScale: Column): Column =
    transform(codes, c => (qMin + c.cast("double") * qScale).cast("float"))

  /**
   * Persist the quantized corpus as the servable ANN artifact (codes +
   * per-vector affine params) sorted by id within files — at 100 TB this
   * table IS the search corpus; the float column stays in cold storage for
   * re-rank joins only.
   */
  def saveQuantized(quantized: DataFrame, path: String,
                    idCol: String = "vec_id"): Unit =
    quantized.sortWithinPartitions(col(idCol))
      .write.mode("overwrite").parquet(path)

  /** Read a stored quantized corpus back; schema (id, codes, q_min, q_scale). */
  def loadQuantized(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Max per-dimension |original − reconstructed| for a quantized row joined
    * back to its float vector — the audit column the gate bounds. */
  def reconstructionError(vec: Column, codes: Column, qMin: Column, qScale: Column): Column =
    aggregate(
      zip_with(vec, dequantize(codes, qMin, qScale),
        (x, d) => abs(x.cast("double") - d)),
      lit(0.0), (acc, e) => greatest(acc, e))

  // ------------------------------------------------------------ product (PQ)

  /** PQ codebook tensor: `m` subspaces × `ksub` centroids × `subDim` floats
    * — driver/broadcast-small by construction (m·ksub·subDim = one codebook
    * per corpus, KBs). */
  final case class PqCodebooks(m: Int, subDim: Int, books: Seq[Seq[Seq[Float]]])

  /**
   * Deterministic PQ codebooks: the `ksub` hash-order-sampled corpus vectors
   * (same stable pick as the IVF coarse quantizer — smallest
   * `md5(cast(id as string))`, reproducible across runs/layouts and
   * replayable in any engine with md5) sliced into `m` contiguous
   * subspaces, optionally refined by `kmeansIters` bounded Lloyd iterations.
   *
   * `kmeansIters = 0` (default) returns the raw sample — bit-identical to
   * the historical behavior, zero extra corpus passes. Each iteration runs
   * ONE narrow assignment pass through the codegen'd `vec_pq_encode` kernel
   * plus one tiny aggregate keyed on (subspace, code, dim) — m·ksub·subDim
   * keys, map-side-combined to KBs regardless of corpus size — and updates
   * each centroid to the exact-decimal mean of its assigned subvectors
   * (empty cells keep their previous centroid, the standard Lloyd
   * convention). Sums are DECIMAL-exact, so the refinement is deterministic
   * across partitionings — the same property every oracle-checked aggregate
   * here relies on.
   */
  def buildPqCodebooks(corpus: DataFrame, m: Int, ksub: Int,
                       idCol: String = "vec_id", vecCol: String = "embedding",
                       kmeansIters: Int = 0): PqCodebooks = {
    // null/NaN/Inf vectors cannot seed or train a codebook (a null in the
    // sample would NPE the collect; a NaN would poison every centroid mean)
    val clean = corpus.filter(VectorFunctions.isFiniteVec(col(vecCol)))
    val sample = clean.select(col(idCol), col(vecCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
      .limit(ksub)
      .collect()
      .map(_.getSeq[Float](1).toArray)
    require(sample.nonEmpty, "PQ codebook sample is empty")
    val dim = sample(0).length
    require(m >= 1 && dim % m == 0, s"dim $dim must divide into m=$m subspaces")
    val sub = dim / m
    val seed = PqCodebooks(m, sub,
      (0 until m).map(mi => sample.toSeq.map(v => v.slice(mi * sub, (mi + 1) * sub).toSeq)))
    (0 until kmeansIters).foldLeft(seed)((b, _) => lloydStepPq(clean, b, vecCol))
  }

  /** One Lloyd iteration over PQ codebooks: assign (codegen'd kernel, narrow)
    * → per-(subspace, code, dim) decimal-exact mean → new centroids. The only
    * driver collect is the m·ksub·subDim cell table (bounded by the codebook
    * shape, never by the corpus). */
  private def lloydStepPq(corpus: DataFrame, books: PqCodebooks, vecCol: String): PqCodebooks = {
    val sub = books.subDim
    val cells = corpus
      .select(col(vecCol).as("_v"),
        posexplode(graft.functions.VectorFunctions.pqEncode(col(vecCol), pqBooksLiteral(books)))
          .as(Seq("_mi", "_code")))
      .select(col("_mi"), col("_code"),
        posexplode(slice(col("_v"), col("_mi") * sub + 1, lit(sub))).as(Seq("_d", "_x")))
      // Decimal(18,12) stays Long-backed (fast compact arithmetic): 6 int
      // digits cover any sane embedding magnitude, and Spark widens the SUM
      // accumulator to Decimal(28,12) — exact to ~10^15 rows per cell.
      // A value with |x| >= 10^6 casts to NULL, which sum() would silently
      // skip — counted and rejected loudly instead (same job, no extra pass).
      .groupBy(col("_mi"), col("_code"), col("_d"))
      .agg(sum(col("_x").cast(org.apache.spark.sql.types.DecimalType(18, 12))).as("_s"),
        count(lit(1)).as("_n"),
        count(when(col("_x").cast(org.apache.spark.sql.types.DecimalType(18, 12)).isNull, 1))
          .as("_bad"))
      .collect()
      .map { r =>
        require(r.getLong(5) == 0L,
          s"PQ Lloyd refinement: ${r.getLong(5)} embedding value(s) in subspace " +
            s"${r.getInt(0)} exceed the compact-decimal range (|x| < 1e6) — " +
            "normalize embeddings before k-means refinement")
        ((r.getInt(0), r.getInt(1), r.getInt(2)), (r.getDecimal(3), r.getLong(4)))
      }.toMap
    PqCodebooks(books.m, sub,
      books.books.zipWithIndex.map { case (book, mi) =>
        book.zipWithIndex.map { case (cent, ki) =>
          cent.zipWithIndex.map { case (prev, d) =>
            cells.get((mi, ki, d))
              .map { case (s, n) => (s.doubleValue() / n).toFloat }
              .getOrElse(prev)
          }
        }
      })
  }

  /** The codebook tensor as a literal column for the codegen'd
    * `vec_pq_encode` / `vec_pq_cosine` kernels. */
  def pqBooksLiteral(b: PqCodebooks): Column = typedLit(b.books)

  /**
   * PQ-encode a corpus: (idCol, pq_codes array<int>). With m=8, ksub≤256
   * this is 8 bytes per vector — 32× smaller than a 64-dim float32 row; at
   * 100 TB of embeddings the codes table is what a scan actually reads.
   * One codegen'd expression per row, no UDF boundary.
   */
  def encodePq(embs: DataFrame, books: PqCodebooks,
               idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    embs.filter(VectorFunctions.isFiniteVec(col(vecCol))) // null/NaN/Inf vectors have no codes
      .select(col(idCol),
        VectorFunctions.pqEncode(col(vecCol), pqBooksLiteral(books))
          .as("pq_codes"))

  /** Persist a PQ index: the code table (id-sorted within files) plus the
    * codebook tensor alongside — same artifact convention as
    * [[graft.operators.Similarity.saveIvfIndex]] / [[saveQuantized]]. At
    * serving time the code table IS the ANN scan; the codebooks reload into
    * a literal. */
  def savePq(encoded: DataFrame, books: PqCodebooks, path: String,
             idCol: String = "vec_id"): Unit = {
    val spark = encoded.sparkSession
    encoded.sortWithinPartitions(col(idCol))
      .write.mode("overwrite").parquet(s"$path/codes")
    import spark.implicits._
    books.books.zipWithIndex
      .flatMap { case (book, mi) => book.zipWithIndex.map { case (c, ki) => (mi, ki, c) } }
      .toDF("m_idx", "k_idx", "centroid")
      .write.mode("overwrite").parquet(s"$path/books")
  }

  /** Read + validate the codebook table of a persisted PQ / IVF-PQ index —
    * the one shared loader (a format or validation change lands here once,
    * not in per-index copies). */
  private[graft] def readPqBooks(spark: org.apache.spark.sql.SparkSession,
                                 path: String): PqCodebooks = {
    val rows = spark.read.parquet(s"$path/books")
      .orderBy(col("m_idx"), col("k_idx")).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Float](2)))
    require(rows.nonEmpty, s"no PQ codebooks at $path/books — empty or corrupt index artifact")
    val books = rows.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (_, g) => g.sortBy(_._2).map(_._3).toSeq }
    val subDims = books.flatMap(_.map(_.length)).distinct
    require(subDims.size == 1,
      s"PQ codebooks at $path/books are ragged: centroid dims ${subDims.mkString(",")}")
    PqCodebooks(books.length, subDims.head, books)
  }

  /** Read a stored PQ index back: (code table, codebooks). */
  def loadPq(spark: org.apache.spark.sql.SparkSession,
             path: String): (DataFrame, PqCodebooks) =
    (spark.read.parquet(s"$path/codes"), readPqBooks(spark, path))
}

package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult.{TypeCheckFailure, TypeCheckSuccess}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * Native Catalyst expressions for dense-vector math over `array<float>`
 * embedding columns — the ANN / near-dup hot path (at 100 TB: corpus ×
 * queries dot products; every one crossing a UDF boundary pays a
 * catalyst→Scala array conversion that ALLOCATES AND COPIES the vector).
 * These evaluate directly against [[ArrayData]] — for parquet-backed
 * UnsafeArrayData that is primitive reads out of the column batch, zero
 * per-row allocation — and `defineCodeGen` keeps them inside whole-stage
 * codegen.
 *
 * Accumulation is sequential ascending-index in double, matching
 * [[graft.functions.VectorFunctions]] UDFs and the DuckDB list oracles
 * bit-for-bit (oracle parity convention).
 *
 * SQL names: `vec_dot`, `vec_norm2sq`, `vec_cosine` ([[GraftFunctions]]).
 */
object VecKernels {
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    s
  }

  def norm2Sq(a: ArrayData): Double = {
    var s = 0.0
    var i = 0
    val n = a.numElements()
    while (i < n) { val x = a.getFloat(i).toDouble; s += x * x; i += 1 }
    s
  }

  def cosine(a: ArrayData, b: ArrayData): Double = {
    val d = dot(a, b)
    val denom = math.sqrt(norm2Sq(a)) * math.sqrt(norm2Sq(b))
    if (denom == 0.0) 0.0 else d / denom
  }

  /**
   * Indices of the `k` nearest centroids by cosine (descending; ties break
   * toward the LOWER index — matching both `maxBy` first-max-wins and a
   * stable sort on the ascending-index input). `cents` is an
   * array<array<float>>; selection is O(k·nlist), fine for the broadcast-
   * small IVF coarse quantizer.
   */
  def topCentroids(v: ArrayData, cents: ArrayData, k: Int): ArrayData = {
    val n = cents.numElements()
    val scores = new Array[Double](n)
    var i = 0
    while (i < n) { scores(i) = cosine(v, cents.getArray(i)); i += 1 }
    val kk = math.max(math.min(k, n), 0)
    val out = new Array[Int](kk)
    val used = new Array[Boolean](n)
    var j = 0
    while (j < kk) {
      var best = -1
      var bs = Double.NegativeInfinity
      var c = 0
      while (c < n) {
        if (!used(c) && (best < 0 || scores(c) > bs)) { best = c; bs = scores(c) }
        c += 1
      }
      used(best) = true
      out(j) = best
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /**
   * Product-quantization encode: `codes(mi)` = index of the centroid in
   * `books(mi)` nearest (L2 — the metric PQ reconstruction minimizes; ties →
   * lower code) to the `mi`-th contiguous subvector of `v`. `books` is the
   * M × ksub × subDim codebook tensor (a literal, driver-built,
   * broadcast-small); each book must be non-empty with one shared centroid
   * dim (checked — an empty or ragged book would silently shift every
   * later subspace's offset and emit codes that `pqCosine` dereferences
   * out of bounds). A vector shorter than the codebook span zero-pads
   * (never reads out of bounds).
   */
  def pqEncode(v: ArrayData, books: ArrayData): ArrayData = {
    val m = books.numElements()
    val out = new Array[Int](m)
    val vn = v.numElements()
    var off = 0
    var mi = 0
    while (mi < m) {
      val book = books.getArray(mi)
      val ksub = book.numElements()
      if (ksub == 0)
        throw new IllegalArgumentException(s"vec_pq_encode: codebook $mi is empty")
      // one shared width per subspace, derived once — a ragged book would
      // otherwise corrupt the offset of every subsequent subspace
      val sub = book.getArray(0).numElements()
      var best = 0
      var bd = Double.MaxValue
      var k = 0
      while (k < ksub) {
        val c = book.getArray(k)
        if (c.numElements() != sub)
          throw new IllegalArgumentException(
            s"vec_pq_encode: codebook $mi is ragged (centroid $k dim ${c.numElements()} != $sub)")
        var d = 0.0
        var i = 0
        while (i < sub) {
          val qv = if (off + i < vn) v.getFloat(off + i).toDouble else 0.0
          val diff = qv - c.getFloat(i).toDouble
          d += diff * diff
          i += 1
        }
        if (d < bd) { bd = d; best = k }
        k += 1
      }
      out(mi) = best
      off += sub
      mi += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /**
   * Asymmetric-distance (ADC) cosine: cos(q, x̂) where
   * x̂ = concat(books(mi)(codes(mi))) is the PQ reconstruction. One pass over
   * the selected centroids; the query stays full-precision (the A in ADC).
   */
  def pqCosine(q: ArrayData, codes: ArrayData, books: ArrayData): Double = {
    val m = math.min(codes.numElements(), books.numElements())
    val qn = q.numElements()
    var dot = 0.0
    var nx = 0.0
    var off = 0
    var mi = 0
    while (mi < m) {
      val c = books.getArray(mi).getArray(codes.getInt(mi))
      val sub = c.numElements()
      var i = 0
      while (i < sub) {
        val cv = c.getFloat(i).toDouble
        val qv = if (off + i < qn) q.getFloat(off + i).toDouble else 0.0
        dot += qv * cv
        nx += cv * cv
        i += 1
      }
      off += sub
      mi += 1
    }
    val denom = math.sqrt(norm2Sq(q)) * math.sqrt(nx)
    if (denom == 0.0) 0.0 else dot / denom
  }

  /**
   * Signed-random-projection bucket: bit b of the result = 1 iff
   * `v · signs(b) ≥ 0`. `signs` is the nBits × dim ±1 hyperplane table
   * (a literal — splitmix64-derived at plan build, broadcast-small).
   * Arithmetic matches the legacy UDF exactly: double promotion,
   * ascending-index accumulation, bound `min(|v|, |signs(b)|)`.
   */
  def srpBucket(v: ArrayData, signs: ArrayData): Long = {
    val nBits = signs.numElements()
    var out = 0L
    var b = 0
    while (b < nBits) {
      val row = signs.getArray(b)
      val n = math.min(v.numElements(), row.numElements())
      var proj = 0.0
      var i = 0
      while (i < n) { proj += v.getFloat(i).toDouble * row.getDouble(i); i += 1 }
      if (proj >= 0) out |= (1L << b)
      b += 1
    }
    out
  }
}

private[plans] trait FloatArrayInputs { self: Expression =>
  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(c => c.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })) TypeCheckSuccess
    else TypeCheckFailure(
      s"$prettyName expects array<float> inputs, got " +
        children.map(_.dataType.simpleString).mkString(", "))
  def children: Seq[Expression]
}

/** Σ aᵢ·bᵢ in double (ascending index). */
case class VecDot(left: Expression, right: Expression)
  extends BinaryExpression with FloatArrayInputs {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"
  override def nullSafeEval(a: Any, b: Any): Any =
    VecKernels.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.VecKernels.dot($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Σ aᵢ² in double. */
case class VecNorm2Sq(child: Expression)
  extends UnaryExpression with FloatArrayInputs {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_norm2sq"
  override def nullSafeEval(a: Any): Any =
    VecKernels.norm2Sq(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.plans.VecKernels.norm2Sq($a)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/**
 * `vec_top_centroids(v, centroids, k)` → array<int>: indices of the `k`
 * centroids nearest to `v` by cosine (desc, ties → lower index). The IVF
 * coarse-quantizer kernel — `centroids` is a LITERAL array<array<float>>
 * (nlist × dim, driver/broadcast-small by construction), so assignment
 * (`k=1` + `element_at(.., 1)`) and query probing (`k=nprobe` + `explode`)
 * stay inside whole-stage codegen with zero UDF conversion per row.
 */
case class VecTopCentroids(first: Expression, second: Expression, third: Expression)
  extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "vec_top_centroids"

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(ArrayType(FloatType, _), _), IntegerType) => true
      case _ => false
    }
    if (ok) TypeCheckSuccess
    else TypeCheckFailure(
      s"$prettyName expects (array<float>, array<array<float>>, int), got " +
        children.map(_.dataType.simpleString).mkString(", "))
  }

  override def nullSafeEval(v: Any, cents: Any, k: Any): Any =
    VecKernels.topCentroids(
      v.asInstanceOf[ArrayData], cents.asInstanceOf[ArrayData], k.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (v, c, k) => s"graft.plans.VecKernels.topCentroids($v, $c, $k)")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}

/**
 * `vec_srp_bucket(v, signs)` → bigint: SRP-LSH bucket key of `v` against a
 * LITERAL nBits × dim ±1 sign table (see [[VecKernels.srpBucket]]). The
 * bucket assigner of [[graft.operators.Dedup.embeddingNearDup]] /
 * [[graft.operators.Similarity]] LSH — it runs once per corpus vector, so it
 * must stay inside whole-stage codegen with no UDF conversion per row.
 */
case class VecSrpBucket(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "vec_srp_bucket"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(ArrayType(DoubleType, _), _)) => TypeCheckSuccess
      case (l, r) => TypeCheckFailure(
        s"$prettyName expects (array<float>, array<array<double>>), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override def nullSafeEval(v: Any, signs: Any): Any =
    VecKernels.srpBucket(v.asInstanceOf[ArrayData], signs.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (v, s) => s"graft.plans.VecKernels.srpBucket($v, $s)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/**
 * `vec_pq_encode(v, books)` → array<int>: per-subspace nearest-centroid
 * codes against a LITERAL M × ksub × subDim codebook tensor (see
 * [[VecKernels.pqEncode]]). The PQ encoder runs once per corpus vector —
 * the 100 TB compression pass — so it must stay inside whole-stage codegen.
 */
case class VecPqEncode(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "vec_pq_encode"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(ArrayType(ArrayType(FloatType, _), _), _)) =>
        TypeCheckSuccess
      case (l, r) => TypeCheckFailure(
        s"$prettyName expects (array<float>, array<array<array<float>>>), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override def nullSafeEval(v: Any, books: Any): Any =
    VecKernels.pqEncode(v.asInstanceOf[ArrayData], books.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (v, b) => s"graft.plans.VecKernels.pqEncode($v, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/**
 * `vec_pq_cosine(q, codes, books)` → double: asymmetric (full-precision
 * query × PQ-reconstructed corpus) cosine — the ADC scoring kernel of
 * [[graft.operators.Similarity]]'s PQ path. Runs once per (query, corpus
 * code row), the ANN hot loop, so it must stay inside whole-stage codegen.
 */
case class VecPqCosine(first: Expression, second: Expression, third: Expression)
  extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_pq_cosine"

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(IntegerType, _),
            ArrayType(ArrayType(ArrayType(FloatType, _), _), _)) => true
      case _ => false
    }
    if (ok) TypeCheckSuccess
    else TypeCheckFailure(
      s"$prettyName expects (array<float>, array<int>, array<array<array<float>>>), got " +
        children.map(_.dataType.simpleString).mkString(", "))
  }

  override def nullSafeEval(q: Any, codes: Any, books: Any): Any =
    VecKernels.pqCosine(q.asInstanceOf[ArrayData],
      codes.asInstanceOf[ArrayData], books.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (q, c, b) => s"graft.plans.VecKernels.pqCosine($q, $c, $b)")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}

/** dot/(‖a‖·‖b‖); 0 for an all-zero vector. */
case class VecCosine(left: Expression, right: Expression)
  extends BinaryExpression with FloatArrayInputs {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_cosine"
  override def nullSafeEval(a: Any, b: Any): Any =
    VecKernels.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.VecKernels.cosine($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

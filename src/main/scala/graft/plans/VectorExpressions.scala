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

package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * `image_dims(payload)` → `struct<format:string, width:int, height:int>`:
 * real PNG-IHDR / JPEG-SOF header parsing over a binary column, inside
 * whole-stage codegen (generated Java calls [[ImageDims.dimsRow]] directly —
 * no UDF boundary, no row-level boxing beyond the tiny result struct).
 * Returns null for anything that is not a parseable PNG/JPEG container —
 * corrupt blobs are DATA at corpus scale, not exceptions. The byte-walking
 * kernel is [[graft.operators.MediaCodec.imageDims]]; its encode→parse
 * roundtrip is oracle-gated by `multimodal_image_dims` (DuckDB recomputes
 * the expected dims from the fixture generator's formulas).
 */
case class ImageDims(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ImageDims.Schema
  override def nullable: Boolean = true
  override def prettyName: String = "image_dims"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckSuccess
    case t => TypeCheckFailure(s"$prettyName expects binary, got ${t.simpleString}")
  }

  override def nullSafeEval(b: Any): Any =
    ImageDims.dimsRow(b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => s"""
      ${ev.value} = graft.plans.ImageDims.dimsRow($b);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object ImageDims {
  val Schema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false)))

  /** Static entry point referenced by the generated Java code. */
  def dimsRow(b: Array[Byte]): InternalRow =
    graft.operators.MediaCodec.imageDims(b) match {
      case Some((f, w, h)) =>
        new GenericInternalRow(Array[Any](UTF8String.fromString(f), w, h))
      case None => null
    }
}

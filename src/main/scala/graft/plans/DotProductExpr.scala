package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/**
 * Fused dot-product kernels over catalyst arrays. The zip_with +
 * aggregate column form is semantically right but materializes a
 * 64-element intermediate array PER PAIR — at 12.5M brute-force
 * pairs that allocation dominated the v03 profile. These loops read
 * both operands in place.
 *
 * Accumulation is double, left-to-right — bit-identical to the
 * higher-order-function form and to the DuckDB `list_dot_product`
 * the vector oracles use. Null ELEMENTS read as 0 (no data path
 * produces them; the HOF form would null the whole product instead);
 * length mismatch truncates to the shorter operand.
 */
object VectorKernels {
  def dotFF(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0; var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i)) acc += a.getFloat(i).toDouble * b.getFloat(i)
      i += 1
    }
    acc
  }
  def dotFD(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0; var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i)) acc += a.getFloat(i).toDouble * b.getDouble(i)
      i += 1
    }
    acc
  }
  def dotDF(a: ArrayData, b: ArrayData): Double = dotFD(b, a)
  def dotDD(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0; var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i)) acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }
}

/** Codegen'd dot product of two float/double array columns (mixed
  * element types allowed). Stays inside WholeStageCodegen — one
  * static call, no UDF boundary, no intermediate array. */
case class DotProductExpr(left: Expression, right: Expression) extends BinaryExpression {

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(t @ (FloatType | DoubleType), _) => Some(t)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (elemType(left), elemType(right)) match {
      case (Some(_), Some(_)) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"dot_product requires array<float|double> operands, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  private lazy val kernel = (elemType(left).get, elemType(right).get) match {
    case (FloatType, FloatType) => "dotFF"
    case (FloatType, DoubleType) => "dotFD"
    case (DoubleType, FloatType) => "dotDF"
    case (DoubleType, DoubleType) => "dotDD"
  }

  override def nullSafeEval(a: Any, b: Any): Any = kernel match {
    case "dotFF" => VectorKernels.dotFF(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    case "dotFD" => VectorKernels.dotFD(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    case "dotDF" => VectorKernels.dotDF(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    case "dotDD" => VectorKernels.dotDD(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.VectorKernels.$kernel($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductExpr =
    copy(left = newLeft, right = newRight)
}

object DotProductExpr {
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(DotProductExpr(
      org.apache.spark.sql.graft.ColumnBridge.expression(a),
      org.apache.spark.sql.graft.ColumnBridge.expression(b)))
}

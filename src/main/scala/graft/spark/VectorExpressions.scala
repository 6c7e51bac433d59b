package graft.spark

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Static kernel the generated (whole-stage codegen) Java calls into. */
object VecKernel {
  /** Sequential dot product over the leading min(|a|, |b|) elements —
    * the SAME left-to-right float-op order as
    * `aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, v) -> acc + v)`
    * and DuckDB's `list_sum(list_transform(...))`, so results are
    * bit-identical to the oracle twins. Float elements widen exactly
    * ((double) f == CAST(f AS DOUBLE)). Arrays are assumed null-element
    * free (embedding columns are).
    */
  def dot(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      s += x * y
      i += 1
    }
    s
  }
}

/** Native codegen'd Catalyst expression (NOT a UDF): 64-dim dot products in
  * the ANN / near-dup / IVF paths were the per-candidate hot loop, and the
  * `aggregate(zip_with(...))` higher-order form evaluates one interpreted
  * lambda per element (~µs per 64-dim dot). This emits a tight primitive
  * loop instead — same "(b) custom Catalyst Expression" tier as
  * [[ExtractTurnField]] — while preserving the exact float summation order
  * of the HOF form (and therefore of every DuckDB oracle twin). Accepts
  * array<float> or array<double> on either side; result is double.
  */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(t @ (DoubleType | FloatType), _) => Some(t)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemType(left).isDefined && elemType(right).isDefined)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"vec_dot expects (array<float|double>, array<float|double>), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable

  private def leftFloat = elemType(left).contains(FloatType)
  private def rightFloat = elemType(right).contains(FloatType)

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecKernel.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      leftFloat, rightFloat)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.spark.VecKernel.dot($a, $b, $leftFloat, $rightFloat)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** DataFrame-DSL access to the native vector expressions. */
object VectorFunctions {
  def vecDot(a: Column, b: Column): Column =
    GraftColumnBridge.column(
      VecDot(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}

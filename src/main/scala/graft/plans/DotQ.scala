package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** `dot_q(a, b)` — exact integer dot product of two quantized
  * (array<long>) vectors in one compiled pass.
  *
  * Value-identical to the built-in form
  * `aggregate(zip_with(a, b, (x,y) -> x*y), 0L, +)` on equal-length
  * arrays ([[graft.operators.Similarity.dotQ]], equality tested) —
  * the scoring inner loop of brute-force top-k, ANN and near-dup
  * verify, and (as `dot_q(v, v)`) the squared norm. The built-in
  * evaluates two interpreted higher-order lambdas and materializes
  * the product array per pair; this is a fused multiply-add loop.
  * Registered by [[GraftExtensions]] as `dot_q`.
  */
case class DotQ(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"dot_q requires two array<bigint> args, got ${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "dot_q"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DotQOps.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.DotQOps.compute($a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotQ =
    copy(left = newLeft, right = newRight)
}

object DotQOps {
  def compute(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0L
    var k = 0
    while (k < n) { dot += a.getLong(k) * b.getLong(k); k += 1 }
    dot
  }
}

package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType}

/** `quantize_vec(vec, scale)` — fixed-point quantization of a float/
  * double vector to array<long> at 10^scale, in one compiled pass:
  * each element is floor(x · 10^scale + 0.5) exactly as the built-in
  * lambda form computes it ([[graft.operators.Similarity.quantize]],
  * equality tested), so the two are interchangeable bit for bit.
  *
  * This is the entry ramp of EVERY similarity path (brute force, LSH,
  * IVF, SemDedup, random projection): the built-in is an interpreted
  * higher-order `transform` evaluated per row in the scan stage; this
  * runs the multiply-floor loop in compiled code next to `dot_q`.
  * Registered by [[GraftExtensions]] as `quantize_vec`.
  */
case class QuantizeVec(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType, _), IntegerType) => TypeCheckResult.TypeCheckSuccess
    case (ArrayType(DoubleType, _), IntegerType) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"quantize_vec requires (array<float|double>, int), got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }

  private def isFloat: Boolean = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def dataType: DataType = ArrayType(LongType,
    containsNull = left.dataType.asInstanceOf[ArrayType].containsNull)
  override def prettyName: String = "quantize_vec"

  override protected def nullSafeEval(arr: Any, scale: Any): Any =
    QuantizeVecOps.compute(arr.asInstanceOf[ArrayData], isFloat,
      scale.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, s) =>
      s"${ev.value} = graft.plans.QuantizeVecOps.compute($a, $isFloat, $s);")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): QuantizeVec =
    copy(left = newLeft, right = newRight)
}

object QuantizeVecOps {
  def compute(a: ArrayData, isFloat: Boolean, scale: Int): ArrayData = {
    val p = math.pow(10, scale)
    val n = a.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        val d = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
        out(i) = java.lang.Math.floor(d * p + 0.5).toLong
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}

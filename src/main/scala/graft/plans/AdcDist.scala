package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** `adc_dist(qtab, codes)` — asymmetric-distance (ADC) table lookup
  * sum for product quantization, in one compiled pass:
  * Σ_s qtab[s][codes[s]] over the m subspaces.
  *
  * Value-identical to the built-in form
  * `aggregate(sequence(0, m-1), 0L, (acc, s) ->
  *   acc + element_at(element_at(qtab, s+1), codes[s+1]+1))`
  * for in-range codes (equality tested in SimilaritySpec). The
  * built-in evaluates an interpreted fold with two `element_at`
  * probes per subspace ON EVERY (query, corpus) PAIR — the single
  * hottest loop of PQ search, |Q|·|C|·m lookups — where this is a
  * flat array walk. Codes must index within their qtab row (PQ
  * encode guarantees [0, ksub)); out-of-range codes throw rather
  * than silently null like the non-ANSI built-in. A NULL element
  * (null code, null qtab row, null table cell) propagates to a NULL
  * result — the same answer the `element_at` fold gives — so the two
  * forms stay value-identical on nullable-element inputs too.
  * Registered by [[GraftExtensions]] as `adc_dist`.
  */
case class AdcDist(left: Expression, right: Expression) extends BinaryExpression {

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(ArrayType(LongType, _), _), ArrayType(LongType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      "adc_dist requires (array<array<bigint>>, array<bigint>), got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "adc_dist"

  override protected def nullSafeEval(qtab: Any, codes: Any): Any =
    AdcDistOps.compute(qtab.asInstanceOf[ArrayData], codes.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (qtab, codes) =>
      s"""java.lang.Long ${ev.value}_r = graft.plans.AdcDistOps.compute($qtab, $codes);
         |if (${ev.value}_r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${ev.value}_r.longValue(); }""".stripMargin)

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): AdcDist =
    copy(left = newLeft, right = newRight)
}

object AdcDistOps {
  /** Boxed return so a null ELEMENT can propagate as SQL NULL (the
    * `element_at` fold's answer) instead of reading 0/garbage; the
    * non-null fast path allocates one box per row, outside the loop. */
  def compute(qtab: ArrayData, codes: ArrayData): java.lang.Long = {
    val m = math.min(qtab.numElements(), codes.numElements())
    var acc = 0L
    var s = 0
    while (s < m) {
      if (codes.isNullAt(s) || qtab.isNullAt(s)) return null
      val row = qtab.getArray(s)
      val j = codes.getLong(s).toInt
      if (row.isNullAt(j)) return null
      acc += row.getLong(j)
      s += 1
    }
    java.lang.Long.valueOf(acc)
  }
}

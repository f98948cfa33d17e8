package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** `pq_encode(vq, codebook, m)` — product-quantization encode in one
  * compiled pass: for each of the `m` subspaces, the index of the
  * nearest sub-centroid (exact integer L2, ties to the lowest index)
  * from a FLAT codebook literal of m·ksub rows × subDim columns.
  *
  * Value-identical to the built-in form
  * `transform(sequence(0, m-1), s -> array_min(transform(sequence(0,
  * ksub-1), j -> struct(l2(sub(vq,s), cb[s][j]), j))).j` (struct
  * ordering = (distance, index), so both pick the lowest index among
  * minimal distances — equality tested in SimilaritySpec). The
  * built-in runs m·ksub interpreted lambda L2s and materializes a
  * struct array PER VECTOR; this is three nested compiled loops.
  * Registered by [[GraftExtensions]] as `pq_encode`.
  */
case class PqEncode(first: Expression, second: Expression, third: Expression)
  extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(LongType, _), ArrayType(ArrayType(LongType, _), _), IntegerType) =>
        // m is almost always a literal — reject a non-positive subspace
        // count at ANALYSIS time with a named error instead of a
        // divide-by-zero surfacing from generated code at runtime.
        if (third.foldable) {
          val m = third.eval()
          if (m == null || m.asInstanceOf[Int] < 1)
            return TypeCheckResult.TypeCheckFailure(
              s"pq_encode: m (number of subspaces) must be >= 1, got $m")
        }
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "pq_encode requires (array<bigint>, array<array<bigint>>, int), got " +
          s"${first.dataType.catalogString}, ${second.dataType.catalogString}, ${third.dataType.catalogString}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "pq_encode"

  override protected def nullSafeEval(vq: Any, cb: Any, m: Any): Any =
    PqEncodeOps.compute(vq.asInstanceOf[ArrayData], cb.asInstanceOf[ArrayData],
      m.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (vq, cb, m) =>
      s"${ev.value} = graft.plans.PqEncodeOps.compute($vq, $cb, $m);")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): PqEncode =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object PqEncodeOps {
  /** Runtime guards cover the non-foldable-m path (checkInputDataTypes
    * already rejects foldable m < 1): a bad subspace count or a vector/
    * codebook whose length does not tile into m subspaces fails with a
    * NAMED error instead of ArithmeticException / silently truncated
    * trailing dimensions. */
  def compute(vq: ArrayData, cb: ArrayData, m: Int): ArrayData = {
    if (m < 1) throw new IllegalArgumentException(
      s"pq_encode: m (number of subspaces) must be >= 1, got $m")
    if (vq.numElements() % m != 0) throw new IllegalArgumentException(
      s"pq_encode: vector length ${vq.numElements()} is not divisible by m=$m " +
        "(trailing dimensions would be silently dropped)")
    if (cb.numElements() % m != 0) throw new IllegalArgumentException(
      s"pq_encode: flat codebook length ${cb.numElements()} is not divisible by m=$m")
    val subDim = vq.numElements() / m
    val ksub = cb.numElements() / m
    val codes = new Array[Long](m)
    var s = 0
    while (s < m) {
      var bestD = Long.MaxValue
      var bestJ = 0
      var j = 0
      while (j < ksub) {
        val row = cb.getArray(s * ksub + j)
        var d = 0L
        var k = 0
        while (k < subDim) {
          val diff = vq.getLong(s * subDim + k) - row.getLong(k)
          d += diff * diff
          k += 1
        }
        if (d < bestD) { bestD = d; bestJ = j }
        j += 1
      }
      codes(s) = bestJ.toLong
      s += 1
    }
    new GenericArrayData(codes)
  }
}

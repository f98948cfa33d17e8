package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** `nearest_cells(vq, centroids, n)` — the ids of the `n` nearest IVF
  * cells of a quantized vector, by exact integer L2 with cell-index
  * tie-break, in one compiled pass.
  *
  * Value-identical to the built-in form in
  * [[graft.operators.Similarity.ivfTopK]] (sort of
  * struct(dist, cell) over a transform — numCells interpreted lambda
  * evaluations plus an array sort per row; equality tested). The
  * centroid literal is foldable: it is evaluated once at plan time
  * and cached per expression instance. Registered by
  * [[GraftExtensions]] as `nearest_cells`.
  */
case class NearestCells(left: Expression, right: Expression, n: Int)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(ArrayType(LongType, _), _))
      if right.foldable && n > 0 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      "nearest_cells requires (array<bigint>, foldable array<array<bigint>>, positive n)")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "nearest_cells"

  @transient private lazy val centroids: Array[Array[Long]] = {
    val arr = right.eval().asInstanceOf[ArrayData]
    Array.tabulate(arr.numElements()) { i =>
      arr.getArray(i).toLongArray()
    }
  }

  override protected def nullSafeEval(v: Any, ignoredCentroids: Any): Any =
    NearestCellsOps.compute(v.asInstanceOf[ArrayData], centroids, n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the foldable centroid child is evaluated once and cached; codegen
    // references the converted long[][] instead of re-reading ArrayData
    val centRef = ctx.addReferenceObj("centroids", centroids, "long[][]")
    nullSafeCodeGen(ctx, ev, (a, _) =>
      s"${ev.value} = graft.plans.NearestCellsOps.compute($a, $centRef, $n);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): NearestCells =
    copy(left = newLeft, right = newRight)
}

object NearestCellsOps {
  def compute(vq: ArrayData, centroids: Array[Array[Long]], n: Int): ArrayData = {
    val v = vq.toLongArray()
    val k = centroids.length
    val dists = new Array[Long](k)
    var c = 0
    while (c < k) {
      val w = centroids(c)
      val m = math.min(v.length, w.length)
      var d = 0L
      var j = 0
      while (j < m) { val t = v(j) - w(j); d += t * t; j += 1 }
      dists(c) = d
      c += 1
    }
    // select n smallest (dist, cell) — k is tiny, simple selection
    val out = new Array[Any](math.min(n, k))
    val used = new Array[Boolean](k)
    var s = 0
    while (s < out.length) {
      var best = -1
      var bd = Long.MaxValue
      var i = 0
      while (i < k) {
        if (!used(i) && (dists(i) < bd || (dists(i) == bd && best == -1))) {
          bd = dists(i); best = i
        }
        i += 1
      }
      used(best) = true
      out(s) = best.toLong
      s += 1
    }
    new GenericArrayData(out)
  }
}

package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** `hyperplane_sig(vec, numPlanes)` — the hyperplane-LSH sign-bit
  * signature of a raw embedding in one pass per row.
  *
  * Value-identical to
  * `lshBucket(quantize(vec), numPlanes)` ([[graft.operators.Similarity]],
  * equality tested): q_k = floor(x_k·10⁶ + 0.5) as long, bit p set ⇔
  * Σ_k q_k·w[p,k] ≥ 0 with the same md5-derived plane literals. The
  * built-in form evaluates numPlanes interpreted zip_with/aggregate
  * lambdas per row (numPlanes×dim boxed ops); this runs the
  * numPlanes×dim multiply-adds in compiled code inside the scan
  * stage. Registered by [[GraftExtensions]] as `hyperplane_sig`.
  */
case class HyperplaneSig(child: Expression, numPlanes: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) if numPlanes > 0 && numPlanes <= 60 =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_sig requires array<float|double> and planes in (0,60], got ${child.dataType.catalogString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_sig"

  // lazy: reading child.dataType eagerly would throw UnresolvedException
  // if the expression is constructed/copied with an unresolved child on
  // an analyzer transform path (the pattern Spark's own expressions use)
  private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(input: Any): Any =
    HyperplaneSigOps.compute(input.asInstanceOf[ArrayData], numPlanes, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.HyperplaneSigOps.compute($c, $numPlanes, $isFloat);")

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSig =
    copy(child = newChild)
}

object HyperplaneSigOps {
  private val Dim = 64
  private val planeCache = new java.util.concurrent.ConcurrentHashMap[Int, Array[Long]]()

  private def planes(numPlanes: Int): Array[Long] =
    planeCache.computeIfAbsent(numPlanes,
      n => graft.operators.Similarity.planeComponents(n, Dim).toArray)

  def compute(vec: ArrayData, numPlanes: Int, isFloat: Boolean): Long = {
    val w = planes(numPlanes)
    val n = vec.numElements()
    val q = new Array[Long](Dim)
    var k = 0
    val m = if (n < Dim) n else Dim
    while (k < m) {
      val x = if (isFloat) vec.getFloat(k).toDouble else vec.getDouble(k)
      q(k) = math.floor(x * 1000000.0 + 0.5).toLong
      k += 1
    }
    var sig = 0L
    var p = 0
    while (p < numPlanes) {
      var dot = 0L
      var j = 0
      val off = p * Dim
      while (j < Dim) { dot += q(j) * w(off + j); j += 1 }
      if (dot >= 0L) sig |= (1L << p)
      p += 1
    }
    sig
  }
}

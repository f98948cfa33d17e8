package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** `winnow_fps(words, k, w)` — the DISTINCT winnowing fingerprints
  * (Schleimer, Wilkerson & Aiken 2003 / MOSS) of a word array in ONE
  * narrow pass per row: hash every ordered k-gram (first-15-md5-hex
  * as a long, the [[MinHashSigOps.hash60]] digest every hash-bearing
  * operator shares), slide a w-window over the hash sequence keeping
  * each window's minimum, and return the distinct minima SORTED
  * ascending.
  *
  * Value-identical to the relational form (posexplode grams → window
  * MIN over the doc partition → distinct; equality tested), but the
  * whole computation stays inside the scan stage: the relational form
  * shuffles and sorts EVERY gram row through a doc-partitioned window
  * — a full-corpus exchange — while this emits the winnowed set
  * (~2/(w+1) of the grams) at parquet-reader speed. The sliding
  * minimum runs over a monotonic index deque, O(grams) not
  * O(grams·w).
  *
  * Registered by [[GraftExtensions]] as `winnow_fps`.
  */
case class WinnowFps(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) if k >= 1 && w >= 1 =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"winnow_fps requires array<string> and positive k/w, got ${child.dataType.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fps"

  override protected def nullSafeEval(input: Any): Any =
    WinnowFpsOps.compute(input.asInstanceOf[ArrayData], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.WinnowFpsOps.compute($c, $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): WinnowFps =
    copy(child = newChild)
}

object WinnowFpsOps {

  /** Distinct sorted window minima of the k-gram hash sequence. */
  def compute(words: ArrayData, k: Int, w: Int): ArrayData = {
    val n = words.numElements()
    val grams = n - k + 1
    if (grams < w) return new GenericArrayData(Array.empty[Long])
    // materialize the word strings once; k-gram bytes are rebuilt per
    // gram via one builder (grams overlap by k-1 words)
    val ws = new Array[String](n)
    var i = 0
    while (i < n) { ws(i) = words.getUTF8String(i).toString; i += 1 }
    val gh = new Array[Long](grams)
    val sb = new java.lang.StringBuilder
    var g = 0
    while (g < grams) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(ws(g + j))
        j += 1
      }
      gh(g) = MinHashSigOps.hash60(
        sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      g += 1
    }
    // sliding minimum via monotonic index deque
    val out = new java.util.TreeSet[java.lang.Long]()
    val dq = new Array[Int](grams)
    var head = 0
    var tail = 0 // exclusive
    var p = 0
    while (p < grams) {
      while (tail > head && gh(dq(tail - 1)) >= gh(p)) tail -= 1
      dq(tail) = p; tail += 1
      if (dq(head) <= p - w) head += 1
      if (p >= w - 1) out.add(gh(dq(head)))
      p += 1
    }
    val res = new Array[Long](out.size())
    val it = out.iterator()
    var r = 0
    while (it.hasNext) { res(r) = it.next(); r += 1 }
    new GenericArrayData(res)
  }
}

package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `word_shingles(text, n)` — distinct word n-grams of a
  * whitespace-tokenized text in one pass per row.
  *
  * Value-identical to the built-in-expression form
  * ([[graft.functions.Funcs.wordShingles]], equality tested),
  * including its edge semantics: split on single spaces KEEPING empty
  * tokens, join with single spaces, first-occurrence order after
  * dedup, empty array when fewer than n words. The built-in form
  * composes transform + slice + concat_ws, which are higher-order /
  * collection expressions with no codegen — per-row cost ~n_words
  * interpreted lambda frames and array allocations. This expression
  * is the hot inner loop of every shingle pipeline (minhash, ngram
  * Jaccard, decontamination), so it earns the native treatment.
  * Registered by [[GraftExtensions]] as `word_shingles`.
  */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType if n > 0 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"word_shingles requires a string and a positive n, got ${child.dataType.catalogString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override protected def nullSafeEval(input: Any): Any =
    WordShinglesOps.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.WordShinglesOps.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object WordShinglesOps {
  def compute(text: UTF8String, n: Int): ArrayData = {
    // split on single spaces, KEEPING empty tokens (mirrors
    // split(text, " ") with limit -1)
    val words = text.toString.split(" ", -1)
    if (words.length < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]()
    val sb = new java.lang.StringBuilder
    var i = 0
    val last = words.length - n
    while (i <= last) {
      sb.setLength(0)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(words(i + k))
        k += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = UTF8String.fromString(it.next()); j += 1 }
    new GenericArrayData(out)
  }
}

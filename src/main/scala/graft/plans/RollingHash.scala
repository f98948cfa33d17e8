package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `rolling_hash(str)` — polynomial (Karp-Rabin) hash over the UTF-8
  * bytes of a string: h = fold(h·31 + byte) mod 1_000_000_007.
  *
  * This is the document-fingerprinting primitive (SURVEY's north-star
  * text-analysis ops). It is the ONE place the engine drops to a custom
  * Catalyst `Expression`: the byte-level fold has no built-in
  * equivalent that avoids exploding each document into a row per
  * character, and as a native expression with `doGenCode` it runs
  * inside whole-stage codegen at scan speed — zero allocation, one
  * pass, ~length·2 integer ops per row. Everything in the reference's
  * own operator inventory maps to built-ins (SURVEY §7.3); custom
  * Catalyst work is reserved for extension points like this.
  *
  * Registered as a SQL function by [[GraftExtensions]]; use
  * `call_function("rolling_hash", col)` or SQL `rolling_hash(text)`.
  * Cross-engine oracle: reproducible in any SQL engine as a fold over
  * code points (exact for ASCII; byte-level by definition otherwise).
  */
case class RollingHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"rolling_hash requires a string argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash"

  private final val Base = 31L
  private final val Mod = 1000000007L

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = (h * Base + (bytes(i) & 0xff)) % Mod
      i += 1
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      s"""
         |byte[] $bytes = $c.getBytes();
         |long $h = 0L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $h = ($h * ${Base}L + (long)($bytes[$i] & 0xff)) % ${Mod}L;
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

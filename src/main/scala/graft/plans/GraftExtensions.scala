package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Engine extension point. Install with
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`
  * or `.withExtensions(new GraftExtensions)`.
  *
  * Registers the custom native expressions (currently
  * [[RollingHash]]). The reference's own operator surface needs no
  * custom Catalyst rules/strategies (SURVEY §4 conclusion) — this hook
  * exists for the scale-path primitives that built-ins can't express
  * without blowing up row counts.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("rolling_hash"),
      new ExpressionInfo(classOf[RollingHash].getName, "rolling_hash"),
      (children: Seq[Expression]) => RollingHash(children.head)))
    ext.injectFunction((
      FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      (children: Seq[Expression]) => MinHashSig(
        children.head,
        children.lift(1).map(_.eval().asInstanceOf[Number].intValue).getOrElse(32))))
    ext.injectFunction((
      FunctionIdentifier("simhash_sig"),
      new ExpressionInfo(classOf[SimHashSig].getName, "simhash_sig"),
      (children: Seq[Expression]) => SimHashSig(
        children.head,
        children.lift(1).map(_.eval().asInstanceOf[Number].intValue).getOrElse(60))))
    ext.injectFunction((
      FunctionIdentifier("word_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "word_shingles"),
      (children: Seq[Expression]) => WordShingles(
        children.head,
        children.lift(1).map(_.eval().asInstanceOf[Number].intValue).getOrElse(3))))
    ext.injectFunction((
      FunctionIdentifier("hyperplane_sig"),
      new ExpressionInfo(classOf[HyperplaneSig].getName, "hyperplane_sig"),
      (children: Seq[Expression]) => HyperplaneSig(
        children.head,
        children.lift(1).map(_.eval().asInstanceOf[Number].intValue).getOrElse(12))))
    ext.injectFunction((
      FunctionIdentifier("dot_q"),
      new ExpressionInfo(classOf[DotQ].getName, "dot_q"),
      (children: Seq[Expression]) => DotQ(children.head, children(1))))
    ext.injectFunction((
      FunctionIdentifier("nearest_cells"),
      new ExpressionInfo(classOf[NearestCells].getName, "nearest_cells"),
      (children: Seq[Expression]) => NearestCells(
        children.head, children(1),
        children.lift(2).map(_.eval().asInstanceOf[Number].intValue).getOrElse(1))))
  }
}

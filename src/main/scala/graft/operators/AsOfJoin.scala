package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: attach to each left row the latest right row
  * with rightTime ≤ leftTime per key (the canonical market-data
  * operation: "the quote in effect at trade time").
  *
  * Spark has no built-in as-of join; the naive theta join
  * (`l.k = r.k AND r.t <= l.t` + argmax) explodes to O(|matches|)
  * before reducing. This implementation is the scalable union-window
  * form: tag both sides, union, ONE shuffle+sort on (key, time), and a
  * running `last(_, ignoreNulls)` carries the most recent right-side
  * values forward onto every left row. O(n log n) in the partition, no
  * pair blowup, no skew amplification beyond the key's own row count.
  *
  * Right rows must be unique per (key, time) for determinism — callers
  * dedupe first (e.g. Dedup.keepFirst) since "which of two same-instant
  * quotes wins" is undefined in any engine's as-of semantics.
  */
object AsOfJoin {

  def asOfBackward(left: DataFrame, right: DataFrame, keys: Seq[String],
                   leftTime: String, rightTime: String): DataFrame = {
    val attachCols = right.columns.filterNot(c => keys.contains(c) || c == rightTime).toSeq
    require(attachCols.intersect(left.columns.toSeq).isEmpty,
      "right-side attach columns must not collide with left columns")
    val leftCols = left.columns.toSeq

    // The right row travels as ONE struct so the latest match is
    // carried atomically — per-column last(_, ignoreNulls) would let a
    // NULL field in the newest right row resurrect a stale value from
    // an older one (and even mix fields of different rows).
    val lSide = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
      .withColumn("__r", lit(null).cast(
        org.apache.spark.sql.types.StructType(
          right.select(attachCols.map(col): _*).schema.fields)))
    val rSide = right
      .withColumn("__t", col(rightTime))
      .withColumn("__side", lit(0))
      .withColumn("__r", struct(attachCols.map(col): _*))
      .drop(rightTime +: attachCols: _*)
    val rAligned = leftCols.filterNot(keys.contains)
      .foldLeft(rSide)((df, c) => df.withColumn(c, lit(null)))

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = lSide.unionByName(rAligned.select(lSide.columns.map(col): _*))
      .withColumn("__r", last(col("__r"), ignoreNulls = true).over(w))
    attachCols
      .foldLeft(carried)((df, c) => df.withColumn(c, col("__r").getField(c)))
      .filter(col("__side") === 1)
      .drop("__t", "__side", "__r")
  }
}

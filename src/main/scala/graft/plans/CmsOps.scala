package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** `cms_merge_agg(binary)` — merges Count-Min sketches produced by
  * Spark's `count_min_sketch(...)` aggregate into one sketch, as an
  * AGGREGATE, so sketch rollups stay inside a single plan (no driver
  * collect-merge round-trip). CMS is linear, so the merged sketch's
  * estimates equal whole-data-sketch estimates exactly (SketchesSpec
  * asserts this, q_cms_frequency relies on it).
  *
  * Spark core ships the per-value `count_min_sketch` aggregate but no
  * merge aggregate — the same gap [[GraftExtensions]] fills for the
  * bloom filter. State is the sketch itself (kilobytes, bounded by
  * eps/confidence — never by data), serialized with the sketch's own
  * `writeTo`/`readFrom`. Sketches must share eps/confidence/seed;
  * mixed parameters raise the sketch library's incompatible-merge
  * error rather than silently degrading.
  */
case class CmsMergeAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CountMinSketch] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[BinaryType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cms_merge_agg requires a binary argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "cms_merge_agg"

  override def createAggregationBuffer(): CountMinSketch = null

  override def update(buffer: CountMinSketch, input: InternalRow): CountMinSketch = {
    val v = child.eval(input)
    if (v == null) buffer
    else {
      val s = CountMinSketch.readFrom(
        new ByteArrayInputStream(v.asInstanceOf[Array[Byte]]))
      if (buffer == null) s else { buffer.mergeInPlace(s); buffer }
    }
  }

  override def merge(buffer: CountMinSketch, other: CountMinSketch): CountMinSketch =
    if (buffer == null) other
    else if (other == null) buffer
    else { buffer.mergeInPlace(other); buffer }

  override def eval(buffer: CountMinSketch): Any =
    if (buffer == null) null else serialize(buffer)

  override def serialize(buffer: CountMinSketch): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    buffer.writeTo(out)
    out.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): CountMinSketch =
    CountMinSketch.readFrom(new ByteArrayInputStream(bytes))

  override def withNewMutableAggBufferOffset(n: Int): CmsMergeAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): CmsMergeAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): CmsMergeAgg =
    copy(child = newChild)
}

/** `cms_estimate(binary, key)` — point-frequency estimate of a string
  * key from a serialized Count-Min sketch, in-plan (the "model read"
  * that [[graft.operators.Sketches.cmsEstimate]] does on the driver).
  *
  * Deserializing ~100 KB of sketch per row would dominate, so the last
  * deserialized sketch is memoized per expression instance (reference
  * equality first — a broadcast sketch is the same array on every row
  * of a task — then content equality). Eval-only ([[CodegenFallback]]):
  * this reads a model over a bounded key dimension, never a corpus hot
  * path, matching the no-interpreted-exprs-in-hot-paths policy.
  */
case class CmsEstimate(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (!left.dataType.isInstanceOf[BinaryType])
      TypeCheckResult.TypeCheckFailure(
        s"cms_estimate requires (binary, string), got ${left.dataType.catalogString} first")
    else if (!right.dataType.isInstanceOf[StringType])
      TypeCheckResult.TypeCheckFailure(
        s"cms_estimate requires (binary, string), got ${right.dataType.catalogString} second")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = LongType
  override def prettyName: String = "cms_estimate"

  @transient private var cachedBytes: Array[Byte] = _
  @transient private var cachedSketch: CountMinSketch = _

  private def sketchOf(bytes: Array[Byte]): CountMinSketch = {
    if (!(cachedBytes eq bytes) && !java.util.Arrays.equals(cachedBytes, bytes)) {
      cachedSketch = CountMinSketch.readFrom(new ByteArrayInputStream(bytes))
      cachedBytes = bytes
    }
    cachedSketch
  }

  override protected def nullSafeEval(cms: Any, key: Any): Any =
    sketchOf(cms.asInstanceOf[Array[Byte]])
      .estimateCount(key.asInstanceOf[UTF8String].toString)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimate =
    copy(left = newLeft, right = newRight)
}

package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional file layout: Z-order (Morton) clustering, the
  * standard answer to "I filter this 100 TB table on TWO columns but
  * can only sort by one". Interleaving the bits of both keys makes
  * rows close in EITHER dimension land in the same files, so parquet
  * min/max row-group stats prune on both columns at once (the same
  * idea as Delta/Iceberg OPTIMIZE ZORDER; plain-parquet rendition
  * here).
  *
  * The z-value is pure codegen'd bit math (shift/mask spread — no
  * UDF, no lambda), deterministic, and mirrored in DuckDB SQL for the
  * oracle ([[zSpreadSql]]).
  */
object Layout {

  private val spreadMasks: Seq[(Int, Long)] = Seq(
    8 -> 0x00FF00FF00FF00FFL,
    4 -> 0x0F0F0F0F0F0F0F0FL,
    2 -> 0x3333333333333333L,
    1 -> 0x5555555555555555L)

  /** Spread the low 16 bits of `c` so bit i moves to bit 2i —
    * the classic shift/mask interleave ladder, all codegen'd builtins.
    * Works in LONG throughout: an INT column would wrap at bit 31
    * under `shiftleft` and flip the z sign. */
  def zSpread(c: Column): Column =
    spreadMasks.foldLeft(c.cast("long").bitwiseAND(lit(0xFFFFL))) { case (x, (sh, mask)) =>
      (x.bitwiseOR(shiftleft(x, sh))).bitwiseAND(lit(mask))
    }

  /** The identical ladder as DuckDB SQL (oracle mirror). */
  def zSpreadSql(expr: String): String =
    spreadMasks.foldLeft(s"(($expr) & 65535)") { case (x, (sh, mask)) =>
      s"((($x | ($x << $sh)) & $mask))"
    }

  /** Morton z-value of two columns' low 16 bits: `a` on even bits,
    * `b` on odd. 32 significant bits — plenty of file-level
    * resolution; widen the ladder if a dimension genuinely needs more
    * than 65536 bins. */
  def zValue(a: Column, b: Column): Column =
    zSpread(a).bitwiseOR(shiftleft(zSpread(b), 1))

  /** [[zValue]]'s DuckDB mirror. */
  def zValueSql(a: String, b: String): String =
    s"(${zSpreadSql(a)} | (${zSpreadSql(b)} << 1))"

  /** N-dimensional Morton key: column c's bit i lands at bit
    * `i·k + c`. The shift/mask ladder only exists for power-of-two
    * strides, so this builds the explicit bit tree — `bitsPerCol·k`
    * shift/and/or terms, all codegen'd scalars (60 terms at the
    * defaults; fine for whole-stage codegen). `bitsPerCol` defaults
    * to `60 / k` so the key always fits a signed long.
    * `zValueN(Seq(a, b), 16) == zValue(a, b)` (tested). */
  def zValueN(cols: Seq[Column], bitsPerCol: Int = 0): Column = {
    val k = cols.size
    require(k >= 1 && k <= 6, s"zValueN supports 1-6 columns, got $k")
    val bits = if (bitsPerCol > 0) bitsPerCol else 60 / k
    require(bits * k <= 62, s"$bits bits x $k cols overflows a signed long")
    cols.zipWithIndex.map { case (c, ci) =>
      val lc = c.cast("long")
      (0 until bits).map { i =>
        shiftleft(shiftright(lc, i).bitwiseAND(lit(1L)), i * k + ci)
      }.reduce(_ bitwiseOR _)
    }.reduce(_ bitwiseOR _)
  }

  /** Hilbert-curve index of two columns' low `order` bits — the
    * locality-preserving alternative to [[zValue]]: consecutive
    * Hilbert indices are always Manhattan-adjacent cells (no Morton
    * "jumps" across the plane), so range-partitioning a 100 TB table
    * by `h` yields files whose 2-D bounding boxes are tighter than
    * Z-order's at the same file count — better min/max skipping for
    * box predicates. Verified exhaustively as a space-filling curve at
    * order 4 in LayoutSpec (bijection onto 0..4^order−1 + unit-step
    * adjacency).
    *
    * Implementation: the classic xy2d reduction, one fold step per
    * bit level carrying `[x, y, d]` (quadrant bit extraction, distance
    * accumulation, then the reflect+swap rotation). Expressed as ONE
    * `aggregate` over the static level array — linear expression
    * size, no per-level staged columns, the same fold idiom as
    * [[graft.operators.DailyAnalytics.macd]]. Pure column arithmetic:
    * distributable, no UDF. */
  def hilbertValue(a: Column, b: Column, order: Int = 16): Column = {
    require(order >= 1 && order <= 16, s"hilbertValue supports order 1-16, got $order")
    val m = lit((1L << order) - 1)
    val levels = array((order - 1 to 0 by -1).map(k => lit(1L << k)): _*)
    val init = array(a.cast("long").bitwiseAND(m), b.cast("long").bitwiseAND(m), lit(0L))
    val folded = aggregate(levels, init, (acc, s) => {
      val x = element_at(acc, 1)
      val y = element_at(acc, 2)
      val d = element_at(acc, 3)
      val rx = when(x.bitwiseAND(s) > 0, lit(1L)).otherwise(lit(0L))
      val ry = when(y.bitwiseAND(s) > 0, lit(1L)).otherwise(lit(0L))
      val nx = when(ry === 0, when(rx === 1, s - lit(1) - y).otherwise(y)).otherwise(x)
      val ny = when(ry === 0, when(rx === 1, s - lit(1) - x).otherwise(x)).otherwise(y)
      val nd = d + s * s * (lit(3L) * rx).bitwiseXOR(ry)
      array(nx, ny, nd)
    })
    element_at(folded, 3)
  }

  /** [[hilbertValue]]'s DuckDB mirror: the same `[x, y, d]` fold via
    * `list_reduce` (array state, not struct — see the macd oracle
    * note), levels prepended with the seed. DuckDB `^` is power, so
    * the quadrant digit uses `xor()`; casts are function-style
    * `CAST(..)` because DuckDB 1.0 mis-parses a postfix `::` cast
    * inside a lambda's function argument. */
  def hilbertSql(a: String, b: String, order: Int = 16): String = {
    require(order >= 1 && order <= 16, s"hilbertSql supports order 1-16, got $order")
    val m = (1L << order) - 1
    val levels = (order - 1 to 0 by -1).map(k => 1L << k).mkString(", ")
    s"""list_reduce(list_prepend(
       |    [($a)::BIGINT & $m, ($b)::BIGINT & $m, 0::BIGINT],
       |    list_transform([$levels]::BIGINT[], s -> [s, s, s])),
       |  (acc, e) -> [
       |    CASE WHEN (acc[2] & e[1]) = 0
       |      THEN CASE WHEN (acc[1] & e[1]) > 0 THEN e[1] - 1 - acc[2] ELSE acc[2] END
       |      ELSE acc[1] END,
       |    CASE WHEN (acc[2] & e[1]) = 0
       |      THEN CASE WHEN (acc[1] & e[1]) > 0 THEN e[1] - 1 - acc[1] ELSE acc[1] END
       |      ELSE acc[2] END,
       |    acc[3] + e[1] * e[1] * xor(
       |      3 * CAST((acc[1] & e[1]) > 0 AS BIGINT),
       |      CAST((acc[2] & e[1]) > 0 AS BIGINT))
       |  ])[3]""".stripMargin
  }

  /** Write `df` z-ordered on `(c1, c2)`: range-partition by z-value
    * (so file boundaries are z-contiguous — NOT a hash shuffle), sort
    * within partitions, drop the helper column on disk. Both columns
    * are first range-binned to 16 bits via min/max scaling (one
    * bounded two-row aggregate action — the "train small, broadcast"
    * pattern; linear binning is the documented simplification vs
    * quantile binning for heavily skewed keys).
    *
    * `outFiles` controls file count = skipping granularity: at 100 TB
    * pick it so files land near the row-group/`maxPartitionBytes`
    * sweet spot (~128 MB—1 GB), not at the default shuffle count.
    */
  def zorderWrite(df: DataFrame, c1: String, c2: String,
                  path: String, outFiles: Int): Unit = {
    val bounds = df.agg(
      min(col(c1)).cast("double"), max(col(c1)).cast("double"),
      min(col(c2)).cast("double"), max(col(c2)).cast("double"))
      .collect().head
    if (bounds.anyNull) { // empty input: nothing to cluster
      df.write.mode("overwrite").parquet(path)
      return
    }
    val Array(lo1, hi1, lo2, hi2) = bounds.toSeq.map(_.asInstanceOf[Double]).toArray
    def bin(c: String, lo: Double, hi: Double): Column =
      if (hi <= lo) lit(0L)
      else floor((col(c).cast("double") - lit(lo)) / lit(hi - lo) * 65535.0).cast("long")
    df.withColumn("__z", zValue(bin(c1, lo1, hi1), bin(c2, lo2, hi2)))
      .repartitionByRange(outFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** Small-file compaction planning: pack an ordered file inventory
    * into target-sized output bins (the planning half of OPTIMIZE /
    * bin-packing compaction in Delta/Iceberg). Files stay in key
    * order — compaction must not destroy the clustering that
    * [[zorderWrite]] or a sorted ingest established — so the bin id is
    * simply `floor(running-size-before / target)`: greedy sequential
    * packing in EXACT integer arithmetic (`div`). A file that
    * overshoots a bin boundary is charged to the bin it started in, so
    * the bin right after an oversized file can land under target —
    * acceptable for a compaction plan (bins stay contiguous in key
    * order, and no bin exceeds target + one file).
    *
    * Scale note: this operates on table METADATA (one row per file),
    * not data — a 100 TB table is a few hundred thousand file rows, so
    * the single-partition ordered window is a deliberate non-issue;
    * the expensive part of compaction is the rewrite that consumes
    * this plan, and that is a plain partitioned write. */
  def compactionPlan(files: DataFrame, orderCols: Seq[String],
                     sizeCol: String, target: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(target > 0, "compactionPlan: target must be positive")
    val w = Window.orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    files
      .withColumn("cum_before", coalesce(sum(col(sizeCol)).over(w), lit(0L)))
      .withColumn("bin", expr(s"cum_before div ${target}L"))
  }

  /** Data-skipping estimator over file min/max statistics: for a
    * range predicate `[lo, hi]` on a column, a file whose stats
    * interval misses the range entirely (`fmax < lo` or `fmin > hi`)
    * never needs to be opened — exactly the pruning decision
    * Delta/Iceberg/parquet row-group skipping makes from the same
    * stats. Returns the one-row savings summary (files and rows
    * skipped, skip ratio) that tells you whether the layout
    * ([[zorderWrite]] clustering or a sorted ingest) is paying for
    * itself on this predicate.
    *
    * Metadata-scale by design, like [[compactionPlan]]: input is one
    * row per FILE; a 100 TB table is ~10⁵ such rows, one
    * partial-aggregable pass. */
  def pruneEstimate(files: DataFrame, minCol: String, maxCol: String,
                    sizeCol: String, lo: Double, hi: Double): DataFrame = {
    val skip = col(maxCol) < lo || col(minCol) > hi
    files.agg(
      count(lit(1)).as("n_files"),
      sum(when(skip, 1L).otherwise(0L)).as("files_skipped"),
      sum(col(sizeCol)).as("rows_total"),
      sum(when(skip, col(sizeCol)).otherwise(0L)).as("rows_skipped"))
      .select(col("n_files"), col("files_skipped"),
        col("rows_total"), col("rows_skipped"),
        graft.functions.Funcs.r4(
          col("rows_skipped").cast("double") /
            nullif(col("rows_total"), lit(0)).cast("double")).as("skip_ratio"))
  }
}

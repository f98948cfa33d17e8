package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval-overlap range join without a nested loop.
  *
  * Spark has no native range-join strategy: a raw
  * `a.start <= b.end AND b.start <= a.end` join condition falls off
  * the equi-join path into BroadcastNestedLoopJoin (or a cartesian),
  * which is exactly the O(|A|·|B|) cliff that kills at 100 TB. The
  * classic scale-out rewrite is BUCKET DECOMPOSITION: chop the time
  * axis into fixed buckets, explode each interval into the buckets it
  * covers, equi-join on the bucket id (a plain shuffled hash join
  * Catalyst can plan, reorder, and AQE-skew-split), then re-check the
  * exact predicate. An overlapping pair shares every bucket the
  * overlap region covers, so the decomposition alone would duplicate
  * pairs; instead of a dedup shuffle, each pair is ASSIGNED to the one
  * bucket containing the overlap's start (`max(a.start, b.start)`) —
  * both sides provably cover that bucket iff the intervals overlap,
  * so each qualifying pair is emitted exactly once with no
  * post-join `distinct`.
  *
  * Cost model: exploded row counts are Σ(len/bucket + 1) per side —
  * linear in input for any fixed bucket size; pick `bucketSeconds`
  * near the typical interval length (too small explodes rows, too
  * large piles unrelated intervals into one bucket and degrades to
  * mini-nested-loops within buckets). Hot buckets (rush hour) are
  * ordinary join skew — AQE's skew-join split applies, no salting
  * needed because the re-check predicate is row-local.
  */
object RangeJoin {

  /** Inner overlap join of closed intervals. `left` must carry epoch-
    * second long columns `lStart`/`lEnd`, `right` likewise; all other
    * column names must be disjoint across the two sides. Emits each
    * overlapping pair exactly once (see object doc). */
  def overlapJoin(left: DataFrame, right: DataFrame,
                  lStart: String, lEnd: String,
                  rStart: String, rEnd: String,
                  bucketSeconds: Long = 3600L): DataFrame = {
    require(bucketSeconds > 0, s"bucketSeconds must be positive: $bucketSeconds")
    // integral `div` (exact at any epoch magnitude — `/` on longs
    // would detour through double); columns are simple names by API
    // contract so the expr strings are unambiguous
    def buckets(s: String, e: String) =
      expr(s"explode(sequence($s div ${bucketSeconds}L, $e div ${bucketSeconds}L))")
    val l = left.withColumn("gr_bucket", buckets(lStart, lEnd))
    val r = right.withColumn("gr_bucket", buckets(rStart, rEnd))
    l.join(r, Seq("gr_bucket"))
      .filter(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd))
      .filter(col("gr_bucket") ===
        expr(s"greatest($lStart, $rStart) div ${bucketSeconds}L"))
      .drop("gr_bucket")
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) compaction: turn a raw per-key
  * event/CDC history into versioned validity ranges — the dimension
  * shape every warehouse keeps for "what was this attribute WHEN".
  * The reference pipeline only upserts current state (its MERGE lane,
  * reference `src/load_stream_to_snowflake.py`); this adds the
  * history-preserving form (dbt calls these snapshots) a user of a
  * complete engine expects next to it.
  */
object Scd2 {

  /** Collapse consecutive equal attribute values into one row per RUN:
    * (key, version, attr, valid_from, valid_to, n_events, is_current).
    * `version` is the 1-based run index per key, `valid_from` the
    * run's first event time, `valid_to` the NEXT run's start (null on
    * the current run — the usual half-open [from, to) convention so
    * ranges tile with no gaps or overlaps), `n_events` how many raw
    * events the run absorbed.
    *
    * `tieCol` must make (tsCol, tieCol) a TOTAL order per key —
    * equal-timestamp events otherwise make run boundaries
    * nondeterministic. The attribute must be non-null (a null never
    * compares unequal, so it would silently extend the previous run).
    *
    * Scale shape: ONE exchange. Both window passes and the run filter
    * share the same (key) partitioning and (ts, tie) ordering, so
    * Catalyst plans a single shuffle+sort feeding every frame
    * (asserted in PlanSpec, same discipline as martStockPerformance);
    * there is no groupBy re-shuffle — runs are collapsed by FILTERING
    * to run starts and differencing row numbers, not by aggregation.
    */
  def fromHistory(df: DataFrame, keyCol: String, tsCol: String,
                  attrCol: String, tieCol: String): DataFrame = {
    val byTime = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    val marked = df
      .withColumn("__prev", lag(col(attrCol), 1).over(byTime))
      .withColumn("__rn", row_number().over(byTime))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(col(keyCol))))
    val starts = marked.filter(col("__prev").isNull || col("__prev") =!= col(attrCol))
    starts
      .withColumn("version", row_number().over(byTime))
      .withColumn("valid_to", lead(col(tsCol), 1).over(byTime))
      .withColumn("__next_rn", lead(col("__rn"), 1).over(byTime))
      .select(col(keyCol), col("version"), col(attrCol),
        col(tsCol).as("valid_from"), col("valid_to"),
        (coalesce(col("__next_rn"), col("__n") + 1) - col("__rn"))
          .cast("long").as("n_events"),
        col("valid_to").isNull.as("is_current"))
  }
}

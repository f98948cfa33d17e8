package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Funcs._
import graft.sources.Tables

/** Dimension-enrichment joins — the reference ships an sp500_tickers
  * seed dimension that its models never join (SURVEY §2.3); this is
  * that implied pattern done right for scale: small dims are
  * `broadcast()` so the fact scan never shuffles, and fact-side money
  * amounts aggregate via the exact fixed-point view (Funcs.scaled).
  */
object Enrichment {

  /** supplier → nation → region snowflake dim, broadcast-joined. */
  def supplierDim(spark: SparkSession, dir: String): DataFrame =
    Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_name").as("nation"),
        col("r_name").as("region"))

  /** Revenue per (region, nation): the canonical broadcast-dim-join +
    * partial-aggregable rollup. revenue = Σ extendedprice·(1−discount),
    * summed exactly at 4-decimal fixed point (both factors are
    * 2-decimal, so the product is an exact 4-decimal rational).
    */
  def revenueByNation(spark: SparkSession, dir: String): DataFrame = {
    val rev = scaled(col("l_extendedprice") * (lit(1) - col("l_discount")), 4)
    Tables.lineitem(spark, dir)
      .join(broadcast(supplierDim(spark, dir)),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("region"), col("nation"))
      .agg(
        r2(sum(rev) / 1e4).as("revenue"),
        count(lit(1)).as("line_count"),
        countDistinct(col("l_suppkey")).as("suppliers"))
  }

  /** ROLLUP over the dim hierarchy: per-nation, per-region subtotal,
    * grand total — one pass, partial-aggregable like any hash agg
    * (Expand just multiplies rows by the grouping-set count before the
    * exchange). */
  def revenueRollup(spark: SparkSession, dir: String): DataFrame = {
    val rev = scaled(col("l_extendedprice") * (lit(1) - col("l_discount")), 4)
    Tables.lineitem(spark, dir)
      .join(broadcast(supplierDim(spark, dir)),
        col("l_suppkey") === col("s_suppkey"))
      .rollup(col("region"), col("nation"))
      .agg(r2(sum(rev) / 1e4).as("revenue"), count(lit(1)).as("line_count"))
  }
}

package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Funcs._
import graft.sources.Staging.Snapshottable
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

  /** Ticker dimension in the seed's shape — (symbol, sector,
    * market_cap_tier) — derived from the supplier snowflake: sector :=
    * nation name, tier := account-balance bands. The reference's
    * sp500_tickers.csv (dbt/seeds/sp500_tickers.csv:1-11) carries this
    * exact shape keyed by ticker string; `RawSources.tickerDim` loads
    * that CSV and feeds the same [[sectorSummary]] (suite-tested).
    * This derivation keys the dim to the numeric symbols of the test
    * corpus so the mart is oracle-checkable end-to-end. */
  def tickerDimFromSuppliers(spark: SparkSession, dir: String): DataFrame =
    Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)),
        col("s_nationkey") === col("n_nationkey"))
      .select(
        col("s_suppkey").as("symbol"),
        col("n_name").as("sector"),
        when(col("s_acctbal") >= 5000, "LARGE")
          .when(col("s_acctbal") >= 0, "MID")
          .otherwise("SMALL").as("market_cap_tier"))

  /** The sector mart the seed dimension implies (SURVEY §2.3 — the
    * reference declares sp500_tickers but never joins it): day ×
    * sector × market-cap-tier rollup of the stock-performance mart.
    * `dim` must carry (symbol, sector, market_cap_tier) — the seed CSV
    * via RawSources.tickerDim in production, [[tickerDimFromSuppliers]]
    * under the oracle. The dim is broadcast (tiny by construction), so
    * the fact side's only shuffle is the partial-aggregable rollup;
    * averages aggregate exact fixed-point views per the repo-wide
    * determinism policy. */
  def sectorSummary(perf: DataFrame, dim: DataFrame): DataFrame = {
    val ret = col("daily_return_pct")
    perf.join(broadcast(dim), Seq("symbol"))
      .groupBy(col("trade_date"), col("sector"), col("market_cap_tier"))
      .agg(
        countDistinct(col("symbol")).as("symbols"),
        count_if(ret > 0).as("advancers"),
        count_if(ret < 0).as("decliners"),
        scaledAvg(scaled(ret, 4), 4, 4).as("avg_return_pct"),
        count_if(col("ma_signal_5_20") === "GOLDEN_CROSS").as("golden_cross_5_20_count"),
        count_if(col("rsi_signal") === "OVERBOUGHT").as("overbought_count"),
        sum(col("volume")).as("total_volume"))
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

  /** CUBE over the same hierarchy — all four grouping sets
    * ((region, nation), (region), (nation), ()) in one pass; same
    * partial-aggregable shape as ROLLUP, Expand just emits one more
    * grouping-set row per input before the exchange. */
  def revenueCube(spark: SparkSession, dir: String): DataFrame = {
    val rev = scaled(col("l_extendedprice") * (lit(1) - col("l_discount")), 4)
    Tables.lineitem(spark, dir)
      .join(broadcast(supplierDim(spark, dir)),
        col("l_suppkey") === col("s_suppkey"))
      .cube(col("region"), col("nation"))
      .agg(r2(sum(rev) / 1e4).as("revenue"), count(lit(1)).as("line_count"))
  }

  /** Market-basket association rules (Agrawal & Srikant, VLDB'94 —
    * the support/confidence/lift frame): from order-level co-purchase
    * baskets, every directed rule a→b with pair support ≥ `minPairSup`
    * scored by
    *   confidence = n(ab)/n(a)
    *   lift       = (n(ab)/n(a)) · (N/n(b))
    * — the rule-interestingness workload beside the co-purchase GRAPH
    * lanes (same fact, a probabilistic rather than structural readout).
    * Baskets DEDUPLICATE to the (order, item) grain first (a part
    * listed on two lines of one order is one basket membership —
    * without this the "support" would count line pairs, not orders).
    *
    * Exactness: supports are exact longs; confidence and lift are each
    * ONE fixed double tree over exact longs, rd(4) — lift multiplies
    * the two division results rather than forming n(ab)·N, which
    * overflows BIGINT once both factors pass ~10¹⁰ at warehouse scale.
    *
    * Scale shape: one distinct + self-join on the order key (per-order
    * fan-out = basket size², bounded by order width, the
    * [[graft.sources.Marts.copurchasePairs]] cost model), two
    * partial-aggregable support rollups, two equi joins. The only
    * driver scalar is N (one count). */
  def associationRules(lineitem: DataFrame, minPairSup: Long = 2): DataFrame = {
    val baskets = lineitem
      .select(col("l_orderkey").as("oid"), col("l_partkey").as("item"))
      .distinct()
      .snapshot() // pair join (both sides), item supports, and N
    val nOrders = baskets.select("oid").distinct().count()
    val itemSup = baskets.groupBy("item").agg(count(lit(1)).as("n_item"))
    val pairs = baskets
      .join(baskets.select(col("oid"), col("item").as("item2")), "oid")
      .filter(col("item") < col("item2"))
      .groupBy(col("item").as("a"), col("item2").as("b"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minPairSup)
    val rules = pairs
      .select(col("a").as("antecedent"), col("b").as("consequent"), col("n_ab"))
      .union(pairs.select(col("b"), col("a"), col("n_ab")))
    rules
      .join(itemSup.select(col("item").as("antecedent"), col("n_item").as("n_ante")),
        "antecedent")
      .join(itemSup.select(col("item").as("consequent"), col("n_item").as("n_cons")),
        "consequent")
      .select(col("antecedent"), col("consequent"), col("n_ab"),
        col("n_ante"), col("n_cons"),
        rd(col("n_ab").cast("double") / col("n_ante").cast("double"), 4)
          .as("confidence"),
        rd((col("n_ab").cast("double") / col("n_ante").cast("double")) *
          (lit(nOrders).cast("double") / col("n_cons").cast("double")), 4)
          .as("lift"))
  }

  /** Explicit GROUPING SETS — the general form ROLLUP/CUBE are sugar
    * for, with an ASYMMETRIC set list neither can express:
    * ((nation, year), (nation, priority), (year)). One pass, one
    * Expand before the exchange (3 grouping-set rows per input), the
    * same partial-aggregable shape as [[revenueRollup]]. `grouping()`
    * flags disambiguate a real NULL from an aggregated-out dimension —
    * emitted per dimension (not the combined grouping_id) so the
    * oracle compare is engine-convention-free. Order totals join the
    * customer→nation dim broadcast; o_totalprice sums exactly at
    * 2-decimal fixed point. */
  def revenueGroupingSets(spark: SparkSession, dir: String): DataFrame = {
    val nationDim = Tables.customer(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("nation"))
    val base = Tables.orders(spark, dir)
      .join(broadcast(nationDim), col("o_custkey") === col("c_custkey"))
      .select(col("nation"),
        year(col("o_orderdate")).as("order_year"),
        col("o_orderpriority").as("priority"),
        scaled(col("o_totalprice"), 2).as("tp2"))
    base.groupingSets(
        Seq(Seq(col("nation"), col("order_year")),
            Seq(col("nation"), col("priority")),
            Seq(col("order_year"))),
        col("nation"), col("order_year"), col("priority"))
      .agg(
        grouping(col("nation")).cast("int").as("g_nation"),
        grouping(col("order_year")).cast("int").as("g_year"),
        grouping(col("priority")).cast("int").as("g_priority"),
        r2(sum(col("tp2")) / 1e2).as("revenue"),
        count(lit(1)).as("n_orders"))
  }
}

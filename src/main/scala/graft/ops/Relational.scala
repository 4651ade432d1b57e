package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classic relational analytics over the TPC-H-ish star schema — the
  * general-purpose engine surface beyond the stock pipeline: multi-way
  * joins, semi-joins, decimal-exact money aggregation, deterministic top-k.
  *
  * Money columns are aggregated as DECIMAL(18,2) (cast at the scan, summed
  * exactly) — float sums of 600k+ values would be association-order
  * sensitive across engines; decimal sums are exact and reproducible
  * anywhere, which is also the right call at 100 TB where partial-aggregate
  * merge order is nondeterministic.
  */
object Relational {

  private def money(c: String) = col(c).cast("decimal(18,2)")

  /** Q1-style pricing summary: one pass, hash-aggregate by two low-
    * cardinality flags. Money is summed exactly as decimal, then the FINAL
    * sum is cast to double — deterministic regardless of partial-aggregate
    * merge order, and the output schema carries no decimal/int128 types
    * (cross-engine compare canonicalizes those differently than Spark's
    * long/double).
    */
  def pricingSummary(lineitem: DataFrame): DataFrame =
    lineitem.filter(col("l_shipdate") <= "1998-09-01")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(col("l_quantity").cast("long")).as("sum_qty"),
        sum(money("l_extendedprice")).cast("double").as("sum_base_price"),
        count(lit(1)).as("count_order"))
      .withColumn("avg_qty",
        (col("sum_qty").cast("double") / col("count_order")).cast("double"))

  /** Top customers by revenue: lineitem ⋈ orders ⋈ customer, decimal-exact
    * revenue, deterministic top-k via (revenue DESC, custkey).
    *
    * Two-phase top-k: `orderBy(...).limit(k)` plans as
    * TakeOrderedAndProject — each partition keeps its local top k and only
    * k rows per partition reach the driver-side merge. Ranks are then
    * numbered over the ≤ k surviving rows, so the only unpartitioned window
    * in the plan runs on a bounded input. (The previous formulation ranked
    * the FULL customer aggregate through one `Window.orderBy` task — a
    * single-partition funnel of the whole customer cardinality at 100×.)
    */
  def topCustomers(lineitem: DataFrame, orders: DataFrame,
      customer: DataFrame, k: Int = 10): DataFrame = {
    val revenue = lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .groupBy("c_custkey", "c_name", "c_mktsegment")
      .agg(sum(money("l_extendedprice")).as("revenue"),
        countDistinct(col("o_orderkey")).as("n_orders"))
    revenue
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(k)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("revenue").desc, col("c_custkey"))))
      // rank over the exact decimal sum; emit double (schema parity — see
      // pricingSummary)
      .withColumn("revenue", col("revenue").cast("double"))
  }

  /** Q4-style late-shipment priorities: orders having ANY lineitem shipped
    * >60 days after the order date — a LEFT SEMI join (exists), counted per
    * priority.
    */
  def lateOrderPriorities(lineitem: DataFrame, orders: DataFrame): DataFrame =
    orders.join(lineitem,
        col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") > date_add(col("o_orderdate"), 60),
        "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_late_orders"))

  /** Sector × month matrix: PIVOT with an explicit value list (no extra
    * distinct scan) — avg close per sector as columns.
    */
  def sectorMonthlyPivot(intDaily: DataFrame): DataFrame = {
    val sectors = Seq("AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST")
    val pivoted = intDaily
      .withColumn("month", date_trunc("month", col("trade_date")).cast("date"))
      .groupBy("month")
      .pivot("sector", sectors)
      .agg(avg(col("close")))
    sectors.foldLeft(pivoted) { (df, sct) =>
      df.withColumnRenamed(sct, "avg_close_" + sct.toLowerCase.replace(" ", "_"))
    }
  }

  /** ROLLUP subtotals: volume by (year, month) with month and grand
    * subtotal rows (NULL-filled grouping columns), exact long sums.
    */
  def volumeRollup(intDaily: DataFrame): DataFrame =
    intDaily
      .selectExpr("CAST(year(trade_date) AS INT) AS year",
        "CAST(month(trade_date) AS INT) AS month", "volume")
      // functions.col (untagged) instead of name-based rollup: Dataset.col's
      // dataset-id disambiguation false-positives on reused cached frames
      .rollup(col("year"), col("month"))
      .agg(sum(col("volume")).as("total_volume"),
        count(lit(1)).as("n_bars"))

  /** CUBE subtotals: volume by every subset of (year, month) — rollup plus
    * the month-only marginal; exercises Spark's full grouping-sets
    * machinery (one Expand + one hash aggregate, not four scans).
    */
  def volumeCube(intDaily: DataFrame): DataFrame =
    intDaily
      .selectExpr("CAST(year(trade_date) AS INT) AS year",
        "CAST(month(trade_date) AS INT) AS month", "volume")
      .cube(col("year"), col("month"))
      .agg(sum(col("volume")).as("total_volume"),
        count(lit(1)).as("n_bars"))

  /** Set difference: tickers that traded in `yearA` but not `yearB`
    * (EXCEPT — the one set operator the reference never uses; completes
    * §2.7 coverage).
    */
  def tickersOnlyIn(intDaily: DataFrame, yearA: Int, yearB: Int): DataFrame =
    intDaily.filter(year(col("trade_date")) === yearA).select("ticker")
      .except(
        intDaily.filter(year(col("trade_date")) === yearB).select("ticker"))

  /** Decile bucketing by a metric (ntile) — the screener's "top decile"
    * generalized.
    */
  def volumeDeciles(intDaily: DataFrame): DataFrame = {
    val perTicker = intDaily.groupBy("ticker")
      .agg(sum(col("volume")).as("total_volume"))
    perTicker.withColumn("decile",
      ntile(10).over(Window.orderBy(col("total_volume").desc, col("ticker"))))
  }

  /** Per-brand demand: lineitem ⋈ part (broadcastable dimension). */
  def brandVolume(lineitem: DataFrame, part: DataFrame): DataFrame =
    lineitem.join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand")
      .agg(sum(col("l_quantity").cast("long")).as("sum_qty"),
        countDistinct(col("l_partkey")).as("n_parts"),
        count(lit(1)).as("n_lineitems"))
}

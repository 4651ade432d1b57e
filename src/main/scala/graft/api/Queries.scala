package graft.api

import java.sql.Date

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The dashboard/acceptance query surface (SURVEY §3.3): the reference's
  * Streamlit pages interpolate SQL strings against Snowflake
  * (`data-viz/pages/2_Universe_Screener.py:58-107`,
  * `3_Ticker_Momentum.py:72-97`, `1_Market_Breadth.py:24-29`); here they are
  * typed, composable `Column` predicates over the marts — injection-proof by
  * construction (the reference hand-escapes quotes,
  * `2_Universe_Screener.py:73-75`).
  *
  * Scale shape: every endpooint is filter + top-k (TakeOrderedAndProject) on
  * a mart. With the fact stored clustered by ticker and partitioned by
  * date, [[tickerHistory]] touches one cluster's files; [[screener]] scans
  * the dimension (ticker-cardinality rows); [[breadthTrend]] reads a
  * day-cardinality table.
  */
object Queries {

  /** Typed screener predicates (reference P7 set). All optional; `limit`
    * mirrors the page's 5000-row cap.
    */
  final case class ScreenerFilter(
    rsiLo: Option[Double] = None,
    rsiHi: Option[Double] = None,
    sectors: Seq[String] = Nil,
    minReturn1m: Option[Double] = None,
    goldenCrossActive: Option[Int] = None,
    overSma50: Option[Int] = None,
    tickerContains: Option[String] = None,
    limit: Int = 5000)

  private def and(preds: Seq[Column]): Column =
    preds.foldLeft(lit(true))(_ && _)

  def screener(dim: DataFrame, f: ScreenerFilter): DataFrame = {
    val preds = Seq(
      f.rsiLo.map(col("latest_rsi") >= _),
      f.rsiHi.map(col("latest_rsi") <= _),
      if (f.sectors.nonEmpty) Some(col("sector").isin(f.sectors: _*)) else None,
      f.minReturn1m.map(col("return_1m") >= _),
      f.goldenCrossActive.map(col("has_golden_cross_active") === _),
      f.overSma50.map(col("over_sma50") === _),
      f.tickerContains.map(s => col("ticker").ilike(s"%$s%"))).flatten
    dim.filter(and(preds)).orderBy(col("return_1m").desc_nulls_last).limit(f.limit)
  }

  /** Per-ticker history page (`3_Ticker_Momentum.py:93-96`). */
  def tickerHistory(fct: DataFrame, ticker: String, from: Date, to: Date,
      limit: Int = 2000): DataFrame =
    fct.filter(col("ticker") === ticker && col("trade_date").between(from, to))
      .orderBy(col("trade_date").desc).limit(limit)

  /** Breadth page: last-n daily rows with the README's sentiment CASE
    * (`1_Market_Breadth.py:24-29`; `README.md:393-407`).
    */
  def breadthTrend(breadth: DataFrame, lastN: Int = 30): DataFrame =
    breadth.select(
        col("trade_date"), col("ad_ratio"), col("pct_market_over_sma50"),
        col("market_rsi"),
        when(col("pct_market_over_sma50") > 0.8, "Strong Bullish")
          .when(col("pct_market_over_sma50") < 0.2, "Strong Bearish")
          .otherwise("Neutral").as("market_sentiment"))
      .orderBy(col("trade_date").desc).limit(lastN)

  /** README acceptance query 1 (`README.md:382-388`): tickers that golden-
    * crossed on the latest trade date. The max-date scalar stays lazy via a
    * broadcastable single-row cross join (J5).
    */
  def latestGoldenCrosses(fct: DataFrame): DataFrame =
    fct.crossJoin(broadcast(fct.agg(max("trade_date").as("max_trade_date"))))
      .filter(col("trade_date") === col("max_trade_date") && col("golden_cross") === 1)
      .select("ticker", "company", "sector")

  /** README acceptance query 3 (`README.md:409-419`): top decile by 1-month
    * return, per sector.
    */
  def topPerformersBySector(dim: DataFrame): DataFrame =
    dim.filter(col("performance_percentile") > 0.9)
      .select("sector", "ticker", "latest_close", "return_1m", "performance_percentile")
      .orderBy(col("sector"), col("return_1m").desc)

  /** Freshness endpoint (`data-viz/utilities/dashboard_helpers.py:75-82`). */
  def freshness(df: DataFrame): DataFrame =
    df.agg(count(lit(1)).as("row_count"),
      min("trade_date").as("oldest"), max("trade_date").as("newest"))

  /** Screener summary metrics — the reference computes these client-side
    * over the fetched page (`2_Universe_Screener.py:119-127`, A8); here
    * they run in-engine as one aggregate.
    */
  def screenerStats(dim: DataFrame): DataFrame =
    dim.agg(
      expr("median(return_1m)").as("median_return_1m"),
      avg(col("return_1m")).as("mean_return_1m"),
      expr("median(latest_rsi)").as("median_rsi"),
      avg(col("latest_rel_vol")).as("mean_rel_vol"),
      count(lit(1)).as("n_securities"))

  /** Widget picklists (`2_Universe_Screener.py:21-25`,
    * `3_Ticker_Momentum.py:24-28`, O5).
    */
  def sectorPicklist(dim: DataFrame): DataFrame =
    dim.select("sector").distinct().orderBy("sector")

  def tickerPicklist(dim: DataFrame): DataFrame =
    dim.select("ticker").distinct().orderBy("ticker")
}

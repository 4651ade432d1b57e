package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.models._
import graft.pipeline.Pipeline._

/** The reference's dbt project as a [[Pipeline]] DAG (SURVEY §3.2):
  * staging = views (lazy, inlined by Catalyst), intermediate/fact =
  * incremental tables MERGE'd by trade_date partition, marts = full-rebuild
  * tables; the fact is clustered by ticker
  * (`dbt/stock_analytics/models/marts/fct_trading_momentum.sql:5`) so the
  * per-ticker dashboard path touches one cluster's files. Downstream marts
  * read the MATERIALIZED fact (a physical re-read, like dbt's `ref()` of a
  * table) — the momentum window stack is computed once per run.
  */
object StockPipeline {

  /** @param stagedBars  staging-shaped OHLCV bars (see TestFixtures.stagedBars)
    * @param constituents SCD2 constituents dimension
    */
  def models(stagedBars: DataFrame, constituents: DataFrame): Seq[Model] = Seq(
    Model("stg_daily_stocks", Nil, View, build = _ => stagedBars),
    Model("stg_constituents", Nil, View, build = _ => constituents),
    Model("int_russell_daily", Seq("stg_daily_stocks", "stg_constituents"),
      Incremental, clusterBy = Seq("ticker"),
      build = in => IntRussellDaily.buildFull(
        in("stg_daily_stocks"), in("stg_constituents"))),
    Model("fct_trading_momentum", Seq("int_russell_daily"),
      Incremental, clusterBy = Seq("ticker"),
      build = in => FctTradingMomentum.buildFull(in("int_russell_daily"))),
    Model("agg_daily_market_breadth", Seq("int_russell_daily", "fct_trading_momentum"),
      Table,
      build = in => AggDailyMarketBreadth.build(
        in("int_russell_daily"), in("fct_trading_momentum"))),
    Model("dim_securities_current", Seq("fct_trading_momentum"), Table,
      build = in => DimSecuritiesCurrent.build(in("fct_trading_momentum"))))

  /** Full run: build every layer into `storeDir`, return resolved marts. */
  def run(spark: SparkSession, stagedBars: DataFrame, constituents: DataFrame,
      storeDir: String): Map[String, DataFrame] =
    Pipeline.run(spark, models(stagedBars, constituents), storeDir)
}

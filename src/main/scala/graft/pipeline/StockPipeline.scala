package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

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

  /** Declared output schemas for the two models the reference protects with
    * `on_schema_change='fail'` (`int_russell3000__daily.sql:6`,
    * `fct_trading_momentum.sql:6`) — the contract the DAG runner enforces
    * before writing.
    */
  val IntRussellDailyContract: StructType = StructType.fromDDL(
    "ticker STRING, trade_date DATE, volume BIGINT, " +
      "volume_weighted_avg DOUBLE, open DOUBLE, close DOUBLE, high DOUBLE, " +
      "low DOUBLE, num_transactions BIGINT, ingested_at TIMESTAMP, " +
      "has_volume INT, is_valid_record INT, sector STRING, company STRING, " +
      "index_weight DOUBLE, consecutive_trading_days BIGINT, " +
      "yesterday_close DOUBLE, is_new_to_index INT")

  val FctTradingMomentumContract: StructType = StructType.fromDDL(
    "ticker STRING, volume BIGINT, open DOUBLE, close DOUBLE, " +
      "yesterday_close DOUBLE, high DOUBLE, low DOUBLE, trade_date DATE, " +
      "sector STRING, company STRING, index_weight DOUBLE, " +
      "is_new_to_index INT, is_valid_record INT, sma_20 DOUBLE, " +
      "sma_50 DOUBLE, sma_200 DOUBLE, high_52week DOUBLE, " +
      "low_52week DOUBLE, avg_gain_14 DOUBLE, avg_loss_14 DOUBLE, " +
      "bullish_crossover INT, golden_cross INT, death_cross INT, " +
      "rel_vol DOUBLE, rsi DOUBLE")

  /** @param stagedBars  staging-shaped OHLCV bars (see TestFixtures.stagedBars)
    * @param constituents SCD2 constituents dimension
    */
  def models(stagedBars: DataFrame, constituents: DataFrame): Seq[Model] = Seq(
    Model("stg_daily_stocks", Nil, View, build = _ => stagedBars),
    Model("stg_constituents", Nil, View, build = _ => constituents),
    Model("int_russell_daily", Seq("stg_daily_stocks", "stg_constituents"),
      Incremental, clusterBy = Seq("ticker"),
      contract = Some(IntRussellDailyContract),
      build = in => IntRussellDaily.buildFull(
        in("stg_daily_stocks"), in("stg_constituents"))),
    Model("fct_trading_momentum", Seq("int_russell_daily"),
      Incremental, clusterBy = Seq("ticker"),
      contract = Some(FctTradingMomentumContract),
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

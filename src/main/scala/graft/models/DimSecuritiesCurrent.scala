package graft.models

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.RollingFunctions.{lookbackReturn, tickerWindow}

/** Mart: one row per ticker, "current state" snapshot.
  *
  * Port of reference `models/marts/dim_securities_current.sql:1-232`: latest
  * snapshot via the scalar-subquery date filter (J5), lookback returns
  * (W11), market-wide percentile with the null-bucket PERCENT_RANK trick
  * (W13), whole-partition sector average (W14), 20-row volatility (A4),
  * per-ticker COUNT DISTINCT (A5), conditional MAX/MIN + COALESCE fallback
  * signals over a trailing 365-day window (A6), top-1-per-ticker QUALIFY
  * filters (W12), and the 6-way left-join assembly (J4).
  *
  * Scale notes: each branch reduces to one row per ticker before the
  * assembly joins, so the joined frames are dimension-sized (the reference
  * expects 2–3k rows) — AQE broadcasts them. The caller should pass a
  * MATERIALIZED (persisted or written-and-reread) fct, mirroring the
  * reference where fct is a physical table read by 6 CTEs; otherwise the
  * whole momentum window stack would be recomputed per branch.
  */
object DimSecuritiesCurrent {

  private def nullIfZero(c: Column): Column = when(c === 0d, lit(null)).otherwise(c)

  def build(fct: DataFrame): DataFrame = {
    val maxDate = fct.agg(max("trade_date")).head().getDate(0)
    val w = tickerWindow
    val wDesc = Window.partitionBy("ticker").orderBy(col("trade_date").desc)

    // latest_snapshot (`dim_securities_current.sql:5-28`)
    val latest = fct.filter(col("trade_date") === lit(maxDate)).select(
      col("ticker"), col("company"), col("sector"),
      col("trade_date").as("latest_trade_date"),
      col("volume").as("latest_volume"),
      col("open").as("latest_open"),
      col("close").as("latest_close"),
      col("yesterday_close").as("latest_prev_close"),
      col("high").as("latest_high"),
      col("low").as("latest_low"),
      col("sma_20").as("latest_sma20"),
      col("sma_50").as("latest_sma50"),
      col("sma_200").as("latest_sma200"),
      col("rsi").as("latest_rsi"),
      col("rel_vol").as("latest_rel_vol"),
      col("high_52week").as("latest_52week_high"),
      col("low_52week").as("latest_52week_low"),
      (col("close") - col("yesterday_close")).as("price_change_1d"),
      ((col("close") - col("yesterday_close")) /
        nullIfZero(col("yesterday_close"))).as("return_1d"))

    // returns_lookback (`dim_securities_current.sql:30-39`)
    val returns = fct
      .withColumn("return_1w", lookbackReturn(col("close"), 5, w))
      .withColumn("return_1m", lookbackReturn(col("close"), 21, w))
      .withColumn("return_3m", lookbackReturn(col("close"), 63, w))
      .withColumn("return_ytd", lookbackReturn(col("close"), 252, w))
      .withColumn("rn", row_number().over(wDesc))
      .filter(col("rn") === 1)
      .select("ticker", "return_1w", "return_1m", "return_3m", "return_ytd")

    // numbered_dates: trailing 33 calendar days (`:41-57`)
    val numbered = fct
      .filter(col("trade_date") >= date_sub(lit(maxDate), 33))
      .select("ticker", "sector", "trade_date", "close", "yesterday_close", "volume")
      .withColumn("days_back", row_number().over(wDesc))

    // sector_lookback + sector_metrics (`:59-80`): note return_1m here is
    // computed over the 33-day slice only (windows see just the slice) —
    // replicated exactly, including the null-bucket PERCENT_RANK partition.
    val sectorLookback = numbered
      .withColumn("return_1m", lookbackReturn(col("close"), 21, w))
    val notNullBucket = when(col("return_1m").isNotNull, 1).otherwise(0)
    val sectorMetrics = sectorLookback
      .withColumn("sector_return_1m",
        avg(col("return_1m")).over(Window.partitionBy("sector")))
      .withColumn("performance_percentile",
        when(col("return_1m").isNotNull,
          percent_rank().over(
            Window.partitionBy(notNullBucket).orderBy("return_1m"))))
      .withColumn("rn", row_number().over(wDesc))
      .filter(col("rn") === 1)
      .select("ticker", "sector_return_1m", "performance_percentile")

    // volatility_metrics: last 20 rows per ticker (`:82-94`). Snowflake
    // STDDEV is sample stddev -> stddev_samp.
    val volatility = numbered
      .filter(col("days_back") <= 20)
      .groupBy("ticker").agg(
        (stddev_samp(log(col("close") / nullIfZero(col("yesterday_close")))) *
          lit(math.sqrt(252.0))).as("vol_20d_raw"),
        avg(col("volume")).as("avg_vol_20d_raw"),
        count(lit(1)).as("trading_days"))

    // trading_days_count (`:96-102`)
    val tradingDays = fct.groupBy("ticker")
      .agg(countDistinct("trade_date").as("total_trading_days"))

    // signal_flags (`:104-112`)
    val signalFlags = latest.select(
      col("ticker"),
      when(col("latest_sma50") > col("latest_sma200"), 1).otherwise(0)
        .as("has_golden_cross_active"),
      when(col("latest_close") > col("latest_sma20"), 1).otherwise(0)
        .as("over_sma20"),
      when(col("latest_close") > col("latest_sma50"), 1).otherwise(0)
        .as("over_sma50"),
      when(col("latest_close") > col("latest_sma200"), 1).otherwise(0)
        .as("over_sma200"))

    // last_signals over trailing 365 days (`:114-154`)
    val lastSignals = fct
      .filter(col("trade_date") >= date_sub(lit(maxDate), 365))
      .groupBy("ticker").agg(
        coalesce(
          max(when(col("golden_cross") === 1, col("trade_date"))),
          min(when(col("sma_200").isNotNull, col("trade_date"))))
          .as("last_golden_cross"),
        coalesce(
          max(when(col("close") > col("sma_50") &&
            (col("yesterday_close") < col("sma_50") ||
              col("yesterday_close").isNull), col("trade_date"))),
          min(when(col("sma_50").isNotNull && col("close") > col("sma_50"),
            col("trade_date"))))
          .as("day_cross_over_sma50"),
        coalesce(
          max(when(col("close") < col("sma_50") &&
            (col("yesterday_close") > col("sma_50") ||
              col("yesterday_close").isNull), col("trade_date"))),
          min(when(col("sma_50").isNotNull && col("close") < col("sma_50"),
            col("trade_date"))))
          .as("day_cross_below_sma50"))

    // final assembly (`:156-232`)
    latest
      .join(returns, Seq("ticker"), "left")
      .join(tradingDays, Seq("ticker"), "left")
      .join(volatility, Seq("ticker"), "left")
      .join(signalFlags, Seq("ticker"), "left")
      .join(lastSignals, Seq("ticker"), "left")
      .join(sectorMetrics, Seq("ticker"), "left")
      .withColumn("pct_distance_from_52week_high",
        when(col("latest_52week_high").isNotNull,
          (col("latest_52week_high") - col("latest_close")) / col("latest_52week_high")))
      .withColumn("pct_distance_from_52week_low",
        when(col("latest_52week_low").isNotNull,
          (col("latest_close") - col("latest_52week_low")) / col("latest_52week_low")))
      .withColumn("outperformance_vs_sector",
        when(col("return_1m").isNotNull,
          col("return_1m") - col("sector_return_1m")))
      .withColumn("volatility_20d",
        when(col("trading_days") >= 20, col("vol_20d_raw")))
      .withColumn("avg_volume_20d",
        when(col("trading_days") >= 20, col("avg_vol_20d_raw")))
      .withColumn("days_since_last_golden_cross",
        datediff(col("latest_trade_date"), col("last_golden_cross")).cast("long"))
      .withColumn("days_over_sma50",
        when(col("over_sma50") === 1,
          datediff(col("latest_trade_date"), col("day_cross_over_sma50")).cast("long")))
      .withColumn("days_under_sma50",
        when(col("over_sma50") === 0,
          datediff(col("latest_trade_date"), col("day_cross_below_sma50")).cast("long")))
      .drop("vol_20d_raw", "avg_vol_20d_raw", "trading_days",
        "last_golden_cross", "day_cross_over_sma50", "day_cross_below_sma50")
  }
}

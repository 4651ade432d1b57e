package graft.models

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.RollingFunctions.{rollingMax, rollingMin, tickerWindow}

/** Mart: one row per trade_date of market-wide breadth statistics.
  *
  * Port of reference `models/marts/agg_daily_market_breadth.sql:1-143`:
  * conditional-sum base aggregates (A1), new-high/low counts against the
  * rolling 252-row extremes (A2 — note the reference recomputes the 52-week
  * columns from the intermediate table rather than reusing the fact's),
  * %-over-SMA ratios + market RSI (A3), the left-join assembly (J3), the
  * cumulative advance/decline line (W9) and the 10-day high-low index (W10).
  *
  * Scale notes: the per-date aggregates shuffle once on trade_date and emit
  * ~one row per day, so the global (unpartitioned) windows W9/W10 run on a
  * single partition of trivially small data — this is safe at any input
  * scale because the cardinality is bounded by calendar days. The join of the
  * three per-date aggregate branches is broadcast-sized by the same argument.
  */
object AggDailyMarketBreadth {

  def build(intDaily: DataFrame, fct: DataFrame): DataFrame = {
    val yc = col("yesterday_close")

    // base_aggregates (`agg_daily_market_breadth.sql:6-17`)
    val base = intDaily.groupBy("trade_date").agg(
      countDistinct("ticker").as("stocks_traded"),
      sum(when(col("close") === yc || yc.isNull, 1).otherwise(0))
        .as("unchanged_stocks"),
      sum(when(col("close") > yc && yc.isNotNull, 1).otherwise(0))
        .as("advances"),
      sum(when(col("close") < yc && yc.isNotNull, 1).otherwise(0))
        .as("declines"),
      sum(when(col("close") > yc && yc.isNotNull, col("volume")).otherwise(0L))
        .as("up_volume"),
      sum(when(col("close") < yc && yc.isNotNull, col("volume")).otherwise(0L))
        .as("down_volume"))

    // rolling_high_low + high_low_aggs (`agg_daily_market_breadth.sql:19-58`).
    // The equality test `close = high_52week` is float-exact because both
    // operands come from the same stored value (SURVEY §7 hard parts).
    val w = tickerWindow
    val highLow = intDaily
      .withColumn("high_52week", rollingMax(col("close"), 252, w))
      .withColumn("low_52week", rollingMin(col("close"), 252, w))
      .groupBy("trade_date").agg(
        sum(when(col("close") === col("high_52week"), 1).otherwise(0))
          .as("new_highs"),
        sum(when(col("close") === col("low_52week"), 1).otherwise(0))
          .as("new_lows"))

    // sma_aggs (`agg_daily_market_breadth.sql:60-69`)
    val smaAggs = fct.groupBy("trade_date").agg(
      (sum(when(col("close") > col("sma_20"), 1).otherwise(0)) /
        count(col("close"))).as("pct_market_over_sma20"),
      (sum(when(col("close") > col("sma_50"), 1).otherwise(0)) /
        count(col("close"))).as("pct_market_over_sma50"),
      (sum(when(col("close") > col("sma_200"), 1).otherwise(0)) /
        count(col("close"))).as("pct_market_over_sma200"),
      avg(col("rsi")).as("market_rsi"))

    // final assembly (`agg_daily_market_breadth.sql:71-143`). One row per
    // day: unpartitioned windows are bounded-cardinality (see scale notes).
    val dayW = Window.orderBy("trade_date")
    val adSum = col("advances") + col("declines") + col("unchanged_stocks")
    base
      .join(smaAggs, Seq("trade_date"), "left")
      .join(highLow, Seq("trade_date"), "left")
      .withColumn("ad_line",
        sum(col("advances") - col("declines")).over(dayW))
      .withColumn("ad_percentage",
        when(adSum > 0, (col("advances") - col("declines")) / adSum))
      .withColumn("ad_ratio",
        when(col("declines").isNotNull && col("declines") =!= 0,
          col("advances") / col("declines")))
      .withColumn("up_down_volume_ratio",
        when(col("down_volume").isNotNull && col("down_volume") =!= 0,
          col("up_volume") / col("down_volume")))
      .withColumn("market_momentum",
        when(col("market_rsi") > 70, "overbought")
          .when(col("market_rsi") < 30, "oversold")
          .otherwise("normal"))
      .withColumn("record_high_pct",
        when(col("stocks_traded") > 0, col("new_highs") / col("stocks_traded")))
      .withColumn("high_low_index",
        avg(when(col("new_highs") + col("new_lows") > 0,
          col("new_highs") / (col("new_highs") + col("new_lows"))))
          .over(dayW.rowsBetween(-9, 0)))
      .select(
        col("trade_date"), col("stocks_traded"), col("unchanged_stocks"),
        col("advances"), col("declines"), col("up_volume"), col("down_volume"),
        col("pct_market_over_sma20"), col("pct_market_over_sma50"),
        col("pct_market_over_sma200"), col("market_rsi"), col("ad_line"),
        col("ad_percentage"), col("ad_ratio"), col("up_down_volume_ratio"),
        col("market_momentum"), col("new_highs"), col("new_lows"),
        col("record_high_pct"), col("high_low_index"))
      .orderBy("trade_date")
  }
}

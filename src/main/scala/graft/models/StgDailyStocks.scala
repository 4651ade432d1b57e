package graft.models

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Staging model: standardizes raw Polygon-shaped daily bars.
  *
  * Spark-native port of reference `models/staging/stg_daily_stocks.sql:1-25`
  * (P1–P4 in SURVEY §2.2): rename/cast projection, `has_volume` and
  * `is_valid_record` 0/1 flags, and the NULL-trade-date filter. Stays a lazy
  * DataFrame (the reference materializes staging as a view,
  * `dbt_project.yml:55-65`), so Catalyst inlines it into downstream plans and
  * pushes the projection + null filter into the parquet scan.
  */
object StgDailyStocks {

  /** `IFF(V > 0, 1, 0)` — reference `stg_daily_stocks.sql:13`. */
  def hasVolume(v: Column): Column = when(v > 0, 1).otherwise(0)

  /** OHLC consistency predicate, reference `stg_daily_stocks.sql:14-23`:
    * all prices positive and L <= C <= H, L <= H.
    */
  def isValidRecord(o: Column, c: Column, h: Column, l: Column): Column =
    when(o > 0 && c > 0 && h > 0 && l > 0 && c <= h && c >= l && l <= h, 1)
      .otherwise(0)

  /** Raw -> staging. Input schema is the raw table of FIXTURES.md §1
    * (`T,V,VW,O,C,H,L,N,TS,DATE,INGESTED_AT`).
    */
  def build(raw: DataFrame): DataFrame =
    raw
      .filter(col("DATE").isNotNull)
      .select(
        col("T").as("ticker"),
        col("V").cast("long").as("volume"),
        col("VW").as("volume_weighted_avg"),
        col("O").as("open"),
        col("C").as("close"),
        col("H").as("high"),
        col("L").as("low"),
        col("N").as("num_transactions"),
        col("DATE").as("trade_date"),
        col("INGESTED_AT").as("ingested_at"),
        hasVolume(col("V")).as("has_volume"),
        isValidRecord(col("O"), col("C"), col("H"), col("L")).as("is_valid_record"))
}

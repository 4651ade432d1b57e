package graft.models

import java.sql.Date

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Staging model: index-constituent snapshots unified into an SCD2-style
  * dimension with validity ranges.
  *
  * Port of reference `models/staging/stg_russell3000__constituents.sql:1-58`
  * (U1 in SURVEY §2.7): per-snapshot projection + injected
  * `valid_from`/`valid_to` literals, UNION ALL'd. Ranges are non-overlapping
  * by construction, so the point-in-time join (IntRussellDaily) needs no
  * dedup. The dimension is small (~2.6k rows x 4 snapshots in the reference)
  * and is broadcast by the consumer.
  */
object StgConstituents {

  /** One snapshot: source frame with columns
    * `Ticker,Name,Sector,Market_Value,Weight` plus its validity range.
    */
  final case class Snapshot(df: DataFrame, validFrom: Date, validTo: Date)

  /** Numeric seed fields arrive as quoted thousands-separated strings
    * ("988,555,988.64") per FIXTURES.md §2 — de-comma then cast
    * (reference declares them `float` in `dbt_project.yml:31-45`).
    */
  def deComma(colName: String) =
    regexp_replace(col(colName), ",", "").cast("double")

  def build(snapshots: Seq[Snapshot]): DataFrame = {
    val parts = snapshots.map { s =>
      s.df.select(
        col("Ticker").as("ticker"),
        col("Name").as("company"),
        col("Sector").as("sector"),
        col("Market_Value").cast("double").as("market_value"),
        col("Weight").cast("double").as("market_weight"),
        lit(s.validFrom).as("valid_from"),
        lit(s.validTo).as("valid_to"))
    }
    parts.reduce(_.unionByName(_))
      .withColumn("ingested_at", current_timestamp())
  }

  /** Reads one reference-style seed CSV (S9 in SURVEY §2.1): quoted header,
    * thousands-separated numerics.
    */
  def readSeedCsv(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame = {
    val raw = spark.read
      .option("header", "true")
      .option("quote", "\"")
      .csv(path)
    raw.select(
      col("Ticker"),
      col("Name"),
      col("Sector"),
      regexp_replace(col("Market_Value"), ",", "").cast("double").as("Market_Value"),
      regexp_replace(col("Weight"), ",", "").cast("double").as("Weight"))
  }
}

package graft.testdata

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.models.StgDailyStocks

/** Deterministic derivations of stock-pipeline-shaped inputs from the
  * driver-provided TPC-H-ish testdata (`/root/testdata/sf*`, TESTDATA.md).
  *
  * The stock models need (ticker, trade_date)-grain OHLCV bars and an
  * SCD2-style constituents dimension; the testdata is a star schema. We
  * derive both with pure, order-independent expressions (min/max/exact sums
  * only — no float accumulation ambiguity at the grain boundary) so the
  * exact same derivation is expressible in the DuckDB oracle SQL
  * ([[graft.testdata.OracleSql]]) and the comparison is bit-honest.
  *
  * `l_suppkey % 25` gives 25 tickers whose bar density is ~1 row/ticker/day
  * at sf0.01 — enough history (~2400 rows/ticker) to populate SMA-200 and
  * 252-row windows. `nation` (exactly 25 rows) provides the constituent
  * dimension; two validity snapshots split at 1998-01-01 exercise the
  * point-in-time join's drop-in/drop-out semantics.
  */
object TestFixtures {

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** The events table has shipped `ts` both as nanosecond parquet
    * timestamps (which Spark's vectorized reader rejects — read as raw
    * longs via `nanosAsLong` and truncate to microseconds, `div 1000`
    * exact integer math) and as plain microsecond timestamps (newer
    * generator runs — pass through, normalized to session-TZ TIMESTAMP).
    * Both land on the same microsecond instants DuckDB's `CAST(ts AS
    * TIMESTAMP)` produces, so the oracle compare stays bit-honest; the
    * type dispatch reads only the parquet footer, not the data.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case _ =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
    }
  }

  private def tickerOf(c: org.apache.spark.sql.Column) =
    concat(lit("S"), lpad(c.cast("string"), 2, "0"))

  /** Quantize to quarter units: quarters are dyadic rationals, so doubles
    * hold them EXACTLY and any summation order (Spark sequential frame
    * re-aggregation vs DuckDB segment trees) yields bit-identical rolling
    * sums/averages — removes ulp-level oracle flakiness at its source.
    */
  private def quarters(c: org.apache.spark.sql.Column) = floor(c * 4) / 4

  /** OHLCV bars at (ticker, trade_date) grain derived from lineitem.
    * Grouping runs on the raw integer key (`l_suppkey % 25`) and the ticker
    * string is derived AFTER aggregation: the partial-agg hash and the
    * shuffle carry a long, and the concat/lpad runs once per output group
    * instead of once per input row.
    */
  def bars(spark: SparkSession, dir: String): DataFrame = {
    val li = table(spark, dir, "lineitem")
    li.groupBy(
        (col("l_suppkey") % 25).as("tid"),
        col("l_shipdate").cast("date").as("trade_date"))
      .agg(
        quarters(min(col("l_extendedprice"))).as("open"),
        quarters(max(col("l_extendedprice"))).as("close"),
        quarters(max(col("l_extendedprice") * (lit(1d) + col("l_tax")))).as("high"),
        quarters(min(col("l_extendedprice") * (lit(1d) - col("l_discount")))).as("low"),
        sum(col("l_quantity")).cast("long").as("volume"),
        count(lit(1)).as("num_transactions"))
      .withColumn("ticker", tickerOf(col("tid")))
      .drop("tid")
  }

  /** Bars in the staging-output shape consumed by IntRussellDaily. */
  def stagedBars(spark: SparkSession, dir: String): DataFrame =
    bars(spark, dir).select(
      col("ticker"), col("volume"),
      ((col("high") + col("low") + col("close")) / 3).as("volume_weighted_avg"),
      col("open"), col("close"), col("high"), col("low"),
      col("num_transactions"), col("trade_date"),
      lit("2026-01-01 00:00:00").cast("timestamp").as("ingested_at"),
      StgDailyStocks.hasVolume(col("volume")).as("has_volume"),
      StgDailyStocks.isValidRecord(col("open"), col("close"), col("high"),
        col("low")).as("is_valid_record"))

  /** SCD2 constituents dimension from nation x region: two snapshots split
    * at 1998-01-01; nationkey%10==3 members join late, %10==7 drop out.
    */
  def constituents(spark: SparkSession, dir: String): DataFrame = {
    val n = table(spark, dir, "nation")
    val r = table(spark, dir, "region")
    val base = n.join(r, col("n_regionkey") === col("r_regionkey"))
      .select(
        tickerOf(col("n_nationkey")).as("ticker"),
        col("n_name").as("company"),
        col("r_name").as("sector"),
        ((col("n_nationkey") + 1) * 1000).cast("double").as("market_value"),
        (col("n_nationkey").cast("double") / 10.0).as("market_weight"),
        col("n_nationkey"))
    val snapA = base.filter(col("n_nationkey") % 10 =!= 3)
      .withColumn("valid_from", to_date(lit("1992-01-01")))
      .withColumn("valid_to", to_date(lit("1997-12-31")))
    val snapB = base.filter(col("n_nationkey") % 10 =!= 7)
      .withColumn("valid_from", to_date(lit("1998-01-01")))
      .withColumn("valid_to", to_date(lit("2999-12-31")))
    snapA.unionByName(snapB).drop("n_nationkey")
  }

  /** Raw Polygon-shaped frame (FIXTURES.md §1) at lineitem grain, with
    * deliberate edge rows: V=0 (has_volume=0), O=0 when discount=0
    * (is_valid_record=0), and NULL DATE on ~1% of rows (dropped by staging).
    */
  def rawDaily(spark: SparkSession, dir: String): DataFrame = {
    val li = table(spark, dir, "lineitem")
    li.select(
      tickerOf(col("l_suppkey") % 25).as("T"),
      (col("l_quantity") - 1).as("V"),
      col("l_extendedprice").as("VW"),
      col("l_discount").as("O"),
      col("l_extendedprice").as("C"),
      (col("l_extendedprice") * (lit(1d) + col("l_tax"))).as("H"),
      (col("l_extendedprice") * (lit(1d) - col("l_discount"))).as("L"),
      col("l_linenumber").cast("long").as("N"),
      col("l_shipdate").as("TS"),
      when(col("l_orderkey") % 97 === 0, lit(null))
        .otherwise(col("l_shipdate").cast("date")).as("DATE"),
      lit("2026-01-01 00:00:00").cast("timestamp").as("INGESTED_AT"))
  }
}

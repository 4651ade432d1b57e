package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.models._
import graft.testdata.{TestFixtures => T}

/** SURVEY ST3–ST5: incremental builds must reproduce the full-refresh ground
  * truth on the merged window (the documented ROW_NUMBER wart excepted).
  */
class IncrementalParitySpec extends SparkSpec {

  private lazy val stg = T.stagedBars(spark, sf).cache()
  private lazy val const = T.constituents(spark, sf)
  private lazy val fullInt = IntRussellDaily.buildFull(stg, const).cache()

  /** A date ~30 trading days before the end, to split history/new. */
  private lazy val splitDate = {
    val dates = fullInt.select("trade_date").distinct().orderBy(col("trade_date").desc)
      .limit(30).agg(min("trade_date")).head().getDate(0)
    dates
  }

  private def symmetricDiff(a: DataFrame, b: DataFrame): Long =
    a.exceptAll(b).count() + b.exceptAll(a).count()

  test("fct incremental slice == full refresh restricted to the slice (ST4)") {
    val existing = FctTradingMomentum.buildFull(
      IntRussellDaily.buildFull(stg.filter(col("trade_date") < lit(splitDate)), const))
    val slice = FctTradingMomentum.buildIncrementalSlice(fullInt, existing)
    val maxExisting = existing.agg(max("trade_date")).head().getDate(0)
    val fullSlice = FctTradingMomentum.buildFull(fullInt)
      .filter(col("trade_date") >= date_sub(lit(maxExisting), 4))
      .filter(col("is_valid_record") === 1)
    assert(symmetricDiff(slice, fullSlice) == 0)
  }

  test("int incremental yesterday_close falls back to existing across the boundary (ST4/J2)") {
    val existing = fullInt.filter(col("trade_date") < lit(splitDate))
    val inc = IntRussellDaily.buildIncremental(stg, const, existing)
    // Ground truth for yesterday_close on slice rows whose previous bar is
    // exactly one calendar day back (the reference's fallback join key —
    // longer gaps are the reference's own documented blind spot).
    val full = fullInt.select(
      col("ticker"), col("trade_date"),
      col("yesterday_close").as("full_yc"))
    val prevDayExists = fullInt.select(
      col("ticker").as("p_ticker"), date_add(col("trade_date"), 1).as("next_date"))
    val mismatches = inc.alias("i")
      .join(full.alias("f"), Seq("ticker", "trade_date"))
      .join(prevDayExists,
        col("i.ticker") === col("p_ticker") && col("i.trade_date") === col("next_date"))
      .filter(col("i.yesterday_close").isNull ||
        col("i.yesterday_close") =!= col("full_yc"))
    assert(mismatches.count() == 0)
  }

  test("incremental merge is idempotent: re-merging the same slice changes nothing") {
    val existing = fullInt.filter(col("trade_date") < lit(splitDate))
    val inc = IntRussellDaily.buildIncremental(stg, const, existing)
    // MERGE = delete-matching-keys + append
    def merge(target: DataFrame, slice: DataFrame): DataFrame =
      target.join(slice.select("ticker", "trade_date"),
        Seq("ticker", "trade_date"), "left_anti")
        .unionByName(slice)
    val once = merge(existing, inc).cache()
    val twice = merge(once, inc)
    assert(symmetricDiff(once, twice) == 0)
  }
}

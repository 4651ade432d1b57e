package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.models.{IntRussellDaily, StgDailyStocks}
import graft.streaming.IncrementalMartStream
import graft.testdata.{TestFixtures => T}

/** End-to-end streaming incremental mart maintenance: landed vendor files →
  * raw append → lookback-slice recompute → partition MERGE, compared
  * against a batch full refresh over the same raw data.
  */
class StreamingMartSpec extends SparkSpec {

  private def barJson(t: String, date: String, c: Double): String =
    s"""{"T":"$t","v":100.0,"vw":$c,"o":$c,"c":$c,"h":${c + 1},"l":${c - 1},""" +
      s""""n":5,"t_ms":1704067200000,"api_date":"$date"}"""

  // ST5 wart columns (consecutive_trading_days / is_new_to_index) are
  // recomputed within the slice on incremental runs and legitimately
  // diverge from full refresh — the reference's documented behavior.
  private def comparable(df: DataFrame): DataFrame =
    df.drop("consecutive_trading_days", "is_new_to_index", "ingested_at")

  private def symmetricDiff(a: DataFrame, b0: DataFrame): Long = {
    val b = b0.select(a.columns.map(col): _*) // partitionBy reorders on disk
    a.exceptAll(b).count() + b.exceptAll(a).count()
  }

  test("streamed incremental mart converges to the batch full refresh") {
    val landing = Files.createTempDirectory("mart-landing")
    val ckpt = Files.createTempDirectory("mart-ckpt").toString + "/c"
    val raw = Files.createTempDirectory("mart-raw").toString + "/raw"
    val mart = Files.createTempDirectory("mart-out").toString + "/int_daily"
    val const = T.constituents(spark, sf)

    // bootstrap: three days of history in one drain
    val days1 = Seq("2024-01-02", "2024-01-03", "2024-01-04")
    Files.writeString(landing.resolve("d1.json"),
      days1.zipWithIndex.flatMap { case (d, i) =>
        Seq(barJson("S01", d, 10.0 + i), barJson("S02", d, 20.0 + i))
      }.mkString("\n"))
    val m1 = IncrementalMartStream.maintainIntDaily(
      spark, landing.toString, ckpt, raw, mart, const)
    val full1 = IntRussellDaily.buildFull(
      StgDailyStocks.build(spark.read.parquet(raw)), const)
    assert(symmetricDiff(comparable(m1), comparable(full1)) == 0)
    assert(m1.count() == 6)

    // a new day lands (plus a restatement of the last day) → incremental
    // cycle must merge the lookback slice, carrying yesterday_close across
    // the batch boundary
    Files.writeString(landing.resolve("d2.json"),
      Seq(barJson("S01", "2024-01-04", 13.5), // corrected close
        barJson("S01", "2024-01-05", 14.0),
        barJson("S02", "2024-01-05", 24.0)).mkString("\n"))
    val m2 = IncrementalMartStream.maintainIntDaily(
      spark, landing.toString, ckpt, raw, mart, const)
    val full2 = IntRussellDaily.buildFull(
      StgDailyStocks.build(spark.read.parquet(raw)), const)
    // the restated 01-04 bar appends a second raw row; staging dedups by
    // grain? No — the reference reprocesses the whole slice from raw, so
    // both engines see identical staged input. Parity is on the OUTPUT.
    assert(symmetricDiff(comparable(m2), comparable(full2)) == 0)
    assert(m2.filter(col("trade_date") === "2024-01-05").count() == 2)
    // cross-boundary lag: 01-05's yesterday_close = the merged 01-04 close
    val yc = m2.filter(col("ticker") === "S02" &&
      col("trade_date") === "2024-01-05").head().getAs[Double]("yesterday_close")
    assert(yc == 22.0)
  }
}

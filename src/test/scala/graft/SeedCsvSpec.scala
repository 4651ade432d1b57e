package graft

import java.nio.file.Files
import java.sql.Date

import org.apache.spark.sql.functions._

import graft.models.StgConstituents

/** S9: reference-style seed CSVs — quoted, thousands-separated numerics
  * (`dbt/stock_analytics/seeds/russell3000_*.csv` shape per SURVEY §1.3).
  */
class SeedCsvSpec extends SparkSpec {

  private val csv =
    """Ticker,Name,Sector,Asset_Class,Market_Value,Weight,Notional_Value,Quantity,Price,Location,Exchange,Currency,FX_Rate,Market_Currency,Accrual_Date
      |AAPL,"Apple Inc","Information Technology",Equity,"988,555,988.64","6.5","988,555,988.64","5,862,574","168.62",US,NASDAQ,USD,"1.00",USD,--
      |MSFT,"Microsoft Corp","Information Technology",Equity,"874,222,111.99","5.9","874,222,111.99","2,111,333","414.11",US,NASDAQ,USD,"1.00",USD,--
      |XOM,"Exxon Mobil","Energy",Equity,"301,000,000.50","1.2","301,000,000.50","2,599,000","115.81",US,NYSE,USD,"1.00",USD,--
      |""".stripMargin

  test("seed CSV: quoted thousands-separated numerics parse to doubles") {
    val dir = Files.createTempDirectory("seed")
    val p = dir.resolve("russell_2024.csv")
    Files.writeString(p, csv)
    val df = StgConstituents.readSeedCsv(spark, p.toString)
    val aapl = df.filter(col("Ticker") === "AAPL").head()
    assert(aapl.getAs[Double]("Market_Value") == 988555988.64)
    assert(aapl.getAs[Double]("Weight") == 6.5)
    assert(df.count() == 3)
  }

  test("snapshots union into non-overlapping SCD2 ranges feeding the PIT join") {
    val dir = Files.createTempDirectory("seed2")
    val p = dir.resolve("s.csv")
    Files.writeString(p, csv)
    val snapDf = StgConstituents.readSeedCsv(spark, p.toString)
    val dim = StgConstituents.build(Seq(
      StgConstituents.Snapshot(snapDf.filter(col("Ticker") =!= "XOM"),
        Date.valueOf("2024-01-01"), Date.valueOf("2024-06-30")),
      StgConstituents.Snapshot(snapDf,
        Date.valueOf("2024-07-01"), Date.valueOf("2024-12-31"))))
    assert(dim.count() == 5)
    // XOM is not a member in H1: the PIT condition must exclude it
    val h1 = dim.filter(lit(Date.valueOf("2024-03-01"))
      .between(col("valid_from"), col("valid_to")))
    assert(h1.count() == 2)
    assert(h1.filter(col("ticker") === "XOM").count() == 0)
    // ...and include it in H2, exactly from valid_from
    val h2 = dim.filter(lit(Date.valueOf("2024-07-01"))
      .between(col("valid_from"), col("valid_to")))
    assert(h2.filter(col("ticker") === "XOM").count() == 1)
  }
}

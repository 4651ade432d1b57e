package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.RollingFunctions._

/** Property tests for the rolling-window combinators (SURVEY §5 item 3).
  * Random walks come from a fixed-seed generator (no scalatestplus bridge in
  * the offline cache), so failures reproduce exactly.
  */
class RollingFunctionsSpec extends SparkSpec {

  private def walkDf(closes: Seq[Seq[Double]]): DataFrame = {
    import spark.implicits._
    closes.zipWithIndex.flatMap { case (walk, t) =>
      walk.zipWithIndex.map { case (c, i) =>
        (s"T$t", java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i.toLong)), c)
      }
    }.toDF("ticker", "trade_date", "close")
  }

  /** 5 reproducible batches of 2 tickers × 40 quarter-unit positive prices. */
  private def randomWalks: Seq[Seq[Seq[Double]]] = {
    val rnd = new scala.util.Random(42)
    Seq.fill(5)(Seq.fill(2)(Seq.fill(40)((rnd.nextInt(400) + 1) / 4.0)))
  }

  test("sma of a constant series equals the constant once populated, null before") {
    val df = walkDf(Seq(Seq.fill(30)(7.25)))
      .withColumn("sma_5", sma(col("close"), 5, tickerWindow))
      .withColumn("rn", row_number().over(tickerWindow))
    assert(df.filter(col("rn") >= 5 && (col("sma_5").isNull || col("sma_5") =!= 7.25)).count() == 0)
    assert(df.filter(col("rn") < 5 && col("sma_5").isNotNull).count() == 0)
  }

  test("min-periods gate: sma_n null exactly when fewer than n rows of history") {
    randomWalks.foreach { walks =>
      val df = walkDf(walks)
        .withColumn("sma_10", sma(col("close"), 10, tickerWindow))
        .withColumn("rn", row_number().over(tickerWindow))
      assert(df.filter((col("rn") < 10) =!= col("sma_10").isNull).count() == 0)
    }
  }

  test("rsi stays in [0,100] or null, on arbitrary walks") {
    randomWalks.foreach { walks =>
      val w = tickerWindow
      val df = walkDf(walks)
        .withColumn("yesterday_close", lag(col("close"), 1).over(w))
        .withColumn("g", avgGain(col("close"), col("yesterday_close"), 14, w))
        .withColumn("l", avgLoss(col("close"), col("yesterday_close"), 14, w))
        .withColumn("rsi", rsi(col("g"), col("l")))
      assert(df.filter(col("rsi").isNotNull && !(col("rsi") >= 0 && col("rsi") <= 100)).count() == 0)
    }
  }

  test("rsi edge ladder: flat series -> 50, strictly rising -> 100, strictly falling -> 0") {
    val w = tickerWindow
    def rsiOf(closes: Seq[Double]): Seq[Double] = {
      walkDf(Seq(closes))
        .withColumn("yesterday_close", lag(col("close"), 1).over(w))
        .withColumn("rsi", rsi(
          avgGain(col("close"), col("yesterday_close"), 14, w),
          avgLoss(col("close"), col("yesterday_close"), 14, w)))
        .orderBy("trade_date").select("rsi").collect()
        .flatMap(r => Option(r.get(0)).map(_.asInstanceOf[Double])).toSeq
    }
    assert(rsiOf(Seq.fill(20)(5.0)).forall(_ == 50.0))
    assert(rsiOf((1 to 20).map(_ * 1.0)).forall(_ == 100.0))
    assert(rsiOf((1 to 20).reverse.map(_ * 1.0)).forall(_ == 0.0))
  }

  test("golden and death cross are mutually exclusive") {
    randomWalks.foreach { walks =>
      val w = tickerWindow
      val df = walkDf(walks)
        .withColumn("sma_5", sma(col("close"), 5, w))
        .withColumn("sma_10", sma(col("close"), 10, w))
        .withColumn("gc", crossover(col("sma_5"), col("sma_10"), w))
        .withColumn("dc", crossunder(col("sma_5"), col("sma_10"), w))
      assert(df.filter(col("gc") === 1 && col("dc") === 1).count() == 0)
    }
  }

  test("lookbackReturn matches direct computation and div-by-zero guards") {
    val closes = Seq(4.0, 8.0, 2.0, 0.0, 6.0, 3.0, 12.0)
    val rows = walkDf(Seq(closes))
      .withColumn("r2", lookbackReturn(col("close"), 2, tickerWindow))
      .orderBy("trade_date").collect()
    // row index 2 (close=2, lag2=4): (2-4)/4 = -0.5
    assert(rows(2).getAs[Double]("r2") == -0.5)
    // row index 5 (close=3, lag2=0): guarded null
    assert(rows(5).isNullAt(rows(5).fieldIndex("r2")))
  }
}

package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Declarative data-quality harness: each test is a violation query — a
  * `DataFrame => DataFrame` returning the rows that BREAK the invariant
  * (empty result = pass), exactly how dbt compiles schema/singular tests
  * (reference `dbt/stock_analytics/models/&#47;_schema.yml` files and
  * `dbt/stock_analytics/tests/` SQL; executed as the final DAG task,
  * `airflow/dags/daily_stock_pipeline_dag.py:48-55`).
  *
  * Generic builders mirror dbt's `not_null` / `unique` /
  * `accepted_range`; the singular invariants from
  * `dbt/stock_analytics/tests/` are ported one-for-one below. Range bounds
  * that the reference data satisfies by construction but synthetic fixtures
  * need not (volume strictly positive, high_low_index exclusive bounds,
  * dim row-count 2000–3000) are parameterized; defaults keep the
  * reference's values.
  */
object DataQuality {

  final case class DataTest(name: String, violations: DataFrame => DataFrame)

  // ---- generic builders (dbt schema tests) ----

  def notNull(cols: String*): DataFrame => DataFrame =
    df => df.filter(cols.map(col(_).isNull).reduce(_ || _))

  def uniqueKey(cols: String*): DataFrame => DataFrame =
    df => df.groupBy(cols.map(col): _*).count().filter(col("count") > 1)

  /** Violations of `lo <= c <= hi` (NULLs pass, as in dbt accepted_range). */
  def acceptedRange(c: String, lo: Double, hi: Double): DataFrame => DataFrame =
    df => df.filter(col(c).isNotNull && !(col(c) >= lo && col(c) <= hi))

  def minValue(c: String, lo: Double): DataFrame => DataFrame =
    df => df.filter(col(c).isNotNull && col(c) < lo)

  /** Run a battery as ONE query: (test_name, n_violations) per test — the
    * dbt-test-results table equivalent, lazily unioned so Spark runs all
    * violation counts in a single job over the (persisted) input.
    */
  def report(df: DataFrame, tests: Seq[DataTest]): DataFrame = {
    import org.apache.spark.sql.types._
    val counts = tests.map(t =>
      t.violations(df)
        .agg(count(lit(1)).as("n_violations"))
        .select(lit(t.name).as("test_name"), col("n_violations")))
    counts.reduceOption(_ unionByName _).getOrElse(
      df.sparkSession.createDataFrame(
        df.sparkSession.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(StructField("test_name", StringType, nullable = false),
          StructField("n_violations", LongType, nullable = false)))))
  }

  // ---- staging (`models/staging/_schema.yml:12-18`) ----

  val stagingTests: Seq[DataTest] = Seq(
    DataTest("stg_not_null_keys", notNull("ticker", "trade_date")),
    DataTest("stg_flags_are_01", df =>
      df.filter(!col("has_volume").isin(0, 1) || !col("is_valid_record").isin(0, 1))),
    DataTest("stg_has_volume_consistent", df =>
      df.filter((col("has_volume") === 1 && col("volume") <= 0) ||
        (col("has_volume") === 0 && col("volume") > 0))))

  // ---- intermediate (`models/intermediate/_schema.yml`) ----

  def intTests(weightHi: Double = 10d): Seq[DataTest] = Seq(
    DataTest("int_unique_ticker_date", uniqueKey("ticker", "trade_date")),
    DataTest("int_not_null_keys", notNull("ticker", "trade_date", "close")),
    DataTest("int_index_weight_range", acceptedRange("index_weight", 0d, weightHi)),
    DataTest("int_consecutive_days_positive",
      minValue("consecutive_trading_days", 1d)))

  // ---- fct (`models/marts/_schema.yml:36-143`, `tests/fct_*.sql`) ----

  val fctTests: Seq[DataTest] = Seq(
    DataTest("fct_unique_ticker_date", uniqueKey("ticker", "trade_date")),
    DataTest("fct_not_null_keys", notNull("ticker", "trade_date", "close")),
    // tests/fct_trading_momentum__rsi_range_or_null.sql:2-7
    DataTest("fct_rsi_range_or_null", acceptedRange("rsi", 0d, 100d)),
    // marts/_schema.yml:100-104 (rel_vol strictly positive when present)
    DataTest("fct_rel_vol_positive", df =>
      df.filter(col("rel_vol").isNotNull && col("rel_vol") <= 0d)),
    // marts/_schema.yml:106-120
    DataTest("fct_avg_gain_nonneg", minValue("avg_gain_14", 0d)),
    DataTest("fct_avg_loss_min", minValue("avg_loss_14", -1e-8)),
    // tests/fct_trading_momentum__close_within_52week_high_low.sql:2-7
    DataTest("fct_close_within_52week", df =>
      df.filter((col("high_52week").isNotNull && col("close") > col("high_52week")) ||
        (col("low_52week").isNotNull && col("close") < col("low_52week")))),
    // tests/fct_trading_momentum__golden_death_cross_exclusive.sql:2-7
    DataTest("fct_golden_death_exclusive", df =>
      df.filter(col("golden_cross") === 1 && col("death_cross") === 1)),
    // tests/fct_trading_momentum__sma_logic.sql:2-8 (population monotonicity)
    DataTest("fct_sma_monotonic", df =>
      df.filter((col("sma_200").isNotNull && (col("sma_50").isNull || col("sma_20").isNull)) ||
        (col("sma_50").isNotNull && col("sma_20").isNull))),
    // tests/fct_trading_momentum__yesterday_close_equal_prev_date_close.sql:2-17
    DataTest("fct_yesterday_close_is_lag", df => {
      val w = Window.partitionBy("ticker").orderBy("trade_date")
      df.withColumn("recomputed_lag", lag(col("close"), 1).over(w))
        .filter(col("yesterday_close").isNotNull && col("recomputed_lag").isNotNull &&
          col("yesterday_close") =!= col("recomputed_lag"))
    }))

  // ---- breadth (`marts/_schema.yml:186-222`, `tests/agg_*.sql`) ----

  /** @param highLowInclusive synthetic early-history fixtures legitimately
    *   touch 0/1 exactly; the reference's exclusive bounds hold only on its
    *   organic data.
    */
  def breadthTests(highLowInclusive: Boolean = false): Seq[DataTest] = Seq(
    // tests/agg_daily_market_breadth__adv_decline_unchanged_equal_all_stocks.sql:2-7
    DataTest("breadth_components_sum", df =>
      df.filter(col("advances") + col("declines") + col("unchanged_stocks")
        =!= col("stocks_traded"))),
    DataTest("breadth_market_rsi_range", acceptedRange("market_rsi", 0d, 100d)),
    DataTest("breadth_ad_percentage_range", acceptedRange("ad_percentage", -1d, 1d)),
    DataTest("breadth_high_low_index_range", df =>
      if (highLowInclusive)
        df.filter(col("high_low_index").isNotNull &&
          !(col("high_low_index") >= 0d && col("high_low_index") <= 1d))
      else
        df.filter(col("high_low_index").isNotNull &&
          !(col("high_low_index") > 0d && col("high_low_index") < 1d))))

  /** tests/agg_daily_market_breadth__record_high_pct_reasonable.sql:2-7 —
    * plausibility bound on mature dates only (a young market where every
    * close is its own 52-week high trips it vacuously).
    */
  def recordHighPctReasonable(matureAfter: Column, threshold: Double = 0.3): DataFrame => DataFrame =
    df => df.filter(col("trade_date") >= matureAfter &&
      col("record_high_pct").isNotNull && col("record_high_pct") > threshold)

  // ---- dim (`marts/_schema.yml:277-296`) ----

  def dimTests(rowLo: Long = 2000L, rowHi: Long = 3000L): Seq[DataTest] = Seq(
    DataTest("dim_unique_ticker", uniqueKey("ticker")),
    DataTest("dim_not_null_ticker", notNull("ticker")),
    DataTest("dim_performance_percentile_range",
      acceptedRange("performance_percentile", 0d, 1d)),
    DataTest("dim_row_count_bounds", df => {
      val n = df.count()
      if (n >= rowLo && n <= rowHi) df.limit(0)
      else df.select(lit(n).as("row_count")).limit(1)
    }))

  // ---- cross-table + freshness singular tests ----

  /** expect_table_row_count_to_equal_other_table (marts/_schema.yml:141-143). */
  def rowCountParity(a: DataFrame, b: DataFrame): Long =
    math.abs(a.count() - b.count())

  /** tests/…__table_freshness.sql — newest row within `maxLagDays` of asOf. */
  def freshnessViolations(df: DataFrame, asOf: Column, maxLagDays: Int = 4): DataFrame =
    df.agg(max(col("trade_date")).as("newest"))
      .filter(col("newest").isNull || col("newest") < date_sub(asOf, maxLagDays))

  /** Run a battery, returning (name, violationCount) — all zeros = pass. */
  def run(df: DataFrame, tests: Seq[DataTest]): Seq[(String, Long)] =
    tests.map(t => t.name -> t.violations(df).count())
}

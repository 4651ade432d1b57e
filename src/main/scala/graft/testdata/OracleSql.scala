package graft.testdata

/** DuckDB-runnable ANSI SQL mirroring [[TestFixtures]] and the stock models,
  * composed as named CTE fragments. The driver executes these against views
  * named after the testdata parquet tables (TESTDATA.md) and hash-compares
  * with the Spark results, so every fragment must be semantically identical
  * to the Spark derivation — including null propagation, integer-division
  * promotion, and min-periods gating.
  *
  * Integer sums are CAST to BIGINT (DuckDB promotes SUM(int) to HUGEINT,
  * Spark to LongType); window helpers are generated from the same period
  * parameters the Scala combinators use (reference
  * `macros/calculate_sma.sql`, `macros/calculate_return.sql`).
  */
object OracleSql {

  val TICKER_WINDOW = "PARTITION BY ticker ORDER BY trade_date"

  private def frame(n: Int) =
    s"OVER ($TICKER_WINDOW ROWS BETWEEN ${n - 1} PRECEDING AND CURRENT ROW)"

  /** min-periods gated rolling aggregate (reference calculate_sma macro). */
  def rollingSql(agg: String, gate: String, n: Int): String =
    s"CASE WHEN COUNT($gate) ${frame(n)} >= $n THEN $agg ${frame(n)} ELSE NULL END"

  def smaSql(n: Int): String = rollingSql("AVG(close)", "close", n)

  def lookbackReturnSql(n: Int): String =
    s"""CASE WHEN COUNT(close) ${frame(n)} >= $n THEN
       |  CASE WHEN LAG(close, $n) OVER ($TICKER_WINDOW) != 0
       |    THEN (close - LAG(close, $n) OVER ($TICKER_WINDOW)) / LAG(close, $n) OVER ($TICKER_WINDOW)
       |    ELSE NULL END
       |ELSE NULL END""".stripMargin

  val BARS =
    """bars AS (
      |  SELECT 'S' || lpad(CAST(l_suppkey % 25 AS VARCHAR), 2, '0') AS ticker,
      |         CAST(l_shipdate AS DATE) AS trade_date,
      |         floor(MIN(l_extendedprice) * 4) / 4 AS open,
      |         floor(MAX(l_extendedprice) * 4) / 4 AS close,
      |         floor(MAX(l_extendedprice * (1 + l_tax)) * 4) / 4 AS high,
      |         floor(MIN(l_extendedprice * (1 - l_discount)) * 4) / 4 AS low,
      |         CAST(SUM(l_quantity) AS BIGINT) AS volume,
      |         CAST(COUNT(*) AS BIGINT) AS num_transactions
      |  FROM lineitem
      |  GROUP BY 1, 2
      |)""".stripMargin

  val STAGED =
    """staged AS (
      |  SELECT ticker, volume, (high + low + close) / 3 AS volume_weighted_avg,
      |         open, close, high, low, num_transactions, trade_date,
      |         TIMESTAMP '2026-01-01 00:00:00' AS ingested_at,
      |         CASE WHEN volume > 0 THEN 1 ELSE 0 END AS has_volume,
      |         CASE WHEN open > 0 AND close > 0 AND high > 0 AND low > 0
      |                   AND close <= high AND close >= low AND low <= high
      |              THEN 1 ELSE 0 END AS is_valid_record
      |  FROM bars
      |)""".stripMargin

  val CONSTITUENTS =
    """constituents AS (
      |  SELECT 'S' || lpad(CAST(n_nationkey AS VARCHAR), 2, '0') AS ticker,
      |         n_name AS company, r_name AS sector,
      |         CAST((n_nationkey + 1) * 1000 AS DOUBLE) AS market_value,
      |         CAST(n_nationkey AS DOUBLE) / 10.0 AS market_weight,
      |         DATE '1992-01-01' AS valid_from, DATE '1997-12-31' AS valid_to
      |  FROM nation JOIN region ON n_regionkey = r_regionkey
      |  WHERE n_nationkey % 10 <> 3
      |  UNION ALL
      |  SELECT 'S' || lpad(CAST(n_nationkey AS VARCHAR), 2, '0') AS ticker,
      |         n_name AS company, r_name AS sector,
      |         CAST((n_nationkey + 1) * 1000 AS DOUBLE) AS market_value,
      |         CAST(n_nationkey AS DOUBLE) / 10.0 AS market_weight,
      |         DATE '1998-01-01' AS valid_from, DATE '2999-12-31' AS valid_to
      |  FROM nation JOIN region ON n_regionkey = r_regionkey
      |  WHERE n_nationkey % 10 <> 7
      |)""".stripMargin

  val INT_DAILY =
    s"""int_daily AS (
       |  SELECT j.*,
       |    CAST(ROW_NUMBER() OVER ($TICKER_WINDOW) AS BIGINT) AS consecutive_trading_days,
       |    LAG(close) OVER ($TICKER_WINDOW) AS yesterday_close,
       |    CASE WHEN LAG(ticker) OVER ($TICKER_WINDOW) IS NULL THEN 1 ELSE 0 END AS is_new_to_index
       |  FROM (
       |    SELECT f.ticker, f.trade_date, f.volume, f.volume_weighted_avg,
       |           f.open, f.close, f.high, f.low, f.num_transactions,
       |           f.ingested_at, f.has_volume, f.is_valid_record,
       |           r.sector, r.company, r.market_weight AS index_weight
       |    FROM (SELECT DISTINCT * FROM staged) f
       |    JOIN constituents r
       |      ON f.ticker = r.ticker
       |     AND f.trade_date BETWEEN r.valid_from AND r.valid_to
       |  ) j
       |)""".stripMargin

  private val avgGainSql = rollingSql(
    "SUM(CASE WHEN close > yesterday_close THEN close - yesterday_close ELSE 0 END)",
    "close", 14) + " / 14"
  private val avgLossSql = rollingSql(
    "SUM(CASE WHEN close < yesterday_close THEN yesterday_close - close ELSE 0 END)",
    "close", 14) + " / 14"

  val FCT =
    s"""fct AS (
       |  SELECT *,
       |    CASE WHEN close > sma_20
       |          AND LAG(close) OVER ($TICKER_WINDOW) <= LAG(sma_20) OVER ($TICKER_WINDOW)
       |         THEN 1 ELSE 0 END AS bullish_crossover,
       |    CASE WHEN sma_50 > sma_200
       |          AND LAG(sma_50) OVER ($TICKER_WINDOW) <= LAG(sma_200) OVER ($TICKER_WINDOW)
       |         THEN 1 ELSE 0 END AS golden_cross,
       |    CASE WHEN sma_50 < sma_200
       |          AND LAG(sma_50) OVER ($TICKER_WINDOW) >= LAG(sma_200) OVER ($TICKER_WINDOW)
       |         THEN 1 ELSE 0 END AS death_cross,
       |    CASE WHEN COUNT(volume) ${frame(20)} >= 20
       |         THEN volume / (AVG(volume) ${frame(20)}) ELSE NULL END AS rel_vol,
       |    CASE WHEN avg_gain_14 IS NULL OR avg_loss_14 IS NULL THEN NULL
       |         WHEN GREATEST(avg_gain_14, 0) = 0 AND GREATEST(avg_loss_14, 0) = 0 THEN 50
       |         WHEN GREATEST(avg_loss_14, 0) = 0 THEN 100
       |         WHEN GREATEST(avg_gain_14, 0) = 0 THEN 0
       |         ELSE 100 - (100 / (1 + (GREATEST(avg_gain_14, 0) / GREATEST(avg_loss_14, 0))))
       |    END AS rsi
       |  FROM (
       |    SELECT ticker, volume, open, close, yesterday_close, high, low,
       |           trade_date, sector, company, index_weight, is_new_to_index,
       |           is_valid_record,
       |           ${smaSql(20)} AS sma_20,
       |           ${smaSql(50)} AS sma_50,
       |           ${smaSql(200)} AS sma_200,
       |           ${rollingSql("MAX(close)", "close", 252)} AS high_52week,
       |           ${rollingSql("MIN(close)", "close", 252)} AS low_52week,
       |           $avgGainSql AS avg_gain_14,
       |           $avgLossSql AS avg_loss_14
       |    FROM int_daily
       |  ) base
       |)""".stripMargin

  /** Raw Polygon-shaped frame at lineitem grain (TestFixtures.rawDaily).
    * `DATE` is spelled `DATE_` to dodge the reserved word.
    */
  val RAW_DAILY =
    """raw_daily AS (
      |  SELECT 'S' || lpad(CAST(l_suppkey % 25 AS VARCHAR), 2, '0') AS T,
      |         l_quantity - 1 AS V,
      |         l_extendedprice AS VW,
      |         l_discount AS O,
      |         l_extendedprice AS C,
      |         l_extendedprice * (1 + l_tax) AS H,
      |         l_extendedprice * (1 - l_discount) AS L,
      |         CAST(l_linenumber AS BIGINT) AS N,
      |         l_shipdate AS TS,
      |         CASE WHEN l_orderkey % 97 = 0 THEN NULL
      |              ELSE CAST(l_shipdate AS DATE) END AS DATE_,
      |         TIMESTAMP '2026-01-01 00:00:00' AS INGESTED_AT
      |  FROM lineitem
      |)""".stripMargin

  /** Breadth mart fragments (reference agg_daily_market_breadth.sql). */
  val BREADTH_BASE =
    """base_aggregates AS (
      |  SELECT trade_date,
      |    COUNT(DISTINCT ticker) AS stocks_traded,
      |    CAST(SUM(CASE WHEN close = yesterday_close OR yesterday_close IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS unchanged_stocks,
      |    CAST(SUM(CASE WHEN close > yesterday_close AND yesterday_close IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS advances,
      |    CAST(SUM(CASE WHEN close < yesterday_close AND yesterday_close IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS declines,
      |    CAST(SUM(CASE WHEN close > yesterday_close AND yesterday_close IS NOT NULL THEN volume ELSE 0 END) AS BIGINT) AS up_volume,
      |    CAST(SUM(CASE WHEN close < yesterday_close AND yesterday_close IS NOT NULL THEN volume ELSE 0 END) AS BIGINT) AS down_volume
      |  FROM int_daily GROUP BY trade_date
      |)""".stripMargin

  val BREADTH_HIGH_LOW =
    s"""high_low_aggs AS (
       |  SELECT trade_date,
       |    CAST(SUM(CASE WHEN close = high_52week THEN 1 ELSE 0 END) AS BIGINT) AS new_highs,
       |    CAST(SUM(CASE WHEN close = low_52week THEN 1 ELSE 0 END) AS BIGINT) AS new_lows
       |  FROM (
       |    SELECT trade_date, close,
       |           ${rollingSql("MAX(close)", "close", 252)} AS high_52week,
       |           ${rollingSql("MIN(close)", "close", 252)} AS low_52week
       |    FROM int_daily
       |  ) GROUP BY trade_date
       |)""".stripMargin

  val BREADTH_SMA =
    """sma_aggs AS (
      |  SELECT trade_date,
      |    CAST(SUM(CASE WHEN close > sma_20 THEN 1 ELSE 0 END) AS BIGINT) / COUNT(close) AS pct_market_over_sma20,
      |    CAST(SUM(CASE WHEN close > sma_50 THEN 1 ELSE 0 END) AS BIGINT) / COUNT(close) AS pct_market_over_sma50,
      |    CAST(SUM(CASE WHEN close > sma_200 THEN 1 ELSE 0 END) AS BIGINT) / COUNT(close) AS pct_market_over_sma200,
      |    AVG(rsi) AS market_rsi
      |  FROM fct GROUP BY trade_date
      |)""".stripMargin

  val BREADTH =
    """breadth AS (
      |  SELECT b.trade_date, b.stocks_traded, b.unchanged_stocks, b.advances,
      |    b.declines, b.up_volume, b.down_volume,
      |    s.pct_market_over_sma20, s.pct_market_over_sma50,
      |    s.pct_market_over_sma200, s.market_rsi,
      |    CAST(SUM(b.advances - b.declines) OVER (ORDER BY b.trade_date) AS BIGINT) AS ad_line,
      |    CASE WHEN (b.advances + b.declines + b.unchanged_stocks) > 0
      |         THEN (b.advances - b.declines) / (b.advances + b.declines + b.unchanged_stocks)
      |         ELSE NULL END AS ad_percentage,
      |    CASE WHEN b.declines IS NOT NULL AND b.declines != 0
      |         THEN b.advances / b.declines ELSE NULL END AS ad_ratio,
      |    CASE WHEN b.down_volume IS NOT NULL AND b.down_volume != 0
      |         THEN b.up_volume / b.down_volume ELSE NULL END AS up_down_volume_ratio,
      |    CASE WHEN s.market_rsi > 70 THEN 'overbought'
      |         WHEN s.market_rsi < 30 THEN 'oversold'
      |         ELSE 'normal' END AS market_momentum,
      |    h.new_highs, h.new_lows,
      |    CASE WHEN b.stocks_traded > 0 THEN h.new_highs / b.stocks_traded
      |         ELSE NULL END AS record_high_pct,
      |    AVG(CASE WHEN (h.new_highs + h.new_lows) > 0
      |             THEN h.new_highs / (h.new_highs + h.new_lows)
      |             ELSE NULL END)
      |      OVER (ORDER BY h.trade_date ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS high_low_index
      |  FROM base_aggregates b
      |  LEFT JOIN sma_aggs s ON s.trade_date = b.trade_date
      |  LEFT JOIN high_low_aggs h ON h.trade_date = b.trade_date
      |)""".stripMargin

  /** dim_securities_current fragments, mirroring
    * [[graft.models.DimSecuritiesCurrent]] branch by branch (reference
    * `models/marts/dim_securities_current.sql:1-232`).
    */
  val DIM_MAXD = "dim_maxd AS (SELECT MAX(trade_date) AS d FROM fct)"

  val DIM_LATEST =
    """dim_latest AS (
      |  SELECT ticker, company, sector,
      |         trade_date AS latest_trade_date,
      |         volume AS latest_volume,
      |         open AS latest_open,
      |         close AS latest_close,
      |         yesterday_close AS latest_prev_close,
      |         high AS latest_high,
      |         low AS latest_low,
      |         sma_20 AS latest_sma20,
      |         sma_50 AS latest_sma50,
      |         sma_200 AS latest_sma200,
      |         rsi AS latest_rsi,
      |         rel_vol AS latest_rel_vol,
      |         high_52week AS latest_52week_high,
      |         low_52week AS latest_52week_low,
      |         close - yesterday_close AS price_change_1d,
      |         (close - yesterday_close) / NULLIF(yesterday_close, 0) AS return_1d
      |  FROM fct WHERE trade_date = (SELECT d FROM dim_maxd)
      |)""".stripMargin

  val DIM_RETURNS =
    s"""dim_returns AS (
       |  SELECT ticker, return_1w, return_1m, return_3m, return_ytd FROM (
       |    SELECT ticker,
       |      ${lookbackReturnSql(5)} AS return_1w,
       |      ${lookbackReturnSql(21)} AS return_1m,
       |      ${lookbackReturnSql(63)} AS return_3m,
       |      ${lookbackReturnSql(252)} AS return_ytd,
       |      ROW_NUMBER() OVER (PARTITION BY ticker ORDER BY trade_date DESC) AS rn
       |    FROM fct) WHERE rn = 1
       |)""".stripMargin

  val DIM_NUMBERED =
    """dim_numbered AS (
      |  SELECT ticker, sector, trade_date, close, yesterday_close, volume,
      |         ROW_NUMBER() OVER (PARTITION BY ticker ORDER BY trade_date DESC) AS days_back
      |  FROM fct WHERE trade_date >= (SELECT d - 33 FROM dim_maxd)
      |)""".stripMargin

  val DIM_SECTOR =
    s"""dim_sector AS (
       |  SELECT ticker, sector_return_1m, performance_percentile FROM (
       |    SELECT ticker,
       |      AVG(return_1m) OVER (PARTITION BY sector) AS sector_return_1m,
       |      CASE WHEN return_1m IS NOT NULL THEN
       |        PERCENT_RANK() OVER (
       |          PARTITION BY CASE WHEN return_1m IS NOT NULL THEN 1 ELSE 0 END
       |          ORDER BY return_1m)
       |      ELSE NULL END AS performance_percentile,
       |      ROW_NUMBER() OVER (PARTITION BY ticker ORDER BY trade_date DESC) AS rn
       |    FROM (SELECT *, ${lookbackReturnSql(21)} AS return_1m FROM dim_numbered)
       |  ) WHERE rn = 1
       |)""".stripMargin

  val DIM_VOL =
    """dim_vol AS (
      |  SELECT ticker,
      |    STDDEV_SAMP(LN(close / NULLIF(yesterday_close, 0))) * SQRT(252) AS vol_20d_raw,
      |    AVG(volume) AS avg_vol_20d_raw,
      |    CAST(COUNT(*) AS BIGINT) AS trading_days
      |  FROM dim_numbered WHERE days_back <= 20 GROUP BY ticker
      |)""".stripMargin

  val DIM_DAYS =
    """dim_days AS (
      |  SELECT ticker, CAST(COUNT(DISTINCT trade_date) AS BIGINT) AS total_trading_days
      |  FROM fct GROUP BY ticker
      |)""".stripMargin

  val DIM_FLAGS =
    """dim_flags AS (
      |  SELECT ticker,
      |    CASE WHEN latest_sma50 > latest_sma200 THEN 1 ELSE 0 END AS has_golden_cross_active,
      |    CASE WHEN latest_close > latest_sma20 THEN 1 ELSE 0 END AS over_sma20,
      |    CASE WHEN latest_close > latest_sma50 THEN 1 ELSE 0 END AS over_sma50,
      |    CASE WHEN latest_close > latest_sma200 THEN 1 ELSE 0 END AS over_sma200
      |  FROM dim_latest
      |)""".stripMargin

  val DIM_SIGNALS =
    """dim_signals AS (
      |  SELECT ticker,
      |    COALESCE(MAX(CASE WHEN golden_cross = 1 THEN trade_date END),
      |             MIN(CASE WHEN sma_200 IS NOT NULL THEN trade_date END)) AS last_golden_cross,
      |    COALESCE(MAX(CASE WHEN close > sma_50 AND (yesterday_close < sma_50 OR yesterday_close IS NULL) THEN trade_date END),
      |             MIN(CASE WHEN sma_50 IS NOT NULL AND close > sma_50 THEN trade_date END)) AS day_cross_over_sma50,
      |    COALESCE(MAX(CASE WHEN close < sma_50 AND (yesterday_close > sma_50 OR yesterday_close IS NULL) THEN trade_date END),
      |             MIN(CASE WHEN sma_50 IS NOT NULL AND close < sma_50 THEN trade_date END)) AS day_cross_below_sma50
      |  FROM fct WHERE trade_date >= (SELECT d - 365 FROM dim_maxd) GROUP BY ticker
      |)""".stripMargin

  val DIM =
    """dim AS (
      |  SELECT l.*, r.return_1w, r.return_1m, r.return_3m, r.return_ytd,
      |    d.total_trading_days,
      |    f.has_golden_cross_active, f.over_sma20, f.over_sma50, f.over_sma200,
      |    sm.sector_return_1m, sm.performance_percentile,
      |    CASE WHEN l.latest_52week_high IS NOT NULL
      |         THEN (l.latest_52week_high - l.latest_close) / l.latest_52week_high
      |    END AS pct_distance_from_52week_high,
      |    CASE WHEN l.latest_52week_low IS NOT NULL
      |         THEN (l.latest_close - l.latest_52week_low) / l.latest_52week_low
      |    END AS pct_distance_from_52week_low,
      |    CASE WHEN r.return_1m IS NOT NULL
      |         THEN r.return_1m - sm.sector_return_1m
      |    END AS outperformance_vs_sector,
      |    CASE WHEN v.trading_days >= 20 THEN v.vol_20d_raw END AS volatility_20d,
      |    CASE WHEN v.trading_days >= 20 THEN v.avg_vol_20d_raw END AS avg_volume_20d,
      |    CAST(date_diff('day', s.last_golden_cross, l.latest_trade_date) AS BIGINT) AS days_since_last_golden_cross,
      |    CASE WHEN f.over_sma50 = 1
      |         THEN CAST(date_diff('day', s.day_cross_over_sma50, l.latest_trade_date) AS BIGINT)
      |    END AS days_over_sma50,
      |    CASE WHEN f.over_sma50 = 0
      |         THEN CAST(date_diff('day', s.day_cross_below_sma50, l.latest_trade_date) AS BIGINT)
      |    END AS days_under_sma50
      |  FROM dim_latest l
      |  LEFT JOIN dim_returns r ON r.ticker = l.ticker
      |  LEFT JOIN dim_days d ON d.ticker = l.ticker
      |  LEFT JOIN dim_vol v ON v.ticker = l.ticker
      |  LEFT JOIN dim_flags f ON f.ticker = l.ticker
      |  LEFT JOIN dim_signals s ON s.ticker = l.ticker
      |  LEFT JOIN dim_sector sm ON sm.ticker = l.ticker
      |)""".stripMargin

  /** Composes `WITH <ctes> <select>`. */
  def query(ctes: Seq[String], select: String): String =
    "WITH " + ctes.mkString(",\n") + "\n" + select

  val stockChain: Seq[String] = Seq(BARS, STAGED, CONSTITUENTS, INT_DAILY, FCT)
  val breadthChain: Seq[String] =
    Seq(BREADTH_BASE, BREADTH_HIGH_LOW, BREADTH_SMA, BREADTH)
  val dimChain: Seq[String] = Seq(DIM_MAXD, DIM_LATEST, DIM_RETURNS,
    DIM_NUMBERED, DIM_SECTOR, DIM_VOL, DIM_DAYS, DIM_FLAGS, DIM_SIGNALS, DIM)
}

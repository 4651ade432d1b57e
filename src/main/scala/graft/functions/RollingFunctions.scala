package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** Rolling-window Column combinators.
  *
  * These are the Spark-native equivalents of the reference's dbt macros and
  * inlined window CASE blocks (reference: `macros/calculate_sma.sql:2-16`,
  * `macros/calculate_return.sql:2-18`,
  * `models/marts/fct_trading_momentum.sql:26-201`). The reference's
  * "min-periods" idiom — `CASE WHEN COUNT(x) OVER frame >= n THEN agg OVER
  * frame ELSE NULL END` — is factored once into [[rollingMinPeriods]].
  *
  * All combinators return plain `Column`s built from
  * `org.apache.spark.sql.functions`, so they stay inside whole-stage codegen
  * and a single window exchange: every rolling column over the same
  * (partitionBy, orderBy) spec is evaluated by one shuffle + sort (Catalyst
  * collapses adjacent Window operators with identical specs).
  */
object RollingFunctions {

  /** Canonical per-security window: partition by ticker, order by trade_date.
    * One Exchange(hashpartitioning(ticker)) + Sort serves every indicator.
    */
  def tickerWindow: WindowSpec =
    Window.partitionBy("ticker").orderBy("trade_date")

  /** `agg` over the trailing `n`-row frame, NULL until `n` non-null `gate`
    * values exist in the frame (reference `macros/calculate_sma.sql:2-16`).
    *
    * @param agg  un-windowed aggregate column, e.g. `avg($"close")`
    * @param gate column whose non-null count gates the result
    */
  def rollingMinPeriods(agg: Column, gate: Column, n: Int, w: WindowSpec): Column = {
    val frame = w.rowsBetween(-(n - 1), 0)
    when(count(gate).over(frame) >= n, agg.over(frame))
  }

  /** Simple moving average with min-periods gate (reference W1). */
  def sma(close: Column, n: Int, w: WindowSpec): Column =
    rollingMinPeriods(avg(close), close, n, w)

  /** Rolling max with min-periods gate (reference W2, 52-week high). */
  def rollingMax(c: Column, n: Int, w: WindowSpec): Column =
    rollingMinPeriods(max(c), c, n, w)

  /** Rolling min with min-periods gate (reference W2, 52-week low). */
  def rollingMin(c: Column, n: Int, w: WindowSpec): Column =
    rollingMinPeriods(min(c), c, n, w)

  /** Volume relative to its n-row rolling average (reference W4,
    * `fct_trading_momentum.sql:171-186`).
    */
  def relVol(volume: Column, n: Int, w: WindowSpec): Column = {
    val frame = w.rowsBetween(-(n - 1), 0)
    when(count(volume).over(frame) >= n, volume / avg(volume).over(frame))
  }

  /** Rolling average daily gain, Cutler's-RSI style: divides by the constant
    * period `n`, not Wilder smoothing (reference W3,
    * `fct_trading_momentum.sql:99-138`).
    */
  def avgGain(close: Column, yesterdayClose: Column, n: Int, w: WindowSpec): Column =
    rollingMinPeriods(
      sum(when(close > yesterdayClose, close - yesterdayClose).otherwise(lit(0d))),
      close, n, w) / n

  /** Rolling average daily loss; symmetric to [[avgGain]]. */
  def avgLoss(close: Column, yesterdayClose: Column, n: Int, w: WindowSpec): Column =
    rollingMinPeriods(
      sum(when(close < yesterdayClose, yesterdayClose - close).otherwise(lit(0d))),
      close, n, w) / n

  /** RSI from pre-computed avg gain/loss components, replicating the
    * reference's edge-case ladder exactly (`fct_trading_momentum.sql:188-201`):
    * NULL components -> NULL; both zero -> 50; no losses -> 100; no gains -> 0.
    */
  def rsi(avgGain14: Column, avgLoss14: Column): Column = {
    val g = greatest(avgGain14, lit(0d))
    val l = greatest(avgLoss14, lit(0d))
    when(avgGain14.isNull || avgLoss14.isNull, lit(null))
      .when(g === 0d && l === 0d, lit(50d))
      .when(l === 0d, lit(100d))
      .when(g === 0d, lit(0d))
      .otherwise(lit(100d) - lit(100d) / (lit(1d) + g / l))
  }

  /** 0/1 flag: `a` crosses above `b` today (`a > b` now, `lag(a) <= lag(b)`
    * yesterday). NULL lags make the predicate NULL -> flag 0, matching the
    * reference CASE semantics (`fct_trading_momentum.sql:147-169`).
    */
  def crossover(a: Column, b: Column, w: WindowSpec): Column =
    when(a > b && lag(a, 1).over(w) <= lag(b, 1).over(w), 1).otherwise(0)

  /** 0/1 flag: `a` crosses below `b` today (inverse of [[crossover]]). */
  def crossunder(a: Column, b: Column, w: WindowSpec): Column =
    when(a < b && lag(a, 1).over(w) >= lag(b, 1).over(w), 1).otherwise(0)

  /** N-period lookback return `(close - lag(close, n)) / lag(close, n)`,
    * gated by the same min-periods count and guarded against division by zero
    * (reference W11, `macros/calculate_return.sql:2-18`). Note the reference
    * gates on `n` rows but lags by `n` (which needs `n+1`), so the first
    * qualifying row still yields NULL — replicated as-is.
    */
  def lookbackReturn(close: Column, n: Int, w: WindowSpec): Column = {
    val frame = w.rowsBetween(-(n - 1), 0)
    val lagN = lag(close, n).over(w)
    when(count(close).over(frame) >= n,
      when(lagN =!= 0d, (close - lagN) / lagN))
  }
}

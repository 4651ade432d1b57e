package graft.ingest

import java.time.LocalDate

/** One grouped-daily bar as returned by the upstream API (Polygon
  * grouped-daily envelope field names, reference `src/extraction.py:11-44`,
  * renamed downstream by [[RawLoader]] per `src/load.py:50-60`).
  *
  * All numeric fields are Options: the reference's `pd.DataFrame(results)`
  * turns ANY missing key into NaN that loads as SQL NULL, so None here
  * flows to NULL in the raw store. (A NaN sentinel instead would both
  * poison downstream aggregates and crash staging's `CAST(V AS BIGINT)`
  * under ANSI mode.) Only the grain keys — ticker and the bar timestamp —
  * are required.
  */
final case class ApiBar(
  ticker: String, // "T"
  volume: Option[Double], // "v"
  vwap: Option[Double], // "vw"
  open: Option[Double], // "o"
  close: Option[Double], // "c"
  high: Option[Double], // "h"
  low: Option[Double], // "l"
  numTransactions: Option[Long], // "n"
  epochMillis: Long) // "t"

/** Abstracts the market-data HTTP API so the pipeline is testable offline;
  * the reference binds directly to `requests` (`src/extraction.py`).
  */
trait MarketDataClient {
  /** All bars for one trading date (~10k tickers/day at reference scale). */
  def groupedDaily(date: LocalDate): Seq[ApiBar]
}

/** Transport-level outcome the retry policy dispatches on. */
sealed trait FetchResult
object FetchResult {
  final case class Ok(bars: Seq[ApiBar]) extends FetchResult
  final case class RateLimited(status: Int = 429) extends FetchResult
  final case class ServerError(status: Int) extends FetchResult
  final case class ClientError(status: Int) extends FetchResult
  final case class TimedOut(afterMillis: Long) extends FetchResult
}

/** The reference's retry envelope (`src/extraction.py:47-81`): 3 attempts;
  * 429 → sleep 60 s; 5xx/timeout → sleep 5 s; other 4xx aborts immediately.
  * `sleeper` is injected so tests run without wall-clock sleeps.
  */
class RetryingClient(
    transport: LocalDate => FetchResult,
    maxAttempts: Int = 3,
    rateLimitSleepMs: Long = 60000L,
    serverErrorSleepMs: Long = 5000L,
    sleeper: Long => Unit = Thread.sleep) extends MarketDataClient {

  import FetchResult._

  def groupedDaily(date: LocalDate): Seq[ApiBar] = {
    var attempt = 0
    while (true) {
      attempt += 1
      transport(date) match {
        case Ok(bars) => return bars
        case ClientError(s) =>
          throw new RuntimeException(s"non-retryable HTTP $s for $date")
        case r @ (RateLimited(_) | ServerError(_) | TimedOut(_)) =>
          if (attempt >= maxAttempts)
            throw new RuntimeException(s"fetch failed after $maxAttempts attempts: $r")
          sleeper(r match {
            case RateLimited(_) => rateLimitSleepMs
            case _ => serverErrorSleepMs
          })
      }
    }
    throw new IllegalStateException("unreachable")
  }
}

/** Deterministic offline stand-in: `nTickers` synthetic bars per date,
  * reproducible from (date, ticker-index) alone — the test double for the
  * live HTTP client in this zero-egress environment.
  */
class FixtureClient(nTickers: Int = 50) extends MarketDataClient {
  def groupedDaily(date: LocalDate): Seq[ApiBar] = {
    val epochDay = date.toEpochDay
    (0 until nTickers).map { i =>
      val seed = epochDay * 1000 + i
      val base = 25.0 + (seed % 97) * 0.25
      ApiBar(
        ticker = f"SYN$i%03d",
        volume = Some(1000.0 + (seed % 31) * 100.0),
        vwap = Some(base + 0.5),
        open = Some(base),
        close = Some(base + (seed % 5) * 0.25 - 0.5),
        high = Some(base + 1.5),
        low = Some(base - 1.5),
        numTransactions = Some(10 + (seed % 13)),
        epochMillis = epochDay * 86400000L)
    }
  }
}

package graft.ingest

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse, HttpTimeoutException}
import java.time.{Duration, LocalDate}

import org.apache.spark.sql.SparkSession

/** Live HTTP binding of the ingest seam — the reference's
  * `requests.get(url, params, timeout=10)` over the grouped-daily endpoint
  * (`src/extraction.py:21-29`), re-expressed on `java.net.http`:
  *
  * {{{
  *   GET {baseUrl}/v2/aggs/grouped/locale/us/market/stocks/{YYYY-MM-DD}
  *       ?adjusted=true&apiKey={apiKey}
  * }}}
  *
  * Status handling feeds [[RetryingClient]]'s policy (the reference's
  * `_make_request_with_retry`, `src/extraction.py:47-81`): 200 → decode via
  * [[JsonEnvelopeClient.decode]]; 429 → RateLimited (60 s sleep);
  * 5xx → ServerError (5 s); request timeout or connect failure → TimedOut
  * (5 s — the reference catches `RequestException` into the same 5 s
  * branch); any other status → ClientError (abort, no retry). A 200 whose
  * body is not a JSON object THROWS from the decode — the fetch fails, no
  * 'completed' checkpoint is written, and the date is re-fetched on the
  * next run (see [[EnvelopeDecoder.corruptEnvelopes]]).
  *
  * `baseUrl`/`apiKey` arrive as parameters; [[fromConfig]] wires them from
  * `POLYGON_API_KEY`/`API_BASE_URL` the way the reference's config loader
  * does (`src/config.py:16-26` — an injected lookup map standing in for
  * Airflow Variables / `.env`, with the process environment beneath it).
  */
object HttpMarketData {

  val RequestTimeoutMs = 10000L

  /** Config keys the reference reads (`src/config.py:25-26`). */
  val ApiKeyVar = "POLYGON_API_KEY"
  val BaseUrlVar = "API_BASE_URL"

  /** Default endpoint host — the reference's documented value
    * (`src/extraction.py:23`: "Even if API_BASE_URL is just
    * 'https://api.polygon.io'").
    */
  val DefaultBaseUrl = "https://api.polygon.io"

  /** Resolve `(baseUrl, apiKey)` with the reference's precedence
    * (`src/config.py:16-20`): the explicit config map first (its Airflow
    * `Variable.get`), then the process environment (its `.env` fallback).
    * The key is REQUIRED and fails loudly — the reference would send
    * `apiKey=None` and surface an opaque 401 instead; the base URL
    * defaults to the documented host.
    */
  def resolveConfig(config: Map[String, String],
      env: Map[String, String] = sys.env): (String, String) = {
    def get(k: String) = config.get(k).orElse(env.get(k)).filter(_.nonEmpty)
    val key = get(ApiKeyVar).getOrElse(throw new IllegalStateException(
      s"HttpMarketData: $ApiKeyVar is not set in config or environment"))
    (get(BaseUrlVar).getOrElse(DefaultBaseUrl), key)
  }

  /** The live client wired from config/environment — [[resolveConfig]]
    * feeding [[client]].
    */
  def fromConfig(spark: SparkSession,
      config: Map[String, String] = Map.empty,
      env: Map[String, String] = sys.env,
      timeoutMs: Long = RequestTimeoutMs,
      sleeper: Long => Unit = Thread.sleep): MarketDataClient = {
    val (baseUrl, apiKey) = resolveConfig(config, env)
    client(spark, baseUrl, apiKey, timeoutMs, sleeper)
  }

  /** The reference's URL construction (`src/extraction.py:24-29`), params
    * inlined into the query string. The key is percent-encoded — the
    * reference's `requests.get(params=...)` does this implicitly; a raw
    * interpolation would corrupt keys holding `+`/`&`/`=` into a silent
    * 401/403 (no retry: ClientError aborts).
    */
  def groupedDailyUri(baseUrl: String, date: LocalDate, apiKey: String): URI = {
    val key = java.net.URLEncoder.encode(apiKey, java.nio.charset.StandardCharsets.UTF_8)
    URI.create(s"${baseUrl.stripSuffix("/")}/v2/aggs/grouped/locale/us/market/stocks/$date" +
      s"?adjusted=true&apiKey=$key")
  }

  /** One GET per date, mapped to the [[FetchResult]] the retry policy
    * dispatches on. Exposed for tests that drive the transport directly.
    */
  def transport(spark: SparkSession, baseUrl: String, apiKey: String,
      timeoutMs: Long = RequestTimeoutMs): LocalDate => FetchResult = {
    val http = HttpClient.newHttpClient()
    date => {
      val req = HttpRequest.newBuilder(groupedDailyUri(baseUrl, date, apiKey))
        .timeout(Duration.ofMillis(timeoutMs))
        .GET().build()
      try {
        val resp = http.send(req, HttpResponse.BodyHandlers.ofString())
        resp.statusCode() match {
          case 200 => FetchResult.Ok(JsonEnvelopeClient.decode(spark, date, resp.body()))
          case 429 => FetchResult.RateLimited()
          case s if s >= 500 && s < 600 => FetchResult.ServerError(s)
          case s => FetchResult.ClientError(s)
        }
      } catch {
        case _: HttpTimeoutException => FetchResult.TimedOut(timeoutMs)
        case _: java.io.IOException => FetchResult.TimedOut(timeoutMs)
      }
    }
  }

  /** The fully-wired live client: HTTP transport behind the reference's
    * retry envelope. `sleeper` is injected so tests assert the 429/5xx
    * back-off without wall-clock sleeps.
    */
  def client(spark: SparkSession, baseUrl: String, apiKey: String,
      timeoutMs: Long = RequestTimeoutMs,
      sleeper: Long => Unit = Thread.sleep): MarketDataClient =
    new RetryingClient(transport(spark, baseUrl, apiKey, timeoutMs), sleeper = sleeper)
}

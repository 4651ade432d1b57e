package graft.ingest

import java.time.LocalDate

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema'd decode of the vendor's grouped-daily JSON envelope
  * (`{"status":…, "queryCount":N, "results":[{bar},…]}`) — the seam the
  * reference implements with `data["results"]` → `pd.DataFrame(results)`
  * (`src/extraction.py:30-44`), where a missing/empty `results` yields no
  * rows and absent per-bar keys become NaN→NULL.
  *
  * The bar object carries BOTH `T` (ticker) and `t` (timestamp). Spark's
  * default case-insensitive resolution refuses a struct holding both, so
  * `results` is parsed as `array<map<string,string>>` — JSON map KEYS stay
  * case-sensitive — and each field is cast out of its map entry. A missing
  * key reads as NULL, exactly the reference's NaN column; `explode` of a
  * NULL/empty array contributes no rows, exactly the reference's
  * `None` return for a resultless envelope.
  */
object EnvelopeDecoder {

  val envelopeSchema: StructType = StructType(Seq(
    StructField("status", StringType),
    StructField("request_id", StringType),
    StructField("queryCount", LongType),
    StructField("resultsCount", LongType),
    StructField("adjusted", BooleanType),
    StructField("results", ArrayType(MapType(StringType, StringType)))))

  val CorruptCol = "_corrupt_envelope"

  private val parseSchema: StructType =
    envelopeSchema.add(StructField(CorruptCol, StringType))

  /** THE parse — one `from_json` per envelope, shared by the bar decode and
    * the corruption check (parsing twice with different schemas, as earlier
    * revisions did, costs a second full parse of a ~10k-bar body and lets
    * the two readings drift). The parser's corrupt-record field rides along
    * inside `__env`. Non-`jsonCol` input columns (e.g. the fetch date) pass
    * through.
    */
  def parsedEnvelopes(envelopes: DataFrame, jsonCol: String = "envelope"): DataFrame = {
    val passthrough = envelopes.columns.filterNot(_ == jsonCol).map(col).toSeq
    envelopes.select(passthrough :+
      from_json(col(jsonCol), parseSchema,
        Map("columnNameOfCorruptRecord" -> CorruptCol)).as("__env"): _*)
  }

  /** One typed bar row per element of `results`, named per
    * [[graft.streaming.RawLanding.landingSchema]] (`t` → `t_ms` is that
    * schema's documented rename, done here at the decode boundary).
    */
  def barsFromParsed(parsed: DataFrame): DataFrame = {
    val passthrough = parsed.columns.filterNot(_ == "__env").map(col).toSeq
    parsed
      .select(passthrough :+ explode(col("__env.results")).as("__bar"): _*)
      .select(passthrough ++ Seq(
        element_at(col("__bar"), "T").as("T"),
        element_at(col("__bar"), "v").cast("double").as("v"),
        element_at(col("__bar"), "vw").cast("double").as("vw"),
        element_at(col("__bar"), "o").cast("double").as("o"),
        element_at(col("__bar"), "c").cast("double").as("c"),
        element_at(col("__bar"), "h").cast("double").as("h"),
        element_at(col("__bar"), "l").cast("double").as("l"),
        element_at(col("__bar"), "n").cast("long").as("n"),
        element_at(col("__bar"), "t").cast("long").as("t_ms")): _*)
  }

  def decodeBars(envelopes: DataFrame, jsonCol: String = "envelope"): DataFrame =
    barsFromParsed(parsedEnvelopes(envelopes, jsonCol))

  /** Rows of a [[parsedEnvelopes]] frame that are not parseable JSON objects
    * at all (truncated body, HTML error page): PERMISSIVE-mode `from_json`
    * silently yields an all-null struct for these, which [[barsFromParsed]]
    * would then decode to zero bars — indistinguishable from a legitimately
    * empty trading day. The reference's `response.json()` RAISES on such
    * bodies and the fetch is retried, so callers must check this relation
    * and fail the fetch rather than complete it empty.
    *
    * A row is corrupt only when the corrupt-record field is populated AND
    * every typed field is null — a syntactically valid envelope with one
    * unconvertible typed field (say a non-numeric `queryCount`) also
    * populates the corrupt-record field, but `response.json()` would accept
    * it and load the data, so it must decode, not throw. (Residual
    * strictness: a valid JSON object whose ONLY recognized fields are
    * unconvertible still reads as corrupt — such a body carries no usable
    * envelope fields at all.)
    */
  def corruptFromParsed(parsed: DataFrame): DataFrame = {
    val allTypedNull = envelopeSchema.fieldNames
      .map(f => col("__env").getField(f).isNull).reduce(_ && _)
    parsed.filter(col("__env").getField(CorruptCol).isNotNull && allTypedNull)
  }

  def corruptEnvelopes(envelopes: DataFrame, jsonCol: String = "envelope"): DataFrame =
    corruptFromParsed(parsedEnvelopes(envelopes, jsonCol))
}

/** [[MarketDataClient]] over a raw-JSON transport: the live-HTTP shape of
  * the ingest seam, with the envelope decode done by [[EnvelopeDecoder]]
  * instead of fixture-constructed [[ApiBar]]s. `transport` returns the
  * response body for one date (in tests, a canned envelope; in production,
  * the HTTP GET the reference builds in `src/extraction.py:21-29`).
  *
  * An unparseable body (truncated response, HTML error page) THROWS — the
  * reference's `response.json()` raises there, failing the fetch so it is
  * retried rather than checkpointed empty. A bar missing `T` or `t` is
  * malformed beyond use (no grain key) and is dropped; every other missing
  * field survives as None → SQL NULL, the reference's NaN-column behavior.
  */
class JsonEnvelopeClient(spark: SparkSession, transport: LocalDate => String)
    extends MarketDataClient {
  def groupedDaily(date: LocalDate): Seq[ApiBar] =
    JsonEnvelopeClient.decode(spark, date, transport(date))
}

object JsonEnvelopeClient {

  private def optD(r: Row, c: String): Option[Double] = {
    val i = r.fieldIndex(c)
    if (r.isNullAt(i)) None else Some(r.getDouble(i))
  }
  private def optL(r: Row, c: String): Option[Long] = {
    val i = r.fieldIndex(c)
    if (r.isNullAt(i)) None else Some(r.getLong(i))
  }

  /** Decode one grouped-daily response body into bars — the seam shared by
    * the injected-transport client above and the live [[HttpMarketData]]
    * client. Throws on an unparseable body (see class doc).
    */
  def decode(spark: SparkSession, date: LocalDate, body: String): Seq[ApiBar] = {
    import spark.implicits._
    // parse ONCE — in the plan (single from_json node) AND at runtime: the
    // corruption check and the bar collect are two actions, so without the
    // persist the second would re-parse the ~10k-bar body
    val parsed = EnvelopeDecoder.parsedEnvelopes(Seq(body).toDF("envelope")).persist()
    try {
      if (!EnvelopeDecoder.corruptFromParsed(parsed).isEmpty)
        throw new RuntimeException(
          s"unparseable grouped-daily envelope for $date (not a JSON object)")
      EnvelopeDecoder.barsFromParsed(parsed)
        .filter(col("T").isNotNull && col("t_ms").isNotNull)
        .collect().toSeq.map { r =>
          ApiBar(
            ticker = r.getAs[String]("T"),
            volume = optD(r, "v"),
            vwap = optD(r, "vw"),
            open = optD(r, "o"),
            close = optD(r, "c"),
            high = optD(r, "h"),
            low = optD(r, "l"),
            numTransactions = optL(r, "n"),
            epochMillis = r.getAs[Long]("t_ms"))
        }
    } finally parsed.unpersist(blocking = false)
  }
}

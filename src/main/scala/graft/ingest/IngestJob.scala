package graft.ingest

import java.time.{LocalDate, ZonedDateTime}
import java.util.UUID

import org.apache.spark.sql.SparkSession

/** The daily ingestion driver — reference `src/extract_load_stocks.py:20-80`:
  * resolve the last completed trading day, anti-join against the ledger's
  * completed dates, then per remaining date fetch → normalize → append,
  * bracketed by started/completed/failed checkpoint rows. (The reference's
  * 20 s inter-date politeness sleep is transport pacing, not engine
  * semantics — it lives in the client's sleeper if needed.)
  */
class IngestJob(
    spark: SparkSession,
    client: MarketDataClient,
    ledger: CheckpointLedger,
    rawPath: String) {

  final case class DateOutcome(date: LocalDate, status: String, rows: Long)

  /** Ingest every un-completed trading day in the `daysBack`-deep window
    * ending at the last completed trading day. Returns per-date outcomes.
    */
  def run(now: ZonedDateTime, daysBack: Int = 1): Seq[DateOutcome] = {
    val runId = UUID.randomUUID().toString
    val end = TradingCalendar.lastCompletedTradingDay(now)
    val start = end.minusDays(daysBack.toLong - 1)
    val wanted = TradingCalendar.tradingDays(start, end)
    val done = ledger.completedDates()
    wanted.filterNot(done).map { date =>
      // Reference bracketing (src/extract_load_stocks.py:73-74 +
      // src/load.py:25-32): fetch FIRST, then record 'started' with the
      // fetched ticker count, then load, then completed/failed. A failed
      // FETCH leaves no ledger row in the reference (the run aborts);
      // recording a 'failed' row instead and continuing with later dates is
      // our deliberate robustness divergence.
      try {
        val bars = client.groupedDaily(date)
        if (bars.isEmpty) {
          // reference `src/load.py:21-23`: a resultless fetch writes NO
          // checkpoint row at all — the date stays un-completed and is
          // re-fetched on the next run. Marking it completed here would
          // permanently swallow a day the vendor was late publishing.
          DateOutcome(date, "no_data", 0L)
        } else {
          ledger.markStarted(runId, date, bars.map(_.ticker).distinct.size.toLong)
          val n = RawLoader.append(RawLoader.normalize(spark, bars, date), rawPath)
          ledger.markCompleted(runId, date, n)
          DateOutcome(date, "completed", n)
        }
      } catch {
        case e: Exception =>
          ledger.markFailed(runId, date, e.getMessage)
          DateOutcome(date, "failed", 0L)
      }
    }
  }
}

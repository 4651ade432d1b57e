package graft.ingest

import java.time.{Duration, LocalTime, ZoneId, ZonedDateTime}

/** Recurring daily driver — the engine-side counterpart of the reference's
  * Airflow cron (`airflow/dags/daily_stock_pipeline_dag.py:8-13`:
  * `schedule="0 12 * * 1-5"`, America/New_York, `catchup=False`): fire at
  * 12:00 ET on weekdays, run the ingest job for that firing instant, sleep
  * until the next firing.
  *
  * The clock and the sleeper are injected, so the loop is deterministic under
  * test and a real deployment can swap in an external scheduler without
  * touching the job. Weekday-holiday firings are intentionally NOT skipped
  * here — the reference's cron fires on them too, and the run resolves to a
  * no-op downstream ([[TradingCalendar.lastCompletedTradingDay]] walks back
  * to the last trading day and the ledger's completed-set makes re-ingesting
  * it idempotent). `catchup=False` maps to "next fire is computed from NOW,
  * never from the last fire" — a loop that slept through N firings runs once,
  * not N times.
  */
object Scheduler {

  /** Cron `0 12 * * 1-5` in the DAG's own timezone. */
  val FireTime: LocalTime = LocalTime.NOON
  val Zone: ZoneId = ZoneId.of("America/New_York")

  private def isWeekday(d: java.time.LocalDate): Boolean = {
    val dow = d.getDayOfWeek.getValue
    dow >= 1 && dow <= 5
  }

  /** The first weekday-noon-ET instant strictly after `now` (any zone —
    * converted, not reinterpreted). Strictness matches cron: a loop that
    * wakes exactly at noon fires once, then targets the NEXT day.
    */
  def nextFire(now: ZonedDateTime): ZonedDateTime = {
    val local = now.withZoneSameInstant(Zone)
    val today = local.toLocalDate
    val candidates = Iterator.iterate(today)(_.plusDays(1))
      .filter(isWeekday)
      .map(d => d.atTime(FireTime).atZone(Zone))
    candidates.find(_.isAfter(now)).get
  }

  /** Run `ticks` firings of the cron loop: sleep until the next fire, then
    * invoke `job` with the firing instant (the job derives its own data date
    * from it, as [[IngestJob.run]] does). Returns each firing and its result,
    * so callers observe exactly what a DAG-run history would show.
    */
  def runLoop[A](clock: () => ZonedDateTime, sleep: Duration => Unit, ticks: Int)(
      job: ZonedDateTime => A): Seq[(ZonedDateTime, A)] =
    (1 to ticks).map { _ =>
      val fire = nextFire(clock())
      val wait = Duration.between(clock(), fire)
      if (!wait.isNegative && !wait.isZero) sleep(wait)
      (fire, job(fire))
    }
}

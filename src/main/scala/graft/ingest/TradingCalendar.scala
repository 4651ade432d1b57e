package graft.ingest

import java.time.{DayOfWeek, LocalDate, ZoneId, ZonedDateTime}

/** Deterministic NYSE trading calendar (public holiday rules), replacing the
  * reference's `pandas_market_calendars` dependency
  * (/root/reference/src/extract_load_stocks.py:13-18,40-47).
  *
  * Holidays: New Year's Day, MLK (3rd Mon Jan), Washington's Birthday
  * (3rd Mon Feb), Good Friday (Easter − 2, Gregorian computus), Memorial Day
  * (last Mon May), Juneteenth (from 2022), Independence Day, Labor Day
  * (1st Mon Sep), Thanksgiving (4th Thu Nov), Christmas. Saturday holidays
  * observe Friday, Sunday holidays observe Monday — except New Year's on a
  * Saturday, which NYSE does not observe at all.
  */
object TradingCalendar {

  val MarketZone: ZoneId = ZoneId.of("America/New_York")

  /** Anonymous Gregorian Easter computus (Meeus/Jones/Butcher). */
  def easterSunday(year: Int): LocalDate = {
    val a = year % 19
    val b = year / 100
    val c = year % 100
    val d = b / 4
    val e = b % 4
    val f = (b + 8) / 25
    val g = (b - f + 1) / 3
    val h = (19 * a + b - d - g + 15) % 30
    val i = c / 4
    val k = c % 4
    val l = (32 + 2 * e + 2 * i - h - k) % 7
    val m = (a + 11 * h + 22 * l) / 451
    val month = (h + l - 7 * m + 114) / 31
    val day = ((h + l - 7 * m + 114) % 31) + 1
    LocalDate.of(year, month, day)
  }

  private def nthWeekday(year: Int, month: Int, dow: DayOfWeek, n: Int): LocalDate = {
    val first = LocalDate.of(year, month, 1)
    val offset = (dow.getValue - first.getDayOfWeek.getValue + 7) % 7
    first.plusDays(offset + 7L * (n - 1))
  }

  private def lastWeekday(year: Int, month: Int, dow: DayOfWeek): LocalDate = {
    val last = LocalDate.of(year, month, 1).plusMonths(1).minusDays(1)
    val offset = (last.getDayOfWeek.getValue - dow.getValue + 7) % 7
    last.minusDays(offset)
  }

  /** Sat → Fri before, Sun → Mon after; `observeSaturday=false` drops
    * Saturday holidays entirely (NYSE New Year's rule).
    */
  private def observed(d: LocalDate, observeSaturday: Boolean = true): Option[LocalDate] =
    d.getDayOfWeek match {
      case DayOfWeek.SATURDAY => if (observeSaturday) Some(d.minusDays(1)) else None
      case DayOfWeek.SUNDAY => Some(d.plusDays(1))
      case _ => Some(d)
    }

  def holidays(year: Int): Set[LocalDate] = {
    val fixed = Seq(
      observed(LocalDate.of(year, 1, 1), observeSaturday = false),
      Some(nthWeekday(year, 1, DayOfWeek.MONDAY, 3)),
      Some(nthWeekday(year, 2, DayOfWeek.MONDAY, 3)),
      Some(easterSunday(year).minusDays(2)),
      Some(lastWeekday(year, 5, DayOfWeek.MONDAY)),
      if (year >= 2022) observed(LocalDate.of(year, 6, 19)) else None,
      observed(LocalDate.of(year, 7, 4)),
      Some(nthWeekday(year, 9, DayOfWeek.MONDAY, 1)),
      Some(nthWeekday(year, 11, DayOfWeek.THURSDAY, 4)),
      observed(LocalDate.of(year, 12, 25)))
    fixed.flatten.toSet
  }

  def isTradingDay(d: LocalDate): Boolean =
    d.getDayOfWeek != DayOfWeek.SATURDAY &&
      d.getDayOfWeek != DayOfWeek.SUNDAY &&
      !holidays(d.getYear).contains(d)

  /** Most recent trading day strictly before the market-local date of `now`
    * — "last completed" because today's bars only finalize after the close
    * (reference `src/extract_load_stocks.py:40-47`).
    */
  def lastCompletedTradingDay(now: ZonedDateTime): LocalDate = {
    var d = now.withZoneSameInstant(MarketZone).toLocalDate.minusDays(1)
    while (!isTradingDay(d)) d = d.minusDays(1)
    d
  }

  /** Trading days in [from, to], ascending. */
  def tradingDays(from: LocalDate, to: LocalDate): Seq[LocalDate] =
    Iterator.iterate(from)(_.plusDays(1)).takeWhile(!_.isAfter(to))
      .filter(isTradingDay).toSeq
}

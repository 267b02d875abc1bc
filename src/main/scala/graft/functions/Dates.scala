package graft.functions

import java.time.{DayOfWeek, LocalDate}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Date/calendar scalar functions.
  *
  * Reference: pd_utils/datetime_utils.py — SAS epoch dates (:18-35),
  * year/month extraction (:38-53), and the US trading-day calendar
  * (USTradingCalendar, :237-251) reimplemented as a pure-Scala holiday
  * generator (nth-weekday rules, nearest-workday observance, Easter
  * computus for Good Friday).
  */
object Dates {

  /** SAS day-count (epoch 1960-01-01, float with possible NaN) →
    * timestamp; nulls/NaN propagate as NULL
    * (pd_utils/datetime_utils.py:18-35).
    */
  def sasDateToTimestamp(c: Column): Column =
    when(c.isNull || isnan(c.cast("double")), lit(null))
      .otherwise(date_add(to_date(lit("1960-01-01")), c.cast("int")).cast("timestamp"))

  /** Adds Year/Month integer columns (pd_utils/datetime_utils.py:38-53). */
  def yearMonthFromDate(df: DataFrame, datevar: String = "Date"): DataFrame =
    df.withColumn("Year", year(col(datevar)))
      .withColumn("Month", month(col(datevar)))

  // ---------------------------------------------------------------
  // US trading calendar (NYSE-style, 9 rules as in the reference)
  // ---------------------------------------------------------------

  /** Saturday → Friday, Sunday → Monday (pandas nearest_workday). */
  def nearestWorkday(d: LocalDate): LocalDate = d.getDayOfWeek match {
    case DayOfWeek.SATURDAY => d.minusDays(1)
    case DayOfWeek.SUNDAY   => d.plusDays(1)
    case _                  => d
  }

  /** nth (1-based) given weekday of a month. */
  def nthWeekday(year: Int, month: Int, dow: DayOfWeek, n: Int): LocalDate = {
    val first = LocalDate.of(year, month, 1)
    val offset = (dow.getValue - first.getDayOfWeek.getValue + 7) % 7
    first.plusDays(offset + 7L * (n - 1))
  }

  /** last given weekday of a month. */
  def lastWeekday(year: Int, month: Int, dow: DayOfWeek): LocalDate = {
    val last = LocalDate.of(year, month, 1).plusMonths(1).minusDays(1)
    val offset = (last.getDayOfWeek.getValue - dow.getValue + 7) % 7
    last.minusDays(offset)
  }

  /** Gregorian Easter Sunday (anonymous/Meeus computus). */
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

  /** The nine holiday rules of USTradingCalendar
    * (pd_utils/datetime_utils.py:237-251).
    */
  def usTradingHolidays(year: Int): Seq[LocalDate] = Seq(
    nearestWorkday(LocalDate.of(year, 1, 1)),              // New Year's Day
    nthWeekday(year, 1, DayOfWeek.MONDAY, 3),              // MLK Day
    nthWeekday(year, 2, DayOfWeek.MONDAY, 3),              // Presidents Day
    easterSunday(year).minusDays(2),                       // Good Friday
    lastWeekday(year, 5, DayOfWeek.MONDAY),                // Memorial Day
    nearestWorkday(LocalDate.of(year, 7, 4)),              // Independence Day
    nthWeekday(year, 9, DayOfWeek.MONDAY, 1),              // Labor Day
    nthWeekday(year, 11, DayOfWeek.THURSDAY, 4),           // Thanksgiving
    nearestWorkday(LocalDate.of(year, 12, 25))             // Christmas
  )

  def usTradingHolidays(fromYear: Int, toYear: Int): Seq[LocalDate] =
    (fromYear to toYear).flatMap(usTradingHolidays)

  def isWeekend(d: LocalDate): Boolean =
    d.getDayOfWeek == DayOfWeek.SATURDAY || d.getDayOfWeek == DayOfWeek.SUNDAY

  /** All trading days in [from, to] inclusive. */
  def tradingDays(from: LocalDate, to: LocalDate): Seq[LocalDate] = {
    val hols = usTradingHolidays(from.getYear, to.getYear).toSet
    Iterator
      .iterate(from)(_.plusDays(1))
      .takeWhile(!_.isAfter(to))
      .filter(d => !isWeekend(d) && !hols.contains(d))
      .toSeq
  }

  /** Driver-side trading-day predicate (holiday set built per call —
    * use for calendar construction, not per-row loops).
    */
  def isTradingDayLocal(d: LocalDate): Boolean =
    !isWeekend(d) && !usTradingHolidays(d.getYear).contains(d)

  /** Every calendar day in [from, to] with (ordinal of the latest
    * trading day <= it; -1 before the first trading day) and whether
    * the day itself is a trading day. One holiday set drives both
    * fields (holidays observed across year boundaries — Jan 1 on a
    * Saturday observed Dec 31 — would otherwise classify
    * inconsistently). Turns date→trading-ordinal lookups into equi
    * joins against a small broadcast frame instead of range joins.
    */
  def calendarWithOrdinals(from: LocalDate, to: LocalDate): Seq[(LocalDate, Int, Boolean)] = {
    val hols = usTradingHolidays(from.getYear, to.getYear).toSet
    var ord = -1
    Iterator
      .iterate(from)(_.plusDays(1))
      .takeWhile(!_.isAfter(to))
      .map { d =>
        val isTd = !isWeekend(d) && !hols.contains(d)
        if (isTd) ord += 1
        (d, ord, isTd)
      }
      .toSeq
  }

  /** Column predicate: is this DATE column a trading day?
    * Weekday check is a codegen'd expression; the holiday set (9/year,
    * tiny) is an in-literal — effectively a broadcast lookup. The
    * membership test runs on the date's EPOCH-DAY INT (`unix_date` —
    * DateType's own storage), not an ISO-string cast: the string form
    * allocated and hashed a UTF8String per exploded row, which
    * dominated q_expand_months' one-stage profile (r20 opt; the
    * ISO-string ↔ epoch-day mapping is bijective, so the predicate is
    * value-identical).
    */
  def isTradingDay(d: Column, fromYear: Int = 1960, toYear: Int = 2040): Column = {
    val hols = usTradingHolidays(fromYear, toYear).map(_.toEpochDay.toInt)
    !dayofweek(d).isin(1, 7) && !unix_date(d.cast("date")).isInCollection(hols)
  }
}

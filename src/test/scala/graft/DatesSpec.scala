package graft

import java.time.LocalDate

import org.apache.spark.sql.functions._

import graft.functions.Dates

/** Goldens: /root/reference/tests/test_pandas.py:963-1025
  * (TestConvertSASDateToPandasDate) + the Jan-2000 trading calendar
  * pinned by TestExpandMonths (:572-703).
  */
class DatesSpec extends SparkSuite {

  test("SAS day counts convert (tests/test_pandas.py:984-1000)") {
    val s = spark; import s.implicits._
    val df = Seq(16114.0, 16482.0, 17178.0, 17197.0, 17212.0).toDF("datadate")
    val got = df.select(date_format(Dates.sasDateToTimestamp(col("datadate")), "yyyy-MM-dd"))
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("2004-02-13", "2005-02-15", "2007-01-12", "2007-01-31", "2007-02-15"))
  }

  test("SAS NaN propagates as null (tests/test_pandas.py:1002-1025)") {
    val s = spark; import s.implicits._
    val df = Seq(Option(16114.0), Option.empty[Double], Option(Double.NaN)).toDF("datadate")
    val got = df.select(Dates.sasDateToTimestamp(col("datadate")).as("d")).collect()
    assert(!got(0).isNullAt(0))
    assert(got(1).isNullAt(0))
    assert(got(2).isNullAt(0))
  }

  test("year_month_from_date (pd_utils/datetime_utils.py:38-53)") {
    val s = spark; import s.implicits._
    val df = Seq(ts("2000-01-15")).toDF("Date")
    val row = Dates.yearMonthFromDate(df, "Date").select("Year", "Month").head()
    assert(row.getInt(0) == 2000 && row.getInt(1) == 1)
  }

  test("US trading holidays 2000 (pinned by the expand_months golden + NYSE rules)") {
    val hols = Dates.usTradingHolidays(2000).map(_.toString)
    assert(hols.contains("2000-01-17")) // MLK (the golden's Jan gap)
    assert(hols.contains("2000-04-21")) // Good Friday (Easter = Apr 23)
    assert(hols.contains("2000-05-29")) // Memorial Day
    assert(hols.contains("2000-07-04"))
    assert(hols.contains("2000-09-04")) // Labor Day
    assert(hols.contains("2000-11-23")) // Thanksgiving
    assert(hols.contains("2000-12-25"))
  }

  test("nearest-workday observance shifts Saturday/Sunday holidays") {
    // July 4 2020 = Saturday -> observed Friday July 3
    assert(Dates.usTradingHolidays(2020).map(_.toString).contains("2020-07-03"))
    // Jan 1 2012 = Sunday -> observed Monday Jan 2
    assert(Dates.usTradingHolidays(2012).map(_.toString).contains("2012-01-02"))
  }

  test("easter computus matches known dates") {
    assert(Dates.easterSunday(2000) == LocalDate.of(2000, 4, 23))
    assert(Dates.easterSunday(2008) == LocalDate.of(2008, 3, 23))
    assert(Dates.easterSunday(2024) == LocalDate.of(2024, 3, 31))
  }

  test("calendarWithOrdinals: consistent ordinals incl cross-year observance") {
    val cal = Dates.calendarWithOrdinals(LocalDate.of(1999, 12, 20), LocalDate.of(2000, 1, 10))
    // a trading day's ordinal must strictly increase; non-trading days inherit
    val tds = cal.filter(_._3).map(_._2)
    assert(tds == (tds.head to tds.last))
    // no duplicate ordinals among trading days
    assert(tds.distinct.size == tds.size)
  }
}

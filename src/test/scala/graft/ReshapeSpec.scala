package graft

import org.apache.spark.sql.functions._

import graft.operators.Reshape

/** Goldens: /root/reference/tests/test_pandas.py:343-413
  * (TestLongToWide) and :572-901 (TestExpandMonths).
  */
class ReshapeSpec extends SparkSuite {

  private def expectWithColindex = {
    val s = spark; import s.implicits._
    Seq(
      (10516L, "a", 1.01, 1.02, 1.03, 1.04),
      (10516L, "b", 1.05, 1.06, 1.07, 1.08),
      (10517L, "a", 1.09, 1.10, 1.11, 1.12)
    ).toDF("PERMNO", "byvar", "RET1/1/2000", "RET1/2/2000", "RET1/3/2000", "RET1/4/2000")
  }

  private def expectNoColindex = {
    val s = spark; import s.implicits._
    Seq(
      (10516L, "a", "1/1/2000", 1.01, 1.02, 1.03, 1.04),
      (10516L, "a", "1/2/2000", 1.01, 1.02, 1.03, 1.04),
      (10516L, "a", "1/3/2000", 1.01, 1.02, 1.03, 1.04),
      (10516L, "a", "1/4/2000", 1.01, 1.02, 1.03, 1.04),
      (10516L, "b", "1/1/2000", 1.05, 1.06, 1.07, 1.08),
      (10516L, "b", "1/2/2000", 1.05, 1.06, 1.07, 1.08),
      (10516L, "b", "1/3/2000", 1.05, 1.06, 1.07, 1.08),
      (10516L, "b", "1/4/2000", 1.05, 1.06, 1.07, 1.08),
      (10517L, "a", "1/1/2000", 1.09, 1.10, 1.11, 1.12),
      (10517L, "a", "1/2/2000", 1.09, 1.10, 1.11, 1.12),
      (10517L, "a", "1/3/2000", 1.09, 1.10, 1.11, 1.12),
      (10517L, "a", "1/4/2000", 1.09, 1.10, 1.11, 1.12)
    ).toDF("PERMNO", "byvar", "Date", "RET0", "RET1", "RET2", "RET3")
  }

  test("long_to_wide with colindex (tests/test_pandas.py:345-361,395)") {
    val out = Reshape.longToWide(fixtureDf, Seq("PERMNO", "byvar"), Seq("RET"), Seq("Date"))
    assertSame(out, expectWithColindex)
  }

  test("long_to_wide drops duplicate rows first (tests/test_pandas.py:397-398)") {
    val out = Reshape.longToWide(fixtureDfDuplicateRow, Seq("PERMNO", "byvar"), Seq("RET"), Seq("Date"))
    assertSame(out, expectWithColindex)
  }

  test("long_to_wide cumcount colindex carries other columns per row (tests/test_pandas.py:363-393,400-404)") {
    val out = Reshape.longToWide(fixtureDf, Seq("PERMNO", "byvar"), Seq("RET"),
      colindex = Nil, orderCols = Seq("Date"))
    assertSame(out, expectNoColindex)
  }

  test("long_to_wide duplicate rows + cumcount colindex (tests/test_pandas.py:406-407)") {
    val out = Reshape.longToWide(fixtureDfDuplicateRow, Seq("PERMNO", "byvar"), Seq("RET"),
      colindex = Nil, orderCols = Seq("Date"))
    assertSame(out, expectNoColindex)
  }

  test("long_to_wide leaks no temp columns (tests/test_pandas.py:409-411)") {
    val out = Reshape.longToWide(fixtureDf, Seq("PERMNO", "byvar"), Seq("RET"), Seq("Date"))
    assert(!out.columns.exists(_.startsWith("__")))
  }

  test("multi-value rename keeps underscore value names (ADVICE r1: ret_1 bug)") {
    val s = spark; import s.implicits._
    val df = Seq((1L, 1, 2.0, 3.0), (1L, 2, 4.0, 5.0))
      .toDF("id", "per", "ret_1", "ret_2")
    val out = Reshape.longToWide(df, Seq("id"), Seq("ret_1", "ret_2"), Seq("per"))
    assert(out.columns.toSet == Set("id", "ret_11", "ret_12", "ret_21", "ret_22"))
  }

  test("expand_months trading days pins Jan-2000 incl MLK gap (tests/test_pandas.py:572-703)") {
    val out = Reshape.expandMonths(fixtureSingleTicker, "Date", "Daily Date", tradeDays = true)
    val days = out.select(date_format(col("Daily Date"), "yyyy-MM-dd"))
      .collect().map(_.getString(0)).sorted.toSeq
    val expect = Seq(
      "2000-01-03", "2000-01-04", "2000-01-05", "2000-01-06", "2000-01-07",
      "2000-01-10", "2000-01-11", "2000-01-12", "2000-01-13", "2000-01-14",
      "2000-01-18", "2000-01-19", "2000-01-20", "2000-01-21", // 17th = MLK
      "2000-01-24", "2000-01-25", "2000-01-26", "2000-01-27", "2000-01-28",
      "2000-01-31"
    )
    assert(days == expect)
    assert(out.columns.toSet == Set("byvar", "Date", "TICKER", "Daily Date"))
  }

  test("expand_months calendar days = all 31 (tests/test_pandas.py:705-898)") {
    val out = Reshape.expandMonths(fixtureSingleTicker, "Date", "Daily Date", tradeDays = false)
    assert(out.count() == 31)
  }

  test("expand_time monthly shifts (pd_utils/datetime_utils.py:56-174)") {
    val s = spark; import s.implicits._
    val df = Seq((1L, ts("2000-01-31"))).toDF("id", "Date")
    val out = Reshape.expandTime(df, Seq(1, 12), "Date", "m")
    val got = out.select(col("Shift"), date_format(col("Shift Date"), "yyyy-MM-dd"))
      .collect().map(r => (r.getInt(0), r.getString(1))).sortBy(_._1).toSeq
    // relativedelta clamps Jan 31 + 1 month to Feb 29 (2000 is a leap year)
    assert(got == Seq((1, "2000-02-29"), (12, "2001-01-31")))
  }

  test("colindex_only uses bare colindex values as names (pd_utils/transform.py:23-25,92)") {
    val out = Reshape.longToWide(fixtureDf, Seq("PERMNO", "byvar"), Seq("RET"), Seq("Date"),
      colindexOnly = true)
    assert(out.columns.toSet == Set("PERMNO", "byvar", "1/1/2000", "1/2/2000", "1/3/2000", "1/4/2000"))
    intercept[IllegalArgumentException] {
      Reshape.longToWide(fixtureDf, Seq("PERMNO"), Seq("RET", "PERMNO"), Seq("Date"), colindexOnly = true)
    }
  }

  test("expand_time trading-day shifts skip weekends and holidays") {
    val s = spark; import s.implicits._
    // Fri 2000-01-14 + 1 trading day = Tue 2000-01-18 (17th = MLK Day)
    val df = Seq((1L, ts("2000-01-14"))).toDF("id", "Date")
    val out = Reshape.expandTime(df, Seq(1), "Date", "td")
    val got = out.select(date_format(col("Shift Date"), "yyyy-MM-dd")).head().getString(0)
    assert(got == "2000-01-18")
  }

  test("expand_time intermediate_periods densifies min..max (pd_utils/datetime_utils.py:82-83)") {
    val s = spark; import s.implicits._
    val df = Seq((1L, ts("2000-01-31"))).toDF("id", "Date")
    val out = Reshape.expandTime(df, Seq(3, 1, 6), "Date", "m", intermediatePeriods = true)
    val shifts = out.select("Shift").collect().map(_.getInt(0)).sorted.toSeq
    assert(shifts == (1 to 6)) // every period between min and max, not just 1,3,6
  }

  test("multi-value rename matches the LONGEST value-name suffix first (ADVICE r3)") {
    val s = spark; import s.implicits._
    // "ret" is a suffix of "vol_ret": pivot column "1_vol_ret" must
    // become "vol_ret1", never "ret1_vol"
    val df = Seq(
      ("g", 1, 0.5, 0.9), ("g", 2, 0.6, 0.8)
    ).toDF("id", "t", "ret", "vol_ret")
    val out = Reshape.longToWide(df, Seq("id"), Seq("ret", "vol_ret"), colindex = Seq("t"))
    assert(out.columns.toSet == Set("id", "ret1", "ret2", "vol_ret1", "vol_ret2"))
  }
}

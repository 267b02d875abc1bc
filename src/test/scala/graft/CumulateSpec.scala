package graft

import org.apache.spark.sql.functions._

import graft.operators.Cumulate

/** Goldens: /root/reference/tests/test_pandas.py:148-249 (TestCumulate)
  * and :1028-1218 (TestMapWindows).
  */
class CumulateSpec extends SparkSuite {

  private def expectBetween13 = {
    val s = spark; import s.implicits._
    Seq(
      (10516L, "a", "1/1/2000", 1.01, 1.01), (10516L, "a", "1/2/2000", 1.02, 1.02),
      (10516L, "a", "1/3/2000", 1.03, 1.0506), (10516L, "a", "1/4/2000", 1.04, 1.04),
      (10516L, "b", "1/1/2000", 1.05, 1.05), (10516L, "b", "1/2/2000", 1.06, 1.06),
      (10516L, "b", "1/3/2000", 1.07, 1.1342), (10516L, "b", "1/4/2000", 1.08, 1.08),
      (10517L, "a", "1/1/2000", 1.09, 1.09), (10517L, "a", "1/2/2000", 1.10, 1.10),
      (10517L, "a", "1/3/2000", 1.11, 1.2210000000000003), (10517L, "a", "1/4/2000", 1.12, 1.12)
    ).toDF("PERMNO", "byvar", "Date", "RET", "cum_RET")
  }

  private def expectFirst = {
    val s = spark; import s.implicits._
    Seq(
      (10516L, "a", "1/1/2000", 1.01, 1.01), (10516L, "a", "1/2/2000", 1.02, 1.02),
      (10516L, "a", "1/3/2000", 1.03, 1.0506), (10516L, "a", "1/4/2000", 1.04, 1.092624),
      (10516L, "b", "1/1/2000", 1.05, 1.05), (10516L, "b", "1/2/2000", 1.06, 1.06),
      (10516L, "b", "1/3/2000", 1.07, 1.1342), (10516L, "b", "1/4/2000", 1.08, 1.224936),
      (10517L, "a", "1/1/2000", 1.09, 1.09), (10517L, "a", "1/2/2000", 1.10, 1.10),
      (10517L, "a", "1/3/2000", 1.11, 1.221), (10517L, "a", "1/4/2000", 1.12, 1.36752)
    ).toDF("PERMNO", "byvar", "Date", "RET", "cum_RET")
  }

  test("method between [1,3] (tests/test_pandas.py:186-196)") {
    val out = Cumulate.cumulate(fixtureDf, Seq("RET"), "between", "Date",
      Seq("PERMNO", "byvar"), time = Seq(1, 3))
    assertSame(out, expectBetween13)
  }

  test("method between [-2,0] equals [1,3] (tests/test_pandas.py:198-209)") {
    val out = Cumulate.cumulate(fixtureDf, Seq("RET"), "between", "Date",
      Seq("PERMNO", "byvar"), time = Seq(-2, 0))
    assertSame(out, expectBetween13)
  }

  test("method first uses the global frame min (tests/test_pandas.py:226-231)") {
    val out = Cumulate.cumulate(fixtureDf, Seq("RET"), "first", "Date", Seq("PERMNO", "byvar"))
    assertSame(out, expectFirst)
  }

  test("grossify (tests/test_pandas.py:233-249)") {
    val ungross = fixtureDf.withColumn("RET", col("RET") - 1)
    val out = Cumulate.cumulate(ungross, Seq("RET"), "first", "Date",
      Seq("PERMNO", "byvar"), grossify = true)
    val expect = expectFirst
      .withColumn("RET", col("RET") - 1)
      .withColumn("cum_RET", col("cum_RET") - 1)
    assertSame(out, expect)
  }

  test("windowMapping matches the five pinned time vectors (tests/test_pandas.py:1028-1218)") {
    val cases = Seq(
      Seq(-4, -2, 0) -> Seq(0, 1, 1, 2, 2, 3, 3, 3),
      Seq(-3, 1, 2) -> Seq(0, 1, 1, 1, 1, 2, 3, 3),
      Seq(4, 5, 6) -> Seq(0, 1, 2, 3, 3, 3, 3, 3),
      Seq(0, 1, 2) -> Seq(0, 1, 2, 3, 3, 3, 3, 3),
      Seq(-1, 0, 1) -> Seq(0, 1, 2, 3, 3, 3, 3, 3)
    )
    for ((time, expect) <- cases)
      assert(Cumulate.windowMapping(time, 8) == expect, s"time=$time")
    assert(Cumulate.windowMapping(Nil, 8, "first") == Seq(0, 1, 1, 1, 1, 1, 1, 1))
  }
}

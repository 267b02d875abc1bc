package graft

import org.apache.spark.sql.functions._

import graft.operators.Portfolio

/** Goldens: /root/reference/tests/test_pandas.py:416-475
  * (TestPortfolioAverages) and :904-960 (TestPortfolio).
  */
class PortfolioSpec extends SparkSuite {

  private def expectPorts = {
    val s = spark; import s.implicits._
    Seq(
      (10516L, "a", "1/1/2000", 1.01, 1), (10516L, "a", "1/2/2000", 1.02, 1),
      (10516L, "a", "1/3/2000", 1.03, 2), (10516L, "a", "1/4/2000", 1.04, 2),
      (10516L, "b", "1/1/2000", 1.05, 1), (10516L, "b", "1/2/2000", 1.06, 1),
      (10516L, "b", "1/3/2000", 1.07, 2), (10516L, "b", "1/4/2000", 1.08, 2),
      (10517L, "a", "1/1/2000", 1.09, 1), (10517L, "a", "1/2/2000", 1.10, 1),
      (10517L, "a", "1/3/2000", 1.11, 2), (10517L, "a", "1/4/2000", 1.12, 2)
    ).toDF("PERMNO", "byvar", "Date", "RET", "portfolio")
  }

  test("portfolio with byvars, ngroups=2 (tests/test_pandas.py:905-926)") {
    val out = Portfolio.portfolio(fixtureDf, "RET", ngroups = 2, byvars = Seq("PERMNO", "byvar"))
    assertSame(out, expectPorts)
  }

  test("NaN-like null maps to portfolio 0 and is excluded from cutoffs (tests/test_pandas.py:929-960)") {
    val s = spark; import s.implicits._
    val indf = fixtureDf.withColumn("RET",
      when(col("PERMNO") === 10516L && col("Date") === "1/1/2000" && col("byvar") === "a", lit(null))
        .otherwise(col("RET")))
    val out = Portfolio.portfolio(indf, "RET", ngroups = 2, byvars = Seq("PERMNO", "byvar"))
    val expect = Seq(
      (10516L, "a", "1/1/2000", Option.empty[Double], 0),
      (10516L, "a", "1/2/2000", Option(1.02), 1),
      (10516L, "a", "1/3/2000", Option(1.03), 1), // boundary tie -> LOWER bucket (per-group rule)
      (10516L, "a", "1/4/2000", Option(1.04), 2),
      (10516L, "b", "1/1/2000", Option(1.05), 1),
      (10516L, "b", "1/2/2000", Option(1.06), 1),
      (10516L, "b", "1/3/2000", Option(1.07), 2),
      (10516L, "b", "1/4/2000", Option(1.08), 2),
      (10517L, "a", "1/1/2000", Option(1.09), 1),
      (10517L, "a", "1/2/2000", Option(1.10), 1),
      (10517L, "a", "1/3/2000", Option(1.11), 2),
      (10517L, "a", "1/4/2000", Option(1.12), 2)
    ).toDF("PERMNO", "byvar", "Date", "RET", "portfolio")
    assertSame(out, expect)
  }

  test("portfolio_averages EW (tests/test_pandas.py:420-428,466-467)") {
    val s = spark; import s.implicits._
    val avgs = Portfolio.portfolioAverages(fixtureDfWeight, "RET", Seq("RET"),
      ngroups = 2, byvars = Seq("byvar"))
    val expect = Seq(
      (1, "a", 1.0250000000000001), (1, "b", 1.0550000000000002),
      (2, "a", 1.1050000000000002), (2, "b", 1.0750000000000002)
    ).toDF("portfolio", "byvar", "RET")
    assertSame(avgs, expect)
  }

  test("portfolio_averages VW (tests/test_pandas.py:430-438,469-470)") {
    val s = spark; import s.implicits._
    val avgs = Portfolio.portfolioAverages(fixtureDfWeight, "RET", Seq("RET"),
      ngroups = 2, byvars = Seq("byvar"), wtvar = Some("weight"))
    val expect = Seq(
      (1, "a", 1.0250000000000001, 1.025), (1, "b", 1.0550000000000002, 1.0550000000000002),
      (2, "a", 1.1050000000000002, 1.12), (2, "b", 1.0750000000000002, 1.0750000000000002)
    ).toDF("portfolio", "byvar", "RET", "RET_wavg")
    assertSame(avgs, expect)
  }

  test("portfolio construction under averages matches golden (tests/test_pandas.py:440-457,472-475)") {
    val s = spark; import s.implicits._
    val out = Portfolio.portfolio(fixtureDfWeight, "RET", ngroups = 2, byvars = Seq("byvar"))
    val expect = Seq(
      (10516L, "a", "1/1/2000", 1.01, 1), (10516L, "a", "1/2/2000", 1.02, 1),
      (10516L, "a", "1/3/2000", 1.03, 1), (10516L, "a", "1/4/2000", 1.04, 1),
      (10516L, "b", "1/1/2000", 1.05, 1), (10516L, "b", "1/2/2000", 1.06, 1),
      (10516L, "b", "1/3/2000", 1.07, 2), (10516L, "b", "1/4/2000", 1.08, 2),
      (10517L, "a", "1/1/2000", 1.09, 2), (10517L, "a", "1/2/2000", 1.10, 2),
      (10517L, "a", "1/3/2000", 1.11, 2), (10517L, "a", "1/4/2000", 1.12, 2)
    ).toDF("PERMNO", "byvar", "Date", "RET", "portfolio")
    assertSame(out.drop("weight"), expect)
  }

  test("whole-frame hard cutoffs put boundary ties in the HIGHER bucket (pd_utils/port.py:263-268)") {
    val s = spark; import s.implicits._
    val df = Seq(1.0, 2.0, 2.0, 3.0).toDF("x")
    val out = Portfolio.portfolio(df, "x", cutoffs = Seq(2.0))
    val got = out.orderBy("x").select("portfolio").collect().map(_.getInt(0)).toSeq
    assert(got == Seq(1, 2, 2, 2)) // 2.0 == cutoff -> higher bucket
  }

  test("quant_cutoffs define explicit interior quantiles (pd_utils/port.py:31-36)") {
    val s = spark; import s.implicits._
    val df = (1 to 10).map(i => (i.toLong, i.toDouble)).toDF("id", "x")
    val out = Portfolio.portfolio(df, "x", quantCutoffs = Seq(0.8)) // 80/20 split, whole frame
    val counts = out.groupBy("portfolio").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(counts == Map(1 -> 8, 2 -> 2)) // q0.8 of 1..10 = 8.2 -> x >= 8.2 in bucket 2
  }

  test("cutdf computes cutoffs on a different dataset (pd_utils/port.py:37-39)") {
    val s = spark; import s.implicits._
    val data = Seq(("g", 1.0), ("g", 2.0), ("g", 3.0), ("g", 100.0)).toDF("k", "x")
    val cut = Seq(("g", 0.0), ("g", 10.0)).toDF("k", "x") // median 5.0
    val out = Portfolio.portfolio(data, "x", ngroups = 2, byvars = Seq("k"), cutDf = Some(cut))
    val m = out.collect().map(r => r.getDouble(1) -> r.getInt(2)).toMap
    assert(m == Map(1.0 -> 1, 2.0 -> 1, 3.0 -> 1, 100.0 -> 2)) // cut at 5.0 from cutdf
  }

  test("long_short_portfolio subtracts bottom from top aligned on byvars (pd_utils/port.py:211-260)") {
    val s = spark; import s.implicits._
    val pa = Portfolio.portfolioAverages(fixtureDfWeight, "RET", Seq("RET"),
      ngroups = 2, byvars = Seq("byvar"))
    val ls = Portfolio.longShortPortfolio(pa, "portfolio", Seq("byvar"), Seq("RET"))
    val expect = Seq(
      ("a", 1.1050000000000002 - 1.0250000000000001),
      ("b", 1.0750000000000002 - 1.0550000000000002)
    ).toDF("byvar", "RET")
    assertSame(ls, expect)
  }

  test("long_short evaluates its input plan exactly once (VERDICT r3 #8)") {
    val s = spark; import s.implicits._
    val pa = Seq(("a", 1, 1.0), ("a", 2, 2.0), ("b", 1, 3.0), ("b", 2, 5.0))
      .toDF("byvar", "portfolio", "RET")
    val ls = Portfolio.longShortPortfolio(pa, "portfolio", Seq("byvar"), Seq("RET"))
    // AQE hides children from collect(), so count scans textually
    val plan = ls.queryExecution.executedPlan.toString
    val scans = "LocalTableScan".r.findAllIn(plan).size
    assert(scans == 1, s"expected one scan of the input, got:\n$plan")
  }

  test("longShortPortfolio rejects raw row-level input past the contract bound (VERDICT r5 #3)") {
    val s = spark
    import org.apache.spark.sql.functions.{col, lit}
    // non-aggregated plan, > 2^20 rows: the in-plan assert_true guard
    // must reject it at execution instead of silently serializing the
    // single-task window (construction itself stays lazy)
    val big = s.range((1 << 20) + 1).toDF("portfolio")
      .withColumn("byvar", lit("a")).withColumn("RET", col("portfolio").cast("double"))
    val ls = Portfolio.longShortPortfolio(big, "portfolio", Seq("byvar"), Seq("RET"))
    val ex = intercept[Throwable] { ls.count() }
    val messages = Iterator.iterate(ex)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString("\n")
    assert(messages.contains("pre-aggregated"), s"unexpected failure:\n$messages")
  }

  test("a byvars group with only one side keeps a NULL return (pandas alignment, ADVICE r3)") {
    val s = spark; import s.implicits._
    // group "c" has a row only in the short (min) portfolio
    val pa = Seq(("a", 1, 1.0), ("a", 3, 2.0), ("c", 1, 9.0))
      .toDF("byvar", "portfolio", "RET")
    val ls = Portfolio.longShortPortfolio(pa, "portfolio", Seq("byvar"), Seq("RET"))
    val rows = ls.collect().map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(rows("a").contains(1.0))
    assert(rows("c").isEmpty) // present, null return — not dropped
  }
}

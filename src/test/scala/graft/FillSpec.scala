package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.Fill

/** Goldens: /root/reference/tests/test_pandas.py:1334-1383
  * (TestFillExcludedRows) and :1386-1419 (TestFillnaByGroups).
  */
class FillSpec extends SparkSuite {

  test("fill_excluded_rows scaffold, no fill (tests/test_pandas.py:1336-1360)") {
    val s = spark; import s.implicits._
    val out = Fill.fillExcludedRows(fixtureGvkeyStr, Seq("GVKEY", "Date"))
    val expect = Seq(
      ("001076", ts("1995-03-01")), ("001076", ts("1995-04-01")),
      ("001076", ts("2012-01-01")), ("001076", ts("2012-07-01")),
      ("001722", ts("1995-03-01")), ("001722", ts("1995-04-01")),
      ("001722", ts("2012-01-01")), ("001722", ts("2012-07-01"))
    ).toDF("GVKEY", "Date")
    assertSame(out, expect)
  }

  test("fill_excluded_rows with fill value (tests/test_pandas.py:1362-1383)") {
    val s = spark; import s.implicits._
    val varDf = fixtureGvkeyStr.withColumn("var", lit(1.0))
    val out = Fill.fillExcludedRows(varDf, Seq("GVKEY", "Date"), Seq("var"), Some(0.0))
    val expect = Seq(
      ("001076", ts("1995-03-01"), 1.0), ("001076", ts("1995-04-01"), 1.0),
      ("001076", ts("2012-01-01"), 0.0), ("001076", ts("2012-07-01"), 0.0),
      ("001722", ts("1995-03-01"), 0.0), ("001722", ts("1995-04-01"), 0.0),
      ("001722", ts("2012-01-01"), 1.0), ("001722", ts("2012-07-01"), 1.0)
    ).toDF("GVKEY", "Date", "var")
    assertSame(out, expect)
  }

  test("fillna_by_groups: numeric -> group mean, string -> group first (tests/test_pandas.py:1386-1402)") {
    val s = spark; import s.implicits._
    val out = Fill.fillnaByGroups(fixtureFillData, Seq("group"), orderCols = Seq("idx"))
      .drop("idx")
    val expect = Seq(
      ("a", 4L, "c", 51.5), ("a", 1L, "d", 3.0), ("a", 10L, "e", 100.0),
      ("b", 2L, "f", 6.0), ("b", 5L, "f", 8.0), ("b", 11L, "g", 150.0)
    ).toDF("group", "y", "x1", "x2")
    assertSame(out, expect)
  }

  test("fillna_by_groups accepts any namedAggs numeric fill, e.g. median (VERDICT r3 #6)") {
    val s = spark; import s.implicits._
    val df = Seq(
      ("a", 1L, Some(1.0)), ("a", 2L, Some(2.0)), ("a", 3L, Some(10.0)), ("a", 4L, None),
      ("b", 1L, Some(5.0)), ("b", 2L, None)
    ).toDF("group", "idx", "v")
    val med = Fill.fillnaByGroups(df, Seq("group"), orderCols = Seq("idx"), numVars = "median")
      .where(col("idx") === (when(col("group") === "a", 4L).otherwise(2L)))
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(med == Map("a" -> 2.0, "b" -> 5.0)) // pandas interpolated median of (1,2,10) = 2
    val mx = Fill.fillnaByGroups(df, Seq("group"), orderCols = Seq("idx"), numVars = "max")
      .where(col("group") === "a" && col("idx") === 4L).head().getDouble(2)
    assert(mx == 10.0)
    intercept[IllegalArgumentException] {
      Fill.fillnaByGroups(df, Seq("group"), orderCols = Seq("idx"), numVars = "nope").collect()
    }
  }

  test("fillna_by_groups_and_keep_one (tests/test_pandas.py:1404-1419)") {
    val s = spark; import s.implicits._
    val out = Fill.fillnaByGroupsAndKeepOnePerGroup(fixtureFillData, Seq("group"), Seq("idx"))
      .drop("idx")
    val expect = Seq(
      ("a", 4L, "c", 51.5),
      ("b", 2L, "f", 6.0)
    ).toDF("group", "y", "x1", "x2")
    assertSame(out, expect)
  }

  test("ffill with limit stops past the guard distance (pd_utils/filldata.py:96-99)") {
    val s = spark; import s.implicits._
    val df = Seq(
      ("g", 1L, Option(10.0)), ("g", 2L, Option.empty[Double]),
      ("g", 3L, Option.empty[Double]), ("g", 4L, Option.empty[Double])
    ).toDF("k", "t", "v")
    val out = Fill.ffill(df, Seq("k"), Seq("t"), Seq("v"), limit = Some(2))
    val got = out.orderBy("t").select("v").collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0))).toSeq
    assert(got == Seq(Some(10.0), Some(10.0), Some(10.0), None))
  }

  test("bfill fills backwards (pd_utils/filldata.py:65-101)") {
    val s = spark; import s.implicits._
    val df = Seq(
      ("g", 1L, Option.empty[Double]), ("g", 2L, Option(5.0)), ("g", 3L, Option.empty[Double])
    ).toDF("k", "t", "v")
    val out = Fill.bfill(df, Seq("k"), Seq("t"), Seq("v"))
    val got = out.orderBy("t").select("v").collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0))).toSeq
    assert(got == Seq(Some(5.0), Some(5.0), None))
  }

  test("add_missing_group_rows scaffolds the full cross product then ffills") {
    val s = spark; import s.implicits._
    val df = Seq(("g1", 1L, 1.0), ("g1", 3L, 3.0), ("g2", 2L, 2.0)).toDF("k", "t", "v")
    val out = Fill.addMissingGroupRows(df, Seq("k"), Seq("t"))
    assert(out.count() == 6) // 2 groups x 3 ts
    val g1 = out.where(col("k") === "g1").orderBy("t").select("v").collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0))).toSeq
    assert(g1 == Seq(Some(1.0), Some(1.0), Some(3.0)))
  }

  test("drop_missing_group_rows drops all-null value rows (pd_utils/filldata.py:104-106)") {
    val s = spark; import s.implicits._
    val df = Seq(
      ("a", 1L, Option(1.0)), ("a", 2L, Option.empty[Double])
    ).toDF("k", "t", "v")
    val out = Fill.dropMissingGroupRows(df, Seq("k", "t"))
    assert(out.count() == 1)
  }
}

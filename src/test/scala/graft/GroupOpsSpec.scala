package graft

import org.apache.spark.sql.functions._

import graft.operators.GroupOps

/** Goldens: /root/reference/tests/test_pandas.py:252-340
  * (TestGroupbyMerge) and :1274-1331 (TestVarChangeByGroups).
  */
class GroupOpsSpec extends SparkSuite {

  test("groupby_merge subset max (tests/test_pandas.py:253-277)") {
    val s = spark; import s.implicits._
    val out = GroupOps.groupbyMerge(fixtureDf, Seq("PERMNO", "byvar"), "max", Seq("RET"))
    val expect = Seq(
      (10516L, "a", "1/1/2000", 1.01, 1.04), (10516L, "a", "1/2/2000", 1.02, 1.04),
      (10516L, "a", "1/3/2000", 1.03, 1.04), (10516L, "a", "1/4/2000", 1.04, 1.04),
      (10516L, "b", "1/1/2000", 1.05, 1.08), (10516L, "b", "1/2/2000", 1.06, 1.08),
      (10516L, "b", "1/3/2000", 1.07, 1.08), (10516L, "b", "1/4/2000", 1.08, 1.08),
      (10517L, "a", "1/1/2000", 1.09, 1.12), (10517L, "a", "1/2/2000", 1.10, 1.12),
      (10517L, "a", "1/3/2000", 1.11, 1.12), (10517L, "a", "1/4/2000", 1.12, 1.12)
    ).toDF("PERMNO", "byvar", "Date", "RET", "RET_max")
    assertSame(out, expect)
  }

  test("groupby_merge subset std is SAMPLE std (tests/test_pandas.py:279-301)") {
    val out = GroupOps.groupbyMerge(fixtureDf, Seq("PERMNO", "byvar"), "std", Seq("RET"))
    // golden pins 0.012909944487358068 for every row (ddof=1)
    val stds = out.select("RET_std").distinct().collect().map(_.getDouble(0))
    assert(stds.length == 1)
    assert(math.abs(stds.head - 0.012909944487358068) < 1e-12)
  }

  test("null group key gets null AGGREGATE (tests/test_pandas.py:327-340 test_nan_byvar_sum)") {
    val s = spark; import s.implicits._
    val out = GroupOps.groupbyMerge(fixtureDfNanByvar, Seq("byvar"), "sum")
    val expect = Seq(
      (Option("a"), 1.0, Option(1.0)),
      (Option.empty[String], 2.0, Option.empty[Double]),
      (Option("b"), 3.0, Option(7.0)),
      (Option("b"), 4.0, Option(7.0))
    ).toDF("byvar", "val", "val_sum")
    assertSame(out, expect)
  }

  test("null group key is INCLUDED in transform; null values excluded (tests/test_pandas.py:299-325)") {
    val s = spark; import s.implicits._
    // reference: groupby_merge(df, 'byvar', 'transform', lambda x: x + 1)
    val out = GroupOps.groupbyTransform(fixtureDfNanByvarAndVal, Seq("byvar"), Seq("val"),
      (c, _) => c + 1)
    val expect = Seq(
      (Option("a"), Option(1.0), Option(2.0)),
      (Option.empty[String], Option(2.0), Option(3.0)), // null KEY still transformed
      (Option("b"), Option.empty[Double], Option.empty[Double]), // null VALUE excluded
      (Option("b"), Option(4.0), Option(5.0))
    ).toDF("byvar", "val", "val_transform")
    assertSame(out, expect)
  }

  test("var_change_by_groups single var (tests/test_pandas.py:1274-1300)") {
    val s = spark; import s.implicits._
    val out = GroupOps.varChangeByGroups(fixtureDf, Seq("RET"), Seq("PERMNO", "byvar"), "Date")
    val expect = Seq(
      (10516L, "a", "1/1/2000", 1.01, Option.empty[Double]),
      (10516L, "a", "1/2/2000", 1.02, Option(0.01)),
      (10516L, "a", "1/3/2000", 1.03, Option(0.01)),
      (10516L, "a", "1/4/2000", 1.04, Option(0.01)),
      (10516L, "b", "1/1/2000", 1.05, Option.empty[Double]),
      (10516L, "b", "1/2/2000", 1.06, Option(0.01)),
      (10516L, "b", "1/3/2000", 1.07, Option(0.01)),
      (10516L, "b", "1/4/2000", 1.08, Option(0.01)),
      (10517L, "a", "1/1/2000", 1.09, Option.empty[Double]),
      (10517L, "a", "1/2/2000", 1.10, Option(0.01)),
      (10517L, "a", "1/3/2000", 1.11, Option(0.01)),
      (10517L, "a", "1/4/2000", 1.12, Option(0.01))
    ).toDF("PERMNO", "byvar", "Date", "RET", "RET_change")
    assertSame(out, expect)
  }

  test("var_change_by_groups multi var (tests/test_pandas.py:1302-1331)") {
    val out = GroupOps.varChangeByGroups(fixtureDfWeight, Seq("RET", "weight"),
      Seq("PERMNO", "byvar"), "Date")
    val changes = out
      .where(col("PERMNO") === 10516L && col("byvar") === "a")
      .orderBy("Date")
      .select("weight_change")
      .collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(changes.toSeq == Seq(None, Some(1L), Some(0L), Some(-1L)))
  }

  test("averages EW and VW (tests/test_pandas.py:416-475 shapes)") {
    val s = spark; import s.implicits._
    val out = GroupOps.averages(fixtureDfWeight, Seq("RET"), Seq("byvar"), wtvar = Some("weight"))
    val expect = Seq(
      ("a", 1.065, 1.0566666666666666), // EW over 8 rows; VW = (1.02+1.03+1.12)/3
      ("b", 1.065, 1.065)
    ).toDF("byvar", "RET", "RET_wavg")
    assertSame(out, expect)
  }

  test("groupby_index 0-based per-group counter (pd_utils/merge.py:122-154)") {
    val out = GroupOps.groupbyIndex(fixtureDf, Seq("PERMNO", "byvar"), Seq("Date"))
    val idx = out
      .where(col("PERMNO") === 10516L && col("byvar") === "a")
      .orderBy("Date")
      .select("group_index")
      .collect()
      .map(_.getInt(0))
    assert(idx.toSeq == Seq(0, 1, 2, 3))
  }

  test("sessionize numbers gap-separated sessions per key; ties share a session") {
    val s = spark; import s.implicits._
    def t(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val df = Seq(
      ("u1", t(0)), ("u1", t(100)),          // session 1
      ("u1", t(100)),                         // tie -> still session 1
      ("u1", t(4000)),                        // > 3600s gap -> session 2
      ("u1", t(4100)), ("u1", t(8000)),      // session 2 + session 3
      ("u2", t(0))                            // separate key restarts at 1
    ).toDF("k", "ts")
    val got = graft.operators.GroupOps.sessionize(df, Seq("k"), "ts", gapSeconds = 3600L)
      .collect().map(r => (r.getString(0), r.getTimestamp(1).getTime / 1000, r.getLong(2)))
    val u1 = got.filter(_._1 == "u1").sortBy(x => (x._2, x._3)).map(x => (x._2, x._3)).toSeq
    assert(u1 == Seq((0L, 1L), (100L, 1L), (100L, 1L), (4000L, 2L), (4100L, 2L), (8000L, 3L)))
    assert(got.filter(_._1 == "u2").map(_._3).toSeq == Seq(1L))
  }
}

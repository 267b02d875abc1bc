package graft

import java.sql.Timestamp

import graft.operators.AsOf

/** Golden: /root/reference/tests/test_pandas.py:1221-1271
  * (TestLeftMergeLatest) — null GVKEY and NaT dates included.
  */
class AsOfSpec extends SparkSuite {

  test("left_merge_latest backward as-of with null keys/dates (tests/test_pandas.py:1221-1271)") {
    val s = spark; import s.implicits._
    val out = AsOf.leftMergeLatest(fixtureGvkeyStr, fixtureGvkeyStr2, Seq("GVKEY"))
    val expect = Seq(
      (Option("001076"), Option(ts("1995-03-01")), Option(ts("1995-02-01"))),
      (Option("001076"), Option(ts("1995-04-01")), Option(ts("1995-03-02"))),
      (Option("001722"), Option(ts("2012-01-01")), Option(ts("2011-11-01"))),
      (Option("001722"), Option(ts("2012-07-01")), Option(ts("2011-11-01"))),
      (Option("001722"), Option.empty[Timestamp], Option.empty[Timestamp]),
      (Option.empty[String], Option(ts("2012-01-01")), Option.empty[Timestamp])
    ).toDF("GVKEY", "Date", "Date_y")
    assertSame(out, expect)
  }

  test("max_offset bounds staleness (pd_utils/merge.py:207-214)") {
    val s = spark; import s.implicits._
    import org.apache.spark.sql.functions.expr
    val out = AsOf.leftMergeLatest(fixtureGvkeyStr, fixtureGvkeyStr2, Seq("GVKEY"),
      maxOffset = Some(expr("INTERVAL 40 DAYS")))
    // 001076 @1995-03-01: latest within 40 days is 1995-02-01 (28 days) -> kept
    // 001722 @2012-01-01: 2011-11-01 is 61 days stale -> dropped (null)
    val m = out.collect().map(r => (r.getString(0), Option(r.getTimestamp(1)).map(_.toString), Option(r.getTimestamp(2)))).toSeq
    val k1722 = m.find(x => x._1 == "001722" && x._2.exists(_.startsWith("2012-01-01"))).get
    assert(k1722._3.isEmpty)
    val k1076 = m.find(x => x._1 == "001076" && x._2.exists(_.startsWith("1995-03-01"))).get
    assert(k1076._3.exists(_.toString.startsWith("1995-02-01")))
  }

  test("ties on the latest right date all survive (dense_rank semantics)") {
    val s = spark; import s.implicits._
    val l = Seq(("k", ts("2020-01-10"))).toDF("id", "Date")
    val r = Seq(("k", ts("2020-01-05"), "x"), ("k", ts("2020-01-05"), "y"), ("k", ts("2020-01-01"), "z"))
      .toDF("id", "Date", "tag")
    val out = AsOf.leftMergeLatest(l, r, Seq("id"))
    assert(out.count() == 2) // both tied rows kept, like the reference's groupby-max + merge
    assert(out.select("tag").collect().map(_.getString(0)).toSet == Set("x", "y"))
  }
}

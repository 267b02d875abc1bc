package graft

import org.apache.spark.sql.functions._

import graft.operators.{Merge, Portfolio, Reshape}

/** apply_func_to_unique_and_merge (pd_utils/merge.py:157-191),
  * portfolio_averages detail return (pd_utils/port.py:203-208), and
  * the expand_time freq aliases.
  */
class MergeSpec extends SparkSuite {

  test("apply_func_to_unique_and_merge expands distinct results to original shape") {
    val s = spark; import s.implicits._
    val df = Seq((1L, "200001"), (2L, "200001"), (3L, "200002"), (4L, null))
      .toDF("id", "month")
    val out = Merge.applyFuncToUniqueAndMerge(df, "month",
      m => to_date(m, "yyyyMM"), "month_date")
    assert(out.count() == 4)
    val got = out.collect().map(r =>
      r.getLong(0) -> Option(r.getDate(r.fieldIndex("month_date"))).map(_.toString)).toMap
    assert(got(1L) == Some("2000-01-01") && got(2L) == Some("2000-01-01"))
    assert(got(3L) == Some("2000-02-01"))
    assert(got(4L).isEmpty) // null key row preserved (pandas merge NaN-matching)
  }

  test("apply_func_to_unique_and_merge computes f once per distinct value") {
    val s = spark; import s.implicits._
    val counter = s.sparkContext.longAccumulator("fcalls")
    val f = udf { (x: String) => counter.add(1); x.toUpperCase }
    val df = Seq.fill(100)("same").zipWithIndex.map(_.swap).toDF("id", "v")
    Merge.applyFuncToUniqueAndMerge(df, "v", f(_), "V").collect()
    assert(counter.value <= 3) // once per distinct (+ possible plan re-eval), never per row
  }

  test("portfolio_averages detail return matches the assignments frame (pd_utils/port.py:203-208)") {
    val (avgs, detail) = Portfolio.portfolioAveragesWithDetail(
      fixtureDfWeight, "RET", Seq("RET"), ngroups = 2, byvars = Seq("byvar"))
    assert(avgs.count() == 4)
    assert(detail.count() == 12)
    assert(detail.columns.contains("portfolio") && detail.columns.contains("weight"))
  }

  test("expand_time freq 'd' equals 'td' (reference default trading calendar)") {
    val s = spark; import s.implicits._
    val df = Seq((1L, ts("2000-01-14"))).toDF("id", "Date")
    val d = Reshape.expandTime(df, Seq(1), "Date", "d")
      .select(date_format(col("Shift Date"), "yyyy-MM-dd")).head().getString(0)
    assert(d == "2000-01-18") // skips MLK Monday
    val cd = Reshape.expandTime(df, Seq(1), "Date", "cd")
      .select(date_format(col("Shift Date"), "yyyy-MM-dd")).head().getString(0)
    assert(cd == "2000-01-15") // plain calendar-day extension
  }
}

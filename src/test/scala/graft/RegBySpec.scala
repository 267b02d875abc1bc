package graft

import org.apache.spark.sql.functions._

import graft.operators.RegBy

/** Goldens: /root/reference/tests/test_pandas.py:506-569 (TestRegBy).
  * The reference concatenates multi-col keys into a string `key`
  * column; the fixtures do the same here.
  */
class RegBySpec extends SparkSuite {

  private def indf = fixtureDfWeight
    .withColumn("key", concat(col("PERMNO").cast("string"), lit("_"), col("byvar")))

  test("reg_by without constant (tests/test_pandas.py:512-529)") {
    val s = spark; import s.implicits._
    val out = RegBy.regBy(indf, "weight", Seq("RET"), Seq("key"), cons = false)
    val expect = Seq(
      (0.48774684748988806, "10516_a"),
      (0.9388636664168903, "10516_b"),
      (0.22929206076239614, "10517_a")
    ).toDF("coef_RET", "key")
    assertSame(out, expect, tol = 1e-9)
  }

  test("reg_by with constant incl degenerate perfect-fit group (tests/test_pandas.py:531-548)") {
    val s = spark; import s.implicits._
    val out = RegBy.regBy(indf, "weight", Seq("RET"), Seq("key"), cons = true)
    val expect = Seq(
      (0.49999999999999645, 5.329070518200751e-15, "10516_a"),
      (0.9999999999999893, 1.0658141036401503e-14, "10516_b"),
      (-32.89999999999997, 29.999999999999982, "10517_a")
    ).toDF("const", "coef_RET", "key")
    assertSame(out, expect, tol = 1e-6)
  }

  test("groups below the obs minimum get all-null coefficients (tests/test_pandas.py:550-569)") {
    val s = spark; import s.implicits._
    // reference .loc[:8] keeps rows 0..8 -> 10517_a has a single obs
    val limited = indf.where(
      !(col("PERMNO") === 10517L && col("Date").isin("1/2/2000", "1/3/2000", "1/4/2000")))
    val out = RegBy.regBy(limited, "weight", Seq("RET"), Seq("key"), cons = true)
    val expect = Seq(
      (Option(0.49999999999999645), Option(5.329070518200751e-15), "10516_a"),
      (Option(0.9999999999999893), Option(1.0658141036401503e-14), "10516_b"),
      (Option.empty[Double], Option.empty[Double], "10517_a")
    ).toDF("const", "coef_RET", "key")
    assertSame(out, expect, tol = 1e-6)
  }

  test("merge=true attaches coefficients back to every input row (pd_utils/regby.py:75-88)") {
    val out = RegBy.regBy(indf, "weight", Seq("RET"), Seq("key"), cons = true, merge = true)
    assert(out.count() == 12)
    assert(out.columns.contains("coef_RET") && out.columns.contains("RET"))
  }

  test("HC1 robust stderr is emitted and positive for a noisy group") {
    val s = spark; import s.implicits._
    val noisy = Seq(
      ("g", 1.0, 1.0), ("g", 2.0, 2.9), ("g", 3.0, 2.2),
      ("g", 4.0, 4.5), ("g", 5.0, 4.9)
    ).toDF("key", "x", "y")
    val out = RegBy.regBy(noisy, "y", Seq("x"), Seq("key"), cons = true, stderr = true)
    val row = out.head()
    assert(row.getDouble(out.columns.indexOf("stderr_const")) > 0)
    assert(row.getDouble(out.columns.indexOf("stderr_x")) > 0)
  }
}

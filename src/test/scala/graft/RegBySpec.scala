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

  test("HC1 robust stderr matches the closed form (golden vs NumPy)") {
    val s = spark; import s.implicits._
    val noisy = Seq(
      ("g", 1.0, 1.0), ("g", 2.0, 2.9), ("g", 3.0, 2.2),
      ("g", 4.0, 4.5), ("g", 5.0, 4.9)
    ).toDF("key", "x", "y")
    val out = RegBy.regBy(noisy, "y", Seq("x"), Seq("key"), cons = true, stderr = true)
    val expect = Seq(
      ("g", 0.28, 0.94, 0.5822599577445, 0.1276975606063)
    ).toDF("key", "const", "coef_x", "stderr_const", "stderr_x")
    assertSame(out, expect, tol = 1e-6)
  }

  test("stderr path keeps colliding multi-col keys separate (VERDICT r3 #3)") {
    val s = spark; import s.implicits._
    // a separator-less key concat would merge ("AB","C") with ("A","BC")
    // into one 6-obs regression; the real-column grouping must fit two
    // distinct 3-obs lines (y = x and y = 2x + 1 exactly)
    val df = Seq(
      ("AB", "C", 1.0, 1.0), ("AB", "C", 2.0, 2.0), ("AB", "C", 3.0, 3.0),
      ("A", "BC", 1.0, 3.0), ("A", "BC", 2.0, 5.0), ("A", "BC", 3.0, 7.0)
    ).toDF("g1", "g2", "x", "y")
    val out = RegBy.regBy(df, "y", Seq("x"), Seq("g1", "g2"), cons = true, stderr = true)
    assert(out.count() == 2)
    val m = out.collect().map(r => (r.getString(0), r.getString(1)) ->
      (r.getDouble(out.columns.indexOf("const")), r.getDouble(out.columns.indexOf("coef_x")))).toMap
    assert(math.abs(m(("AB", "C"))._2 - 1.0) < 1e-9 && math.abs(m(("AB", "C"))._1) < 1e-9)
    assert(math.abs(m(("A", "BC"))._2 - 2.0) < 1e-9 && math.abs(m(("A", "BC"))._1 - 1.0) < 1e-9)
  }

  test("underdetermined group yields null stderr, not a crash") {
    val s = spark; import s.implicits._
    val df = Seq(("g", 1.0, 1.0), ("g", 2.0, 2.0), ("g", 3.0, 3.1), ("h", 1.0, 1.0))
      .toDF("key", "x", "y")
    val out = RegBy.regBy(df, "y", Seq("x"), Seq("key"), cons = true, stderr = true)
    val h = out.where(col("key") === "h").head()
    assert(h.isNullAt(out.columns.indexOf("const")) && h.isNullAt(out.columns.indexOf("stderr_x")))
    val g = out.where(col("key") === "g").head()
    assert(g.getDouble(out.columns.indexOf("stderr_x")) > 0)
  }
}

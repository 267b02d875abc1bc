package graft

import org.apache.spark.sql.functions._

import graft.operators.Percentiles

/** DDSketch approximate quantiles: relative-error bound vs the exact
  * aggregate, partitioning invariance (the determinism claim), and
  * builtin-parity null handling.
  */
class QuantileSketchSpec extends SparkSuite {

  private val ps = Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)
  private val alpha = 0.01

  private def messy(n: Int, groups: Int) = {
    val s = spark; import s.implicits._
    (0 until n).map { i =>
      val g = s"g${i % groups}"
      val v = (i * 37 % 101) match {
        case m if m < 15 => m.toDouble + 1          // duplicates
        case m if m < 40 => -math.E * m - 0.5       // negatives
        case m if m < 70 => 1e6 + m * 997.0         // large magnitude
        case m           => 1e-4 * m + 1e-7         // tiny magnitude
      }
      (i.toLong, g, v)
    }.toDF("id", "g", "v")
  }

  test("every quantile is within the relative-error bound of the exact rank element") {
    val df = messy(20000, 1)
    val approx = df.agg(Percentiles.approxQuantiles(col("v"), ps, alpha).as("q"))
      .head().getSeq[Double](0)
    // the sketch's contract is the element at rank round(p*(n-1)),
    // not the interpolated percentile — compare against that element
    val sorted = df.select("v").collect().map(_.getDouble(0)).sorted
    ps.indices.foreach { i =>
      val exact = sorted(math.round(ps(i) * (sorted.length - 1)).toInt)
      val got = approx(i)
      val tol = alpha * math.abs(exact) + 1e-12
      assert(math.abs(got - exact) <= tol,
        s"p=${ps(i)}: approx=$got exact=$exact (tol $tol)")
    }
  }

  test("grouped sketch obeys the bound per group") {
    val df = messy(12000, 5)
    val approx = Percentiles.approxCuts(df, col("v"), Seq("g"), ps, alpha)
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    val byGroup = df.collect().map(r => (r.getString(1), r.getDouble(2)))
      .groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2).sorted }
    byGroup.foreach { case (g, sorted) =>
      ps.indices.foreach { i =>
        val exact = sorted(math.round(ps(i) * (sorted.length - 1)).toInt)
        val got = approx(g)(i)
        assert(math.abs(got - exact) <= alpha * math.abs(exact) + 1e-12,
          s"group $g p=${ps(i)}: approx=$got exact=$exact")
      }
    }
  }

  test("result is bit-identical under any partitioning (deterministic merge)") {
    val df = messy(9000, 3)
    def run(parts: Int): Map[String, Seq[Double]] =
      Percentiles.approxCuts(df.repartition(parts, col("id")), col("v"), Seq("g"), ps, alpha)
        .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    val one = run(1)
    val many = run(17)
    assert(one.keySet == many.keySet)
    for (g <- one.keySet; i <- ps.indices)
      assert(java.lang.Double.doubleToLongBits(one(g)(i)) ==
        java.lang.Double.doubleToLongBits(many(g)(i)),
        s"group $g p=${ps(i)}: ${one(g)(i)} vs ${many(g)(i)}")
  }

  test("nulls and NaN are excluded; all-excluded group yields NULL; zeros and signs handled") {
    val s = spark; import s.implicits._
    val df = Seq(
      ("a", Some(-2.0)), ("a", Some(0.0)), ("a", Some(0.0)), ("a", Some(3.0)),
      ("a", None), ("a", Some(Double.NaN)),
      ("b", None), ("b", Some(Double.NaN))).toDF("g", "v")
    val out = df.groupBy("g").agg(Percentiles.approxQuantiles(col("v"), Seq(0.0, 0.5, 1.0)).as("q"))
      .collect().map(r => r.getString(0) -> (if (r.isNullAt(1)) null else r.getSeq[Double](1))).toMap
    assert(out("b") == null)
    val a = out("a").asInstanceOf[Seq[Double]]
    assert(math.abs(a(0) + 2.0) <= 0.01 * 2.0 + 1e-12)  // min ~ -2
    assert(a(1) == 0.0)                                  // median of {-2,0,0,3}: rank 2 -> 0
    assert(math.abs(a(2) - 3.0) <= 0.01 * 3.0 + 1e-12)  // max ~ 3
  }

  test("the SQL surface serves the same aggregate (graft_approx_quantiles)") {
    val df = messy(3000, 2)
    df.createOrReplaceTempView("qsk")
    try {
      val viaSql = spark.sql(
        "SELECT g, graft_approx_quantiles(CAST(v AS DOUBLE), array(0.25D, 0.5D, 0.75D), 0.01D) AS q FROM qsk GROUP BY g")
        .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
      val viaCol = Percentiles.approxCuts(df, col("v"), Seq("g"), Seq(0.25, 0.5, 0.75), 0.01)
        .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
      assert(viaSql == viaCol)
      // plain numeric literals parse as DECIMAL — they must bind too
      // (ADVICE r11: only the 0.25D spelling used to work)
      val viaPlain = spark.sql(
        "SELECT g, graft_approx_quantiles(CAST(v AS DOUBLE), array(0.25, 0.5, 0.75), 0.01) AS q FROM qsk GROUP BY g")
        .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
      assert(viaPlain == viaCol)
    } finally spark.catalog.dropTempView("qsk")
  }

  test("the aggregate partially aggregates (sketches, not rows, cross the shuffle)") {
    val df = messy(5000, 4).repartition(8)
    val plan = Percentiles.approxCuts(df, col("v"), Seq("g"), ps, alpha)
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_graft_approx_quantiles"),
      s"no partial aggregation mode found:\n$plan")
  }
}

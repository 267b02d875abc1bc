package graft

import graft.operators.Winsorize

/** Golden: /root/reference/tests/test_pandas.py:478-503
  * (test_winsor_40_subset_byvars, check_less_precise -> tol 1e-3).
  * The 1.0216 value pins the reference's sequential clamp: the bottom
  * quantile is computed AFTER the top clamp mutates the column.
  */
class WinsorizeSpec extends SparkSuite {

  test("winsorize 0.4 subset byvars (tests/test_pandas.py:478-503)") {
    val s = spark; import s.implicits._
    val out = Winsorize.winsorize(fixtureDf, 0.4, Seq("RET"), Seq("PERMNO", "byvar"))
    val expect = Seq(
      (10516L, "a", "1/1/2000", 1.0216), (10516L, "a", "1/2/2000", 1.0216),
      (10516L, "a", "1/3/2000", 1.028), (10516L, "a", "1/4/2000", 1.028),
      (10516L, "b", "1/1/2000", 1.0616), (10516L, "b", "1/2/2000", 1.0616),
      (10516L, "b", "1/3/2000", 1.068), (10516L, "b", "1/4/2000", 1.068),
      (10517L, "a", "1/1/2000", 1.1016000000000001), (10517L, "a", "1/2/2000", 1.1016000000000001),
      (10517L, "a", "1/3/2000", 1.108), (10517L, "a", "1/4/2000", 1.108)
    ).toDF("PERMNO", "byvar", "Date", "RET")
    assertSame(out, expect, tol = 1e-3)
  }

  test("winsorize without byvars keeps a distributed plan and clamps whole-frame") {
    val s = spark; import s.implicits._
    // force the distributed percentile path (the size-adaptive default
    // would route this 100-row frame to the builtin aggregate)
    s.conf.set("graft.percentiles.distributedThresholdBytes", "0")
    try {
    val df = (1 to 100).map(i => (i.toLong, i.toDouble)).toDF("id", "x")
    val out = Winsorize.winsorize(df, (0.05, 0.05), Seq("x"), Nil)
    val xs = out.select("x").collect().map(_.getDouble(0))
    // q0.95 of 1..100 (linear) = 95.05; q0.05 of the top-clamped data
    assert(xs.max <= 95.0500001)
    assert(xs.min >= 5.9499999 - 1e-6)
    // the data-sized stages stay distributed: the only windows are the
    // Percentiles rank windows partitioned by __pid__ and the
    // global prefix/total windows over the (numPartitions x groups)-row
    // per-partition-totals aggregate — never the raw rows
    val plan = out.queryExecution.executedPlan.toString
    val windowLines = plan.linesIterator.filter(_.contains("Window [")).toSeq
    val unpart = windowLines.filterNot(_.contains("], [__pid__"))
    assert(unpart.forall(_.contains("__pc__")),
      s"global window over something other than the tiny offsets frame:\n$plan")
    assert(plan.contains("HashAggregate(keys=[__pid__"),
      s"offsets windows not fed by the per-partition-totals aggregate:\n$plan")
    } finally s.conf.unset("graft.percentiles.distributedThresholdBytes")
  }

  test("fused distributed bounds are bit-identical to the builtin two-pass form") {
    val s = spark; import s.implicits._
    // messy mix: duplicates, negatives, ties at the cut positions,
    // plus null/NaN rows that must stay excluded from BOTH passes
    val df = (0 until 800).map { i =>
      val g = s"g${i % 3}"
      val v: java.lang.Double = (i * 37 % 97) match {
        case m if m < 8  => null
        case m if m < 12 => Double.NaN
        case m if m < 30 => m.toDouble
        case m if m < 60 => -math.Pi * m
        case m           => math.sqrt(m.toDouble) * 100
      }
      (i.toLong, g, v)
    }.toDF("id", "g", "v")
    def run() = Winsorize.winsorize(df, (0.1, 0.1), Seq("v"), Seq("g"))
      .select("id", "v").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    val builtin = run() // default threshold: builtin two-pass
    s.conf.set("graft.percentiles.distributedThresholdBytes", "0")
    val fused = try run() finally s.conf.unset("graft.percentiles.distributedThresholdBytes")
    assert(fused.keySet == builtin.keySet)
    fused.foreach { case (id, fv) =>
      val bv = builtin(id)
      if (fv == null || bv == null) assert(fv == null && bv == null, s"id=$id: $fv vs $bv")
      else assert(
        java.lang.Double.doubleToLongBits(fv.asInstanceOf[Double]) ==
          java.lang.Double.doubleToLongBits(bv.asInstanceOf[Double]) ||
          (fv.asInstanceOf[Double].isNaN && bv.asInstanceOf[Double].isNaN),
        s"id=$id: fused=$fv builtin=$bv")
    }
  }

  test("null and NaN rows never feed the bottom percentile as clamped hi values") {
    val s = spark; import s.implicits._
    // 10 clean values 1..10 plus 5 nulls and 5 NaNs. If null/NaN rows
    // leaked into pass 2 as `hi`, N would inflate from 10 to 20 and
    // the bottom cut would shift from q0.2 of {1..8(clamped)} to a
    // visibly different value.
    val clean = (1 to 10).map(i => (i.toLong, i.toDouble: java.lang.Double))
    val dirty = (11 to 15).map(i => (i.toLong, null: java.lang.Double)) ++
      (16 to 20).map(i => (i.toLong, Double.NaN: java.lang.Double))
    val df = (clean ++ dirty).toDF("id", "x")
    val out = Winsorize.winsorize(df, (0.2, 0.2), Seq("x"), Nil)
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    // hi = q0.8 of 1..10 = 8.2; clamped = {1..8, 8.2, 8.2};
    // lo = q0.2 of that = 2.8; so x=1,2 -> 2.8
    assert(math.abs(out(1L).asInstanceOf[Double] - 2.8) < 1e-9)
    assert(math.abs(out(2L).asInstanceOf[Double] - 2.8) < 1e-9)
    assert(out(11L) == null)                      // nulls untouched
    assert(out(16L).asInstanceOf[Double].isNaN)   // NaN untouched
  }

  test("single-tail winsorize leaves the other tail untouched") {
    val s = spark; import s.implicits._
    val df = (1 to 10).map(i => (i.toLong, i.toDouble)).toDF("id", "x")
    val out = Winsorize.winsorize(df, (0.2, 0.2), Seq("x"), Nil, bot = false, top = true)
    val xs = out.select("x").collect().map(_.getDouble(0))
    assert(xs.min == 1.0)
    assert(xs.max < 10.0)
  }
}

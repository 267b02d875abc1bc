package graft

import org.apache.spark.sql.functions._

import graft.operators.RangeJoin

/** Bucketized point-in-interval range join: equivalence to the naive
  * non-equi join (which is the SEMANTIC spec but plans a nested
  * loop), boundary inclusivity, negative axis, and the linear plan
  * shape that justifies the operator.
  */
class RangeJoinSpec extends SparkSuite {

  test("matches the naive non-equi join on random data, all bucket widths") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(7)
    val pts = (1 to 400).map(i => (i.toLong, rnd.between(-50L, 150L), rnd.nextInt(3).toLong))
      .toDF("pid", "p", "k")
    val ivs = (1 to 60).map { i =>
      val st = rnd.between(-60L, 140L)
      (i.toLong, st, st + rnd.between(0L, 40L), rnd.nextInt(3).toLong)
    }.toDF("iid", "s", "e", "k")
    val naive = pts.join(ivs, Seq("k")).where(col("p") >= col("s") && col("p") <= col("e"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (bw <- Seq(1L, 7L, 64L)) {
      val got = RangeJoin.pointInInterval(pts, ivs, "p", "s", "e", Seq("k"), bw)
        .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == naive, s"bucketWidth=$bw diverges from the naive join")
    }
    // and without equi keys
    val naiveNoKey = pts.drop("k").join(ivs.drop("k"))
      .where(col("p") >= col("s") && col("p") <= col("e"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val gotNoKey = RangeJoin.pointInInterval(pts.drop("k"), ivs.drop("k"), "p", "s", "e", Nil, 16L)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(gotNoKey == naiveNoKey)
  }

  test("bounds are inclusive on both ends; nulls match nothing") {
    val s = spark; import s.implicits._
    val pts = Seq((1L, Some(10L)), (2L, Some(20L)), (3L, None), (4L, Some(15L)))
      .toDF("pid", "p")
    val ivs = Seq((100L, Some(10L), Some(20L)), (200L, None, Some(20L)))
      .toDF("iid", "s", "e")
    val got = RangeJoin.pointInInterval(pts, ivs, "p", "s", "e", Nil, 5L)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 100L), (2L, 100L), (4L, 100L)))
  }

  test("intervalOverlap matches the naive overlap join, each pair exactly once") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(11)
    def ivs(pfx: String, n: Int) = (1 to n).map { i =>
      val st = rnd.between(-40L, 120L)
      (s"$pfx$i", st, st + rnd.between(0L, 30L), rnd.nextInt(2).toLong)
    }
    val a = ivs("a", 80).toDF("aid", "as", "ae", "k")
    val b = ivs("b", 80).toDF("bid", "bs", "be", "k")
    val naive = a.join(b, Seq("k")).where(col("as") <= col("be") && col("bs") <= col("ae"))
      .select("aid", "bid").collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(naive.distinct.size == naive.size)
    for (bw <- Seq(1L, 8L, 50L)) {
      val got = RangeJoin.intervalOverlap(a, b, "as", "ae", "bs", "be", Seq("k"), bw)
        .select("aid", "bid").collect().map(r => (r.getString(0), r.getString(1))).toSeq
      assert(got.distinct.size == got.size, s"bw=$bw emits duplicate pairs")
      assert(got.toSet == naive.toSet, s"bw=$bw diverges from the naive overlap join")
    }
  }

  test("plans an equi join on the cell — no nested loop, no cartesian") {
    val s = spark; import s.implicits._
    val pts = (1 to 100).map(i => (i.toLong, i.toLong)).toDF("pid", "p")
    val ivs = (1 to 10).map(i => (i.toLong, i * 10L, i * 10L + 5L)).toDF("iid", "s", "e")
    val plan = RangeJoin.pointInInterval(pts, ivs, "p", "s", "e", Nil, 8L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join degenerated to a quadratic join:\n$plan")
    assert(plan.contains("__cell__"), s"no cell key in the join:\n$plan")
  }
}

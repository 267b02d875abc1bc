package graft

import org.apache.spark.sql.functions._

import graft.operators.Percentiles

/** The no-cleanup conveniences must park their release handles in
  * [[Cleanup]] instead of leaking persists (ADVICE r11), and draining
  * must be safe while the returned frames are still referenced.
  */
class CleanupSpec extends SparkSuite {

  test("convenience operators park release handles; drain is safe while frames live") {
    val s = spark; import s.implicits._
    Cleanup.drain() // isolate from other suites
    val df = (1 to 100).map(i => (s"g${i % 3}", i.toDouble)).toDF("g", "v")
    val before = Cleanup.pendingCount
    val cuts = Percentiles.cuts(df, col("v"), Seq("g"), Seq(0.5))
    assert(Cleanup.pendingCount == before + 1,
      "the no-cleanup convenience must register its release handle")
    val r1 = cuts.collect()
    Cleanup.drain()
    assert(Cleanup.pendingCount == 0)
    // the frame survives the drain: persists recompute, never fail
    assert(cuts.collect().sameElements(r1))
    Cleanup.drain() // idempotent
  }
}

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
    Cleanup.drainAll() // isolate from other suites
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

  test("checkpoint-releasing conveniences are fragile-tier: drain() leaves frames usable (ADVICE r12)") {
    val s = spark; import s.implicits._
    Cleanup.drainAll() // isolate from other suites
    // connectedComponents' convenience parks a handle that releases
    // localCheckpoint blocks — running it under a live frame would
    // FAIL later actions (lineage truncated), so the anytime-safe
    // drain() must leave it parked; only drainAll() may run it.
    // Force the distributed (checkpointing) path: localSolveMaxEdges=0.
    val edges = (1 until 40).map(i => (i.toLong, i.toLong + 1)).toDF("a", "b")
    val cc = graft.pipeline.Dedup.connectedComponents(edges, "a", "b", localSolveMaxEdges = 0)
    assert(Cleanup.fragileCount == 1,
      "connectedComponents must park its checkpoint release in the fragile tier")
    Cleanup.drain() // the documented "safe at any time" drain
    assert(Cleanup.fragileCount == 1, "drain() must not run fragile handles")
    // the frame is STILL fully consumable after the safe drain
    assert(cc.count() == 40)
    assert(cc.collect().forall(_.getLong(1) == 1L))
    val persisted = spark.sparkContext.getPersistentRDDs.keySet
    Cleanup.drainAll()
    assert(Cleanup.pendingCount == 0 && Cleanup.fragileCount == 0)
    assert((spark.sparkContext.getPersistentRDDs.keySet -- persisted).isEmpty &&
      spark.sparkContext.getPersistentRDDs.size < persisted.size,
      "drainAll must actually release the parked checkpoint blocks")
  }
}

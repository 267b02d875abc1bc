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

  test("owner scopes isolate a thread's handles from concurrent drain() (ADVICE r15, r16)") {
    Cleanup.drainAll() // isolate from other suites
    var releasedOwned = 0
    var releasedGlobal = 0
    // the managed-stream shape: a daemon parks caches under its owner
    // scope while the trigger thread drains the global tier per batch
    Cleanup.scoped("ivf-maintain-test") {
      Cleanup.defer(() => releasedOwned += 1)
      // nested scope attributes to the INNER owner and restores
      Cleanup.scoped("inner") { Cleanup.defer(() => releasedOwned += 10) }
      Cleanup.defer(() => releasedOwned += 1)
    }
    Cleanup.defer(() => releasedGlobal += 1) // outside any scope
    assert(Cleanup.pendingCount == 4)
    Cleanup.drain() // another thread's anytime drain
    assert(releasedGlobal == 1 && releasedOwned == 0,
      "drain() must not release owner-scoped handles")
    Cleanup.drainOwner("inner")
    assert(releasedOwned == 10)
    Cleanup.drainOwner("ivf-maintain-test")
    assert(releasedOwned == 12)
    assert(Cleanup.pendingCount == 0)
    Cleanup.drainOwner("ivf-maintain-test") // idempotent
    // drainAll sweeps owner scopes too (end-of-session)
    Cleanup.scoped("leftover") { Cleanup.defer(() => releasedOwned += 100) }
    Cleanup.drainAll()
    assert(releasedOwned == 112 && Cleanup.pendingCount == 0)
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

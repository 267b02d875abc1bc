package graft

/** Session-lifetime registry for the cache-release handles the
  * no-cleanup operator conveniences would otherwise discard.
  *
  * Every `xyzWithCleanup` operator returns `(frame, release)` where
  * `release` unpersists the operator's internal MEMORY_AND_DISK
  * state; the convenience forms (`Percentiles.cuts`,
  * `Winsorize.winsorize`, `Dedup.minhashCandidates`, ...) used to
  * drop the handle, so a long-lived session accumulated cached
  * frames indefinitely (ADVICE r11). They now park the handle here.
  *
  * Handles come in two tiers, because their failure modes differ:
  *
  *  - [[defer]] — handles releasing plain persist CACHES. Dropping
  *    one while its frame is still referenced makes later actions
  *    silently RECOMPUTE (cost: time, never correctness).
  *    [[drain]] runs exactly these and is safe at ANY time — after
  *    an action, between pipeline stages, on a scheduler tick.
  *  - [[deferFragile]] — handles releasing `localCheckpoint` blocks
  *    (the iterative operators' conveniences: `connectedComponents`,
  *    `nearDupGroups`, `pageRank`). A local checkpoint TRUNCATES
  *    lineage, so releasing it under a still-unconsumed frame makes
  *    later actions FAIL with missing-block errors instead of
  *    recomputing. [[drain]] deliberately leaves these parked;
  *    [[drainAll]] runs them too and must only be called once every
  *    frame obtained from a convenience operator so far has been
  *    fully consumed (end of a batch/session is the natural point).
  *
  * Thread-safe; drain order is registration order within each tier.
  */
object Cleanup {

  private val pending = new java.util.concurrent.ConcurrentLinkedQueue[() => Unit]()
  private val fragilePending = new java.util.concurrent.ConcurrentLinkedQueue[() => Unit]()

  /** Park a persist-cache release handle for a later [[drain]]. */
  def defer(release: () => Unit): Unit = { pending.add(release); () }

  /** Park a handle that releases `localCheckpoint` blocks — run only
    * by [[drainAll]], never by the anytime-safe [[drain]].
    */
  def deferFragile(release: () => Unit): Unit = { fragilePending.add(release); () }

  /** Run and clear every parked persist-cache handle (safe at any
    * time — a drained-too-early frame recomputes, never fails).
    * Checkpoint-releasing handles stay parked; see [[drainAll]].
    */
  def drain(): Unit = {
    var f = pending.poll()
    while (f != null) { f(); f = pending.poll() }
  }

  /** [[drain]] plus the checkpoint-releasing handles. Only safe once
    * every frame handed out by a convenience operator so far has
    * been fully consumed — a released checkpoint cannot recompute.
    */
  def drainAll(): Unit = {
    drain()
    var f = fragilePending.poll()
    while (f != null) { f(); f = fragilePending.poll() }
  }

  /** Handles currently parked across both tiers (monitoring / test
    * hook); [[fragileCount]] isolates the checkpoint tier.
    */
  def pendingCount: Int = pending.size() + fragilePending.size()

  /** Checkpoint-releasing handles currently parked. */
  def fragileCount: Int = fragilePending.size()
}

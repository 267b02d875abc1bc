package graft

/** Session-lifetime registry for the cache-release handles the
  * no-cleanup operator conveniences would otherwise discard.
  *
  * Every `xyzWithCleanup` operator returns `(frame, release)` where
  * `release` unpersists the operator's internal MEMORY_AND_DISK
  * caches; the convenience forms (`Percentiles.cuts`,
  * `Winsorize.winsorize`, `Dedup.minhashCandidates`, ...) used to
  * drop the handle, so a long-lived session accumulated cached
  * frames indefinitely (ADVICE r11). They now park the handle here;
  * call [[drain]] at any natural batch boundary (after an action,
  * between pipeline stages, on a scheduler tick).
  *
  * Draining is safe at ANY time: the handles release persist CACHES,
  * never checkpoints, so a still-referenced frame silently recomputes
  * instead of failing — the cost of draining too early is time, not
  * correctness. Thread-safe; drain order is registration order.
  */
object Cleanup {

  private val pending = new java.util.concurrent.ConcurrentLinkedQueue[() => Unit]()

  /** Park a release handle for a later [[drain]]. */
  def defer(release: () => Unit): Unit = { pending.add(release); () }

  /** Run and clear every parked release handle. */
  def drain(): Unit = {
    var f = pending.poll()
    while (f != null) { f(); f = pending.poll() }
  }

  /** Handles currently parked (monitoring / test hook). */
  def pendingCount: Int = pending.size()
}

package graft.queries

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Lifecycle tracking for the query builders' `localCheckpoint` sites.
  *
  * Several dedup/corpus pipelines materialize a shared subplan once via
  * `localCheckpoint(eager = true)` (Catalyst does not share subplans, so a
  * self-join's two roles would otherwise recompute the encode — measured
  * ~1.5× the query cost). The checkpointed RDD blocks, however, live in
  * storage memory until the SESSION ends: a long-lived session running
  * these queries repeatedly would accumulate dead blocks until eviction
  * churn. `localCheckpoint` does not ride the CacheManager, so
  * `Dataset.unpersist` cannot release it — the backing RDD must be
  * unpersisted directly.
  *
  * Tracking is scoped PER QUERY, not per session: queries are built on the
  * driver, so each building thread gets an implicit [[Scope]] and
  * [[release]] frees only the calling thread's scope. Two queries running
  * concurrently from different threads can therefore never free each
  * other's live blocks (a localCheckpoint is not recomputable — freeing an
  * in-flight query's blocks fails its dependent stages rather than
  * recomputing). For builds whose release happens on a different thread,
  * [[begin]] returns an explicit handle whose `release()` frees exactly
  * that build's checkpoints from anywhere.
  *
  * Every builder routes through [[checkpoint]], which records the
  * checkpointed plan's backing RDD in the current scope; terminal-action
  * owners (Verify, Bench, tests, user code) call [[release]] (or the
  * handle's `release()`) once a query's action completes. Releasing is
  * safe at any point after the action: the checkpoint only exists to share
  * work WITHIN one query execution.
  *
  * Known trade-off, inherited from the eager checkpoint itself: the
  * materialization runs Spark jobs at plan-CONSTRUCTION time (plan dumps
  * pay it too), and a local checkpoint is not fault-tolerant — losing an
  * executor after materialization fails dependent stages instead of
  * recomputing. On the 100 TB cluster path, prefer rerunning the query
  * over reliable `checkpoint()` (which would write the corpus encode to
  * the cluster FS every run).
  */
object Checkpoints {

  /** One query build's tracked checkpoints; `release()` frees exactly
    * these, from any thread.
    */
  final class Scope private[Checkpoints] () {
    private[Checkpoints] val rdds = scala.collection.mutable.Buffer.empty[RDD[_]]
    def release(): Unit = Checkpoints.releaseScope(this)
    def trackedCount: Int = Checkpoints.synchronized(rdds.size)
  }

  /** All scopes with un-released checkpoints (insertion-ordered for
    * deterministic tests). A scope abandoned by a dying thread without
    * release persists here until session end — the same bound the old
    * session-global registry had.
    */
  private val scopes = scala.collection.mutable.LinkedHashSet.empty[Scope]
  private val current = new ThreadLocal[Scope]

  private def currentScope(): Scope = synchronized {
    val cur = current.get()
    // A released scope is not reused: the next checkpoint on this thread
    // (= the next query build) opens a fresh one.
    if (cur != null && scopes.contains(cur)) cur
    else {
      val s = new Scope
      scopes += s
      current.set(s)
      s
    }
  }

  /** Open a fresh scope for the calling thread and return its handle —
    * for callers that build on one thread and release from another.
    * Subsequent [[checkpoint]] calls on this thread land in it until it is
    * released (or another `begin`).
    */
  def begin(): Scope = synchronized {
    val s = new Scope
    scopes += s
    current.set(s)
    s
  }

  /** Run `body` in a fresh scope and release exactly that scope's
    * checkpoints afterwards, restoring the calling thread's previous scope
    * — for library entry points (e.g. [[RepeatStream.emitNext]]) that may
    * be composed INSIDE another query build on the same thread: the outer
    * build's live localCheckpoints survive, and its subsequent
    * [[checkpoint]] calls keep landing in its own scope.
    */
  def scoped[T](body: => T): T = {
    val prev = current.get()
    val s = begin()
    try body
    finally {
      releaseScope(s)
      current.set(prev)
    }
  }

  /** `df.localCheckpoint(eager = true)` with its backing RDD recorded in
    * the calling thread's current scope for a later [[release]].
    */
  def checkpoint(df: DataFrame): DataFrame = {
    val cp = df.localCheckpoint(true)
    val rdd = cp.queryExecution.analyzed.collectFirst { case lr: LogicalRDD => lr.rdd }
    val s = currentScope()
    synchronized { rdd.foreach(s.rdds += _) }
    cp
  }

  private def releaseScope(s: Scope): Unit = synchronized {
    s.rdds.foreach(r => try r.unpersist(blocking = false) catch { case _: Exception => () })
    s.rdds.clear()
    scopes -= s
  }

  /** Unpersist the CALLING THREAD's tracked checkpoints. Checkpoints made
    * by other threads' in-flight queries are untouched. Idempotent;
    * blocking is unnecessary (freeing storage is advisory for
    * correctness).
    */
  def release(): Unit = {
    val s = synchronized { Option(current.get()).filter(scopes.contains) }
    s.foreach(releaseScope)
  }

  /** Unpersist EVERY scope's checkpoints — a drain point for harnesses
    * (test settle, session shutdown) that know no graft query is in
    * flight on any thread. Not for per-query cleanup: that is [[release]]
    * or a [[begin]] handle.
    */
  def releaseAll(): Unit = {
    val all = synchronized(scopes.toList)
    all.foreach(releaseScope)
    // The pinned PCA scatter cache deliberately survives per-query
    // release(); a full drain frees it too (advisor r10: otherwise a
    // long-lived session over many dirs accumulates unreleasable storage).
    Similarity.releaseScatterCache()
  }

  /** Total un-released checkpoints across all scopes — test hook. */
  def trackedCount: Int = synchronized(scopes.iterator.map(_.rdds.size).sum)
}

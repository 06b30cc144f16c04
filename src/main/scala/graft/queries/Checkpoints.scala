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
  * Every builder routes through [[checkpoint]], which records the
  * checkpointed plan's backing RDD; terminal-action owners (Verify, Bench,
  * tests, user code) call [[release]] once a query's action completes.
  * Releasing is safe at any point after the action: the checkpoint only
  * exists to share work WITHIN one query execution.
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

  private val tracked = scala.collection.mutable.Buffer.empty[RDD[_]]

  /** `df.localCheckpoint(eager = true)` with its backing RDD recorded for
    * a later [[release]].
    */
  def checkpoint(df: DataFrame): DataFrame = {
    val cp = df.localCheckpoint(true)
    val rdd = cp.queryExecution.analyzed.collectFirst { case lr: LogicalRDD => lr.rdd }
    synchronized { rdd.foreach(tracked += _) }
    cp
  }

  /** Unpersist every tracked checkpoint's blocks. Idempotent; blocking is
    * unnecessary (freeing storage is advisory for correctness).
    */
  def release(): Unit = synchronized {
    tracked.foreach(r => try r.unpersist(blocking = false) catch { case _: Exception => () })
    tracked.clear()
  }

  /** Number of currently tracked (un-released) checkpoints — test hook. */
  def trackedCount: Int = synchronized(tracked.size)
}

package graft.core

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/**
 * Cache-lifetime ownership for query-built DataFrames (VERDICT r06 nit 1).
 *
 * Several query compositions persist an intermediate because more than one
 * consumer inside ONE action would otherwise re-execute it (the ML events
 * slice, the two-pass rank materialization, the collapsed dedup universe),
 * and the iterative-components loop leaves its final round as a
 * checkpointed RDD. A lazy DataFrame cannot release those itself —
 * unpersisting before the caller's action would undo the persist — so
 * ownership must sit with whoever knows when the action is over:
 *
 *  - long-lived schedulers ([[graft.workers.MlModelJobs]]) thread a
 *    [[CacheScope]] through the build explicitly and `release()` after
 *    materializing their output table;
 *  - the `SparkEntry.queries` map (driver contract: a `(session, dir) =>
 *    DataFrame` with exactly one materializing action per constructed
 *    relation) wraps each build in [[owned]], which exposes a THREAD-LOCAL
 *    scope that persisting components report into by default (via
 *    [[report]] / [[reportRdd]] — so every component in the repo
 *    participates without explicit threading at each of its call sites)
 *    and registers a one-shot listener that unpersists the collected
 *    caches as soon as the FIRST action over the returned plan completes —
 *    success or failure. The harness's `clearCache()` between queries
 *    remains a convenience, not the ownership mechanism, so embedding
 *    these queries in a long-lived server no longer accumulates dead
 *    cached relations.
 *
 * Contract of [[owned]]: one materializing action per constructed
 * DataFrame. Re-running an action on the SAME object after the first
 * completes recomputes from source — correct for pure plans, but the
 * rank-based compositions pin driver-collected offsets to one specific
 * materialization ([[graft.operators.Quantiles]]), so a second action on
 * a stale object is API misuse: construct a fresh DataFrame instead
 * (Verify and Bench both do).
 */
object QueryCaches {

  /** Per-job cache collector (the MlModelJobs tracker, promoted to core):
    * `collect` every relation a build persists, `release` after the job's
    * output is materialized. */
  final class CacheScope {
    private val pending = scala.collection.mutable.ArrayBuffer.empty[() => Unit]
    def collect(df: DataFrame): Unit = synchronized { pending += (() => df.unpersist(false)) }
    def collectRdd(rdd: RDD[_]): Unit = synchronized { pending += (() => { rdd.unpersist(false); () }) }
    def isEmpty: Boolean = synchronized(pending.isEmpty)
    def release(): Unit = synchronized {
      pending.foreach(f => try f() catch { case _: Throwable => () })
      pending.clear()
    }
  }

  // the scope of the `owned` build currently running on this thread, if
  // any — query construction is synchronous driver-side code, so a
  // DynamicVariable is exactly the right carrier
  private val active = new scala.util.DynamicVariable[Option[CacheScope]](None)

  /** Default cache-report hook for persisting components: hand the persist
    * to the enclosing [[owned]] build's scope. Outside any `owned` build
    * this is a no-op — explicit callers (MlModelJobs) pass their own
    * collector instead. */
  def report(df: DataFrame): Unit = active.value.foreach(_.collect(df))

  /** [[report]] for RDD-level caches (localCheckpoint/checkpoint blocks —
    * the iterative-components round state). */
  def reportRdd(rdd: RDD[_]): Unit = active.value.foreach(_.collectRdd(rdd))

  /** Build a query DataFrame whose persisted intermediates are released
    * automatically after the first completed action over the returned
    * plan. Builds that persist nothing pay nothing (no listener is
    * registered). */
  def owned(s: SparkSession)(build: => DataFrame): DataFrame = {
    val scope = new CacheScope
    val df = active.withValue(Some(scope))(build)
    if (!scope.isEmpty) releaseAfterFirstAction(s, df, scope)
    df
  }

  /** One-shot auto-release: unpersist the scope when an action whose
    * analyzed plan contains this DataFrame's plan completes. Matching is
    * by object identity first (DataFrameWriter and direct actions reuse
    * the Dataset's analyzed plan object) with a canonicalized
    * `sameResult` fallback for commands that re-analyze. */
  def releaseAfterFirstAction(s: SparkSession, df: DataFrame, scope: CacheScope): Unit = {
    val target = df.queryExecution.analyzed
    val fired = new java.util.concurrent.atomic.AtomicBoolean(false)
    lazy val listener: QueryExecutionListener = new QueryExecutionListener {
      private def hit(qe: QueryExecution): Boolean =
        try qe.analyzed.exists(p => (p eq target) || p.sameResult(target))
        catch { case _: Throwable => false }
      private def maybeRelease(qe: QueryExecution): Unit =
        if (hit(qe) && fired.compareAndSet(false, true)) {
          scope.release()
          s.listenerManager.unregister(listener)
        }
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
        maybeRelease(qe)
      override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit =
        maybeRelease(qe)
    }
    s.listenerManager.register(listener)
  }
}

package graft

import java.util.concurrent.atomic.AtomicBoolean

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Cache ownership for the bare convenience wrappers (`Dedup.minhashLsh`,
  * `TextAnalysis.tfidfTopTerms`, `Similarity.cosineLshPairs`): their
  * internal frames must be persisted (multiple branches re-read them), but
  * a bare `persist()` with no owner accretes executor storage across a
  * long-lived session. The `*Cached` variants hand the caller a release
  * handle; this closes the loop for the handle-less forms — a
  * QueryExecutionListener watches for the FIRST action whose analyzed plan
  * contains the wrapped result and drops the internal cache then,
  * unregistering itself.
  *
  * Best-effort by design: an action that bypasses the SQL execution path
  * (e.g. consuming `result.rdd` directly) never fires a
  * QueryExecutionListener; a result that is never materialized has its
  * cache released anyway after [[AutoRelease.MaxUnmatchedScans]] unrelated
  * queries complete (the internal frames are `persist()`ed, never
  * lineage-truncated, so a later action simply recomputes — strictly
  * better than the pre-existing leak-until-session-end). Two CONCURRENT
  * bare calls with identical arguments have `sameResult` plans, so the
  * first one materialized can release both caches — the second recomputes
  * uncached (correct, slower). Multi-pass or concurrent-identical
  * consumers should use the `*Cached` variants and release explicitly.
  * Listener callbacks run on the listener bus AFTER the action returns,
  * so release is asynchronous — tests poll.
  */
private[graft] object AutoRelease {

  /** After this many completed queries NONE of which materialized the
    * wrapped result, release the cache and unregister anyway — bounds both
    * the leaked cache and the per-query sameResult scan of a result that
    * was built and abandoned. */
  private val MaxUnmatchedScans = 200

  /** Return `result` unchanged, releasing `release` after the first
    * completed (or failed) action that materializes it. */
  def onFirstMaterialize(result: DataFrame, release: () => Unit): DataFrame = {
    val session = result.sparkSession
    val target = result.queryExecution.analyzed
    val fired = new AtomicBoolean(false)
    val misses = new java.util.concurrent.atomic.AtomicInteger(0)
    lazy val listener: QueryExecutionListener = new QueryExecutionListener {
      private def maybe(qe: QueryExecution): Unit = {
        val hit =
          try qe.analyzed.exists(p => p.sameResult(target))
          catch { case _: Throwable => false }
        val abandoned = !hit && misses.incrementAndGet() >= MaxUnmatchedScans
        if ((hit || abandoned) && fired.compareAndSet(false, true)) {
          try release()
          finally {
            try session.listenerManager.unregister(listener)
            catch { case _: Throwable => () }
          }
        }
      }
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
        maybe(qe)
      override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit =
        maybe(qe)
    }
    session.listenerManager.register(listener)
    result
  }
}

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
  * QueryExecutionListener, and a result that is never materialized keeps
  * its cache until session end — exactly the pre-existing behavior.
  * Multi-pass consumers should use the `*Cached` variants and release
  * explicitly (after the first action the internal cache is gone and later
  * passes recompute from source). Listener callbacks run on the listener
  * bus AFTER the action returns, so release is asynchronous — tests poll.
  */
private[graft] object AutoRelease {

  /** Return `result` unchanged, releasing `release` after the first
    * completed (or failed) action that materializes it. */
  def onFirstMaterialize(result: DataFrame, release: () => Unit): DataFrame = {
    val session = result.sparkSession
    val target = result.queryExecution.analyzed
    val fired = new AtomicBoolean(false)
    lazy val listener: QueryExecutionListener = new QueryExecutionListener {
      private def maybe(qe: QueryExecution): Unit = {
        val hit =
          try qe.analyzed.exists(p => p.sameResult(target))
          catch { case _: Throwable => false }
        if (hit && fired.compareAndSet(false, true)) {
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

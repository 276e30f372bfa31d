package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Stage-level resume for multi-stage pipelines (near-dup removal,
  * decontamination): each expensive intermediate (verified pairs, CC
  * labels, flagged ids) is materialized through the [[TableIO]] seam under
  * `(dir, runId)` with a DONE marker written only after the stage's data is
  * fully on storage. A re-run of the same `(dir, runId)` reads completed
  * stages back instead of recomputing — the pipeline analog of the
  * engine's bucket-granular [[Checkpoint]] (which resumes WITHIN the
  * validation scan; this resumes BETWEEN pipeline stages).
  *
  * Crash safety: a failure mid-write leaves stage data without its marker,
  * so the stage recomputes (mode=overwrite) on resume — never a partial
  * read. Markers are per-stage zero-byte files; storage is whatever
  * `TableIO` points at (Parquet here, Iceberg on a real cluster).
  * Determinism: every stage this engine persists is a deterministic
  * function of its inputs, so resumed and from-scratch runs produce
  * identical results — asserted by the kill-after-stage tests.
  */
final class StageRunner(
    spark: SparkSession,
    dir: String,
    runId: String,
    io: TableIO = TableIO.default) {

  // both interpolated path segments are validated HERE, once — `runId` is
  // the same public surface as stage names, and "$dir/$runId/…" with
  // runId ".." plus mode=overwrite would write (and first DELETE) outside
  // the stage directory entirely
  require(StageRunner.safeSegment(runId), s"unsafe runId: $runId")

  private def fs = new org.apache.hadoop.fs.Path(dir)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)
  private def stagePath(name: String) = s"$dir/$runId/$name"
  private def markerPath(name: String) =
    new org.apache.hadoop.fs.Path(s"$dir/$runId/_done_$name")

  /** Has `name` fully completed (data written AND marker present)? */
  def isDone(name: String): Boolean = fs.exists(markerPath(name))

  // (companion below defines safeSegment)

  /** Run (or resume) one stage: if its marker exists, read the materialized
    * frame back; otherwise compute, write, then mark. The returned frame is
    * always the STORAGE-backed read, so downstream stages never re-trigger
    * the compute lineage (and the write doubles as the persist the
    * non-resumable pipelines do in memory). */
  def stage(name: String)(compute: => DataFrame): DataFrame = {
    require(StageRunner.safeSegment(name), s"unsafe stage name: $name")
    if (!isDone(name)) {
      io.writer(compute, "overwrite").save(stagePath(name))
      fs.create(markerPath(name), true).close()
    }
    io.read(spark, stagePath(name))
  }
}

object StageRunner {
  /** One interpolated path segment: the safe char class MINUS the "." /
    * ".." traversal tokens (the class alone admits both). */
  private[graft] def safeSegment(s: String): Boolean =
    s.matches("[A-Za-z0-9_.-]+") && s.exists(_ != '.')
}

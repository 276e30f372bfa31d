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
  * read. Markers are per-stage files carrying the stage's parameter
  * fingerprint (see [[stage]]); storage is whatever `TableIO` points at
  * (Parquet here, Iceberg on a real cluster).
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
    * non-resumable pipelines do in memory).
    *
    * `params` is the stage's parameter fingerprint input: everything the
    * compute's OUTPUT depends on besides the run identity (thresholds,
    * numHashes, shingle size, input-table identifiers…). Its hash is
    * recorded inside the DONE marker; resuming the same `(dir, runId,
    * name)` with DIFFERENT params fails LOUDLY instead of silently serving
    * the stale stage output computed under the old parameters — re-running
    * with changed params needs a new runId (stage mixing across parameter
    * sets within one run is never coherent). Markers written before this
    * contract (empty) are treated as matching, preserving old runs. */
  def stage(name: String, params: Seq[Any] = Nil)(compute: => DataFrame): DataFrame = {
    require(StageRunner.safeSegment(name), s"unsafe stage name: $name")
    val fp = StageRunner.fingerprint(params)
    val mp = markerPath(name)
    if (isDone(name)) {
      val recorded = StageRunner.readFully(fs, mp)
      if (recorded.nonEmpty && recorded != fp)
        throw new IllegalStateException(
          s"stage '$name' of run '$runId' under $dir was completed with a different " +
            s"parameter fingerprint ($recorded; this call: $fp) — resuming would serve " +
            "output computed under the OLD parameters. Use a fresh runId (or delete " +
            s"$mp to force recompute) when parameters change.")
    } else {
      io.writer(compute, "overwrite").save(stagePath(name))
      StageRunner.writeFully(fs, mp, fp)
    }
    io.read(spark, stagePath(name))
  }

}

object StageRunner {
  /** One interpolated path segment: the safe char class MINUS the "." /
    * ".." traversal tokens (the class alone admits both). */
  private[graft] def safeSegment(s: String): Boolean =
    s.matches("[A-Za-z0-9_.-]+") && s.exists(_ != '.')

  private[graft] def readFully(fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path): String = {
    val in = fs.open(p)
    try {
      val buf = new java.io.ByteArrayOutputStream()
      val chunk = new Array[Byte](4096)
      var n = in.read(chunk)
      while (n > 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
      new String(buf.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
    } finally in.close()
  }

  private[graft] def writeFully(fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path, content: String): Unit = {
    val out = fs.create(p, true)
    out.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    out.close()
  }

  /** Parameter fingerprint recorded in the DONE marker. NUL-joined toString
    * under md5 — collisions here would need adversarial parameter strings,
    * and the cost of one is a loud spurious mismatch, never a stale read. */
  private[graft] def fingerprint(params: Seq[Any]): String =
    if (params.isEmpty) "" else {
      val md = java.security.MessageDigest.getInstance("MD5")
      val joined = params.map(String.valueOf(_: Any)).mkString("\u0000")
      md.digest(joined.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        .map(b => f"$b%02x").mkString
    }
}

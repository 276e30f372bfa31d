package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.{StageRunner, TableIO}

/** Lifecycle of the STORED incremental-dedup indexes — the missing third
  * of the daily-ingest loop. [[Dedup.exactSignatures]] /
  * [[Dedup.minhashBandTable]] build an index ONCE; a daily pipeline must
  * then APPEND each accepted batch's signatures and band rows after the
  * gates pass, or tomorrow's ingest can't see today's corpus without a
  * full rebuild. This object owns that append.
  *
  * Layout (all through the [[TableIO]] seam — Parquet here, Iceberg on a
  * real cluster, where `batch` maps to a partition transform):
  * {{{
  *   <dir>/batch=<batchId>/…      one subdirectory per appended batch
  *   <dir>/_appended_<batchId>    DONE marker, written AFTER the data
  *   <dir>/_params                parameter fingerprint, pinned at birth
  * }}}
  *
  * EXACTLY-ONCE per (dir, batchId): each batch writes its own
  * subdirectory in OVERWRITE mode and the marker lands only after the
  * data is fully on storage — a crash mid-write leaves data without a
  * marker and the re-run overwrites the partial subdirectory; a re-run of
  * a COMPLETED batch sees the marker and appends nothing (returns false).
  * Underscore-prefixed marker/params files are invisible to the readers
  * (Spark skips `_`/`.` files), and the `batch=` directory names surface
  * as a partition column on read — harmless to the incremental ops, and a
  * retention job can drop whole expired batches by directory.
  *
  * PARAMETER SAFETY: band rows built with different (numHashes, bands,
  * shingleK) are mutually meaningless — the first append pins the index's
  * parameter fingerprint in `_params` and every later append verifies it,
  * failing loudly on mismatch (one logical writer per index per batch —
  * the daily-pipeline contract; concurrent first-appends racing the pin
  * are out of scope by design).
  *
  * Scale: an append writes ONLY the batch's rows (no read of the existing
  * index, no compaction); the read side stays the one-scan / zero-shuffle
  * store contract of [[Dedup.dropExactDupsAgainst]] /
  * [[Dedup.nearDupCandidatesAgainst]].
  */
object DedupIndex {

  private def hfs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Append the accepted batch's exact-content signatures. Returns true if
    * the batch was written, false if this (dir, batchId) already landed.
    * The signature `algo` (md5 default | sha256) is part of the parameter
    * fingerprint — digests from different algorithms can never silently
    * mix in one index (the "exact_sigs_md5" fingerprint stem predates the
    * parameter, so existing md5 indexes keep verifying). */
  def appendSignatures(accepted: DataFrame, textCol: String, idCol: String,
      dir: String, batchId: String, algo: String = "md5",
      io: TableIO = TableIO.default): Boolean =
    appendBatch(Dedup.exactSignatures(accepted, textCol, idCol, algo), dir, batchId,
      Seq(s"exact_sigs_$algo", textCol, idCol), io)

  /** Append the accepted batch's MinHash band rows. Parameters MUST equal
    * those of every prior append to this index (verified via `_params` —
    * including the SOURCE columns: band rows built over different document
    * representations are as mutually meaningless as different hash counts). */
  def appendBands(accepted: DataFrame, textCol: String, idCol: String,
      dir: String, batchId: String, numHashes: Int = 128, bands: Int = 32,
      shingleK: Int = 3, io: TableIO = TableIO.default): Boolean =
    appendBatch(
      Dedup.minhashBandTable(accepted, textCol, idCol, numHashes, bands, shingleK),
      dir, batchId,
      Seq("minhash_bands", textCol, idCol, numHashes, bands, shingleK), io)

  /** Append the accepted batch's sign-LSH EMBEDDING band rows — the index
    * behind [[Dedup.embedCandidatesAgainst]] /
    * [[Dedup.dropNearDupsByEmbeddingAgainst]]. Same parameter pinning:
    * (vec column, id column, bands, planesPerBand) are part of the
    * fingerprint, so an index can never silently mix plane geometries. */
  def appendEmbedBands(accepted: DataFrame, vecCol: String, idCol: String,
      dir: String, batchId: String, bands: Int = 8, planesPerBand: Int = 4,
      io: TableIO = TableIO.default): Boolean =
    appendBatch(
      Dedup.signLshBandTable(accepted, vecCol, idCol, bands, planesPerBand),
      dir, batchId,
      Seq("signlsh_bands", vecCol, idCol, bands, planesPerBand), io)

  /** Read the index's COMPLETED batches — feed this to
    * [[Dedup.dropExactDupsAgainst]] / [[Dedup.dropNearDupsAgainst]]. Reads
    * are MARKER-GATED: only `batch=` directories whose `_appended_` marker
    * landed are listed, so a crashed append's partially-committed data is
    * invisible until its retry overwrites and commits it (the same
    * discipline the write side promises, now enforced on read). */
  def readIndex(spark: SparkSession, dir: String,
      io: TableIO = TableIO.default): DataFrame = {
    val fs = hfs(spark, dir)
    val completed = fs.listStatus(new Path(dir)).map(_.getPath.getName)
      .filter(_.startsWith("_appended_")).map(_.stripPrefix("_appended_")).sorted
    require(completed.nonEmpty, s"no completed batches in the index at $dir")
    io.readUnder(spark, dir, completed.toSeq.map(b => s"$dir/batch=$b"))
  }

  /** Has any batch completed here? (False for a brand-new index dir — the
    * day-0 bootstrap case, where the gates have nothing to check against.) */
  def exists(spark: SparkSession, dir: String, batchId: String = ""): Boolean = {
    val fs = hfs(spark, dir)
    if (batchId.isEmpty) {
      val p = new Path(dir)
      fs.exists(p) && fs.listStatus(p).exists(_.getPath.getName.startsWith("_appended_"))
    } else fs.exists(new Path(s"$dir/_appended_$batchId"))
  }

  private def appendBatch(rows: DataFrame, dir: String, batchId: String,
      params: Seq[Any], io: TableIO): Boolean = {
    require(StageRunner.safeSegment(batchId), s"unsafe batchId: $batchId")
    val spark = rows.sparkSession
    val fs = hfs(spark, dir)
    val fp = StageRunner.fingerprint(params)
    val paramsPath = new Path(s"$dir/_params")
    if (fs.exists(paramsPath)) {
      val recorded = StageRunner.readFully(fs, paramsPath)
      if (recorded != fp)
        throw new IllegalStateException(
          s"index at $dir was built with a different parameter fingerprint " +
            s"($recorded; this append: $fp) — band/signature rows across " +
            "parameter sets are mutually meaningless. Rebuild the index or " +
            "match its parameters.")
    }
    val marker = new Path(s"$dir/_appended_$batchId")
    if (fs.exists(marker)) return false // completed batch: idempotent no-op
    // pin params BEFORE data: a crash after this point leaves a valid pin
    // (the fingerprint of what was being written), never a mismatched one
    if (!fs.exists(paramsPath)) StageRunner.writeFully(fs, paramsPath, fp)
    io.writer(rows, "overwrite").save(s"$dir/batch=$batchId")
    fs.create(marker, true).close()
    true
  }
}

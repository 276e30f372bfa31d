package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-partition (bucket) lineage + metrics checkpoint, enabling resume at
  * bucket granularity (north rule). Written as Parquet locally; the layout is
  * Iceberg-shaped (append-only fact keyed by (run_id, bucket_id)) so swapping
  * `format("parquet")` for `format("iceberg")` on a real cluster is a config
  * change — no Iceberg runtime jar ships in this sandbox (SURVEY.md §1.5).
  */
object Checkpoint {

  /** Append completed-bucket rows for `runId`. Caller passes the bucket
    * report (bucket_id, rows, pass, fail, fail_by_check, ...). */
  def write(report: DataFrame, path: String, runId: String): Unit =
    report
      .withColumn("run_id", lit(runId))
      .withColumn("completed_at", current_timestamp())
      .write.mode("append").partitionBy("run_id").parquet(path)

  /** Buckets already completed for `runId` (empty set if no checkpoint yet).
    * Bounded by nBuckets (≤ a few thousand), safe to collect. */
  def completedBuckets(spark: SparkSession, path: String, runId: String): Set[Int] = {
    // Hadoop FS probe, not java.io.File — the path may be hdfs://, s3a://, …
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Set.empty
    else {
      // a run that crashed before its first commit leaves the directory with
      // no data files — schema inference throws AnalysisException; treat as
      // "nothing completed". ONLY that case: a corrupt footer or transient
      // IO error must fail fast — swallowing it would silently resume from
      // zero, reprocess every bucket, and append duplicate lineage rows.
      val dfOpt =
        try Some(spark.read.parquet(path))
        catch { case _: org.apache.spark.sql.AnalysisException => None }
      dfOpt match {
        case None => Set.empty
        case Some(df) if !df.columns.contains("run_id") => Set.empty
        case Some(df) =>
          df.filter(col("run_id") === runId)
            .select("bucket_id").distinct()
            .collect().map(_.getInt(0)).toSet
      }
    }
  }

  /** Prune rows of already-completed buckets from the input. The filter is a
    * deterministic function of the key, so resumed runs see exactly the
    * complement of what completed runs saw — identical union regardless of
    * parallelism. With a bucket-partitioned table layout this predicate
    * becomes partition pruning at the source. */
  def resumeFilter(df: DataFrame, suite: CompiledSuite, done: Set[Int]): DataFrame =
    if (done.isEmpty) df
    else df.filter(!suite.bucketOf(col(suite.keyCol)).isin(done.toSeq: _*))
}

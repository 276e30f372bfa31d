package graft

import org.apache.spark.sql.{DataFrame, DataFrameWriter, Row, SparkSession}

/** Thin storage seam (SURVEY.md §1.5): production tables are Iceberg; this
  * sandbox has no Iceberg runtime jar, so the default is Parquet with an
  * Iceberg-compatible layout. Swapping `format` to "iceberg" (plus catalog
  * conf) is the only change needed on a real cluster — every reader/writer
  * in the engine goes through here.
  */
final case class TableIO(format: String = TableIO.defaultFormat) {

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.format(format).load(path)

  /** Read an explicit subset of a partitioned table's directories, keeping
    * the partition columns (via `basePath`). Lets marker-gated readers
    * serve only committed partitions — uncommitted directories are never
    * listed, so even footerless partial files can't break the read. */
  def readUnder(spark: SparkSession, basePath: String, paths: Seq[String]): DataFrame =
    spark.read.format(format).option("basePath", basePath).load(paths: _*)

  def writer(df: DataFrame, mode: String = "append"): DataFrameWriter[Row] =
    df.write.format(format).mode(mode)

  /** Write hash-bucketed by a stable key — the Parquet stand-in for Iceberg's
    * `bucket(N, col)` partition transform; enables bucket-level pruning on
    * resume and co-located reads. */
  def writeBucketed(df: DataFrame, path: String, bucketCol: String, mode: String = "overwrite"): Unit =
    writer(df, mode).partitionBy(bucketCol).save(path)

  /** TRUE Spark bucketing (`bucketBy` + `saveAsTable`): readers of the
    * catalog table carry HashPartitioning on the bucket key, so KEY-LOCAL
    * operations — the uniqueness groupBy, exact-dedup groupBy, co-located
    * key joins — run with ZERO exchange (PlanSpec asserts it). This is the
    * "store bucketed by doc_id and uniqueness never shuffles" path from the
    * scale notes; directory partitioning ([[writeBucketed]]) prunes scans
    * but cannot remove shuffles. Needs a table catalog (`saveAsTable`) —
    * on a real cluster, Iceberg's `bucket(N, col)` transform with
    * storage-partitioned joins plays this role. */
  def writeBucketedTable(df: DataFrame, table: String, bucketCol: String,
      numBuckets: Int, mode: String = "overwrite"): Unit =
    writer(df, mode).bucketBy(numBuckets, bucketCol).sortBy(bucketCol)
      .saveAsTable(table)
}

object TableIO {
  /** Overridable via system property for a cluster deployment. */
  def defaultFormat: String = sys.props.getOrElse("graft.table.format", "parquet")
  val default: TableIO = TableIO()
}

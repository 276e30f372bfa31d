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

  def writer(df: DataFrame, mode: String = "append"): DataFrameWriter[Row] =
    df.write.format(format).mode(mode)

  /** Write hash-bucketed by a stable key — the Parquet stand-in for Iceberg's
    * `bucket(N, col)` partition transform; enables bucket-level pruning on
    * resume and co-located reads. */
  def writeBucketed(df: DataFrame, path: String, bucketCol: String, mode: String = "overwrite"): Unit =
    writer(df, mode).partitionBy(bucketCol).save(path)
}

object TableIO {
  /** Overridable via system property for a cluster deployment. */
  def defaultFormat: String = sys.props.getOrElse("graft.table.format", "parquet")
  val default: TableIO = TableIO()
}

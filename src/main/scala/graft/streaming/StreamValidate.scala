package graft.streaming

import graft._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, Trigger}
import org.apache.spark.sql.Row

/** Structured-Streaming face of the engine.
  *
  * The constraint→Column compiler is batch/stream agnostic: the same
  * CompiledSuite annotates a streaming DataFrame. Two modes:
  *
  *  - `violationsStream`: fully incremental — row-local checks only (they
  *    are per-row pure, so append-mode safe with no state).
  *  - `validateForeachBatch`: the full suite (incl. cross-row uniqueness /
  *    referential / drift) per micro-batch via foreachBatch, appending each
  *    batch's violations + bucket report to sinks. Cross-batch uniqueness
  *    at 10^12 scale belongs to the batch layer (or a state store keyed by
  *    doc_id — deliberately not in v0; documented scale trade-off).
  */
object StreamValidate {

  /** Row-local violations as an append-mode streaming transform. */
  def violationsStream(suite: CompiledSuite, stream: DataFrame): DataFrame =
    suite.rowViolations(suite.annotate(stream))

  /** Full-suite validation per micro-batch. Returns a writer ready to start. */
  def validateForeachBatch(
      suite: CompiledSuite,
      stream: DataFrame,
      onBatch: (ValidationResult, Long) => Unit): DataStreamWriter[Row] =
    stream.writeStream
      .outputMode(OutputMode.Update())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val result = suite.run(batch, persistAnnotated = true)
        try onBatch(result, batchId)
        finally result.annotated.unpersist() // no per-batch cache leak
      }

  /** Watermarked windowed violation-rate monitor: per (window, constraint)
    * counts over the violation stream — the operational dashboard feed. */
  def windowedViolationCounts(
      suite: CompiledSuite, stream: DataFrame, tsCol: String,
      window_ : String = "5 minutes", watermark: String = "10 minutes"): DataFrame = {
    val ann = suite.annotate(stream)
    ann.filter(!suite.allOkCol)
      .select(col(tsCol), explode(suite.viosOf).as("v"))
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), window_), col("v.constraint_id"))
      .agg(count(lit(1)).as("violations"))
  }
}

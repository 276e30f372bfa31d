package graft

import org.apache.spark.sql.functions._

/** Sinks for validation outputs (SURVEY.md §2.4 scans/sources/sinks row):
  * violations + per-bucket report tables via the TableIO seam, plus a small
  * driver-side JSON summary for orchestration systems.
  */
object ReportSink {

  /** Write violations partitioned by bucket (bucket-pruned re-reads) and the
    * report keyed by (run_id, bucket). Everything through TableIO — Iceberg
    * on a real cluster is a format swap. */
  def write(result: ValidationResult, outDir: String, runId: String,
      io: TableIO = TableIO.default): Unit = {
    io.writer(result.violations.withColumn("run_id", lit(runId)), "append")
      .partitionBy("run_id")
      .save(s"$outDir/violations")
    Checkpoint.write(result.report, s"$outDir/checkpoint", runId)
  }

  /** Driver-side one-line JSON summary (rows/pass/fail + per-check fails).
    * Collects only the ≤nBuckets report rows — never the data. */
  def summaryJson(result: ValidationResult, runId: String): String = {
    val rep = result.report
      .agg(coalesce(sum("rows"), lit(0L)).as("rows"),
        coalesce(sum("pass"), lit(0L)).as("pass"),
        coalesce(sum("fail"), lit(0L)).as("fail"))
      .collect()(0)
    val byCheck = result.report
      .select(explode(col("fail_by_check")).as(Seq("check", "n")))
      .groupBy("check").agg(sum("n").as("n"))
      .collect().map(r => s""""${esc(r.getString(0))}":${r.getLong(1)}""")
      .sorted.mkString("{", ",", "}")
    s"""{"run_id":"${esc(runId)}","rows":${rep.getLong(0)},"pass":${rep.getLong(1)},""" +
      s""""fail":${rep.getLong(2)},"fail_by_check":$byCheck}"""
  }

  /** JSON string escape — constraint ids embed user-supplied labels. */
  private def esc(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }
}

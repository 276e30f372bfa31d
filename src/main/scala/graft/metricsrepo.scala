package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** A persistent metrics history for validation runs, plus anomaly
  * detection over it — the "is today's corpus SHAPED like yesterday's"
  * check that per-run validation alone cannot express (a drifting null
  * rate can pass every per-row bound while the trend screams). The
  * published pattern is Deequ's MetricsRepository + anomaly strategies;
  * this is that loop over the [[TableIO]] seam.
  *
  * Layout mirrors [[ops.DedupIndex]]'s exactly-once discipline:
  * {{{
  *   <dir>/run=<seq>/…         one subdirectory per appended run
  *   <dir>/_appended_<seq>     DONE marker, written AFTER the data
  * }}}
  * A crash mid-append leaves data without a marker — invisible to
  * [[history]] (marker-gated read) and overwritten by the retry. A re-run
  * of a completed seq is an idempotent no-op. `seq` is caller-assigned
  * (a date stamp, an ingest counter): the engine never reads a clock, so
  * runs replay deterministically.
  *
  * Metric rows are `(metric: string, value: long)` — counts and
  * fixed-point sums only, so every anomaly rule below is EXACT integer
  * arithmetic (no float thresholds that flip with summation order).
  *
  * Scale: appends write only the run's rows (metrics are bounded by the
  * suite's constraint count, not the corpus); history reads list markers
  * driver-side (one listStatus) and scan only committed run directories.
  * Anomaly windows partition BY METRIC — state per partition is the run
  * count, never the corpus.
  */
object MetricsRepo {

  private def hfs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Flatten a [[CompiledSuite.bucketReport]] into metric rows: corpus
    * totals (`rows`, `pass`, `fail`) plus one `fail:<constraint_id>` per
    * check — the per-run fingerprint the anomaly rules track. One pass
    * over the (nBuckets-sized) report. */
  def fromReport(report: DataFrame): DataFrame = {
    val totals = report.agg(
      sum(col("rows")).as("rows"), sum(col("pass")).as("pass"),
      sum(col("fail")).as("fail"))
      .select(explode(map(
        lit("rows"), col("rows"), lit("pass"), col("pass"),
        lit("fail"), col("fail"))).as(Seq("metric", "value")))
    val perCheck = report
      .select(explode(col("fail_by_check")).as(Seq("k", "v")))
      .groupBy(col("k")).agg(sum(col("v")).as("value"))
      .select(concat(lit("fail:"), col("k")).as("metric"), col("value"))
    totals.unionByName(perCheck)
  }

  /** Append one run's metrics. Returns true if written, false if this
    * (dir, seq) already completed (idempotent re-run). */
  def append(metrics: DataFrame, dir: String, seq: Long,
      io: TableIO = TableIO.default): Boolean = {
    require(seq >= 0, s"run seq must be >= 0, got $seq")
    val spark = metrics.sparkSession
    val fs = hfs(spark, dir)
    val marker = new Path(s"$dir/_appended_$seq")
    if (fs.exists(marker)) return false
    io.writer(metrics.select(col("metric"), col("value").cast(LongType)),
      "overwrite").save(s"$dir/run=$seq")
    fs.create(marker, true).close()
    true
  }

  /** All COMPLETED runs as (run: long, metric, value) — marker-gated like
    * [[ops.DedupIndex.readIndex]]: uncommitted `run=` directories are
    * never listed, so partial appends cannot poison the history. */
  def history(spark: SparkSession, dir: String,
      io: TableIO = TableIO.default): DataFrame = {
    val fs = hfs(spark, dir)
    val completed = fs.listStatus(new Path(dir)).map(_.getPath.getName)
      .filter(_.startsWith("_appended_")).map(_.stripPrefix("_appended_"))
      .map(_.toLong).sorted
    require(completed.nonEmpty, s"no completed runs in the metrics repo at $dir")
    io.readUnder(spark, dir, completed.toSeq.map(s => s"$dir/run=$s"))
      .select(col("run").cast(LongType).as("run"), col("metric"), col("value"))
  }

  /** Run-over-run relative-change anomalies (the RelativeRateOfChange
    * strategy): flag (run, metric) where
    * `|value - prev| * 100 > maxPct * |prev|`, or where prev == 0 and the
    * value moved off zero. Cross-multiplied LONG arithmetic — no division,
    * no floats, so the flag set is bit-stable at any parallelism. The
    * first run of each metric has no predecessor and is never flagged.
    *
    * `seasonLag` compares each run to the value `seasonLag` COMPLETED runs
    * back instead of the immediately prior one — the seasonal form: a
    * pipeline whose Sunday batches legitimately halve will flag every
    * Monday and Sunday at lag 1, but compared at lag 7 (same weekday) only
    * a real break flags. The first `seasonLag` runs of each metric have no
    * comparison point and are never flagged. Positions are run SEQUENCE
    * ordinals (the repo's caller-assigned seq), not wall-clock — a skipped
    * day shifts the season; assign seqs accordingly. */
  def relChangeAnomalies(history: DataFrame, maxPct: Long,
      seasonLag: Int = 1): DataFrame = {
    require(maxPct >= 0, s"maxPct must be >= 0, got $maxPct")
    require(seasonLag >= 1, s"seasonLag must be >= 1, got $seasonLag")
    val w = Window.partitionBy("metric").orderBy("run")
    history
      .withColumn("prev", lag(col("value"), seasonLag).over(w))
      .filter(col("prev").isNotNull)
      .filter(
        (col("prev") === 0 && col("value") =!= 0) ||
          (col("prev") =!= 0 &&
            abs(col("value") - col("prev")) * 100 > lit(maxPct) * abs(col("prev"))))
      .select(col("run"), col("metric"), col("prev"), col("value"))
  }

  /** Interval anomalies: the run at `atSeq` is flagged per metric when its
    * value falls outside the PRIOR runs' observed [min, max], widened by
    * `widenPct`% of the observed range on each side (integer floor — the
    * conservative direction). New metrics with no prior history are never
    * flagged. The tolerant complement to [[relChangeAnomalies]]: a slow
    * drift passes every run-over-run check but eventually walks outside
    * the historical envelope. */
  def intervalAnomalies(history: DataFrame, atSeq: Long, widenPct: Long): DataFrame = {
    require(widenPct >= 0, s"widenPct must be >= 0, got $widenPct")
    val prior = history.filter(col("run") < atSeq)
      .groupBy(col("metric")).agg(
        min(col("value")).as("hist_min"), max(col("value")).as("hist_max"))
      // `div`, not `/`: Spark's Divide promotes to double; the widening must
      // stay in the exact LONG domain (range and pct are both non-negative,
      // so integral division IS the floor)
      .withColumn("widen", expr(s"(hist_max - hist_min) * $widenPct div 100"))
    history.filter(col("run") === atSeq)
      .join(prior, "metric")
      .filter(col("value") < col("hist_min") - col("widen") ||
        col("value") > col("hist_max") + col("widen"))
      .select(col("run"), col("metric"), col("hist_min"), col("hist_max"),
        col("value"))
  }

  /** Robust-statistics anomalies: |value - median| > k * MAD per metric,
    * medians via exact `percentile` (history length is runs-per-metric —
    * tiny). Float statistic → test-covered, not oracle-checked (same
    * policy as the χ²/KS float forms); the exact integer strategies above
    * are the oracle surface. `minMad` floors the MAD so a constant history
    * (MAD 0) doesn't flag every deviation of 1. */
  def madAnomalies(history: DataFrame, k: Double, minMad: Double = 0.5): DataFrame = {
    val med = history.groupBy(col("metric"))
      .agg(percentile(col("value"), lit(0.5)).as("median"))
    val withDev = history.join(med, "metric")
      .withColumn("absdev", abs(col("value") - col("median")))
    val mad = withDev.groupBy(col("metric"), col("median"))
      .agg(percentile(col("absdev"), lit(0.5)).as("mad"))
      .withColumn("mad", greatest(col("mad"), lit(minMad)))
    history.join(mad, "metric")
      .filter(abs(col("value") - col("median")) > lit(k) * col("mad"))
      .select(col("run"), col("metric"), col("median"), col("mad"), col("value"))
  }
}

package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.functions._

/** One-off probe: shuffle-write volume of duplicatedSpans' document-
  * frequency aggregation, STRING-keyed (the round-2 formulation) vs
  * HASH-keyed (round 3) on a multi-million-row synthetic text corpus.
  * Results recorded in BASELINE.md ("Operator throughput probes").
  *
  * Env: SPARK_PROBE_ROWS (default 8M), SPARK_GRAFT_CPUS (default 16).
  */
object ProbeSpans {
  def main(args: Array[String]): Unit = {
    val rows = sys.env.getOrElse("SPARK_PROBE_ROWS", "8000000").toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt
    val spark = GraftSession.local(cpus, "probe-spans")
    spark.sparkContext.setLogLevel("WARN")

    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong
    val shuffleRecords = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        shuffleBytes.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
        shuffleRecords.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.recordsWritten)
      }
    })

    // synthetic text: ~10 docs share each text (boilerplate-style), so spans
    // genuinely duplicate — the df-agg combines map-side AND the round-3
    // exemplar re-attach stage is exercised (out_rows > 0)
    val groups = math.max(rows / 10, 1)
    val corpus = spark.range(rows).select(col("id").as("doc_id"),
      array_join(transform(sequence(lit(0), lit(27)),
        i => pmod(xxhash64(pmod(col("id"), lit(groups)), i), lit(5000)).cast("string")), " ")
        .as("text"))
      .localCheckpoint(true) // generation cost excluded from both probes

    def measure(name: String)(body: => Long): Unit = {
      shuffleBytes.set(0); shuffleRecords.set(0)
      val t0 = System.nanoTime()
      val n = body
      val sec = (System.nanoTime() - t0) / 1e9
      // listener events arrive asynchronously; give the bus a moment to drain
      Thread.sleep(2000)
      println(f"""{"probe":"$name","rows":$rows,"out_rows":$n,"sec":$sec%.1f,""" +
        f""""shuffle_mb":${shuffleBytes.get / 1e6}%.1f,"shuffle_records":${shuffleRecords.get}}""")
    }

    measure("string-keyed df-agg (round-2 formulation)") {
      corpus.select(explode(ops.Dedup.shingles(col("text"), 10)).as("span"))
        .groupBy(col("span")).agg(count(lit(1)).as("n_docs"))
        .filter(col("n_docs") >= 2).count()
    }
    measure("hash-keyed df-agg + exemplar re-attach (round 3, Dedup.duplicatedSpans)") {
      ops.Dedup.duplicatedSpans(corpus, "text", spanWords = 10, minDocs = 2).count()
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.functions._

/** End-to-end integration: the driver entry point, and the streaming
  * full-suite path (foreachBatch → checkpoint). */
class IntegrationSpec extends SparkSpec {
  import spark.implicits._

  test("SparkEntry.entry: flagship violations frame is non-empty (driver smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a queries entry") {
    val qs = SparkEntry.queries.keySet
    val missing = SparkEntry.oracleSql.keySet.diff(qs)
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("streaming foreachBatch: full suite per micro-batch + checkpoint append") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stream2").toString
    val corpus = DataGen.sequences(spark, 2000, maxLen = 16)
    corpus.write.parquet(s"$dir/in")
    val compiled = DataGen.standardSuite(spark, 16).compile(Seq_.schema).toOption.get

    val stream = spark.readStream.schema(corpus.schema).parquet(s"$dir/in")
    var batches = 0L
    val q = graft.streaming.StreamValidate.validateForeachBatch(compiled, stream,
      (res, batchId) => {
        Checkpoint.write(res.report, s"$dir/ckpt", s"stream-$batchId")
        batches += 1
      })
      .option("checkpointLocation", s"$dir/sck")
      .start()
    q.processAllAvailable(); q.stop()

    assert(batches >= 1)
    val done = Checkpoint.completedBuckets(spark, s"$dir/ckpt", "stream-0")
    assert(done.nonEmpty)
    // checkpointed rows cover the whole batch
    val ck = spark.read.parquet(s"$dir/ckpt")
    assert(ck.filter(col("run_id") === "stream-0").agg(sum("rows")).as[Long].head() === 2000L)
  }
}

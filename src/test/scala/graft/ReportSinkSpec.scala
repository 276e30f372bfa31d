package graft

import org.apache.spark.sql.functions._

class ReportSinkSpec extends SparkSpec {
  import spark.implicits._

  test("write: violations partitioned by run_id; checkpoint readable; summary JSON consistent") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sink").toString
    val corpus = DataGen.sequences(spark, 3000, maxLen = 16)
    val compiled = DataGen.standardSuite(spark, 16).compile(Seq_.schema).toOption.get
    val result = compiled.run(corpus, persistAnnotated = true)

    ReportSink.write(result, dir, "run-A")
    val vios = spark.read.parquet(s"$dir/violations")
    assert(vios.filter(col("run_id") === "run-A").count() === result.violations.count())
    assert(Checkpoint.completedBuckets(spark, s"$dir/checkpoint", "run-A").nonEmpty)

    val json = ReportSink.summaryJson(result, "run-A")
    assert(json.contains("\"run_id\":\"run-A\"") && json.contains("\"rows\":3000"))
    // pass + fail == rows in the serialized summary too
    val pass = "\"pass\":(\\d+)".r.findFirstMatchIn(json).get.group(1).toLong
    val fail = "\"fail\":(\\d+)".r.findFirstMatchIn(json).get.group(1).toLong
    assert(pass + fail === 3000L)

    // second run appends without clobbering the first
    ReportSink.write(result, dir, "run-B")
    assert(spark.read.parquet(s"$dir/violations")
      .select("run_id").distinct().count() === 2)
  }
}

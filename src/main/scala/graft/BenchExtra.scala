package graft

import java.nio.file.{Files, Paths}

/** Round-6 optimization harness (guide §1.4): times individual
  * `SparkEntry.queries` entries through the noop sink — every column of
  * every row computed, no sink cost, no count-only column pruning — and
  * dumps `.explain("formatted")` per query for the plans/ artifacts.
  *
  * Usage:
  *   sbt "runMain graft.BenchExtra time q1 q2 ..."    — noop-sink timings
  *   sbt "runMain graft.BenchExtra plans outDir q1 …" — write <q>.txt plans
  *
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_BENCH_REPS as in
  * [[Bench]]. This main is ADDITIVE — the frozen Bench/Verify harness is
  * untouched; numbers from here are cited in OPTIMIZATION_r06.md only.
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val mode = if (args.nonEmpty) args(0) else "time"
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val reps = math.max(1, sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "2").toInt)
    val spark = GraftSession.local(cpus.toInt, "graft-bench-extra")
    DataGen.ensureMediaFixture(spark)
    DataGen.ensureAudioFixture(spark)
    DataGen.ensureCodecAudioFixture(spark)
    DataGen.ensureVideoFixture(spark)
    try {
      spark.range(100000).selectExpr("sum(id)").collect()
      spark.read.parquet(s"$sfDir/lineitem.parquet").limit(1000).count()
    } catch { case _: Throwable => () }

    mode match {
      case "time" =>
        val names = if (args.length > 1) args.drop(1).toSeq
                    else SparkEntry.queries.keys.toSeq.sorted
        names.foreach { name =>
          val fn = SparkEntry.queries(name)
          spark.sparkContext.setJobDescription(name)
          val best = (1 to reps).map { _ =>
            val t0 = System.nanoTime()
            fn(spark, sfDir).write.format("noop").mode("overwrite").save()
            (System.nanoTime() - t0) / 1e9
          }
          println(f"[bench-extra] $name%-28s min=${best.min}%8.3f  runs=${best.map(t => f"$t%.3f").mkString(",")}")
        }
      case "plans" =>
        val outDir = args(1)
        Files.createDirectories(Paths.get(outDir))
        val names = if (args.length > 2) args.drop(2).toSeq
                    else SparkEntry.queries.keys.toSeq.sorted
        names.foreach { name =>
          val fn = SparkEntry.queries(name)
          val plan = fn(spark, sfDir).queryExecution.explainString(
            org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
          Files.writeString(Paths.get(s"$outDir/$name.txt"), plan)
          println(s"[bench-extra] wrote $outDir/$name.txt")
        }
      case other =>
        System.err.println(s"unknown mode '$other' (time | plans)"); sys.exit(2)
    }
    spark.stop()
  }
}

package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main. Runs every `SparkEntry.queries` entry on
  * SPARK_GRAFT_SF_DIR and prints one JSON line.
  *
  * Bench protocol (round 5): each query runs SPARK_GRAFT_BENCH_REPS times
  * (default 2) and the MINIMUM is reported — the host shows ambient
  * hypervisor-co-tenant inflation that moves a different random subset of
  * queries 1.5-4x on every run (see BASELINE.md "ambient load"); min-of-N
  * removes those phantoms. The 1-minute load average is recorded before and
  * after the run so a polluted record is self-documenting.
  */
object Bench {
  private def loadAvg(): Double =
    try scala.io.Source.fromFile("/proc/loadavg").mkString.split("\\s+")(0).toDouble
    catch { case _: Throwable => -1.0 }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val reps = math.max(1, sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "2").toInt)
    val spark = GraftSession.local(cpus.toInt, "graft-bench")
    val loadBefore = loadAvg()
    // Fixture generation is offline test infrastructure, not part of the
    // decode operators being measured — ensure it OUTSIDE both the timings
    // and the warmup's error-swallowing try: a generation failure here must
    // be visible, not silently charged to the first timed m_decode query.
    DataGen.ensureMediaFixture(spark)
    DataGen.ensureAudioFixture(spark)
    DataGen.ensureCodecAudioFixture(spark)
    DataGen.ensureVideoFixture(spark)
    // JIT/codegen warmup so the first measured query isn't charged for
    // first-stage compilation and scan-path initialization
    try {
      spark.range(100000).selectExpr("sum(id)").collect()
      spark.read.parquet(s"$sfDir/lineitem.parquet").limit(1000).count()
    } catch { case _: Throwable => () }
    // errors are RECORDED, never swallowed: a broken query must fail the
    // bench visibly (nonzero rc + per-query error), not "pass" with a fast -1
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val best = (1 to reps).foldLeft(Double.MaxValue) { (acc, _) =>
        if (errors.contains(name)) acc
        else {
          val t0 = System.nanoTime()
          try { fn(spark, sfDir).count(); math.min(acc, (System.nanoTime() - t0) / 1e9) }
          catch { case e: Throwable =>
            errors += name -> Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
            acc
          }
        }
      }
      name -> (if (errors.contains(name)) -1.0 else best)
    }.toMap
    val loadAfter = loadAvg()
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    def jstr(s: String): String =
      "\"" + s.flatMap { case '"' => "\\\""; case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString } + "\""
    val errJson = errors.map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }.mkString("{", ",", "}")
    val total = results.values.filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errJson,"sf":"$sfDir","reps":$reps,"load1m_before":$loadBefore,"load1m_after":$loadAfter}""")
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }
}

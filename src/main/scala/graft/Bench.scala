package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.local(cpus.toInt, "graft-bench")
    // JIT/codegen warmup so the first measured query isn't charged for
    // first-stage compilation and scan-path initialization
    try {
      spark.range(100000).selectExpr("sum(id)").collect()
      spark.read.parquet(s"$sfDir/lineitem.parquet").limit(1000).count()
      // fixture generation is offline test infrastructure, not part of the
      // decode operators being measured — ensure it outside the timings
      DataGen.ensureMediaFixture(spark)
      DataGen.ensureAudioFixture(spark)
    } catch { case _: Throwable => () }
    // errors are RECORDED, never swallowed: a broken query must fail the
    // bench visibly (nonzero rc + per-query error), not "pass" with a fast -1
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() }
      catch { case e: Throwable =>
        errors += name -> Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
      }
      name -> (if (errors.contains(name)) -1.0 else (System.nanoTime() - t0) / 1e9)
    }.toMap
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    def jstr(s: String): String =
      "\"" + s.flatMap { case '"' => "\\\""; case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString } + "\""
    val errJson = errors.map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }.mkString("{", ",", "}")
    val total = results.values.filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errJson,"sf":"$sfDir"}""")
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scaling-evidence harness (BASELINE.md protocol): the identical validation
  * job at two parallelism levels on the same materialized input — the
  * sandbox proxy for the north rule's N vs 4N executors criterion.
  *
  * Prints one JSON line:
  *   {"rows":N,"tokens":T,"t8":…,"t32":…,"r8":rows/s,"r32":rows/s,
  *    "tok8":tokens/s,"tok32":tokens/s,"efficiency":r32/(4*r8),
  *    "identical":true}
  */
object Scaling {

  private def session(cores: Int): SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-scaling-$cores")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Runs the full suite (row checks + uniqueness + referential + drift) and
    * forces complete evaluation; returns (violationsByCheck, reportAgg). */
  private def runSuite(spark: SparkSession, df: DataFrame, maxLen: Int)
      : (Map[String, Long], (Long, Long, Long)) = {
    val compiled = DataGen.standardSuite(spark, maxLen).compile(Seq_.schema)
      .fold(es => throw new IllegalStateException(es.map(_.msg).mkString("; ")), identity)
    val r = compiled.run(df)
    val byCheck = r.violations.groupBy("constraint_id").count()
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    val rep = r.report.agg(sum("rows"), sum("pass"), sum("fail")).collect()(0)
    (byCheck, (rep.getLong(0), rep.getLong(1), rep.getLong(2)))
  }

  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_SCALE_ROWS", "4000000").toLong
    val maxLen = 64
    val loCores = sys.env.getOrElse("SPARK_GRAFT_LO", "8").toInt
    val hiCores = sys.env.getOrElse("SPARK_GRAFT_HI", "32").toInt
    val path = "target/scaling/corpus.parquet"

    // Materialize the corpus ONCE (content is partitioning-independent, but
    // sharing one file set removes any doubt both runs see identical input).
    val gen = session(hiCores)
    val exists = new java.io.File(path + "/_SUCCESS").exists()
    val haveRows = if (exists) gen.read.parquet(path).count() else -1L
    if (haveRows != n) {
      DataGen.sequences(gen, n, maxLen, parts = 256)
        .write.mode("overwrite").parquet(path)
    }
    val tokens = gen.read.parquet(path).agg(sum(size(col("tokens")))).collect()(0).getLong(0)
    gen.stop()

    def timed(cores: Int): (Double, Map[String, Long], (Long, Long, Long)) = {
      val s = session(cores)
      // warm the JIT/codegen paths on a small synthetic slice so the
      // measurement is the engine, not first-query compilation
      runSuite(s, DataGen.sequences(s, 20000, maxLen, parts = cores), maxLen)
      val t0 = System.nanoTime()
      val out = runSuite(s, s.read.parquet(path), maxLen)
      val dt = (System.nanoTime() - t0) / 1e9
      s.stop()
      (dt, out._1, out._2)
    }

    val (tLo, vLo, repLo) = timed(loCores)
    val (tHi, vHi, repHi) = timed(hiCores)

    val identical = vLo == vHi && repLo == repHi
    val rLo = n / tLo
    val rHi = n / tHi
    val eff = (rHi / rLo) / (hiCores.toDouble / loCores)
    println(
      s"""{"rows":$n,"tokens":$tokens,"lo_cores":$loCores,"hi_cores":$hiCores,""" +
        s""""t_lo":$tLo,"t_hi":$tHi,"rows_per_s_lo":$rLo,"rows_per_s_hi":$rHi,""" +
        s""""tokens_per_s_lo":${tokens / tLo},"tokens_per_s_hi":${tokens / tHi},""" +
        s""""efficiency":$eff,"identical":$identical}""")
  }
}

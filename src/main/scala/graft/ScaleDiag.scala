package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Phase-by-phase scaling diagnostic: times each component of the validation
  * job at two core counts to locate what fails to scale. */
object ScaleDiag {

  private def session(cores: Int): SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def main(args: Array[String]): Unit = {
    val path = "target/scaling/corpus.parquet"
    val maxLen = 64
    for (cores <- Seq(8, 32)) {
      val s = session(cores)
      val compiled = DataGen.standardSuite(s, maxLen).compile(Seq_.schema).toOption.get
      def df: DataFrame = s.read.parquet(path)
      def t(name: String)(f: => Any): Unit = {
        val t0 = System.nanoTime()
        f
        println(f"[diag] cores=$cores $name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      }
      t("scan_count") { df.count() }
      t("scan_tokens_sum") { df.agg(sum(size(col("tokens")))).collect() }
      t("rowchecks_report") { compiled.bucketReport(compiled.annotate(df)).collect() }
      t("row_violations") { compiled.rowViolations(compiled.annotate(df)).count() }
      t("unique") { Unique("doc_id").run(df).count() }
      t("ref") { RefIntegrity("source", DataGen.sourcesDim(s), "source").run(df).count() }
      t("drift") { DriftChiSquare("n_tok", "source", 4.0, 100.0).run(df).count() }
      s.stop()
    }
  }
}

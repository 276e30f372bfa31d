package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bisect which row check anti-scales with cores. */
object ScaleBisect {
  private def session(cores: Int): SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def main(args: Array[String]): Unit = {
    val path = "target/scaling/corpus.parquet"
    val checks: Seq[(String, Seq[RowConstraint])] = Seq(
      "nonnull" -> Seq(NonNull("doc_id")),
      "regex" -> Seq(Regex("doc_id", "^doc-[0-9]{12}$")),
      "range" -> Seq(Range("n_tok", 1, 8192)),
      "lengthConsistent" -> Seq(LengthConsistent("tokens", "n_tok")),
      "elemRange" -> Seq(ArrayElemRange("tokens", 0, DataGen.VOCAB - 1)),
      "contains" -> Seq(ArrayContainsValue("tokens", DataGen.BOS)),
      "sizeBounds" -> Seq(ArraySizeBounds("tokens", Some(1), Some(8192))),
      "ALL" -> Seq(
        NonNull("doc_id"), Regex("doc_id", "^doc-[0-9]{12}$"), NonNull("source"),
        Range("n_tok", 1, 8192), LengthConsistent("tokens", "n_tok"),
        ArrayElemRange("tokens", 0, DataGen.VOCAB - 1),
        ArrayContainsValue("tokens", DataGen.BOS),
        ArraySizeBounds("tokens", Some(1), Some(8192))))
    for (cores <- Seq(8, 32)) {
      val s = session(cores)
      def df: DataFrame = s.read.parquet(path)
      // warmup
      df.count()
      for ((name, cs) <- checks) {
        val suite = ConstraintSuite("doc_id", cs)
        val compiled = suite.compile(Seq_.schema).toOption.get
        val t0 = System.nanoTime()
        compiled.bucketReport(compiled.annotate(df)).collect()
        println(f"[bisect] cores=$cores $name%-18s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      }
      s.stop()
    }
  }
}

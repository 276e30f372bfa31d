package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Repeat one array-reading query to separate steady-state from warmup/GC. */
object ScaleRepeat {
  def main(args: Array[String]): Unit = {
    for (cores <- Seq(32, 8)) {
      SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
      val s = SparkSession.builder().master(s"local[$cores]")
        .config("spark.sql.shuffle.partitions", cores.toString)
        .config("spark.ui.enabled", "false").getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      for (i <- 1 to 4) {
        val t0 = System.nanoTime()
        s.read.parquet("target/scaling/corpus.parquet")
          .agg(sum(size(col("tokens")))).collect()
        println(f"[rep] cores=$cores iter=$i sum_size ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      }
      for (i <- 1 to 4) {
        val t0 = System.nanoTime()
        val c = ConstraintSuite("doc_id", Seq(ArraySizeBounds("tokens", Some(1), Some(8192))))
          .compile(Seq_.schema).toOption.get
        c.bucketReport(c.annotate(s.read.parquet("target/scaling/corpus.parquet"))).collect()
        println(f"[rep] cores=$cores iter=$i sizeBounds ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      }
      s.stop()
    }
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Sampled-LM-training probe (BASELINE.md evidence for the `trainFraction`
  * scale path): full-corpus bigram training vs training on a deterministic
  * 10% sample, same corpus the text-filter probe uses (random token text —
  * the no-map-side-combine WORST case for the bigram count agg). Scoring
  * is a zero-shuffle projection either way; only training cost moves. */
object ProbeLmSample {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_LM_ROWS", "2000000").toLong
    val cores = sys.env.getOrElse("SPARK_GRAFT_LM_CPUS", "16").toInt
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft-probe-lm-sample")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ops.UnigramLM

    val path = s"target/lmprobe/docs_$n.parquet"
    if (!new java.io.File(path + "/_SUCCESS").exists()) {
      val words = (0 until 40).map(k =>
        concat(lit("w"), pmod(abs(xxhash64(col("id"), lit(k))), lit(50000L)).cast("string")))
      spark.range(0, n, 1, cores * 4)
        .select(col("id").as("doc_id"), concat_ws(" ", words: _*).as("text"))
        .write.mode("overwrite").parquet(path)
    }
    val docs = spark.read.parquet(path)
    docs.count() // warm listing

    def timed(f: => Long): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // untimed warmup of the tokenize/explode/agg codepath AND the parquet
    // column scan, so neither timed run pays first-use JIT/page-cache costs;
    // the SAMPLED run then goes FIRST (any residual warmth favors the
    // full-corpus run, i.e. works AGAINST the headline speedup)
    UnigramLM.trainBigram(docs, "text", vocabSize = 50000, bigramSize = 200000,
      trainFraction = 0.02, idCol = "doc_id")
    val tSampled = timed {
      UnigramLM.trainBigram(docs, "text", vocabSize = 50000, bigramSize = 200000,
        trainFraction = 0.1, idCol = "doc_id").bigrams.size.toLong
    }
    val tFull = timed {
      UnigramLM.trainBigram(docs, "text", vocabSize = 50000, bigramSize = 200000)
        .bigrams.size.toLong
    }
    println(f"""{"rows":$n,"cores":$cores,"full_train_sec":$tFull%.1f,""" +
      f""""sampled_train_sec":$tSampled%.1f,"speedup":${tFull / tSampled}%.1f}""")
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.functions._

/** Probe: the executor-shared (broadcast) order-N LM form vs the embedded
  * form, at and beyond the embedded form's measured model-size ceiling.
  *
  * Round-5 context (BASELINE.md "Order-5 LM"): a 5-level × 850 k-entry
  * embedded model GC-froze a 16-core driver — the maps serialize into the
  * expression (so every task binary carries them) and the scoring trie
  * rebuilds once per task. `NgramLogProbFpBroadcast` ships the maps once
  * per executor (torrent broadcast) and builds the trie once per JVM, so
  * the same corpus/model pair must (a) run, (b) match the embedded scores
  * bit-for-bit at sizes both can handle, and (c) lift the ceiling to the
  * KenLM size class. This main measures all three.
  *
  * Env: SPARK_PROBE_ROWS (default 2 000 000), SPARK_GRAFT_CPUS (16).
  */
object ProbeLmBroadcast {
  def main(args: Array[String]): Unit = {
    val rows = sys.env.getOrElse("SPARK_PROBE_ROWS", "2000000").toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt
    val spark = GraftSession.local(cpus, "probe-lm-broadcast")
    spark.sparkContext.setLogLevel("WARN")
    // ~80 words/doc from a 300k vocab: random enough that every n-gram level
    // fills its cap (worst case for model size), Zipf-free by design
    val docs = spark.range(rows).select(
      col("id").as("doc_id"),
      concat_ws(" ", transform(sequence(lit(0), lit(79)), i =>
        concat(lit("w"), pmod(xxhash64(col("id"), i), lit(300000L)).cast("string"))))
        .as("text"))
      .localCheckpoint(true) // generation excluded from timings
    val chars = docs.agg(sum(length(col("text")))).head().getLong(0)

    def timed(name: String, extra: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"probe":"$name","rows":$rows,"scored":$n,"sec":$sec%.1f,""" +
        f""""mb_per_s":${chars / sec / 1e6}%.0f$extra}""")
    }

    // -- A/B at the embedded form's documented ceiling (~250k entries) -----
    val sizesMid = Seq(50000, 50000, 50000, 50000, 50000)
    val mid = ops.UnigramLM.trainNgram(docs, "text", sizesMid, trainFraction = 0.05,
      idCol = "doc_id")
    val midEntries = mid.grams.map(_.size).sum
    def fullScore(df: org.apache.spark.sql.DataFrame): Long = {
      val r = df.agg(count(lit(1)), sum(col("logprob_fp"))).head()
      require(r.getLong(0) == rows); r.getLong(0)
    }
    // warm both paths once (JIT + codegen), then time
    ops.UnigramLM.scoreNgram(docs.limit(10000), "text", mid).agg(sum("logprob_fp")).head()
    val midBc = ops.UnigramLM.broadcastModel(spark, mid)
    ops.UnigramLM.scoreNgramBroadcast(docs.limit(10000), "text", midBc)
      .agg(sum("logprob_fp")).head()
    timed("embedded-5gram-score", s""","entries":$midEntries""") {
      fullScore(ops.UnigramLM.scoreNgram(docs, "text", mid))
    }
    timed("broadcast-5gram-score", s""","entries":$midEntries""") {
      fullScore(ops.UnigramLM.scoreNgramBroadcast(docs, "text", midBc))
    }
    // equality of the two forms on this corpus (sum is order-insensitive)
    val se = ops.UnigramLM.scoreNgram(docs, "text", mid)
      .agg(sum("logprob_fp"), sum("n_tok")).head()
    val sb = ops.UnigramLM.scoreNgramBroadcast(docs, "text", midBc)
      .agg(sum("logprob_fp"), sum("n_tok")).head()
    require(se == sb, s"embedded vs broadcast mismatch: $se vs $sb")
    midBc.destroy()
    println(s"""{"probe":"equality","entries":$midEntries,"identical":true}""")

    // -- the size that GC-froze the embedded form: broadcast-only ----------
    val sizesBig = Seq(150000, 175000, 175000, 175000, 175000)
    var t0 = System.nanoTime()
    val big = ops.UnigramLM.trainNgram(docs, "text", sizesBig, trainFraction = 0.05,
      idCol = "doc_id")
    val trainSec = (System.nanoTime() - t0) / 1e9
    val bigEntries = big.grams.map(_.size).sum
    t0 = System.nanoTime()
    val bigBc = ops.UnigramLM.broadcastModel(spark, big)
    val bcSec = (System.nanoTime() - t0) / 1e9
    println(f"""{"probe":"big-train","entries":$bigEntries,"train_sec":$trainSec%.1f,""" +
      f""""broadcast_sec":$bcSec%.1f}""")
    timed("broadcast-850k-score", s""","entries":$bigEntries""") {
      fullScore(ops.UnigramLM.scoreNgramBroadcast(docs, "text", bigBc))
    }
    bigBc.destroy()
    spark.stop()
  }
}

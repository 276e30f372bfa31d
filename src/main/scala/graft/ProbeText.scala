package graft

import org.apache.spark.sql.functions._

/** One-off probe: text quality-filter throughput at web-pipeline scale —
  * repetition stats (Gopher signals), unigram-LM train + score, PII
  * redaction, and mixture rebalancing over a synthetic multi-million-doc
  * corpus (~500 chars/doc, pure function of row id). Every op under test is
  * a zero-shuffle projection except LM training (two-phase term agg) and the
  * balance count agg, so throughput should track scan speed; recorded in
  * BASELINE.md.
  *
  * Env: SPARK_PROBE_ROWS (default 4M), SPARK_GRAFT_CPUS (default 16). */
object ProbeText {
  def main(args: Array[String]): Unit = {
    val rows = sys.env.getOrElse("SPARK_PROBE_ROWS", "4000000").toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt
    val spark = GraftSession.local(cpus, "probe-text")
    spark.sparkContext.setLogLevel("WARN")
    // ~80 words/doc, a newline every 10 words; 20% of docs repeat ONE line
    // eight times (planted boilerplate -> duplicate-line + dup-ngram
    // signals fire), the rest draw words from a 50k vocab
    val docs = spark.range(rows).select(
      col("id").as("doc_id"),
      concat_ws(" ", transform(sequence(lit(0), lit(79)), i =>
        concat(
          when(pmod(col("id"), lit(5)) === 0, lit("r")).otherwise(lit("w")),
          pmod(xxhash64(col("id"),
              when(pmod(col("id"), lit(5)) === 0, pmod(i, lit(10))).otherwise(i)),
            lit(50000L)).cast("string"),
          when(pmod(i, lit(10)) === 9, lit("\n")).otherwise(lit(""))))).as("text"),
      when(pmod(col("id"), lit(4)) === 0, lit("en"))
        .when(pmod(col("id"), lit(4)) === 1, lit("fr"))
        .when(pmod(col("id"), lit(4)) === 2, lit("de"))
        .otherwise(lit("es")).as("lang"))
      .localCheckpoint(true) // generation excluded from timings
    val chars = docs.agg(sum(length(col("text")))).head().getLong(0)
    def timed(name: String)(body: => String): Unit = {
      val t0 = System.nanoTime()
      val detail = body
      val sec = (System.nanoTime() - t0) / 1e9
      // valid JSON: unit suffixes live in the key names, values are numbers
      println(f"""{"probe":"$name","rows":$rows,"chars":$chars,"sec":$sec%.1f,""" +
        f""""mdocs_per_s":${rows / sec / 1e6}%.2f,"mb_per_s":${chars / sec / 1e6}%.0f,$detail}""")
    }
    timed("repetition-stats") {
      val r = ops.TextAnalysis.repetitionProfile(docs, "text")
        .agg(count(lit(1)), sum(col("gopher_pass").cast("long"))).head()
      require(r.getLong(0) == rows)
      s""""gopher_pass":${r.getLong(1)}"""
    }
    timed("unigram-lm train+score") {
      val model = ops.UnigramLM.train(docs, "text", vocabSize = 50000)
      val r = ops.UnigramLM.score(docs, "text", model)
        .agg(sum(col("logprob_fp")), sum(col("n_tok"))).head()
      s""""vocab":${model.vocab.size},"avg_fp":${r.getLong(0) / r.getLong(1)}"""
    }
    timed("bigram-lm train+score") {
      val model = ops.UnigramLM.trainBigram(docs, "text",
        vocabSize = 50000, bigramSize = 200000)
      val r = ops.UnigramLM.scoreBigram(docs, "text", model)
        .agg(sum(col("logprob_fp")), sum(col("n_tok"))).head()
      s""""bigrams":${model.bigrams.size},"avg_fp":${r.getLong(0) / r.getLong(1)}"""
    }
    timed("5gram-lm train+score") {
      // the order-5 generalized kernel (CCNet's published filter shape):
      // training pays five explode->count aggs (the trainFraction path cuts
      // that at corpus scale); SCORING stays a zero-shuffle projection with
      // O(order) trie lookups per token — the number that matters at 100 TB.
      // Model SIZE budget: the maps ship inside the expression and the trie
      // rebuilds per task, so total entries stay ~250 k here (an 850 k-entry
      // probe run GC-froze the driver for 10+ minutes — the documented
      // driver-embedded-vocabulary ceiling, see NgramLogProbFp scaladoc)
      val model = ops.UnigramLM.trainNgram(docs, "text",
        Seq(50000, 50000, 50000, 50000, 50000), trainFraction = 0.05,
        idCol = "doc_id")
      val r = ops.UnigramLM.scoreNgram(docs, "text", model)
        .agg(sum(col("logprob_fp")), sum(col("n_tok"))).head()
      s""""grams5":${model.grams(4).size},"avg_fp":${r.getLong(0) / r.getLong(1)}"""
    }
    timed("tfidf-top3 (quarter corpus)") {
      // tf-idf is the one op here with an inherent term shuffle (df agg +
      // idf join + per-doc window) — probe at rows/4 to keep the join
      // input ~70M exploded terms. Cached variant + release so the pinned
      // token frame can't skew the probes that follow.
      val quarter = docs.filter(pmod(col("doc_id"), lit(4)) === 0)
      val (out, release) =
        ops.TextAnalysis.tfidfTopTermsCached(quarter, "text", "doc_id", 3)
      val r = out.agg(count(lit(1)), countDistinct(col("doc_id"))).head()
      release()
      s""""out_rows":${r.getLong(0)},"docs":${r.getLong(1)}"""
    }
    timed("gopher-quality-heuristics") {
      val r = docs.select(ops.TextAnalysis.gopherQualityPass(col("text"))
          .cast("long").as("p"))
        .agg(sum(col("p")), count(lit(1))).head()
      s""""q_pass":${r.getLong(0)}"""
    }
    timed("pii-redact") {
      val r = docs.select(
        length(ops.TextAnalysis.redact(col("text"), ops.TextAnalysis.piiRules)).as("l"),
        ops.TextAnalysis.matchCount(col("text"), "[0-9]{6,}").as("n"))
        .agg(sum(col("l")), sum(col("n"))).head()
      s""""out_chars":${r.getLong(0)},"num_hits":${r.getLong(1)}"""
    }
    timed("jsonl-roundtrip (write + readSplit + validate counts)") {
      val path = "target/probe_jsonl"
      docs.write.mode("overwrite").json(path)
      val (valid, corrupt) = sources.JsonCorpus.readSplit(spark, path, docs.schema)
      val (nv, nc) = (valid.count(), corrupt.count())
      require(nv == rows && nc == 0, s"roundtrip drift: $nv/$nc")
      s""""valid":$nv,"corrupt":$nc"""
    }
    timed("balance-to-mix") {
      val kept = ops.Sampling.balanceToMix(docs.select("doc_id", "lang"),
        "lang", "doc_id", Map("en" -> 0.5, "fr" -> 0.3, "de" -> 0.2)).count()
      s""""kept":$kept"""
    }
    spark.stop()
  }
}

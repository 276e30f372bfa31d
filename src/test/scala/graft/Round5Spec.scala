package graft

import org.apache.spark.sql.functions._

/** Round-5: order-N LM generalization, the two-phase exact stratum cap,
  * stage parameter fingerprints, and the incremental-index lifecycle. */
class Round5Spec extends SparkSpec {
  import spark.implicits._

  // ---------------------------------------------------------------------
  // NgramLogProbFp: order-N interpolated LM
  // ---------------------------------------------------------------------

  private def fp(p: Double) = math.round(math.log(p) * 1e6)

  test("NgramLogProbFp order 5: hand-computed dispatch at every context length") {
    import graft.ops.UnigramLM
    // tokens: a b c d e a b c d e a b c d f  (N=15)
    // c1: a3 b3 c3 d3 e2 f1; c2(a,b)=3 (b,c)=3 (c,d)=3 (d,e)=2 (e,a)=2 (d,f)=1
    // c3(a,b,c)=3 (b,c,d)=3 (c,d,e)=2 …; c4(a,b,c,d)=3 (b,c,d,e)=2 …
    // c5(a,b,c,d,e)=2 …
    val train = Seq((1L, "a b c d e a b c d e a b c d f")).toDF("doc_id", "text")
    val m = UnigramLM.trainNgram(train, "text", Seq(10, 10, 10, 10, 10))
    assert(m.order === 5 && m.totalTokens === 15L)
    assert(m.grams(1)("ab") === 3L)
    assert(m.grams(4)("abcde") === 2L)
    // score "a b c d e": token i dispatches at context length i-1 (0..4)
    val expected =
      fp(3.0 / 15) + // "a": no context
      fp(0.5 * (3.0 / 3) + 0.5 * (3.0 / 15)) + // "b": L=1
      fp(0.5 * (3.0 / 3) + 0.25 * (3.0 / 3) + 0.25 * (3.0 / 15)) + // "c": L=2
      fp(0.5 * (3.0 / 3) + 0.25 * (3.0 / 3) + 0.125 * (3.0 / 3)
        + 0.125 * (3.0 / 15)) + // "d": L=3
      fp(0.5 * (2.0 / 3) + 0.25 * (2.0 / 3) + 0.125 * (2.0 / 3)
        + 0.0625 * (2.0 / 3) + 0.0625 * (2.0 / 15)) // "e": full L=4
    val scored = UnigramLM.scoreNgram(
        Seq((2L, "a b c d e")).toDF("doc_id", "text"), "text", m)
      .select("logprob_fp", "n_tok").head()
    assert(scored.getLong(0) === expected && scored.getLong(1) === 5L)
  }

  test("NgramLogProbFp: a truncation hole mid-chain drops dispatch to that level") {
    import graft.ops.UnigramLM
    // bigram vocabulary capped at 1: ties (a,b)=3 (b,c)=3 (c,d)=3 break by
    // key asc -> only (a,b) kept. Scoring "b c d": "c" takes the bigram
    // PATH (p1=b in vocab) with truncated numerator 0; "d" must ALSO stay
    // at the bigram path because context bigram (b,c) is truncated —
    // a trigram with a fabricated denominator would score p>1.
    val train = Seq((1L, "a b c d e a b c d e a b c d f")).toDF("doc_id", "text")
    val m = UnigramLM.trainNgram(train, "text", Seq(10, 1, 10, 10, 10))
    assert(m.grams(1) === Map("ab" -> 3L))
    val expected =
      fp(3.0 / 15) + // "b"
      fp(0.5 * (0.0 / 3) + 0.5 * (3.0 / 15)) + // "c": (b,c) truncated => num 0
      fp(0.5 * (0.0 / 3) + 0.5 * (3.0 / 15)) // "d": chain hole at (b,c) => L=1
    val scored = UnigramLM.scoreNgram(
        Seq((2L, "b c d")).toDF("doc_id", "text"), "text", m)
      .select("logprob_fp", "n_tok").head()
    assert(scored.getLong(0) === expected && scored.getLong(1) === 3L)
  }

  test("NgramLogProbFp: OOV token and OOV predecessor back off to unigram") {
    import graft.ops.UnigramLM
    val train = Seq((1L, "a b c d e a b c d e a b c d f")).toDF("doc_id", "text")
    val m = UnigramLM.trainNgram(train, "text", Seq(10, 10, 10, 10, 10))
    val expected = fp(1.0 / 15) + fp(3.0 / 15) // "z" OOV; "a" after OOV prev
    val scored = UnigramLM.scoreNgram(
        Seq((2L, "z a")).toDF("doc_id", "text"), "text", m)
      .select("logprob_fp", "n_tok").head()
    assert(scored.getLong(0) === expected && scored.getLong(1) === 2L)
  }

  test("NgramModel orders 1-3 reproduce the dedicated kernels bit-for-bit") {
    import graft.ops.UnigramLM
    val docs = spark.range(0, 300).selectExpr("id AS doc_id",
      """concat('the quick tok', cast(id % 23 AS STRING),
                ' jumps over tok', cast(id % 7 AS STRING),
                ' and tok', cast(id % 3 AS STRING)) AS text""")
    val uni = UnigramLM.train(docs, "text", 40)
    val bi = UnigramLM.trainBigram(docs, "text", 40, 60)
    val tri = UnigramLM.trainTrigram(docs, "text", 40, 60, 80)
    val n1 = UnigramLM.trainNgram(docs, "text", Seq(40))
    val n2 = UnigramLM.trainNgram(docs, "text", Seq(40, 60))
    val n3 = UnigramLM.trainNgram(docs, "text", Seq(40, 60, 80))
    // identical trained vocabularies…
    assert(n1.grams.head === uni.vocab && n1.totalTokens === uni.totalTokens)
    assert(n2.grams(1) === bi.bigrams)
    assert(n3.grams(2) === tri.trigrams)
    // …and identical scores from the generalized kernel
    def scores(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long)] =
      df.select("doc_id", "logprob_fp", "n_tok").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    assert(scores(UnigramLM.scoreNgram(docs, "text", n1))
      === scores(UnigramLM.score(docs, "text", uni)))
    assert(scores(UnigramLM.scoreNgram(docs, "text", n2))
      === scores(UnigramLM.scoreBigram(docs, "text", bi)))
    assert(scores(UnigramLM.scoreNgram(docs, "text", n3))
      === scores(UnigramLM.scoreTrigram(docs, "text", tri)))
  }

  test("NgramLogProbFp compiles under FORCED codegen, matching interpreted eval") {
    import graft.ops.UnigramLM
    val train = Seq((1L, "a b c d e a b c d e a b c d f")).toDF("doc_id", "text")
    val m = UnigramLM.trainNgram(train, "text", Seq(10, 10, 10, 10, 10))
    val df = Seq((1L, "a b c d e x"), (2L, "f f f"), (3L, "")).toDF("doc_id", "text")
    def eval(mode: String): Seq[(Long, Long)] = {
      val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
      spark.conf.set("spark.sql.codegen.factoryMode", mode)
      try UnigramLM.scoreNgram(df, "text", m)
        .select("logprob_fp", "n_tok").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      finally prev match {
        case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
        case None => spark.conf.unset("spark.sql.codegen.factoryMode")
      }
    }
    assert(eval("CODEGEN_ONLY") === eval("NO_CODEGEN"))
  }

  test("trainNgram(trainFraction) routes through the deterministic sample") {
    import graft.ops.{Sampling, UnigramLM}
    val docs = spark.range(0, 200).selectExpr("id AS doc_id",
      "concat('common words here plus tok', cast(id % 37 AS STRING)) AS text")
    val sampled = UnigramLM.trainNgram(docs, "text", Seq(50, 100, 100),
      trainFraction = 0.5, idCol = "doc_id")
    val manual = UnigramLM.trainNgram(
      Sampling.deterministicSample(docs, "doc_id", 0.5), "text", Seq(50, 100, 100))
    assert(sampled.grams === manual.grams &&
      sampled.totalTokens === manual.totalTokens)
    assert(sampled.totalTokens < UnigramLM.trainNgram(docs, "text", Seq(50)).totalTokens)
  }

  // ---------------------------------------------------------------------
  // capStrataExact: two-phase bounded-heap == per-stratum window sort
  // ---------------------------------------------------------------------

  test("capStrataExact matches the window-sort formulation on a skewed, duplicate-key corpus") {
    import graft.ops.Sampling
    // hot stratum (90%), two small strata, a NULL stratum, duplicate keys
    // with DIFFERENT payloads (the boundary-tie trap), plus strata under k
    val df = spark.range(0, 4000).selectExpr(
      """CASE WHEN id % 10 < 8 THEN 'hot'
              WHEN id % 10 = 8 THEN concat('s', cast((id div 10) % 4 AS STRING))
              ELSE NULL END AS stratum""",
      "cast(id % 600 AS STRING) AS key", // ~7 rows per key across strata
      "id AS payload").cache()
    val k = 150
    val two = Sampling.capStrataExact(df, "stratum", "key", k)
    // the retired formulation, reconstructed with the same ordering triple
    val g = Sampling.auditGate(df, "key", "cap_exact")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("stratum")
      .orderBy(g.asc, col("key").asc, Sampling.rowHash(df, Sampling.TagCapExact, 0L).asc)
    val ref = df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k).drop("__rn")
    def canon(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (Option(r.getString(0)), r.getString(1), r.getLong(2)))
        .toSeq.sorted
    assert(canon(two) === canon(ref))
    // per-stratum exact counts: min(n, k), null stratum capped too
    val counts = two.groupBy("stratum").count().collect()
      .map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(counts(Some("hot")) === k.toLong)
    assert(counts(None) === k.toLong)
    assert((0 to 3).map(i => counts(Some(s"s$i"))).sum === 400L) // under cap: all kept
    // parallelism-independent
    val rep = Sampling.capStrataExact(df.repartition(13), "stratum", "key", k)
    assert(canon(rep) === canon(two))
    df.unpersist()
  }

  test("capStrataExact plans as a partial-agg pipeline, not a window sort") {
    import graft.ops.Sampling
    val df = spark.range(0, 100).selectExpr(
      "cast(id % 3 AS STRING) AS stratum", "cast(id AS STRING) AS key", "id AS v")
    val plan = Sampling.capStrataExact(df, "stratum", "key", 5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"window survived:\n$plan")
    assert(plan.contains("ObjectHashAggregate") || plan.contains("SortAggregate"),
      s"no aggregate found:\n$plan")
  }

  // ---------------------------------------------------------------------
  // StageRunner parameter fingerprints
  // ---------------------------------------------------------------------

  test("StageRunner: resuming a stage with changed parameters fails loudly") {
    val dir = java.nio.file.Files.createTempDirectory("stage_fp").toString
    val r1 = new StageRunner(spark, dir, "run1")
    val d = spark.range(0, 10).toDF("id")
    r1.stage("s1", Seq("op", 64, 0.8))(d)
    // same params: resume is fine (storage-backed, no recompute)
    var computes = 0
    val again = new StageRunner(spark, dir, "run1")
      .stage("s1", Seq("op", 64, 0.8)) { computes += 1; d }
    assert(again.count() === 10L && computes === 0)
    // changed params: loud failure, not stale output
    val e = intercept[IllegalStateException] {
      new StageRunner(spark, dir, "run1").stage("s1", Seq("op", 128, 0.8))(d)
    }
    assert(e.getMessage.contains("different"))
    // legacy empty markers (pre-fingerprint) still resume
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val mp = new org.apache.hadoop.fs.Path(s"$dir/run1/_done_s1")
    fs.create(mp, true).close() // truncate to zero bytes
    assert(new StageRunner(spark, dir, "run1")
      .stage("s1", Seq("anything", 1))(d).count() === 10L)
  }
}

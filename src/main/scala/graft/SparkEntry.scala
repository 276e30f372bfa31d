package graft

import graft.ops._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Driver contract — queries + DuckDB oracles (see /root/repo/SURVEY.md §7).
  *
  * Every SQL-expressible operator has an `oracleSql` entry with IDENTICAL
  * column names and exact-value semantics (integer/cents arithmetic, md5,
  * quantized dots) so the driver's sorted-hash compare is bit-stable across
  * engines. Approximate / hash-dependent operators (MinHash, SimHash, LSH,
  * cosine floats, engine violation frames on synthetic data) are rows-only.
  */
object SparkEntry {

  private def ld(s: SparkSession, dir: String, t: String): DataFrame =
    s.read.parquet(s"$dir/$t.parquet")

  // The trained IVF quantizer is DETERMINISTIC (hash-sampled init,
  // fixed-point sums) and shared by the three s_ann_ivf* queries — train it
  // once per fixture dir, as production would (index build is an offline
  // one-time step; per-query re-training would charge every search ~1.5 s
  // of train cost and is not what the operator costs at scale).
  // Memoization is keyed by DIR and validated by mtime — a rewritten table
  // at the same path never serves a stale model, and the superseded entry is
  // REPLACED (not accreted alongside), so a long-lived session re-pointing
  // at refreshed fixtures holds one model per dir, not one per mtime.
  // The check-then-train-then-put sequence is atomic (synchronized on the
  // per-family cache): concurrent queries against the same dir must not each
  // pay the multi-second training. Cost: two DIFFERENT dirs in one family
  // serialize their (rare, first-touch-only) training — duplicate work was
  // the real hazard, cross-dir concurrency is not.
  private def memo[M](cache: scala.collection.concurrent.TrieMap[String, (Long, M)],
      dir: String, mtime: Long)(train: => M): M =
    cache.synchronized {
      cache.get(dir) match {
        case Some((t, m)) if t == mtime => m
        case _ =>
          val m = train
          cache.put(dir, (mtime, m))
          m
      }
    }

  private val ivfModels = scala.collection.concurrent.TrieMap.empty[String, (Long, Ivf.Model)]
  private[graft] def ivfModel(s: SparkSession, dir: String): Ivf.Model = {
    val mtime = new java.io.File(s"$dir/embeddings.parquet").lastModified()
    memo(ivfModels, dir, mtime)(
      Ivf.train(ld(s, dir, "embeddings"), "embedding", nlist = 8, iters = 2))
  }

  // Same reasoning for the unigram LM: a language model is trained offline
  // once and reused across scoring runs — per-query retraining is not what
  // the scoring operator costs. Deterministic (tie-broken top-V), so
  // memoization cannot change results.
  private val lmModels = scala.collection.concurrent.TrieMap.empty[String, (Long, UnigramLM.Model)]
  private def lmModel(s: SparkSession, dir: String): UnigramLM.Model = {
    val mtime = new java.io.File(s"$dir/documents.parquet").lastModified()
    memo(lmModels, dir, mtime)(
      UnigramLM.train(ld(s, dir, "documents").filter(col("text").isNotNull),
        "text", vocabSize = 500))
  }
  private val bigramModels = scala.collection.concurrent.TrieMap.empty[String, (Long, UnigramLM.BigramModel)]
  private def bigramModel(s: SparkSession, dir: String): UnigramLM.BigramModel = {
    val mtime = new java.io.File(s"$dir/documents.parquet").lastModified()
    memo(bigramModels, dir, mtime)(
      UnigramLM.trainBigram(ld(s, dir, "documents").filter(col("text").isNotNull),
        "text", vocabSize = 500, bigramSize = 1000))
  }
  private val trigramModels = scala.collection.concurrent.TrieMap.empty[String, (Long, UnigramLM.TrigramModel)]
  private def trigramModel(s: SparkSession, dir: String): UnigramLM.TrigramModel = {
    val mtime = new java.io.File(s"$dir/documents.parquet").lastModified()
    memo(trigramModels, dir, mtime)(
      UnigramLM.trainTrigram(ld(s, dir, "documents").filter(col("text").isNotNull),
        "text", vocabSize = 500, bigramSize = 1000, trigramSize = 2000))
  }
  private val fivegramModels = scala.collection.concurrent.TrieMap.empty[String, (Long, UnigramLM.NgramModel)]
  private def fivegramModel(s: SparkSession, dir: String): UnigramLM.NgramModel = {
    val mtime = new java.io.File(s"$dir/documents.parquet").lastModified()
    memo(fivegramModels, dir, mtime)(
      UnigramLM.trainNgram(ld(s, dir, "documents").filter(col("text").isNotNull),
        "text", Seq(500, 1000, 2000, 3000, 4000)))
  }
  // Executor-shared form of the SAME 5-gram model: the broadcast handle is
  // memoized per dir alongside the embedded model, so repeated queries ship
  // the maps once. A handle for a refreshed dir is dropped (not destroyed —
  // in-flight queries may still hold it; the driver-side reference goes
  // away and the blocks age out with the context).
  private val fivegramBcModels =
    scala.collection.concurrent.TrieMap.empty[String, (Long, UnigramLM.BroadcastNgramModel)]
  private def fivegramBcModel(s: SparkSession, dir: String): UnigramLM.BroadcastNgramModel = {
    val mtime = new java.io.File(s"$dir/documents.parquet").lastModified()
    memo(fivegramBcModels, dir, mtime)(
      UnigramLM.broadcastModel(s, fivegramModel(s, dir)))
  }

  private val classifierModels = scala.collection.concurrent.TrieMap.empty[String, (Long, QualityClassifier.Model)]
  private def classifierModel(s: SparkSession, dir: String): QualityClassifier.Model = {
    val mtime = new java.io.File(s"$dir/documents.parquet").lastModified()
    memo(classifierModels, dir, mtime)(
      QualityClassifier.train(
        ld(s, dir, "documents").filter(col("text").isNotNull)
          .withColumn("is_en", col("lang") === "en"),
        "text", "is_en", vocabSize = 300))
  }

  /** The v_metrics_* fixture: a six-run metrics history from deterministic
    * `doc_id % 500` slices of the documents table (every residue populated
    * at every SF — doc ids are 0..N-1 with N a multiple of 500), limits
    * 300,303,306,420,309,312 ⇒ runs 3/4 jump ~±30%, the rest ~1%. Rebuilt
    * from scratch on FIRST use per (scope, sfDir) in this JVM (stale-run
    * hygiene) and memoized after (computeIfAbsent: both v_metrics_* queries
    * — and bench reps — share one build in whatever order they run). */
  private val metricsFixtureBuilt = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def ensureMetricsRepoFixture(s: SparkSession, dir: String): String = {
    val repo = DataGen.MetricsRepoFixturePath
    metricsFixtureBuilt.computeIfAbsent(s"$repo|$dir", _ => {
      val p = new org.apache.hadoop.fs.Path(repo)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true)
      val docs = ld(s, dir, "documents")
      Seq(300L, 303L, 306L, 420L, 309L, 312L).zipWithIndex.foreach { case (l, i) =>
        val metrics = docs.filter(pmod(col("doc_id"), lit(500L)) < l)
          .agg(
            count(lit(1)).as("rows"),
            coalesce(sum(col("n_chars")), lit(0L)).as("n_chars_sum"))
          .select(explode(map(
            lit("rows"), col("rows"),
            lit("n_chars_sum"), col("n_chars_sum"))).as(Seq("metric", "value")))
        MetricsRepo.append(metrics, repo, i.toLong)
      }
      "built"
    })
    repo
  }

  /** Flagship: full validation suite over the deterministic synthetic corpus
    * — violations frame (planted defects ⇒ rows > 0). */
  def entry(spark: SparkSession): DataFrame = {
    val corpus = DataGen.sequences(spark, 5000, maxLen = 32)
    val suite = DataGen.standardSuite(spark, maxLen = 32)
    val compiled = suite.compile(Seq_.schema)
      .fold(es => throw new IllegalStateException(es.map(_.msg).mkString("; ")), identity)
    compiled.run(corpus).violations
  }

  /** cents-exact money column. */
  private def cents(c: Column): Column = round(c * 100).cast(LongType)

  /** The draft-07 documents suite shared by v_jsonschema and the JSONL
    * round-trip query (identical checks, two sources). */
  private val docSchemaJson =
    """{"type":"object","required":["doc_id","text"],
        "properties":{
          "doc_id":{"type":"integer","minimum":0},
          "text":{"type":"string","minLength":60,"maxLength":400,"pattern":"[A-Za-z]"},
          "n_chars":{"minimum":0,"maximum":375},
          "lang":{"enum":["en","es","fr","de"]},
          "source":{"type":"string","pattern":"^src[0-9]+$"}}}"""

  private def jsonSchemaViolationCounts(df: DataFrame): DataFrame = {
    val suite = JsonSchema.parse(docSchemaJson, "doc_id", tableSchema = Some(df.schema))
      .fold(es => throw new IllegalStateException(es.map(_.msg).mkString("; ")), identity)
    val compiled = suite.compile(df.schema)
      .fold(es => throw new IllegalStateException(es.map(_.msg).mkString("; ")), identity)
    compiled.run(df).violations.groupBy(col("constraint_id")).agg(count(lit(1)).as("n"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- validation engine: row-local checks (C4-C7, C2, C8, C21) ----
    "v_range" -> ((s, dir) => {
      val c = Range("l_quantity", 1, 30)
      ld(s, dir, "lineitem").filter(!c.pred)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
    }),
    "v_enum" -> ((s, dir) => {
      val c = EnumIn("o_orderpriority", Seq("1-URGENT", "2-HIGH", "3-MEDIUM"))
      ld(s, dir, "orders").filter(!c.pred)
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
    }),
    "v_nonnull_regex" -> ((s, dir) => {
      val nn = NonNull("c_name"); val re = Regex("c_name", "^Customer#[0-9]{9}$")
      ld(s, dir, "customer").agg(
        sum((!nn.pred).cast(LongType)).as("n_null"),
        sum((!re.pred).cast(LongType)).as("n_bad_name"),
        count(lit(1)).as("n_rows"))
    }),
    "v_decimal_range" -> ((s, dir) => {
      // EXACT decimal bounds beyond double precision: big_id = orderkey
      // concatenated with 18 zeros plus the line number — 24-digit values
      // whose +-1 differences vanish in f64. The threshold ends in ...003,
      // so boundary rows (orderkey 100, lines 4..7) are distinguishable
      // ONLY in the decimal domain; a double-domain Range would misjudge
      // them. The oracle reproduces the same DECIMAL(38,0) arithmetic.
      val bigId = concat(col("l_orderkey").cast(StringType),
          lit("000000000000000000")).cast(DecimalType(38, 0)) +
        col("l_linenumber").cast(DecimalType(38, 0))
      val c = DecimalRange("big_id",
        max = Some(BigDecimal("100000000000000000003")))
      ld(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), bigId.as("big_id"))
        .filter(!c.pred)
        .select(col("l_orderkey"), col("l_linenumber"))
    }),
    "v_length" -> ((s, dir) => {
      val c = LengthBounds("text", Some(50), Some(400))
      ld(s, dir, "documents").filter(!c.pred)
        .select(col("doc_id"), length(col("text")).as("len"))
    }),
    "v_multipleof" -> ((s, dir) => {
      val c = MultipleOf("p_size", 5.0)
      ld(s, dir, "part").filter(!c.pred).select(col("p_partkey"), col("p_size"))
    }),
    "v_anyof" -> ((s, dir) => {
      val c = AnyOf("cheap_or_urgent", Seq(
        Range("o_totalprice", max = 150000),
        EnumIn("o_orderpriority", Seq("1-URGENT", "2-HIGH"))))
      ld(s, dir, "orders").filter(!c.pred).select(col("o_orderkey"))
    }),
    "v_tag" -> ((s, dir) => {
      val c = TagDispatch("by_type", "event_type", Map(
        "purchase" -> Range("value", 0, 300),
        "click" -> Range("value", 0, 50)))
      ld(s, dir, "events").filter(!c.pred)
        .select(col("event_id"), col("event_type"))
    }),
    "a_elem_at" -> ((s, dir) => {
      val c = ArrayElemAtRange("embedding", 1, -0.3, 0.3)
      ld(s, dir, "embeddings").filter(!c.pred).select(col("vec_id"))
    }),
    "a_elem_tail" -> ((s, dir) => { // additionalItems analog (C12 tail)
      val c = ArrayTailRange("embedding", 3, -0.45, 0.45)
      ld(s, dir, "embeddings").filter(!c.pred).select(col("vec_id"))
    }),
    // ---- runtime JSON Schema → engine → violation profile (loader E2E) ----
    "v_jsonschema" -> ((s, dir) =>
      jsonSchemaViolationCounts(ld(s, dir, "documents"))),
    "j_jsonl" -> ((s, dir) => { // JSONL round-trip: the reference's native
      // input form — export, re-parse with an explicit schema + corrupt
      // capture, validate. The export is part of the measured operator (a
      // JSON source benchmark), and gives the oracle the same bytes.
      val docs = ld(s, dir, "documents")
      val path = DataGen.DocumentsJsonlFixturePath
      docs.write.mode("overwrite").json(path)
      val (valid, corrupt) = sources.JsonCorpus.readSplit(s, path, docs.schema)
      jsonSchemaViolationCounts(valid)
        .union(s.range(1).select(lit("corrupt_lines").as("constraint_id"),
          lit(corrupt.count()).as("n")))
    }),
    // ---- cross-row: uniqueness / referential (SURVEY.md §2.4) ----
    "v_unique" -> ((s, dir) => // agg checks emit native-typed keys; stringify for the oracle
      Unique("l_orderkey").run(ld(s, dir, "lineitem"))
        .select(col("key").cast(StringType).as("key"), col("actual"))),
    "v_unique_salted" -> ((s, dir) => // explicit two-phase salted variant
      Unique("l_orderkey", salted = true, saltBuckets = 16).run(ld(s, dir, "lineitem"))
        .select(col("key").cast(StringType).as("key"), col("actual"))),
    "v_unique_tuple" -> ((s, dir) => // composite-key uniqueness: the few
      // (order, part) collisions in the synthetic lineitem
      UniqueTuple(Seq("l_orderkey", "l_partkey")).run(ld(s, dir, "lineitem"))
        .select(col("key"), col("actual"))),
    "v_format" -> ((s, dir) => { // draft-07 format vocabulary: candidate
      // strings derived deterministically from doc_id (planted-invalid on
      // residue classes), judged by the SAME anchored regexes DuckDB runs —
      // a cross-dialect (Java regex vs RE2) agreement check, one scan
      val d = col("doc_id")
      val base = ld(s, dir, "documents").select(
        d,
        when(d % 7 === 0, lit("bad email@@x"))
          .otherwise(concat(lit("user"), d.cast(StringType), lit("@example.com"))).as("email"),
        when(d % 5 === 0, lit("256.1.2.3"))
          .otherwise(concat((d % 256).cast(StringType), lit(".10.20."),
            (d % 250).cast(StringType))).as("ip"),
        when(d % 3 === 0, lit("not-a-uuid"))
          .otherwise(concat(lit("0000"), lpad((d % 10000).cast(StringType), 4, "0"),
            lit("-0000-4000-8000-000000000000"))).as("uid"),
        when(d % 4 === 0, lit("2024-13-01T12:00:00Z"))
          .otherwise(concat(lit("2024-01-"),
            lpad((d % 28 + 1).cast(StringType), 2, "0"), lit("T"),
            lpad((d % 24).cast(StringType), 2, "0"), lit(":30:00Z"))).as("dt"))
      base.agg(
        sum((!FormatCheck("email", "email").pred).cast(LongType)).as("n_bad_email"),
        sum((!FormatCheck("ip", "ipv4").pred).cast(LongType)).as("n_bad_ipv4"),
        sum((!FormatCheck("uid", "uuid").pred).cast(LongType)).as("n_bad_uuid"),
        sum((!FormatCheck("dt", "date-time").pred).cast(LongType)).as("n_bad_dt"),
        count(lit(1)).as("n_rows"))
    }),
    "v_compliance" -> ((s, dir) => // statistical gate: sources where fewer
      // than 10% of docs reach 500 chars breach — exact fixed-point rates,
      // two LONGs per group over the wire
      Compliance(Range("n_chars", min = 500), minPassFp = 100000L,
        groupBy = Some("source")).run(ld(s, dir, "documents"))),
    "v_monotonic" -> ((s, dir) => // sequential gate: per-user purchase-value
      // monotonicity along the event counter — one violation row PER GROUP
      // with the break count and the first break (pay-per-defect)
      MonotonicWithin("user_id", "event_id", "value_c")
        .run(ld(s, dir, "events").withColumn("value_c", cents(col("value"))))),
    "v_suggest_composite" -> ((s, dir) => { // minimal composite keys over a
      // per-user event sequence: (user_id, seq) is the natural key by
      // construction; neither alone is; (event_type, seq) can't reach n
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("ts")
      val t = ld(s, dir, "events")
        .select(col("user_id"), col("event_type"),
          row_number().over(w).cast(LongType).as("seq"))
      Suggest.compositeKeyDf(s, t, Seq("user_id", "event_type", "seq"))
    }),
    "v_ref" -> ((s, dir) => {
      val dim = ld(s, dir, "customer").filter(col("c_custkey") >= 10) // active-customer dim
      RefIntegrity("user_id", dim, "c_custkey").run(ld(s, dir, "events"))
        .select(col("key").cast(StringType).as("key"), col("actual"))
    }),
    // ---- column stats (Q1-style aggregation; cents-exact) ----
    "v_stats" -> ((s, dir) =>
      ld(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          count(lit(1)).as("n"),
          sum(cents(col("l_quantity"))).as("sum_qty_c"),
          sum(cents(col("l_extendedprice"))).as("sum_price_c"),
          min(col("l_quantity")).as("min_qty"),
          max(col("l_quantity")).as("max_qty"),
          countDistinct(col("l_orderkey")).as("n_orders"))),
    // ---- drift: exact histogram cells (integer-only oracle) + χ² (engine) ----
    "v_drift_hist" -> ((s, dir) =>
      Drift.histogram(ld(s, dir, "documents"), "n_chars", "source", 50.0)),
    "v_drift_chi2" -> ((s, dir) => // rows-only: float statistic
      Drift.chiSquare(ld(s, dir, "documents"), "n_chars", "source", 50.0)
        .select(col("source"), col("chi2"), col("grp_total"))),
    "v_drift_ks" -> ((s, dir) => // rows-only: float statistic
      Drift.ks(ld(s, dir, "documents"), "n_chars", "source", 50.0)
        .select(col("source"), col("ks"), col("grp_total"))),
    // fixed-point variants: per-term rounding makes the statistic
    // order-independent → oracle-exact (no float summation ambiguity)
    "v_drift_chi2_fp" -> ((s, dir) =>
      Drift.chiSquareFixedPoint(ld(s, dir, "documents"), "n_chars", "source", 50.0)),
    "v_drift_ks_fp" -> ((s, dir) =>
      Drift.ksFixedPoint(ld(s, dir, "documents"), "n_chars", "source", 50.0)),
    "v_drift_psi" -> ((s, dir) => // rows-only: ln() statistic
      Drift.psi(ld(s, dir, "documents"), "n_chars", "source", 50.0)
        .select(col("source"), col("psi"), col("grp_total"))),
    "v_drift_psi_fp" -> ((s, dir) =>
      Drift.psiFixedPoint(ld(s, dir, "documents"), "n_chars", "source", 50.0)),
    // ---- profiling → suggestion → metrics history (the Deequ-shaped loop) ----
    "v_profile" -> ((s, dir) => // exact per-column profile, cents fixed point
      Profiler.profile(ld(s, dir, "documents"))),
    "v_profile_by" -> ((s, dir) => // grouped form: one profile row per (lang, column)
      Profiler.profileBy(ld(s, dir, "documents"), "lang", Seq("doc_id", "n_chars"))),
    "v_suggest" -> ((s, dir) => // deterministic rule derivation from the profile
      Suggest.suggestDf(s, ld(s, dir, "documents"))),
    "v_col_order" -> ((s, dir) => { // cross-column ordering constraint: one
      // frequently-violated <= and one always-holding strict <, both judged
      // in one codegen'd scan (null-complete rows exempt per the leaf stance)
      val le = ColOrder("l_discount", "l_tax")
      val lt = ColOrder("l_quantity", "l_extendedprice", allowEqual = false)
      ld(s, dir, "lineitem").agg(
        sum((!le.pred).cast(LongType)).as("n_discount_gt_tax"),
        sum((!lt.pred).cast(LongType)).as("n_qty_ge_price"),
        count(lit(1)).as("n_rows"))
    }),
    "v_suggest_orderings" -> ((s, dir) => // cross-column ordering DISCOVERY:
      // which a<=b / a<b / a==b invariants hold on every complete row —
      // ONE aggregation judges all candidate pairs
      Suggest.orderingsDf(s, ld(s, dir, "lineitem"),
        Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))),
    "v_suggest_apply" -> ((s, dir) => // round trip: the suggested suite holds
      // on its own training table BY CONSTRUCTION -> the oracle asserts EMPTY
      Suggest.applyToSelf(ld(s, dir, "documents"), "doc_id")
        .groupBy(col("constraint_id")).agg(count(lit(1)).as("n"))),
    "v_metrics_anomaly" -> ((s, dir) => // metrics repo + run-over-run drift:
      // six-run planted-jump history (see ensureMetricsRepoFixture)
      MetricsRepo.relChangeAnomalies(
        MetricsRepo.history(s, ensureMetricsRepoFixture(s, dir)), maxPct = 20)),
    "v_metrics_seasonal" -> ((s, dir) => // the seasonal form: same history
      // compared at lag 2 — each run against two completed runs back
      MetricsRepo.relChangeAnomalies(
        MetricsRepo.history(s, ensureMetricsRepoFixture(s, dir)),
        maxPct = 20, seasonLag = 2)),
    "v_metrics_interval" -> ((s, dir) => // historical-envelope strategy over
      // the same history: run 3 (+37%) exits the prior [min,max] ± 10% range
      MetricsRepo.intervalAnomalies(
        MetricsRepo.history(s, ensureMetricsRepoFixture(s, dir)),
        atSeq = 3, widenPct = 10)),
    "v_schema_diff" -> ((s, dir) => { // static drift vs a frozen expected schema
      val expected = StructType(Seq(
        StructField("doc_id", LongType), StructField("text", StringType),
        StructField("source", StringType),
        StructField("n_chars", IntegerType), // actual is long -> type_changed
        StructField("quality", DoubleType))) // absent in actual -> removed
      SchemaDiff.diffDf(s, expected, ld(s, dir, "documents").schema)
    }),
    "v_profile_quantiles" -> ((s, dir) => // exact SQL-standard discrete
      // quantiles in the cents domain — always actual column elements
      Profiler.profileQuantiles(ld(s, dir, "documents"), Seq("doc_id", "n_chars"))),
    "v_quantile_shift" -> ((s, dir) => { // the drift a histogram-χ² misses:
      // a doubled-length ingest keeps the shape but moves every quantile ×2
      // -> n_chars breaches at 100-char tolerance, doc_id (unchanged) never
      val ref = ld(s, dir, "documents")
      val cur = ref.withColumn("n_chars", col("n_chars") * 2)
      Drift.quantileShift(ref, cur, Seq("doc_id", "n_chars"), maxShiftC = 10000L)
    }),
    "v_top_values" -> ((s, dir) => // exact top-5 most frequent values per
      // column, two-phase bounded-heap (never a full per-column sort)
      Profiler.topValues(ld(s, dir, "documents"), Seq("lang", "source", "n_chars"), 5)),
    "v_top_approx" -> ((s, dir) => // Misra-Gries one-pass heavy hitters;
      // capacity 64 >= both distinct counts -> err 0, counts EXACT (the
      // summary self-certifies, and the oracle holds it to the exact answer)
      Profiler.topValuesApprox(ld(s, dir, "documents"), Seq("lang", "source"),
        k = 5, capacity = 64)),
    "v_corr_stats" -> ((s, dir) => // exact correlation sufficient stats in
      // the cents domain; decimal sums stringified for the comparator
      // (pandas/duckdb would coerce big decimals to lossy float64)
      Stats.correlationStats(ld(s, dir, "lineitem"),
        Seq("l_quantity", "l_extendedprice", "l_discount"))
        .select(col("col_x"), col("col_y"), col("n"),
          col("sum_x").cast(StringType).as("sum_x"),
          col("sum_y").cast(StringType).as("sum_y"),
          col("sum_xx").cast(StringType).as("sum_xx"),
          col("sum_yy").cast(StringType).as("sum_yy"),
          col("sum_xy").cast(StringType).as("sum_xy"),
          col("pearson_fp"))),
    // ---- window / top-k ----
    "w_top3_per_cust" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("o_custkey").orderBy(desc("price_c"), col("o_orderkey"))
      ld(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"), cents(col("o_totalprice")).as("price_c"))
        .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
    }),
    "q_topk_orders" -> ((s, dir) =>
      ld(s, dir, "orders")
        .select(col("o_orderkey"), cents(col("o_totalprice")).as("price_c"))
        .orderBy(desc("price_c"), col("o_orderkey")).limit(10)),
    // ---- array checks over real array data (C11, C13, C15 analogs) ----
    "a_elem_domain" -> ((s, dir) =>
      ld(s, dir, "embeddings")
        .withColumn("n_bad", size(filter(col("embedding"), x => abs(x) > 0.45)))
        .filter(col("n_bad") > 0).select(col("vec_id"), col("n_bad"))),
    "a_dims" -> ((s, dir) =>
      ld(s, dir, "embeddings")
        .groupBy(size(col("embedding")).as("dim")).agg(count(lit(1)).as("n"))),
    "a_contains" -> ((s, dir) =>
      ld(s, dir, "embeddings")
        .filter(!exists(col("embedding"), x => x > lit(0.4)))
        .select(col("vec_id"))),
    "a_contains_schema" -> ((s, dir) => { // C13 general form: contains-SCHEMA
      val c = ArrayContainsSchema("embedding", Seq(ElemRange(0.3, 0.4)))
      ld(s, dir, "embeddings").filter(!c.pred).select(col("vec_id"))
    }),
    // ---- dedup ----
    "d_dedup_exact" -> ((s, dir) =>
      Dedup.exact(ld(s, dir, "documents"), "text", "doc_id")
        .select(col("sig"), col("n"), col("keep_id"))),
    "d_dedup_keep" -> ((s, dir) =>
      Dedup.dropExactDups(ld(s, dir, "documents"), "text", "doc_id")
        .select(col("doc_id"))),
    "d_dedup_against" -> ((s, dir) => { // incremental: new batch vs stored corpus
      // deterministic "daily ingest": 20% of the corpus re-crawled verbatim
      // (re-keyed) + 20% re-crawled with changed text; only the changed
      // docs survive the against-the-store gate
      val docs = ld(s, dir, "documents").filter(col("text").isNotNull)
      val recrawl = docs.filter(col("doc_id") % 5 === 0)
        .select((col("doc_id") + 10000).as("doc_id"), col("text"))
      val fresh = docs.filter(col("doc_id") % 5 === 1)
        .select((col("doc_id") + 20000).as("doc_id"),
          concat(col("text"), lit(" fresh suffix")).as("text"))
      Dedup.dropExactDupsAgainst(recrawl.union(fresh), "text", "doc_id",
        Dedup.exactSignatures(docs, "text", "doc_id"))
        .select("doc_id")
    }),
    "d_fingerprint" -> ((s, dir) =>
      ld(s, dir, "documents")
        .select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp"))),
    "d_minhash_pairs" -> ((s, dir) => // oracle via signature fixture
      Dedup.minhashLsh(ld(s, dir, "documents").filter(col("doc_id") < 2000),
        "text", "doc_id", numHashes = 64, bands = 16, shingleK = 1,
        threshold = 0.5, maxBucket = 500)),
    "d_simhash_pairs" -> ((s, dir) => // oracle via signature fixture
      Dedup.simhashPairs(ld(s, dir, "documents").filter(col("doc_id") < 2000),
        "text", "doc_id", shingleK = 2, maxHamming = 8, maxBucket = 500)),
    "d_ngram_jaccard" -> ((s, dir) =>
      // maxBlock = unbounded HERE because the DuckDB oracle joins every
      // block — the correctness gate must not depend on fixture block sizes
      // staying under the production guard default
      Dedup.ngramJaccard(ld(s, dir, "documents"), "text", "doc_id",
        blockCols = Seq("source", "lang"), shingleK = 1, minJaccard = 0.8,
        maxBlock = Int.MaxValue)
        .select(col("id_a"), col("id_b"), col("inter"), col("uni"))),
    "d_dup_spans" -> ((s, dir) => // duplicated 3-word spans across >= 5 docs
      Dedup.duplicatedSpans(ld(s, dir, "documents"), "text",
        spanWords = 3, minDocs = 5)),
    "d_neardup_drop" -> ((s, dir) => // oracle via verified-edge fixture
      Dedup.dropNearDups(ld(s, dir, "documents").filter(col("doc_id") < 2000),
        "text", "doc_id", numHashes = 64, bands = 16, shingleK = 1,
        threshold = 0.7, maxBucket = 500)
        .select(col("doc_id"))),
    "d_neardup_clusters" -> ((s, dir) => // audit report; oracle via the same edge fixture
      Dedup.nearDupClusters(ld(s, dir, "documents").filter(col("doc_id") < 2000),
        "text", "doc_id", numHashes = 64, bands = 16, shingleK = 1,
        threshold = 0.7, maxBucket = 500)),
    "d_neardup_embed" -> ((s, dir) => // SemDeDup shape; oracle via embed_edges fixture
      Dedup.dropNearDupsByEmbedding(DataGen.embedNearDupCorpus(s, dir),
        "embedding", "vec_id", threshold = 0.95, bands = 8, planesPerBand = 4,
        maxBucket = 500)
        .select(col("vec_id"))),
    "d_neardup_embed_clusters" -> ((s, dir) => // embedding-cluster audit report
      Dedup.nearDupClustersByEmbedding(DataGen.embedNearDupCorpus(s, dir),
        "embedding", "vec_id", threshold = 0.95, bands = 8, planesPerBand = 4,
        maxBucket = 500)),
    // ---- similarity search ----
    "s_ann_quantized" -> ((s, dir) => {
      val e = ld(s, dir, "embeddings")
      val q = broadcast(e.filter(col("vec_id") === 0).select(col("embedding").as("qv")))
      e.filter(col("vec_id") =!= 0).join(q)
        .select(col("vec_id"), Similarity.quantizedDot(col("embedding"), col("qv")).as("dot"))
        .orderBy(desc("dot"), col("vec_id")).limit(10)
    }),
    "s_ann_cosine" -> ((s, dir) => { // oracle: DuckDB recomputes double cosine
      val e = ld(s, dir, "embeddings")
      Similarity.bruteForceTopK(e.filter(col("vec_id") =!= 0), "embedding", "vec_id",
        e.filter(col("vec_id") === 0), "embedding", 10)
    }),
    "s_ann_lsh" -> ((s, dir) => // oracle via band fixture (scale path)
      Similarity.cosineLshPairs(ld(s, dir, "embeddings"), "embedding", "vec_id",
        threshold = 0.4, bands = 8, planesPerBand = 4)),
    "s_ann_ivf" -> ((s, dir) => { // oracle via index/probe fixture
      val e = ld(s, dir, "embeddings")
      val model = ivfModel(s, dir)
      val q = e.filter(col("vec_id") === 0).select("embedding").head()
        .getSeq[Float](0).map(_.toDouble).toArray
      Ivf.searchTopK(Ivf.index(e.filter(col("vec_id") =!= 0), "embedding", model),
        "embedding", "vec_id", model, q, k = 10, nprobe = 3)
        .select("vec_id", "list_id")
    }),
    "s_ann_ivf_batch" -> ((s, dir) => {
      // batched IVF search, ORACLE-EXACT: nprobe = nlist makes the probe set
      // exhaustive, so results equal brute-force top-k independent of the
      // trained centroids; quantized integer dot scores are cross-engine
      // bit-stable. The plumbing under test (probe explode -> static list
      // filter -> broadcast query join -> per-query window top-k) is exactly
      // the production path; only the probe COVERAGE is widened for the gate.
      val e = ld(s, dir, "embeddings")
      val model = ivfModel(s, dir)
      val queries = e.filter(col("vec_id") < 3)
        .select(col("vec_id").as("qid"), col("embedding"))
      Ivf.searchTopKBatch(Ivf.index(e.filter(col("vec_id") >= 3), "embedding", model),
        "embedding", "vec_id", model, queries, "embedding", "qid",
        k = 5, nprobe = 8, score = (a, b) => Similarity.quantizedDot(a, b))
        .select(col("query_id"), col("vec_id"), col("score").cast(LongType).as("dot"), col("rn"))
    }),
    "s_ann_ivf_batch_probe" -> ((s, dir) => { // oracle via index/probe fixture (nprobe < nlist)
      val e = ld(s, dir, "embeddings")
      val model = ivfModel(s, dir)
      val queries = e.filter(col("vec_id") < 3)
        .select(col("vec_id").as("qid"), col("embedding"))
      Ivf.searchTopKBatch(Ivf.index(e.filter(col("vec_id") >= 3), "embedding", model),
        "embedding", "vec_id", model, queries, "embedding", "qid", k = 5, nprobe = 3)
        .select("query_id", "vec_id", "rn")
    }),
    // ---- text analysis ----
    "t_tokens" -> ((s, dir) =>
      ld(s, dir, "documents").select(
        col("doc_id"),
        TextAnalysis.whitespaceTokens(col("text")).as("n_ws"),
        TextAnalysis.bpeIshTokens(col("text")).as("n_bpe"))),
    "t_quality" -> ((s, dir) => {
      val d = ld(s, dir, "documents")
      val feats = TextAnalysis.qualityFeatures(col("text"))
      d.groupBy(col("source"))
        .agg(
          sum(feats.toMap.apply("n_words").cast(LongType)).as("words"),
          sum(feats.toMap.apply("n_distinct_words").cast(LongType)).as("distinct_words"),
          sum(feats.toMap.apply("n_punct").cast(LongType)).as("punct"),
          sum(TextAnalysis.qualityPass(col("text")).cast(LongType)).as("n_pass"),
          count(lit(1)).as("n"))
    }),
    "t_filter_audit" -> ((s, dir) => { // per-stage drop attribution (one scan)
      val t = col("text")
      val (_, audit) = Pipeline.filterWithAudit(ld(s, dir, "documents"), Seq(
        "length" -> length(t).between(50, 400),
        "quality" -> TextAnalysis.qualityPass(t),
        "digits" -> (TextAnalysis.matchCount(t, "[0-9]") * 10 <= length(t))))
      audit
    }),
    "t_langid" -> ((s, dir) =>
      ld(s, dir, "documents")
        .select(col("doc_id"), TextAnalysis.langId(col("text")).as("lang_pred"))),
    "t_top_terms" -> ((s, dir) =>
      TextAnalysis.topTerms(ld(s, dir, "documents"), "text", 50)),
    "t_tfidf" -> ((s, dir) => // per-doc top-3 keywords, fixed-point idf
      TextAnalysis.tfidfTopTerms(ld(s, dir, "documents"), "text", "doc_id", 3)),
    "t_repetition" -> ((s, dir) => // Gopher repetition signals (exact ints)
      TextAnalysis.repetitionProfile(
        ld(s, dir, "documents").filter(col("text").isNotNull), "text")),
    "t_gopher_quality" -> ((s, dir) => { // the REST of the Gopher heuristics
      val t = col("text")
      val feats = TextAnalysis.gopherQualityFeatures(t)
      ld(s, dir, "documents").filter(t.isNotNull).select(
        (col("doc_id") +: feats.map { case (n, c) => c.as(n) }) :+
          TextAnalysis.gopherQualityPass(t).as("q_pass"): _*)
    }),
    "t_unigram_lp" -> ((s, dir) => { // unigram LM likelihood (CCNet-style)
      val docs = ld(s, dir, "documents").filter(col("text").isNotNull)
      UnigramLM.score(docs, "text", lmModel(s, dir))
        .filter(col("n_tok") > 0)
        .select(col("doc_id"), col("logprob_fp"), col("n_tok"))
    }),
    "t_bigram_lp" -> ((s, dir) => { // interpolated-bigram LM likelihood
      val docs = ld(s, dir, "documents").filter(col("text").isNotNull)
      UnigramLM.scoreBigram(docs, "text", bigramModel(s, dir))
        .filter(col("n_tok") > 0)
        .select(col("doc_id"), col("logprob_fp"), col("n_tok"))
    }),
    "t_trigram_lp" -> ((s, dir) => { // interpolated-trigram LM likelihood
      val docs = ld(s, dir, "documents").filter(col("text").isNotNull)
      UnigramLM.scoreTrigram(docs, "text", trigramModel(s, dir))
        .filter(col("n_tok") > 0)
        .select(col("doc_id"), col("logprob_fp"), col("n_tok"))
    }),
    "t_5gram_lp" -> ((s, dir) => { // order-5 interpolated LM (the CCNet 5-gram filter shape)
      val docs = ld(s, dir, "documents").filter(col("text").isNotNull)
      UnigramLM.scoreNgram(docs, "text", fivegramModel(s, dir))
        .filter(col("n_tok") > 0)
        .select(col("doc_id"), col("logprob_fp"), col("n_tok"))
    }),
    "t_5gram_lp_bc" -> ((s, dir) => { // same 5-gram model, executor-shared broadcast form
      val docs = ld(s, dir, "documents").filter(col("text").isNotNull)
      UnigramLM.scoreNgramBroadcast(docs, "text", fivegramBcModel(s, dir))
        .filter(col("n_tok") > 0)
        .select(col("doc_id"), col("logprob_fp"), col("n_tok"))
    }),
    "t_ppl_buckets" -> ((s, dir) => { // CCNet head/middle/tail perplexity split
      val docs = ld(s, dir, "documents").filter(col("text").isNotNull)
      val scored = UnigramLM.scoreNgram(docs, "text", fivegramModel(s, dir))
        .filter(col("n_tok") > 0)
        .select(col("doc_id"), col("logprob_fp"), col("n_tok"))
        .withColumn("ppl_fp", UnigramLM.perplexityFp(col("logprob_fp"), col("n_tok")))
      UnigramLM.perplexityBucketsExact(scored, "doc_id", "ppl_fp",
          sampleFraction = 0.5)
        .select(col("doc_id"), col("ppl_fp"), col("bucket"))
    }),
    "t_ppl_buckets_lang" -> ((s, dir) => { // CCNet's actual form: PER-LANGUAGE tertiles
      val docs = ld(s, dir, "documents").filter(col("text").isNotNull)
      val scored = UnigramLM.scoreNgram(docs, "text", fivegramModel(s, dir))
        .filter(col("n_tok") > 0)
        .select(col("doc_id"), col("lang"), col("logprob_fp"), col("n_tok"))
        .withColumn("ppl_fp", UnigramLM.perplexityFp(col("logprob_fp"), col("n_tok")))
      UnigramLM.perplexityBucketsExactByGroup(scored, "doc_id", "ppl_fp", "lang",
          sampleFraction = 0.5)
        .select(col("doc_id"), col("lang"), col("ppl_fp"), col("bucket"))
    }),
    "t_ccnet_select" -> ((s, dir) => { // the composed selection: keep head+middle per lang
      val docs = ld(s, dir, "documents").filter(col("text").isNotNull)
      val (survivors, _) = Pipeline.ccnetSelect(docs, "text", "doc_id", "lang",
        fivegramModel(s, dir), keep = Set("head", "middle"),
        sampleFraction = 0.5, exact = true)
      survivors.select(col("doc_id"), col("lang"), col("ppl_fp"), col("bucket"))
    }),
    "t_classifier" -> ((s, dir) => { // NB log-odds quality classifier (fastText shape)
      val docs = ld(s, dir, "documents").filter(col("text").isNotNull)
      QualityClassifier.score(docs, "text", classifierModel(s, dir))
        .filter(col("n_tok") > 0)
        .select(col("doc_id"), col("score_fp"), col("n_tok"))
    }),
    "t_redact" -> ((s, dir) => { // pattern redaction (PII-scrub primitive)
      val t = col("text")
      ld(s, dir, "documents").select(
        col("doc_id"),
        TextAnalysis.redact(t,
          Seq("[0-9]+" -> "<NUM>", "[aeiou]{2,}" -> "<VOWELS>")).as("redacted"),
        TextAnalysis.matchCount(t, "[0-9]+").as("n_num"))
    }),
    "p_sample" -> ((s, dir) => { // oracle via auditGate fixture
      // pre-project for scan pruning (see p_balance note; doc_id non-null)
      val d = ld(s, dir, "documents").select("doc_id", "lang")
      val (train, test) = Sampling.trainTestSplit(d, "doc_id", testFraction = 0.2)
      val strat = Sampling.stratifiedSample(d, "lang", "doc_id",
        Map("en" -> 0.5), defaultFraction = 1.0)
      train.select(lit("train").as("part"), col("doc_id"))
        .union(test.select(lit("test").as("part"), col("doc_id")))
        .union(strat.select(lit("strat").as("part"), col("doc_id")))
    }),
    "p_cap_exact" -> ((s, dir) => // exact-k per-stratum cap (gate fixture oracle)
      Sampling.capStrataExact(ld(s, dir, "documents").select("doc_id", "lang"),
        "lang", "doc_id", maxRows = 40)),
    "p_weighted" -> ((s, dir) => { // per-row weighted sampling (gate fixture oracle)
      val d = ld(s, dir, "documents").select("doc_id", "n_chars")
        .withColumn("w", col("n_chars") / lit(400.0))
      Sampling.weightedSample(d, "doc_id", "w").select("doc_id")
    }),
    "p_balance" -> ((s, dir) => { // domain-mixture rebalance (oracle via gate fixture)
      // project BEFORE sampling: the gate's null-key fallback binds every
      // column of the frame it is given, so sampling the full table would
      // drag a full-width scan (PlanSpec asserts the pruned shape). doc_id
      // is non-null here → gate values are unchanged by the projection.
      Sampling.balanceToMix(ld(s, dir, "documents").select("doc_id", "lang"),
        "lang", "doc_id", Map("en" -> 0.5, "fr" -> 0.25, "de" -> 0.25))
    }),
    // ---- events: windowed agg / sessionization / set ops ----
    "e_window" -> ((s, dir) =>
      ld(s, dir, "events")
        .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
        .agg(count(lit(1)).as("n"), sum(cents(col("value"))).as("value_c"))),
    "e_sessions" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      // ts arrives TIMESTAMP_NTZ; session TZ is UTC so the cast is identity
      val us = unix_micros(col("ts").cast(TimestampType))
      ld(s, dir, "events")
        .withColumn("prev_us", lag(us, 1).over(w))
        .withColumn("new_sess",
          (col("prev_us").isNull || (us - col("prev_us")) > 1800000000L).cast(LongType))
        .groupBy(col("user_id")).agg(sum(col("new_sess")).as("n_sessions"))
    }),
    "e_except" -> ((s, dir) => {
      val ev = ld(s, dir, "events")
      ev.filter(col("event_type") === "click").select(col("user_id")).distinct()
        .except(ev.filter(col("event_type") === "purchase").select(col("user_id")).distinct())
    }),
    // ---- temporal joins: as-of + interval range ----
    "j_asof_purchase" -> ((s, dir) => { // each non-purchase event annotated
      // with the user's most recent purchase at-or-before it: the shuffle-
      // native sort-merge as-of (one exchange of both sides on the key, one
      // sort, zero row amplification), adjudicated by DuckDB's NATIVE ASOF
      // JOIN — two independent implementations of the operator
      val ev = ld(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
          col("event_id").as("p_event_id"), cents(col("value")).as("p_value_c"))
      Joins.asofJoin(
        ev.filter(col("event_type") =!= "purchase")
          .select("event_id", "user_id", "ts", "event_type"),
        purchases, "user_id", "p_user", "ts", "p_ts",
        Seq("p_event_id", "p_value_c"), tieBreak = Some("p_event_id"))
    }),
    "j_range_window" -> ((s, dir) => { // clicks landing inside any sampled
      // purchase's 2-hour window: keyless interval containment as a bucketed
      // EQUI-join (no BroadcastNestedLoopJoin), DuckDB's inequality join
      // (IEJoin) as the independent oracle
      val ev = ld(s, dir, "events")
      val windows = ev
        .filter(col("event_type") === "purchase" && col("event_id") % 10 === 0)
        .select(col("event_id").as("w_id"), col("ts").as("w_start"),
          (col("ts") + expr("INTERVAL 2 HOURS")).as("w_end"))
      Joins.rangeJoinBucketed(
        ev.filter(col("event_type") === "click").select("event_id", "ts"),
        windows, "ts", "w_start", "w_end", Seq("w_id"), bucketWidth = 7200)
    }),
    // ---- multimodal plumbing (meta profile is oracle-exact) ----
    "m_meta" -> ((s, dir) =>
      Multimodal.metaProfile(Multimodal.asBinaryTable(ld(s, dir, "documents"), "doc_id", "text"))),
    "m_decode" -> ((s, dir) => { // REAL header decode vs generation ground truth
      // the fixture carries real JDK-encoded images + planted corrupt
      // payloads; the query decodes ONLY the bytes (MediaCodec header
      // parse), the oracle reads the generation-time true_* columns —
      // a genuine cross-implementation check, nothing circular
      val media = s.read.parquet(DataGen.ensureMediaFixture(s))
        .select("doc_id", "payload")
      Multimodal.decodeMeta(s, media).toDF()
        .select(col("doc_id"), col("format"), col("width"), col("height"),
          col("n_frames"), col("ok"))
    }),
    "m_audio" -> ((s, dir) => { // REAL WAV/RIFF header decode vs ground truth
      val audio = s.read.parquet(DataGen.ensureAudioFixture(s))
        .select("doc_id", "payload")
      Multimodal.decodeAudioMeta(s, audio).toDF()
        .select(col("doc_id"), col("format"), col("channels"), col("sample_rate"),
          col("bits"), col("n_samples"), col("ok"))
    }),
    "m_codec_audio" -> ((s, dir) => { // hand-parsed MP3 + FLAC headers vs ground truth
      val audio = s.read.parquet(DataGen.ensureCodecAudioFixture(s))
        .select("doc_id", "payload")
      Multimodal.decodeAudioMeta(s, audio).toDF()
        .select(col("doc_id"), col("format"), col("channels"), col("sample_rate"),
          col("bits"), col("n_samples"), col("ok"))
    }),
    "m_video" -> ((s, dir) => { // MP4 moov/mvhd/tkhd box walk vs ground truth
      val video = s.read.parquet(DataGen.ensureVideoFixture(s))
        .select("doc_id", "payload")
      Multimodal.decodeVideoMeta(s, video).toDF()
        .select(col("doc_id"), col("format"), col("width"), col("height"),
          col("duration_ms"), col("ok"))
    }),
    // ---- flagship synthetic-corpus validation (rows-only: engine-native) ----
    "seq_validate" -> ((s, dir) => {
      val corpus = DataGen.sequences(s, 20000, maxLen = 32)
      val compiled = DataGen.standardSuite(s, maxLen = 32).compile(Seq_.schema)
        .fold(es => throw new IllegalStateException(es.map(_.msg).mkString("; ")), identity)
      compiled.run(corpus).violations
        .groupBy(col("constraint_id")).agg(count(lit(1)).as("n"))
    }),
    "v_oov_rate" -> ((s, dir) => // per-source OOV rate over the token
      // arrays: one codegen'd array pass per row, three LONGs per group
      // shuffled (never the tokens), exact fixed-point rate
      Drift.oovProfile(DataGen.sequences(s, 20000, maxLen = 32),
        "tokens", "source", DataGen.VOCAB)),
    "v_oov_shift" -> ((s, dir) => { // tokenizer-change drill: the same
      // corpus profiled under the real vocab vs a halved one — every
      // source's rate jumps past 1% and breaches
      val corpus = DataGen.sequences(s, 20000, maxLen = 32)
      Drift.oovShift(
        Drift.oovProfile(corpus, "tokens", "source", DataGen.VOCAB),
        Drift.oovProfile(corpus, "tokens", "source", DataGen.VOCAB / 2),
        "source", maxDeltaFp = 10000)
    }),
    "v_pad_layout" -> ((s, dir) => { // right-padded batch layout: the three
      // pad-boundary invariants positional checks can't express (the
      // boundary is per-row dynamic) — each a one-pass zero-allocation
      // codegen'd kernel; four LONGs per source over the wire, never tokens
      val corpus = DataGen.paddedSequences(s, 20000, maxLen = 32)
      val suffixOk = PadSuffixOnly("tokens", DataGen.PAD).pred
      val endsOk = EndsWithToken("tokens", DataGen.EOS, DataGen.PAD).pred
      val lenOk = PadAwareLength("tokens", "n_tok", DataGen.PAD).pred
      corpus.groupBy(col("source")).agg(
        sum((!suffixOk).cast(LongType)).as("n_interior_pad"),
        sum((!endsOk).cast(LongType)).as("n_missing_eos"),
        sum((!lenOk).cast(LongType)).as("n_len_mismatch"),
        count(lit(1)).as("n_rows"))
    }),
    "v_token_drift" -> ((s, dir) => { // tokenizer-swap drill: token-unigram
      // RATE drift per source via bounded MG summaries (no explode) — the
      // current side remaps forums tokens onto HALF the id space, so every
      // watchlist token's rate roughly doubles or vanishes; other sources
      // are bit-identical. Vocab 101 < capacity 128 ⇒ err 0 ⇒ exact.
      val base = DataGen.sequences(s, 20000, maxLen = 32)
        .filter(col("tokens").isNotNull && col("source").isNotNull)
      val refToks = transform(col("tokens"), t => pmod(t, lit(101)))
      val curToks = when(col("source") === "forums",
        transform(col("tokens"), t => pmod(t, lit(51)))).otherwise(refToks)
      val ref = Drift.tokenUnigramProfile(
        base.select(col("source"), refToks.as("tokens")), "tokens", "source", 128)
      val cur = Drift.tokenUnigramProfile(
        base.select(col("source"), curToks.as("tokens")), "tokens", "source", 128)
      Drift.tokenUnigramShift(ref, cur, "source", topK = 20, maxDeltaFp = 500)
        .select(col("source"), col("n_top"), col("n_breach"),
          col("max_abs_delta_fp"), col("breach"))
    }),
    "v_reconcile" -> ((s, dir) => { // pipeline row accounting: bidirectional
      // multiplicity-aware key parity between a corpus and a deterministic
      // mutation of it (dropped / duplicated / invented keys) — per-key
      // counts collapse map-side, ONE full-outer join on the key
      val docs = ld(s, dir, "documents").select(col("doc_id"))
      val right = docs.filter(col("doc_id") % 13 =!= 0)
        .unionByName(docs.filter(col("doc_id") % 17 === 0))
        .unionByName(docs.filter(col("doc_id") % 19 === 0)
          .select((col("doc_id") + 10000000L).as("doc_id")))
      Reconcile.keyParity(docs, right, "doc_id")
    }),
    "v_row_parity" -> ((s, dir) => { // CONTENT parity: keyParity's blind spot
      // is a rewrite that keeps every key and silently edits row content —
      // rowParity fingerprints full rows and compares per-key content
      // multisets. Deterministic mutation: edit text on %7, drop %13,
      // duplicate %17, invent %19 keys
      val docs = ld(s, dir, "documents")
      val kept = docs.filter(col("doc_id") % 13 =!= 0)
      val mutated = kept.withColumn("text",
        when(col("doc_id") % 7 === 0, concat(col("text"), lit("x")))
          .otherwise(col("text")))
      val right = mutated
        .unionByName(docs.filter(col("doc_id") % 17 === 0))
        .unionByName(docs.filter(col("doc_id") % 19 === 0)
          .withColumn("doc_id", col("doc_id") + 10000000L))
      Reconcile.rowParity(docs, right, "doc_id")
    }),
    "v_col_diff" -> ((s, dir) => { // rowParity's diagnostic tail: WHICH
      // column did the rewrite corrupt — per-column multiset-fingerprint
      // compare over keys with matching multiplicity. Deterministic
      // mutation: text on %7, n_chars on %11, lang on %23; %13 dropped and
      // %17 duplicated prove the compared-key scope excludes them
      val docs = ld(s, dir, "documents")
      val mut = docs.filter(col("doc_id") % 13 =!= 0)
        .withColumn("text", when(col("doc_id") % 7 === 0,
          concat(col("text"), lit("x"))).otherwise(col("text")))
        .withColumn("n_chars", when(col("doc_id") % 11 === 0,
          col("n_chars") + 1L).otherwise(col("n_chars")))
        .withColumn("lang", when(col("doc_id") % 23 === 0,
          concat(col("lang"), lit("x"))).otherwise(col("lang")))
      val right = mut.unionByName(docs.filter(col("doc_id") % 17 === 0))
      Reconcile.columnDiff(docs, right, "doc_id")
    }),
    "v_diff_examples" -> ((s, dir) => { // bounded examples after a red
      // parity gate: the 25 smallest non-match keys with their disposition —
      // ordered limit plans as TakeOrderedAndProject, deterministic at any
      // parallelism (same mutation as v_row_parity)
      val docs = ld(s, dir, "documents")
      val kept = docs.filter(col("doc_id") % 13 =!= 0)
      val mutated = kept.withColumn("text",
        when(col("doc_id") % 7 === 0, concat(col("text"), lit("x")))
          .otherwise(col("text")))
      val right = mutated
        .unionByName(docs.filter(col("doc_id") % 17 === 0))
        .unionByName(docs.filter(col("doc_id") % 19 === 0)
          .withColumn("doc_id", col("doc_id") + 10000000L))
      Reconcile.diffExamples(docs, right, "doc_id", 25)
    }),
    "v_ref_table" -> ((s, dir) => { // serializable referential check: the
      // dimension is a TABLE PATH loaded through TableIO at run (config
      // form of v_ref); planted orphans via shifted region keys
      val nation = ld(s, dir, "nation")
      val fact = nation.unionByName(
        nation.filter(col("n_nationkey") % 5 === 0)
          .withColumn("n_regionkey", col("n_regionkey") + lit(100)))
      RefIntegrityTable("n_regionkey", s"$dir/region.parquet", "r_regionkey")
        .run(fact)
        .select(col("constraint_id"), col("path"), col("actual"),
          col("key").cast(LongType).as("key"))
    }),
    "v_triage" -> ((s, dir) => { // violation triage: top error CLASSES per
      // check (digit runs folded to '#') with counts + exemplars — the
      // human-entry point after a 10^9-violation run; bounded-heap top-k,
      // no window sort. Violations-shaped frame derived from documents
      val docs = ld(s, dir, "documents")
      val vios = docs.select(
        col("source").as("constraint_id"),
        concat(lit("lang="), col("lang"), lit(" n="), col("n_chars"))
          .as("actual"),
        col("doc_id").cast(StringType).as("doc_id"))
      Triage.topViolations(vios, k = 3, normalize = true)
    }),
    "v_pad_waste" -> ((s, dir) => // padding-waste efficiency profile: the
      // fraction of scanned tokens that are pad, per source — the compute
      // cost of the padded layout, exact ×10^6 fixed point
      Stats.padWasteProfile(DataGen.paddedSequences(s, 20000, maxLen = 32),
        "tokens", "source", DataGen.PAD)),
    "v_segments" -> ((s, dir) => { // packed-batch segment structure: every
      // EOS-delimited document's length in [1, MAX_SEG] — empty segments
      // (consecutive separators) and over-context documents breach; one
      // codegen'd pass per row, three LONGs per source over the wire
      val corpus = DataGen.packedSequences(s, 20000)
      val ok = SegmentLengthBounds("tokens", DataGen.EOS, 1L, DataGen.MAX_SEG).pred
      val bad = graft.functions.VecFunctions.array_bad_segments(
        col("tokens"), DataGen.EOS, 1L, DataGen.MAX_SEG)
      corpus.groupBy(col("source")).agg(
        sum((!ok).cast(LongType)).as("n_bad_rows"),
        sum(bad).as("n_bad_segments"),
        count(lit(1)).as("n_rows"))
    }),
    "seq_decontaminate" -> ((s, dir) => { // rows-only: 64-bit span hashes
      val corpus = DataGen.sequences(s, 20000, maxLen = 32)
      // benchmark = a deterministic slice of the corpus itself -> those
      // sequences (and any sharing a 13-token window) must be flagged
      val benchmark = corpus.filter(pmod(xxhash64(col("doc_id")), lit(100)) === 0)
        .select(col("tokens"))
      Decontaminate.overlapReport(corpus.filter(col("n_tok") >= 13), "tokens", "doc_id",
        benchmark, "tokens", n = 13)
        .agg(count(lit(1)).as("n_contaminated"), sum("n_overlap").as("total_overlap"))
    }),
    "seq_quarantine" -> ((s, dir) => { // the produce-side split: clean rows
      // (original schema) for training, quarantined rows carrying their
      // violation entries — counts must agree with the report by
      // construction, and the oracle re-derives both sides per-row
      val corpus = DataGen.sequences(s, 20000, maxLen = 32)
      val compiled = DataGen.standardSuite(s, maxLen = 32).compile(Seq_.schema)
        .fold(es => throw new IllegalStateException(es.map(_.msg).mkString("; ")), identity)
      val (clean, quarantined) = compiled.split(corpus)
      clean.agg(count(lit(1)).as("n_clean")).crossJoin(
        quarantined.agg(count(lit(1)).as("n_quarantined"),
          sum(size(col("violations"))).as("n_entries")))
    }),
    "seq_report" -> ((s, dir) => {
      val corpus = DataGen.sequences(s, 20000, maxLen = 32)
      val compiled = DataGen.standardSuite(s, maxLen = 32).compile(Seq_.schema)
        .fold(es => throw new IllegalStateException(es.map(_.msg).mkString("; ")), identity)
      compiled.run(corpus).report
        .agg(sum("rows").as("rows"), sum("pass").as("pass"), sum("fail").as("fail"))
    }))

  /** Oracle SQL with fixture paths rebased onto the CURRENT fixture scope
    * (set by Verify from its sfDir argument): the literals below are written
    * against the unscoped root and rewritten here at dump time, so a Verify
    * run at one SF can never hand the driver oracle SQL pointing at another
    * SF's fixtures. */
  def oracleSql: Map[String, String] = {
    val m = oracleSqlRaw.map { case (k, v) =>
      k -> v.replace("/root/repo/target/fixtures/", DataGen.fixtureRoot + "/")
    }
    // The broadcast-form 5-gram query scores the SAME model with the same
    // arithmetic through a different transport — one SQL mirror serves both
    // (both must be oracle-exact independently).
    m + ("t_5gram_lp_bc" -> m("t_5gram_lp"))
  }

  /** Shared CTE chain of the order-5 LM oracles: tokenize, mirror all
    * five training levels (same vocabulary sizes and tie-breaks as the
    * memoized fivegramModel), and emit the per-token fixed-point
    * log-prob column `v` in CTE `lp`. t_5gram_lp (and its broadcast
    * twin) aggregate it per document; t_ppl_buckets additionally
    * derives the perplexity proxy and sampled tertile thresholds. */
  private val fiveGramLpCtes: String =
    """WITH d AS (
           SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS words
           FROM documents WHERE text IS NOT NULL),
         toks AS (
           SELECT doc_id, p, words[p] AS cur,
                  CASE WHEN p > 1 THEN words[p-1] END AS prev,
                  CASE WHEN p > 2 THEN words[p-2] END AS prev2,
                  CASE WHEN p > 3 THEN words[p-3] END AS prev3,
                  CASE WHEN p > 4 THEN words[p-4] END AS prev4
           FROM d, unnest(range(1, len(words)+1)) AS t(p)),
         tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM toks),
         uni AS (
           SELECT cur AS term, CAST(count(*) AS BIGINT) AS c FROM toks
           GROUP BY cur ORDER BY c DESC, term ASC LIMIT 500),
         big AS (
           SELECT prev || chr(1) || cur AS g, CAST(count(*) AS BIGINT) AS c
           FROM toks WHERE prev IS NOT NULL
           GROUP BY prev || chr(1) || cur ORDER BY c DESC, g ASC LIMIT 1000),
         tri AS (
           SELECT prev2 || chr(1) || prev || chr(1) || cur AS g,
                  CAST(count(*) AS BIGINT) AS c
           FROM toks WHERE prev2 IS NOT NULL
           GROUP BY prev2 || chr(1) || prev || chr(1) || cur
           ORDER BY c DESC, g ASC LIMIT 2000),
         qua AS (
           SELECT prev3 || chr(1) || prev2 || chr(1) || prev || chr(1) || cur AS g,
                  CAST(count(*) AS BIGINT) AS c
           FROM toks WHERE prev3 IS NOT NULL
           GROUP BY prev3 || chr(1) || prev2 || chr(1) || prev || chr(1) || cur
           ORDER BY c DESC, g ASC LIMIT 3000),
         fiv AS (
           SELECT prev4 || chr(1) || prev3 || chr(1) || prev2 || chr(1) || prev || chr(1) || cur AS g,
                  CAST(count(*) AS BIGINT) AS c
           FROM toks WHERE prev4 IS NOT NULL
           GROUP BY prev4 || chr(1) || prev3 || chr(1) || prev2 || chr(1) || prev || chr(1) || cur
           ORDER BY c DESC, g ASC LIMIT 4000),
         lp AS (
           SELECT t.doc_id,
                  CAST(round(ln(CASE
                    WHEN t.prev IS NULL OR up.c IS NULL
                    THEN CAST(coalesce(uc.c, 1) AS DOUBLE) / (SELECT n FROM tot)
                    WHEN t.prev2 IS NULL OR b2.c IS NULL
                    THEN 0.5 * (CAST(coalesce(b.c, 0) AS DOUBLE) / up.c)
                       + 0.5 * (CAST(coalesce(uc.c, 1) AS DOUBLE) / (SELECT n FROM tot))
                    WHEN t.prev3 IS NULL OR t3.c IS NULL
                    THEN 0.5 * (CAST(coalesce(g3.c, 0) AS DOUBLE) / b2.c)
                       + 0.25 * (CAST(coalesce(b.c, 0) AS DOUBLE) / up.c)
                       + 0.25 * (CAST(coalesce(uc.c, 1) AS DOUBLE) / (SELECT n FROM tot))
                    WHEN t.prev4 IS NULL OR q4.c IS NULL
                    THEN 0.5 * (CAST(coalesce(g4.c, 0) AS DOUBLE) / t3.c)
                       + 0.25 * (CAST(coalesce(g3.c, 0) AS DOUBLE) / b2.c)
                       + 0.125 * (CAST(coalesce(b.c, 0) AS DOUBLE) / up.c)
                       + 0.125 * (CAST(coalesce(uc.c, 1) AS DOUBLE) / (SELECT n FROM tot))
                    ELSE 0.5 * (CAST(coalesce(g5.c, 0) AS DOUBLE) / q4.c)
                       + 0.25 * (CAST(coalesce(g4.c, 0) AS DOUBLE) / t3.c)
                       + 0.125 * (CAST(coalesce(g3.c, 0) AS DOUBLE) / b2.c)
                       + 0.0625 * (CAST(coalesce(b.c, 0) AS DOUBLE) / up.c)
                       + 0.0625 * (CAST(coalesce(uc.c, 1) AS DOUBLE) / (SELECT n FROM tot))
                    END) * 1e6) AS BIGINT) AS v
           FROM toks t
           LEFT JOIN uni uc ON t.cur = uc.term
           LEFT JOIN uni up ON t.prev = up.term
           LEFT JOIN big b ON t.prev || chr(1) || t.cur = b.g
           LEFT JOIN big b2 ON t.prev2 || chr(1) || t.prev = b2.g
           LEFT JOIN tri g3 ON t.prev2 || chr(1) || t.prev || chr(1) || t.cur = g3.g
           LEFT JOIN tri t3 ON t.prev3 || chr(1) || t.prev2 || chr(1) || t.prev = t3.g
           LEFT JOIN qua g4 ON t.prev3 || chr(1) || t.prev2 || chr(1) || t.prev || chr(1) || t.cur = g4.g
           LEFT JOIN qua q4 ON t.prev4 || chr(1) || t.prev3 || chr(1) || t.prev2 || chr(1) || t.prev = q4.g
           LEFT JOIN fiv g5 ON t.prev4 || chr(1) || t.prev3 || chr(1) || t.prev2 || chr(1) || t.prev || chr(1) || t.cur = g5.g)"""

  /** Per-language tertile oracle (CCNet's per-language cutoffs): the
    * 5-gram CTE chain + per-lang window order statistics. Shared by
    * t_ppl_buckets_lang and the composed t_ccnet_select. */
  private val pplBucketsLangSql: String =
    s"""$fiveGramLpCtes,
         score AS (
           SELECT doc_id, CAST(sum(v) AS BIGINT) AS lp,
                  CAST(count(*) AS BIGINT) AS nt
           FROM lp GROUP BY doc_id),
         ppl AS (SELECT doc_id, (-lp) // nt AS ppl_fp FROM score WHERE nt > 0),
         g AS (
           SELECT doc_id, g_ppl FROM read_parquet('/root/repo/target/fixtures/sample_gates.parquet/*.parquet')),
         dl AS (SELECT doc_id, lang FROM documents),
         samp AS (
           SELECT dl.lang, p.ppl_fp FROM ppl p
           JOIN g USING (doc_id) JOIN dl USING (doc_id)
           WHERE g.g_ppl < 500000),
         r AS (
           SELECT lang, ppl_fp,
                  row_number() OVER (PARTITION BY lang ORDER BY ppl_fp) AS rn,
                  count(*) OVER (PARTITION BY lang) AS c
           FROM samp),
         t AS (
           SELECT lang,
                  max(CASE WHEN rn <= (c + 2) // 3 THEN ppl_fp END) AS t1,
                  max(CASE WHEN rn <= (2 * c + 2) // 3 THEN ppl_fp END) AS t2
           FROM r GROUP BY lang)
         SELECT p.doc_id, dl.lang, p.ppl_fp,
                CASE WHEN p.ppl_fp <= t.t1 THEN 'head'
                     WHEN p.ppl_fp <= t.t2 THEN 'middle'
                     ELSE 'tail' END AS bucket
         FROM ppl p JOIN dl USING (doc_id) JOIN t ON dl.lang = t.lang"""

  private def oracleSqlRaw: Map[String, String] = Map(
    "v_range" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
         WHERE NOT (l_quantity >= 1 AND l_quantity <= 30)""",
    "v_enum" ->
      """SELECT o_orderpriority, count(*) AS n FROM orders
         WHERE o_orderpriority NOT IN ('1-URGENT','2-HIGH','3-MEDIUM')
         GROUP BY o_orderpriority""",
    "v_nonnull_regex" ->
      """SELECT CAST(sum(CASE WHEN c_name IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
                CAST(sum(CASE WHEN c_name IS NOT NULL AND NOT regexp_matches(c_name, '^Customer#[0-9]{9}$')
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_bad_name,
                count(*) AS n_rows
         FROM customer""",
    "v_unique" ->
      """SELECT CAST(l_orderkey AS VARCHAR) AS key,
                'count=' || CAST(count(*) AS VARCHAR) AS actual
         FROM lineitem GROUP BY l_orderkey HAVING count(*) > 1""",
    "v_unique_salted" ->
      """SELECT CAST(l_orderkey AS VARCHAR) AS key,
                'count=' || CAST(count(*) AS VARCHAR) AS actual
         FROM lineitem GROUP BY l_orderkey HAVING count(*) > 1""",
    "v_decimal_range" ->
      """SELECT l_orderkey, l_linenumber FROM lineitem
         WHERE CAST(CAST(l_orderkey AS VARCHAR) || '000000000000000000' AS DECIMAL(38,0))
               + CAST(l_linenumber AS DECIMAL(38,0))
               > CAST('100000000000000000003' AS DECIMAL(38,0))""",
    "v_length" ->
      """SELECT doc_id, length(text) AS len FROM documents
         WHERE NOT (length(text) >= 50 AND length(text) <= 400)""",
    "v_multipleof" ->
      """SELECT p_partkey, p_size FROM part WHERE NOT (p_size % 5 = 0)""",
    "v_anyof" ->
      """SELECT o_orderkey FROM orders
         WHERE NOT (o_totalprice <= 150000 OR o_orderpriority IN ('1-URGENT','2-HIGH'))""",
    "v_tag" ->
      """SELECT event_id, event_type FROM events
         WHERE NOT (CASE WHEN event_type = 'click' THEN value >= 0 AND value <= 50
                         WHEN event_type = 'purchase' THEN value >= 0 AND value <= 300
                         ELSE TRUE END)""",
    "a_elem_at" ->
      """SELECT vec_id FROM embeddings
         WHERE len(embedding) >= 1
           AND NOT (embedding[1] >= -0.3 AND embedding[1] <= 0.3)""",
    "a_elem_tail" ->
      """SELECT vec_id FROM embeddings
         WHERE len(list_filter(embedding[3:], x -> NOT (x >= -0.45 AND x <= 0.45))) > 0""",
    "v_jsonschema" ->
      """WITH v AS (
           SELECT 'nonnull(doc_id)' AS constraint_id, count(*) AS n FROM documents WHERE doc_id IS NULL
           UNION ALL SELECT 'nonnull(text)', count(*) FROM documents WHERE text IS NULL
           UNION ALL SELECT 'range(doc_id)', count(*) FROM documents
             WHERE doc_id IS NOT NULL AND NOT (doc_id >= 0)
           UNION ALL SELECT 'length(text)', count(*) FROM documents
             WHERE text IS NOT NULL AND NOT (length(text) >= 60 AND length(text) <= 400)
           UNION ALL SELECT 'regex(text)', count(*) FROM documents
             WHERE text IS NOT NULL AND NOT regexp_matches(text, '[A-Za-z]')
           UNION ALL SELECT 'range(n_chars)', count(*) FROM documents
             WHERE n_chars IS NOT NULL AND NOT (n_chars >= 0 AND n_chars <= 375)
           UNION ALL SELECT 'enum(lang)', count(*) FROM documents
             WHERE lang IS NOT NULL AND lang NOT IN ('en','es','fr','de')
           UNION ALL SELECT 'regex(source)', count(*) FROM documents
             WHERE source IS NOT NULL AND NOT regexp_matches(source, '^src[0-9]+$'))
         SELECT constraint_id, CAST(n AS BIGINT) AS n FROM v WHERE n > 0""",
    "j_jsonl" ->
      // Same checks as v_jsonschema but over the JSONL export the query
      // itself writes; corrupt_lines is 0 by construction (clean export) —
      // malformed-line capture is covered by ScalaTest with planted garbage.
      """WITH documents AS (
           SELECT * FROM read_json('/root/repo/target/fixtures/documents_jsonl/*.json',
                                   format='newline_delimited',
                                   columns={doc_id:'BIGINT', text:'VARCHAR',
                                            lang:'VARCHAR', source:'VARCHAR',
                                            n_chars:'BIGINT'})),
         v AS (
           SELECT 'nonnull(doc_id)' AS constraint_id, count(*) AS n FROM documents WHERE doc_id IS NULL
           UNION ALL SELECT 'nonnull(text)', count(*) FROM documents WHERE text IS NULL
           UNION ALL SELECT 'range(doc_id)', count(*) FROM documents
             WHERE doc_id IS NOT NULL AND NOT (doc_id >= 0)
           UNION ALL SELECT 'length(text)', count(*) FROM documents
             WHERE text IS NOT NULL AND NOT (length(text) >= 60 AND length(text) <= 400)
           UNION ALL SELECT 'regex(text)', count(*) FROM documents
             WHERE text IS NOT NULL AND NOT regexp_matches(text, '[A-Za-z]')
           UNION ALL SELECT 'range(n_chars)', count(*) FROM documents
             WHERE n_chars IS NOT NULL AND NOT (n_chars >= 0 AND n_chars <= 375)
           UNION ALL SELECT 'enum(lang)', count(*) FROM documents
             WHERE lang IS NOT NULL AND lang NOT IN ('en','es','fr','de')
           UNION ALL SELECT 'regex(source)', count(*) FROM documents
             WHERE source IS NOT NULL AND NOT regexp_matches(source, '^src[0-9]+$'))
         SELECT constraint_id, CAST(n AS BIGINT) AS n FROM v WHERE n > 0
         UNION ALL SELECT 'corrupt_lines', CAST(0 AS BIGINT)""",
    "v_drift_chi2_fp" ->
      """WITH binned AS (
           SELECT source AS grp, CAST(floor(n_chars / 50.0) AS BIGINT) AS bin
           FROM documents WHERE n_chars IS NOT NULL AND source IS NOT NULL),
         obs AS (SELECT grp, bin, count(*) AS obs FROM binned GROUP BY grp, bin),
         gt AS (SELECT grp, CAST(sum(obs) AS BIGINT) AS grp_total FROM obs GROUP BY grp),
         bt AS (SELECT bin, CAST(sum(obs) AS BIGINT) AS bin_total FROM obs GROUP BY bin),
         tot AS (SELECT CAST(sum(obs) AS BIGINT) AS n_total FROM obs),
         cells AS (
           SELECT gt.grp, gt.grp_total, bt.bin, bt.bin_total,
                  COALESCE(obs.obs, 0) AS obs, tot.n_total
           FROM gt CROSS JOIN bt
           LEFT JOIN obs ON obs.grp = gt.grp AND obs.bin = bt.bin
           CROSS JOIN tot),
         terms AS (
           SELECT grp, grp_total,
                  CAST(round(CASE
                    WHEN CAST(grp_total AS DOUBLE) * bin_total / n_total > 0
                    THEN (obs - CAST(grp_total AS DOUBLE) * bin_total / n_total)
                       * (obs - CAST(grp_total AS DOUBLE) * bin_total / n_total)
                       / (CAST(grp_total AS DOUBLE) * bin_total / n_total)
                    ELSE 0 END * 1000000.0) AS BIGINT) AS term_fp
           FROM cells)
         SELECT grp AS source, CAST(sum(term_fp) AS BIGINT) AS chi2_fp, grp_total
         FROM terms GROUP BY grp, grp_total""",
    "v_profile" ->
      // exact per-column profile: numeric bounds in cents (round(min)*100 is
      // monotonic, so min/max commute with the transform), string bounds as
      // length extrema; sums CAST to BIGINT (DuckDB sums to HUGEINT)
      """WITH p AS (SELECT count(*) AS n,
           CAST(sum(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nu_doc_id,
           count(DISTINCT doc_id) AS nd_doc_id,
           CAST(round(min(doc_id)*100) AS BIGINT) AS mn_doc_id,
           CAST(round(max(doc_id)*100) AS BIGINT) AS mx_doc_id,
           CAST(sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nu_text,
           count(DISTINCT text) AS nd_text,
           CAST(min(length(text)) AS BIGINT) AS mnl_text,
           CAST(max(length(text)) AS BIGINT) AS mxl_text,
           CAST(sum(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nu_lang,
           count(DISTINCT lang) AS nd_lang,
           CAST(min(length(lang)) AS BIGINT) AS mnl_lang,
           CAST(max(length(lang)) AS BIGINT) AS mxl_lang,
           CAST(sum(CASE WHEN source IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nu_source,
           count(DISTINCT source) AS nd_source,
           CAST(min(length(source)) AS BIGINT) AS mnl_source,
           CAST(max(length(source)) AS BIGINT) AS mxl_source,
           CAST(sum(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nu_n_chars,
           count(DISTINCT n_chars) AS nd_n_chars,
           CAST(round(min(n_chars)*100) AS BIGINT) AS mn_n_chars,
           CAST(round(max(n_chars)*100) AS BIGINT) AS mx_n_chars
         FROM documents)
         SELECT 'doc_id' AS col_name, 'long' AS dtype, n, nu_doc_id AS nulls,
                nd_doc_id AS n_distinct, mn_doc_id AS min_c, mx_doc_id AS max_c,
                CAST(NULL AS BIGINT) AS min_len, CAST(NULL AS BIGINT) AS max_len FROM p
         UNION ALL SELECT 'text', 'string', n, nu_text, nd_text,
                CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), mnl_text, mxl_text FROM p
         UNION ALL SELECT 'lang', 'string', n, nu_lang, nd_lang,
                CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), mnl_lang, mxl_lang FROM p
         UNION ALL SELECT 'source', 'string', n, nu_source, nd_source,
                CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), mnl_source, mxl_source FROM p
         UNION ALL SELECT 'n_chars', 'long', n, nu_n_chars, nd_n_chars,
                mn_n_chars, mx_n_chars, CAST(NULL AS BIGINT), CAST(NULL AS BIGINT) FROM p""",
    "v_profile_by" ->
      """WITH p AS (
           SELECT lang, count(*) AS n,
             CAST(sum(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nu_doc_id,
             count(DISTINCT doc_id) AS nd_doc_id,
             CAST(round(min(doc_id)*100) AS BIGINT) AS mn_doc_id,
             CAST(round(max(doc_id)*100) AS BIGINT) AS mx_doc_id,
             CAST(sum(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nu_n_chars,
             count(DISTINCT n_chars) AS nd_n_chars,
             CAST(round(min(n_chars)*100) AS BIGINT) AS mn_n_chars,
             CAST(round(max(n_chars)*100) AS BIGINT) AS mx_n_chars
           FROM documents GROUP BY lang)
         SELECT lang, 'doc_id' AS col_name, 'long' AS dtype, n, nu_doc_id AS nulls,
                nd_doc_id AS n_distinct, mn_doc_id AS min_c, mx_doc_id AS max_c,
                CAST(NULL AS BIGINT) AS min_len, CAST(NULL AS BIGINT) AS max_len FROM p
         UNION ALL SELECT lang, 'n_chars', 'long', n, nu_n_chars, nd_n_chars,
                mn_n_chars, mx_n_chars, CAST(NULL AS BIGINT), CAST(NULL AS BIGINT) FROM p""",
    "v_suggest" ->
      // mirrors Suggest.suggest's rule derivation (enumMaxK = 8): each rule
      // row is emitted under the same condition the Scala side tests
      """WITH p AS (SELECT count(*) AS n,
           CAST(sum(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nu_doc_id,
           count(DISTINCT doc_id) AS nd_doc_id,
           CAST(round(min(doc_id)*100) AS BIGINT) AS mn_doc_id,
           CAST(round(max(doc_id)*100) AS BIGINT) AS mx_doc_id,
           CAST(sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nu_text,
           count(DISTINCT text) AS nd_text,
           min(length(text)) AS mnl_text, max(length(text)) AS mxl_text,
           CAST(sum(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nu_lang,
           count(DISTINCT lang) AS nd_lang,
           min(length(lang)) AS mnl_lang, max(length(lang)) AS mxl_lang,
           CAST(sum(CASE WHEN source IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nu_source,
           count(DISTINCT source) AS nd_source,
           min(length(source)) AS mnl_source, max(length(source)) AS mxl_source,
           CAST(sum(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nu_n_chars,
           count(DISTINCT n_chars) AS nd_n_chars,
           CAST(round(min(n_chars)*100) AS BIGINT) AS mn_n_chars,
           CAST(round(max(n_chars)*100) AS BIGINT) AS mx_n_chars
         FROM documents)
         SELECT 'doc_id' AS col_name, 'non_null' AS rule, 'not null' AS bound FROM p WHERE nu_doc_id = 0 AND n > 0
         UNION ALL SELECT 'doc_id', 'unique', 'distinct == rows' FROM p WHERE n > 0 AND nu_doc_id = 0 AND nd_doc_id = n
         UNION ALL SELECT 'doc_id', 'range', '[' || mn_doc_id || ',' || mx_doc_id || ']' FROM p WHERE n - nu_doc_id > 0
         UNION ALL SELECT 'text', 'non_null', 'not null' FROM p WHERE nu_text = 0 AND n > 0
         UNION ALL SELECT 'text', 'unique', 'distinct == rows' FROM p WHERE n > 0 AND nu_text = 0 AND nd_text = n
         UNION ALL SELECT 'text', 'enum',
           (SELECT string_agg(DISTINCT text, ',' ORDER BY text) FROM documents WHERE text IS NOT NULL)
           FROM p WHERE n - nu_text > 0 AND nd_text <= 8
         UNION ALL SELECT 'text', 'length', '[' || mnl_text || ',' || mxl_text || ']' FROM p WHERE n - nu_text > 0
         UNION ALL SELECT 'lang', 'non_null', 'not null' FROM p WHERE nu_lang = 0 AND n > 0
         UNION ALL SELECT 'lang', 'unique', 'distinct == rows' FROM p WHERE n > 0 AND nu_lang = 0 AND nd_lang = n
         UNION ALL SELECT 'lang', 'enum',
           (SELECT string_agg(DISTINCT lang, ',' ORDER BY lang) FROM documents WHERE lang IS NOT NULL)
           FROM p WHERE n - nu_lang > 0 AND nd_lang <= 8
         UNION ALL SELECT 'lang', 'length', '[' || mnl_lang || ',' || mxl_lang || ']' FROM p WHERE n - nu_lang > 0
         UNION ALL SELECT 'source', 'non_null', 'not null' FROM p WHERE nu_source = 0 AND n > 0
         UNION ALL SELECT 'source', 'unique', 'distinct == rows' FROM p WHERE n > 0 AND nu_source = 0 AND nd_source = n
         UNION ALL SELECT 'source', 'enum',
           (SELECT string_agg(DISTINCT source, ',' ORDER BY source) FROM documents WHERE source IS NOT NULL)
           FROM p WHERE n - nu_source > 0 AND nd_source <= 8
         UNION ALL SELECT 'source', 'length', '[' || mnl_source || ',' || mxl_source || ']' FROM p WHERE n - nu_source > 0
         UNION ALL SELECT 'n_chars', 'non_null', 'not null' FROM p WHERE nu_n_chars = 0 AND n > 0
         UNION ALL SELECT 'n_chars', 'unique', 'distinct == rows' FROM p WHERE n > 0 AND nu_n_chars = 0 AND nd_n_chars = n
         UNION ALL SELECT 'n_chars', 'range', '[' || mn_n_chars || ',' || mx_n_chars || ']' FROM p WHERE n - nu_n_chars > 0""",
    "v_suggest_apply" ->
      // the semantic claim IS the empty set: every suggested bound is an
      // observed extremum, so the suite cannot fail on its training table
      """SELECT CAST(NULL AS VARCHAR) AS constraint_id, CAST(0 AS BIGINT) AS n WHERE 1 = 0""",
    "v_metrics_anomaly" ->
      // same lag-window + cross-multiplied integer threshold over the
      // fixture history the Spark query just (re)wrote
      """WITH h AS (
           SELECT CAST(run AS BIGINT) AS run, metric, CAST(value AS BIGINT) AS value
           FROM read_parquet('/root/repo/target/fixtures/metrics_repo/run=*/*.parquet',
                             hive_partitioning = 1)),
         l AS (
           SELECT run, metric, value,
                  lag(value) OVER (PARTITION BY metric ORDER BY run) AS prev
           FROM h)
         SELECT run, metric, prev, value FROM l
         WHERE prev IS NOT NULL
           AND ((prev = 0 AND value <> 0)
             OR (prev <> 0 AND abs(value - prev) * 100 > 20 * abs(prev)))""",
    "v_metrics_seasonal" ->
      // lag-2 comparison over the same fixture history — the seasonal form
      """WITH h AS (
           SELECT CAST(run AS BIGINT) AS run, metric, CAST(value AS BIGINT) AS value
           FROM read_parquet('/root/repo/target/fixtures/metrics_repo/run=*/*.parquet',
                             hive_partitioning = 1)),
         l AS (
           SELECT run, metric, value,
                  lag(value, 2) OVER (PARTITION BY metric ORDER BY run) AS prev
           FROM h)
         SELECT run, metric, prev, value FROM l
         WHERE prev IS NOT NULL
           AND ((prev = 0 AND value <> 0)
             OR (prev <> 0 AND abs(value - prev) * 100 > 20 * abs(prev)))""",
    "v_unique_tuple" ->
      // composite-key duplicate groups, key rendered as '|'-joined values
      """SELECT CAST(l_orderkey AS VARCHAR) || '|' || CAST(l_partkey AS VARCHAR) AS key,
                'count=' || CAST(count(*) AS VARCHAR) AS actual
         FROM lineitem
         WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL
         GROUP BY l_orderkey, l_partkey
         HAVING count(*) > 1""",
    "v_format" ->
      // the SAME pattern strings (interpolated from Formats.patterns, single
      // quotes doubled for the SQL literal) run under DuckDB's RE2 — the
      // patterns are written in the Java/RE2 common subset, so the verdicts
      // must agree bit-for-bit
      s"""WITH f AS (
           SELECT doc_id,
                  CASE WHEN doc_id % 7 = 0 THEN 'bad email@@x'
                       ELSE 'user' || CAST(doc_id AS VARCHAR) || '@example.com' END AS email,
                  CASE WHEN doc_id % 5 = 0 THEN '256.1.2.3'
                       ELSE CAST(doc_id % 256 AS VARCHAR) || '.10.20.' || CAST(doc_id % 250 AS VARCHAR) END AS ip,
                  CASE WHEN doc_id % 3 = 0 THEN 'not-a-uuid'
                       ELSE '0000' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || '-0000-4000-8000-000000000000' END AS uid,
                  CASE WHEN doc_id % 4 = 0 THEN '2024-13-01T12:00:00Z'
                       ELSE '2024-01-' || lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0')
                            || 'T' || lpad(CAST(doc_id % 24 AS VARCHAR), 2, '0') || ':30:00Z' END AS dt
           FROM documents)
         SELECT CAST(sum(CASE WHEN NOT regexp_matches(email, '${Formats.patterns("email").replace("'", "''")}') THEN 1 ELSE 0 END) AS BIGINT) AS n_bad_email,
                CAST(sum(CASE WHEN NOT regexp_matches(ip, '${Formats.patterns("ipv4")}') THEN 1 ELSE 0 END) AS BIGINT) AS n_bad_ipv4,
                CAST(sum(CASE WHEN NOT regexp_matches(uid, '${Formats.patterns("uuid")}') THEN 1 ELSE 0 END) AS BIGINT) AS n_bad_uuid,
                CAST(sum(CASE WHEN NOT regexp_matches(dt, '${Formats.patterns("date-time")}') THEN 1 ELSE 0 END) AS BIGINT) AS n_bad_dt,
                count(*) AS n_rows
         FROM f""",
    "v_compliance" ->
      // exact fixed-point rate mirror: HUGEINT product, // floor division,
      // same null-passes leaf stance inside the compliance predicate
      """WITH p AS (
           SELECT CAST(source AS VARCHAR) AS key, count(*) AS n,
                  CAST(sum(CASE WHEN n_chars IS NULL OR CAST(n_chars AS DOUBLE) >= 500
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_pass
           FROM documents GROUP BY source)
         SELECT 'compliance(range(n_chars) by source)' AS constraint_id,
                'range(n_chars)' AS path,
                'pass rate >= 100000/10^6' AS bound,
                'pass_fp=' || CAST(CAST((CAST(n_pass AS HUGEINT) * 1000000) // n AS BIGINT) AS VARCHAR)
                  || ' (' || CAST(n_pass AS VARCHAR) || ' of ' || CAST(n AS VARCHAR) || ')' AS actual,
                key
         FROM p
         WHERE CAST((CAST(n_pass AS HUGEINT) * 1000000) // n AS BIGINT) < 100000""",
    "v_monotonic" ->
      // mirror of the sequential gate: same (order, value) tie-sort, same
      // first-break selection, same integer-string violation entry
      """WITH e AS (
           SELECT user_id, event_id, CAST(round(value * 100) AS BIGINT) AS vc
           FROM events
           WHERE user_id IS NOT NULL AND event_id IS NOT NULL AND value IS NOT NULL),
         s AS (
           SELECT user_id, event_id, vc,
                  lag(vc) OVER (PARTITION BY user_id ORDER BY event_id, vc) AS prev
           FROM e),
         b AS (
           SELECT *,
                  row_number() OVER (PARTITION BY user_id ORDER BY event_id, vc) AS rn,
                  count(*) OVER (PARTITION BY user_id) AS n_breaks
           FROM s WHERE prev > vc)
         SELECT 'monotonic(value_c <= next by event_id within user_id)' AS constraint_id,
                'value_c' AS path,
                'monotone (<=) along event_id' AS bound,
                'breaks=' || CAST(n_breaks AS VARCHAR) || ' first at event_id='
                  || CAST(event_id AS VARCHAR) || ': ' || CAST(prev AS VARCHAR)
                  || ' -> ' || CAST(vc AS VARCHAR) AS actual,
                CAST(user_id AS VARCHAR) AS key
         FROM b WHERE rn = 1""",
    "v_col_order" ->
      """SELECT CAST(sum(CASE WHEN l_discount IS NOT NULL AND l_tax IS NOT NULL
                       AND NOT (l_discount <= l_tax) THEN 1 ELSE 0 END) AS BIGINT) AS n_discount_gt_tax,
                CAST(sum(CASE WHEN l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
                       AND NOT (l_quantity < l_extendedprice) THEN 1 ELSE 0 END) AS BIGINT) AS n_qty_ge_price,
                count(*) AS n_rows
         FROM lineitem""",
    "v_suggest_orderings" ->
      // full mirror of the ordering-discovery derivation: per pair the four
      // conditional counts, then the same emission CASE (direction flip when
      // only b>a violates; eq when neither; lt when additionally tie-free)
      ("""WITH s AS (""" +
      Seq(("l_quantity", "l_extendedprice"), ("l_quantity", "l_discount"),
          ("l_quantity", "l_tax"), ("l_extendedprice", "l_discount"),
          ("l_extendedprice", "l_tax"), ("l_discount", "l_tax")).map { case (a, b) =>
        s"""SELECT '$a' AS a, '$b' AS b,
              CAST(sum(CASE WHEN $a IS NOT NULL AND $b IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n,
              CAST(sum(CASE WHEN $a IS NOT NULL AND $b IS NOT NULL AND $a > $b THEN 1 ELSE 0 END) AS BIGINT) AS gab,
              CAST(sum(CASE WHEN $a IS NOT NULL AND $b IS NOT NULL AND $b > $a THEN 1 ELSE 0 END) AS BIGINT) AS gba,
              CAST(sum(CASE WHEN $a IS NOT NULL AND $b IS NOT NULL AND $a = $b THEN 1 ELSE 0 END) AS BIGINT) AS eq
            FROM lineitem"""
      }.mkString(" UNION ALL ") +
      """)
         SELECT CASE WHEN gab > 0 AND gba = 0 THEN b ELSE a END AS col_a,
                CASE WHEN gab > 0 AND gba = 0 THEN a ELSE b END AS col_b,
                CASE WHEN gab = 0 AND gba = 0 THEN 'eq'
                     WHEN eq > 0 THEN 'le' ELSE 'lt' END AS kind,
                n AS n_complete, eq AS n_eq
         FROM s WHERE n > 0 AND (gab = 0 OR gba = 0)"""),
    "v_suggest_composite" ->
      // full mirror of the minimal-composite-key derivation over the same
      // per-user sequence frame: a pair is emitted when its complete rows
      // are distinct, nonempty, and neither component is unique alone
      """WITH t AS (
           SELECT user_id, event_type,
                  CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts) AS BIGINT) AS seq
           FROM events),
         s AS (
           SELECT count(*) AS n,
             count(DISTINCT user_id) AS nd_u, sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS nu_u,
             count(DISTINCT event_type) AS nd_e, sum(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS nu_e,
             count(DISTINCT seq) AS nd_s, sum(CASE WHEN seq IS NULL THEN 1 ELSE 0 END) AS nu_s
           FROM t),
         p AS (
           SELECT 'user_id,event_type' AS cols,
             (SELECT count(*) FROM t WHERE user_id IS NOT NULL AND event_type IS NOT NULL) AS cnt,
             (SELECT count(*) FROM (SELECT DISTINCT user_id, event_type FROM t
                WHERE user_id IS NOT NULL AND event_type IS NOT NULL)) AS ndp,
             (nu_u = 0 AND nd_u = n) AS ua, (nu_e = 0 AND nd_e = n) AS ub FROM s
           UNION ALL SELECT 'user_id,seq',
             (SELECT count(*) FROM t WHERE user_id IS NOT NULL AND seq IS NOT NULL),
             (SELECT count(*) FROM (SELECT DISTINCT user_id, seq FROM t
                WHERE user_id IS NOT NULL AND seq IS NOT NULL)),
             (nu_u = 0 AND nd_u = n), (nu_s = 0 AND nd_s = n) FROM s
           UNION ALL SELECT 'event_type,seq',
             (SELECT count(*) FROM t WHERE event_type IS NOT NULL AND seq IS NOT NULL),
             (SELECT count(*) FROM (SELECT DISTINCT event_type, seq FROM t
                WHERE event_type IS NOT NULL AND seq IS NOT NULL)),
             (nu_e = 0 AND nd_e = n), (nu_s = 0 AND nd_s = n) FROM s)
         SELECT cols AS col_name, 'composite_unique' AS rule, 'distinct == rows' AS bound
         FROM p WHERE cnt > 0 AND ndp = cnt AND NOT ua AND NOT ub""",
    "v_metrics_interval" ->
      // historical envelope at run 3: prior [min,max] widened by an
      // INTEGRAL-division 10% of range (DuckDB `//` mirrors Spark's `div`)
      """WITH h AS (
           SELECT CAST(run AS BIGINT) AS run, metric, CAST(value AS BIGINT) AS value
           FROM read_parquet('/root/repo/target/fixtures/metrics_repo/run=*/*.parquet',
                             hive_partitioning = 1)),
         prior AS (
           SELECT metric, min(value) AS hist_min, max(value) AS hist_max,
                  (max(value) - min(value)) * 10 // 100 AS widen
           FROM h WHERE run < 3 GROUP BY metric)
         SELECT h.run, h.metric, prior.hist_min, prior.hist_max, h.value
         FROM h JOIN prior ON h.metric = prior.metric
         WHERE h.run = 3
           AND (h.value < prior.hist_min - prior.widen
             OR h.value > prior.hist_max + prior.widen)""",
    "v_schema_diff" ->
      // the diff of the frozen expected schema vs the actual table schema is
      // static -> literal oracle rows
      """SELECT * FROM (VALUES
           ('lang', 'added', '', 'string'),
           ('n_chars', 'type_changed', 'integer', 'long'),
           ('quality', 'removed', 'double', '')) AS t(col_name, change, expected, actual)""",
    "v_profile_quantiles" ->
      // SQL-standard percentile_disc agrees exactly between Spark and DuckDB
      // (verified on ceil-boundary cases); both sides order by the SAME
      // cents-long domain so the picked element is identical
      """SELECT 'doc_id' AS col_name, 'long' AS dtype, CAST(25 AS BIGINT) AS q_pct, CAST(percentile_disc(0.25) WITHIN GROUP (ORDER BY CAST(ROUND(doc_id*100) AS BIGINT)) AS BIGINT) AS value_c FROM documents
         UNION ALL SELECT 'doc_id', 'long', 50, CAST(percentile_disc(0.50) WITHIN GROUP (ORDER BY CAST(ROUND(doc_id*100) AS BIGINT)) AS BIGINT) FROM documents
         UNION ALL SELECT 'doc_id', 'long', 75, CAST(percentile_disc(0.75) WITHIN GROUP (ORDER BY CAST(ROUND(doc_id*100) AS BIGINT)) AS BIGINT) FROM documents
         UNION ALL SELECT 'doc_id', 'long', 95, CAST(percentile_disc(0.95) WITHIN GROUP (ORDER BY CAST(ROUND(doc_id*100) AS BIGINT)) AS BIGINT) FROM documents
         UNION ALL SELECT 'n_chars', 'long', 25, CAST(percentile_disc(0.25) WITHIN GROUP (ORDER BY CAST(ROUND(n_chars*100) AS BIGINT)) AS BIGINT) FROM documents
         UNION ALL SELECT 'n_chars', 'long', 50, CAST(percentile_disc(0.50) WITHIN GROUP (ORDER BY CAST(ROUND(n_chars*100) AS BIGINT)) AS BIGINT) FROM documents
         UNION ALL SELECT 'n_chars', 'long', 75, CAST(percentile_disc(0.75) WITHIN GROUP (ORDER BY CAST(ROUND(n_chars*100) AS BIGINT)) AS BIGINT) FROM documents
         UNION ALL SELECT 'n_chars', 'long', 95, CAST(percentile_disc(0.95) WITHIN GROUP (ORDER BY CAST(ROUND(n_chars*100) AS BIGINT)) AS BIGINT) FROM documents""",
    "v_quantile_shift" ->
      // ref = documents; cur = the same table with n_chars doubled (the
      // planted ingest corruption) — doc_id rows shift 0, n_chars rows
      // shift by exactly the ref quantile (monotone transforms commute
      // with discrete quantiles), breaching the 10000-cent tolerance
      """WITH r AS (
           SELECT 'doc_id' AS col_name, CAST(25 AS BIGINT) AS q_pct, CAST(percentile_disc(0.25) WITHIN GROUP (ORDER BY CAST(ROUND(doc_id*100) AS BIGINT)) AS BIGINT) AS ref_c FROM documents
           UNION ALL SELECT 'doc_id', 50, CAST(percentile_disc(0.50) WITHIN GROUP (ORDER BY CAST(ROUND(doc_id*100) AS BIGINT)) AS BIGINT) FROM documents
           UNION ALL SELECT 'doc_id', 75, CAST(percentile_disc(0.75) WITHIN GROUP (ORDER BY CAST(ROUND(doc_id*100) AS BIGINT)) AS BIGINT) FROM documents
           UNION ALL SELECT 'doc_id', 95, CAST(percentile_disc(0.95) WITHIN GROUP (ORDER BY CAST(ROUND(doc_id*100) AS BIGINT)) AS BIGINT) FROM documents
           UNION ALL SELECT 'n_chars', 25, CAST(percentile_disc(0.25) WITHIN GROUP (ORDER BY CAST(ROUND(n_chars*100) AS BIGINT)) AS BIGINT) FROM documents
           UNION ALL SELECT 'n_chars', 50, CAST(percentile_disc(0.50) WITHIN GROUP (ORDER BY CAST(ROUND(n_chars*100) AS BIGINT)) AS BIGINT) FROM documents
           UNION ALL SELECT 'n_chars', 75, CAST(percentile_disc(0.75) WITHIN GROUP (ORDER BY CAST(ROUND(n_chars*100) AS BIGINT)) AS BIGINT) FROM documents
           UNION ALL SELECT 'n_chars', 95, CAST(percentile_disc(0.95) WITHIN GROUP (ORDER BY CAST(ROUND(n_chars*100) AS BIGINT)) AS BIGINT) FROM documents),
         c AS (
           SELECT 'doc_id' AS col_name, CAST(25 AS BIGINT) AS q_pct, CAST(percentile_disc(0.25) WITHIN GROUP (ORDER BY CAST(ROUND(doc_id*100) AS BIGINT)) AS BIGINT) AS cur_c FROM documents
           UNION ALL SELECT 'doc_id', 50, CAST(percentile_disc(0.50) WITHIN GROUP (ORDER BY CAST(ROUND(doc_id*100) AS BIGINT)) AS BIGINT) FROM documents
           UNION ALL SELECT 'doc_id', 75, CAST(percentile_disc(0.75) WITHIN GROUP (ORDER BY CAST(ROUND(doc_id*100) AS BIGINT)) AS BIGINT) FROM documents
           UNION ALL SELECT 'doc_id', 95, CAST(percentile_disc(0.95) WITHIN GROUP (ORDER BY CAST(ROUND(doc_id*100) AS BIGINT)) AS BIGINT) FROM documents
           UNION ALL SELECT 'n_chars', 25, CAST(percentile_disc(0.25) WITHIN GROUP (ORDER BY CAST(ROUND(n_chars*2*100) AS BIGINT)) AS BIGINT) FROM documents
           UNION ALL SELECT 'n_chars', 50, CAST(percentile_disc(0.50) WITHIN GROUP (ORDER BY CAST(ROUND(n_chars*2*100) AS BIGINT)) AS BIGINT) FROM documents
           UNION ALL SELECT 'n_chars', 75, CAST(percentile_disc(0.75) WITHIN GROUP (ORDER BY CAST(ROUND(n_chars*2*100) AS BIGINT)) AS BIGINT) FROM documents
           UNION ALL SELECT 'n_chars', 95, CAST(percentile_disc(0.95) WITHIN GROUP (ORDER BY CAST(ROUND(n_chars*2*100) AS BIGINT)) AS BIGINT) FROM documents)
         SELECT r.col_name, r.q_pct, ref_c, cur_c, cur_c - ref_c AS shift_c,
                CAST(CASE WHEN ref_c IS NULL AND cur_c IS NULL THEN 0
                          WHEN ref_c IS NULL OR cur_c IS NULL THEN 1
                          WHEN abs(cur_c - ref_c) > 10000 THEN 1 ELSE 0 END AS BIGINT) AS breach
         FROM r JOIN c ON r.col_name = c.col_name AND r.q_pct = c.q_pct""",
    "v_top_values" ->
      // exact top-5 per column with (count desc, value asc) tie-break —
      // binary string ordering on both engines
      """WITH vals AS (
           SELECT 'lang' AS col_name, CAST(lang AS VARCHAR) AS value FROM documents WHERE lang IS NOT NULL
           UNION ALL SELECT 'source', CAST(source AS VARCHAR) FROM documents WHERE source IS NOT NULL
           UNION ALL SELECT 'n_chars', CAST(n_chars AS VARCHAR) FROM documents WHERE n_chars IS NOT NULL),
         counted AS (SELECT col_name, value, CAST(count(*) AS BIGINT) AS cnt
                     FROM vals GROUP BY col_name, value),
         ranked AS (SELECT col_name, value, cnt,
                      CAST(row_number() OVER (PARTITION BY col_name ORDER BY cnt DESC, value) AS BIGINT) AS rnk
                    FROM counted)
         SELECT col_name, value, cnt, rnk FROM ranked WHERE rnk <= 5""",
    "v_top_approx" ->
      // in the err=0 regime the MG summary is held to the EXACT answer
      """WITH vals AS (
           SELECT 'lang' AS col_name, CAST(lang AS VARCHAR) AS value FROM documents WHERE lang IS NOT NULL
           UNION ALL SELECT 'source', CAST(source AS VARCHAR) FROM documents WHERE source IS NOT NULL),
         counted AS (SELECT col_name, value, CAST(count(*) AS BIGINT) AS cnt
                     FROM vals GROUP BY col_name, value),
         ranked AS (SELECT col_name, value, cnt,
                      CAST(row_number() OVER (PARTITION BY col_name ORDER BY cnt DESC, value) AS BIGINT) AS rnk
                    FROM counted)
         SELECT col_name, value, cnt, rnk, CAST(0 AS BIGINT) AS err
         FROM ranked WHERE rnk <= 5""",
    "v_corr_stats" ->
      // HUGEINT sums over the same cents domain, stringified; pearson_fp
      // recomputed from the SAME exact integers in the SAME double formula
      """WITH c AS (
           SELECT CAST(ROUND(l_quantity*100) AS HUGEINT) AS q,
                  CAST(ROUND(l_extendedprice*100) AS HUGEINT) AS p,
                  CAST(ROUND(l_discount*100) AS HUGEINT) AS d,
                  l_quantity IS NOT NULL AS nq, l_extendedprice IS NOT NULL AS np,
                  l_discount IS NOT NULL AS nd
           FROM lineitem),
         s AS (
           SELECT 'l_quantity' AS col_x, 'l_extendedprice' AS col_y,
                  CAST(sum(CASE WHEN nq AND np THEN 1 ELSE 0 END) AS BIGINT) AS n,
                  sum(CASE WHEN nq AND np THEN q END) AS sx, sum(CASE WHEN nq AND np THEN p END) AS sy,
                  sum(CASE WHEN nq AND np THEN q*q END) AS sxx, sum(CASE WHEN nq AND np THEN p*p END) AS syy,
                  sum(CASE WHEN nq AND np THEN q*p END) AS sxy FROM c
           UNION ALL SELECT 'l_quantity', 'l_discount',
                  CAST(sum(CASE WHEN nq AND nd THEN 1 ELSE 0 END) AS BIGINT),
                  sum(CASE WHEN nq AND nd THEN q END), sum(CASE WHEN nq AND nd THEN d END),
                  sum(CASE WHEN nq AND nd THEN q*q END), sum(CASE WHEN nq AND nd THEN d*d END),
                  sum(CASE WHEN nq AND nd THEN q*d END) FROM c
           UNION ALL SELECT 'l_extendedprice', 'l_discount',
                  CAST(sum(CASE WHEN np AND nd THEN 1 ELSE 0 END) AS BIGINT),
                  sum(CASE WHEN np AND nd THEN p END), sum(CASE WHEN np AND nd THEN d END),
                  sum(CASE WHEN np AND nd THEN p*p END), sum(CASE WHEN np AND nd THEN d*d END),
                  sum(CASE WHEN np AND nd THEN p*d END) FROM c)
         SELECT col_x, col_y, n,
                CAST(sx AS VARCHAR) AS sum_x, CAST(sy AS VARCHAR) AS sum_y,
                CAST(sxx AS VARCHAR) AS sum_xx, CAST(syy AS VARCHAR) AS sum_yy,
                CAST(sxy AS VARCHAR) AS sum_xy,
                CASE WHEN CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE) > 0
                      AND CAST(n AS DOUBLE)*CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE) > 0
                     THEN CAST(ROUND((CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE))
                          / sqrt((CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE))
                               * (CAST(n AS DOUBLE)*CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE)))
                          * 1000000) AS BIGINT) END AS pearson_fp
         FROM s""",
    "v_drift_psi_fp" ->
      """WITH binned AS (
           SELECT source AS grp, CAST(floor(n_chars / 50.0) AS BIGINT) AS bin
           FROM documents WHERE n_chars IS NOT NULL AND source IS NOT NULL),
         obs AS (SELECT grp, bin, count(*) AS obs FROM binned GROUP BY grp, bin),
         gt AS (SELECT grp, CAST(sum(obs) AS BIGINT) AS grp_total FROM obs GROUP BY grp),
         bt AS (SELECT bin, CAST(sum(obs) AS BIGINT) AS bin_total FROM obs GROUP BY bin),
         tot AS (SELECT CAST(sum(obs) AS BIGINT) AS n_total FROM obs),
         cells AS (
           SELECT gt.grp, gt.grp_total, bt.bin, bt.bin_total,
                  COALESCE(obs.obs, 0) AS obs, tot.n_total
           FROM gt CROSS JOIN bt
           LEFT JOIN obs ON obs.grp = gt.grp AND obs.bin = bt.bin
           CROSS JOIN tot),
         terms AS (
           SELECT grp, grp_total,
                  CAST(round((greatest(CAST(obs AS DOUBLE) / grp_total, 0.000001)
                            - greatest(CAST(bin_total AS DOUBLE) / n_total, 0.000001))
                        * ln(greatest(CAST(obs AS DOUBLE) / grp_total, 0.000001)
                           / greatest(CAST(bin_total AS DOUBLE) / n_total, 0.000001))
                        * 1000000.0) AS BIGINT) AS term_fp
           FROM cells)
         SELECT grp AS source, CAST(sum(term_fp) AS BIGINT) AS psi_fp, grp_total
         FROM terms GROUP BY grp, grp_total""",
    "v_drift_ks_fp" ->
      """WITH binned AS (
           SELECT source AS grp, CAST(floor(n_chars / 50.0) AS BIGINT) AS bin
           FROM documents WHERE n_chars IS NOT NULL AND source IS NOT NULL),
         obs AS (SELECT grp, bin, count(*) AS obs FROM binned GROUP BY grp, bin),
         gt AS (SELECT grp, CAST(sum(obs) AS BIGINT) AS grp_total FROM obs GROUP BY grp),
         bt AS (SELECT bin, CAST(sum(obs) AS BIGINT) AS bin_total FROM obs GROUP BY bin),
         tot AS (SELECT CAST(sum(obs) AS BIGINT) AS n_total FROM obs),
         cells AS (
           SELECT gt.grp, gt.grp_total, bt.bin, bt.bin_total,
                  COALESCE(obs.obs, 0) AS obs, tot.n_total
           FROM gt CROSS JOIN bt
           LEFT JOIN obs ON obs.grp = gt.grp AND obs.bin = bt.bin
           CROSS JOIN tot),
         cum AS (
           SELECT grp, grp_total, n_total,
                  sum(obs) OVER (PARTITION BY grp ORDER BY bin) AS cum_obs,
                  sum(bin_total) OVER (PARTITION BY grp ORDER BY bin) AS cum_bin
           FROM cells)
         SELECT grp AS source,
                CAST(max(CAST(round(abs(CAST(cum_obs AS DOUBLE) / grp_total
                  - CAST(cum_bin AS DOUBLE) / n_total) * 1000000.0) AS BIGINT)) AS BIGINT) AS ks_fp,
                grp_total
         FROM cum GROUP BY grp, grp_total""",
    "v_ref" ->
      """SELECT CAST(user_id AS VARCHAR) AS key,
                'orphan rows=' || CAST(count(*) AS VARCHAR) AS actual
         FROM events
         WHERE user_id NOT IN (SELECT c_custkey FROM customer WHERE c_custkey >= 10)
         GROUP BY user_id""",
    "v_stats" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
                CAST(sum(CAST(round(l_quantity*100) AS BIGINT)) AS BIGINT) AS sum_qty_c,
                CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_price_c,
                min(l_quantity) AS min_qty, max(l_quantity) AS max_qty,
                count(DISTINCT l_orderkey) AS n_orders
         FROM lineitem GROUP BY l_returnflag, l_linestatus""",
    "v_drift_hist" ->
      """SELECT source, CAST(floor(n_chars / 50.0) AS INT) AS bin, count(*) AS n
         FROM documents WHERE n_chars IS NOT NULL AND source IS NOT NULL
         GROUP BY source, bin""",
    "w_top3_per_cust" ->
      """SELECT o_custkey, o_orderkey, price_c, rn FROM (
           SELECT o_custkey, o_orderkey, CAST(round(o_totalprice*100) AS BIGINT) AS price_c,
                  row_number() OVER (PARTITION BY o_custkey
                    ORDER BY CAST(round(o_totalprice*100) AS BIGINT) DESC, o_orderkey) AS rn
           FROM orders) WHERE rn <= 3""",
    "q_topk_orders" ->
      """SELECT o_orderkey, CAST(round(o_totalprice*100) AS BIGINT) AS price_c
         FROM orders ORDER BY price_c DESC, o_orderkey LIMIT 10""",
    "a_elem_domain" ->
      """SELECT vec_id, len(list_filter(embedding, x -> abs(x) > 0.45)) AS n_bad
         FROM embeddings WHERE len(list_filter(embedding, x -> abs(x) > 0.45)) > 0""",
    "a_dims" ->
      """SELECT len(embedding) AS dim, count(*) AS n FROM embeddings GROUP BY dim""",
    "a_contains" ->
      """SELECT vec_id FROM embeddings
         WHERE len(list_filter(embedding, x -> x > 0.4)) = 0""",
    "a_contains_schema" ->
      """SELECT vec_id FROM embeddings
         WHERE len(list_filter(embedding, x -> x >= 0.3 AND x <= 0.4)) = 0""",
    "d_dedup_exact" ->
      """SELECT md5(text) AS sig, count(*) AS n, min(doc_id) AS keep_id
         FROM documents GROUP BY md5(text) HAVING count(*) > 1""",
    "d_dedup_keep" ->
      """SELECT doc_id FROM (
           SELECT doc_id, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
           FROM documents) WHERE rn = 1""",
    "d_dedup_against" ->
      // text EQUALITY stands in for the md5 signature match (collision-free
      // here); NOT EXISTS is the null-safe anti-join form
      """WITH d AS (SELECT doc_id, text FROM documents WHERE text IS NOT NULL),
         nb AS (
           SELECT doc_id + 10000 AS doc_id, text FROM d WHERE doc_id % 5 = 0
           UNION ALL
           SELECT doc_id + 20000 AS doc_id, text || ' fresh suffix' AS text
           FROM d WHERE doc_id % 5 = 1)
         SELECT nb.doc_id FROM nb
         WHERE NOT EXISTS (SELECT 1 FROM d WHERE d.text = nb.text)""",
    "d_fingerprint" ->
      """SELECT doc_id, md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp
         FROM documents""",
    "d_ngram_jaccard" ->
      """WITH g AS (
           SELECT doc_id, source, lang,
                  list_distinct(regexp_extract_all(lower(regexp_replace(text, '[^a-z0-9\s]', ' ', 'gi')), '[a-z0-9]+')) AS grams
           FROM documents)
         SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                len(list_intersect(a.grams, b.grams)) AS inter,
                len(list_distinct(list_concat(a.grams, b.grams))) AS uni
         FROM g a JOIN g b ON a.source = b.source AND a.lang = b.lang AND a.doc_id < b.doc_id
         WHERE len(list_distinct(list_concat(a.grams, b.grams))) > 0
           AND len(list_intersect(a.grams, b.grams)) >=
               0.8 * len(list_distinct(list_concat(a.grams, b.grams)))""",
    "d_minhash_pairs" ->
      // Signature-fixture oracle (see DataGen.writeLshFixtures): DuckDB
      // re-derives banding (band key = the joined signature slice the Spark
      // side hashes), the maxBucket guard, the candidate self-join, and the
      // agreement fraction from Spark-computed minhash signatures.
      """WITH sig AS (
           SELECT id, sig FROM read_parquet('/root/repo/target/fixtures/minhash_sig.parquet/*.parquet')),
         banded AS (
           SELECT id, b AS band, array_to_string(sig[b*4+1 : b*4+4], ',') AS bkey
           FROM sig, unnest(range(0, 16)) AS t(b)),
         cnt AS (SELECT band, bkey, count(*) AS n FROM banded GROUP BY band, bkey),
         ok AS (SELECT banded.* FROM banded JOIN cnt USING (band, bkey) WHERE cnt.n <= 500),
         cand AS (
           SELECT DISTINCT a.id AS id_a, b.id AS id_b
           FROM ok a JOIN ok b ON a.band = b.band AND a.bkey = b.bkey AND a.id < b.id),
         scored AS (
           SELECT c.id_a, c.id_b,
                  CAST(len(list_filter(range(1, 65),
                    i -> sa.sig[CAST(i AS INT)] = sb.sig[CAST(i AS INT)])) AS DOUBLE) / 64
                    AS est_jaccard
           FROM cand c JOIN sig sa ON c.id_a = sa.id JOIN sig sb ON c.id_b = sb.id)
         SELECT id_a, id_b, est_jaccard FROM scored WHERE est_jaccard >= 0.5""",
    "d_simhash_pairs" ->
      """WITH sig AS (
           SELECT id, sim FROM read_parquet('/root/repo/target/fixtures/simhash_sig.parquet/*.parquet')),
         chunked AS (
           SELECT id, sim, c AS chunk, (sim >> (c*16)) & 65535 AS cv
           FROM sig, unnest([0,1,2,3]) AS t(c)),
         cnt AS (SELECT chunk, cv, count(*) AS n FROM chunked GROUP BY chunk, cv),
         ok AS (SELECT chunked.* FROM chunked JOIN cnt USING (chunk, cv) WHERE cnt.n <= 500),
         cand AS (
           SELECT DISTINCT a.id AS id_a, b.id AS id_b, a.sim AS sim_a, b.sim AS sim_b
           FROM ok a JOIN ok b ON a.chunk = b.chunk AND a.cv = b.cv AND a.id < b.id)
         SELECT id_a, id_b, CAST(bit_count(xor(sim_a, sim_b)) AS INT) AS hamming
         FROM cand WHERE bit_count(xor(sim_a, sim_b)) <= 8""",
    "d_neardup_drop" ->
      // Edge-fixture oracle: the verified near-dup edge list is materialized
      // by Verify; DuckDB recomputes connected components (recursive-CTE
      // closure), keep-min-per-component, and the anti-join tail.
      """WITH RECURSIVE
         e AS (SELECT id_a, id_b FROM read_parquet('/root/repo/target/fixtures/neardup_edges.parquet/*.parquet')),
         nodes AS (SELECT id_a AS id FROM e UNION SELECT id_b FROM e),
         sym AS (SELECT id_a AS u, id_b AS v FROM e UNION SELECT id_b, id_a FROM e),
         reach AS (
           SELECT id AS root, id AS node FROM nodes
           UNION
           SELECT r.root, s.v FROM reach r JOIN sym s ON r.node = s.u),
         comp AS (SELECT root AS id, min(node) AS component FROM reach GROUP BY root)
         SELECT d.doc_id FROM documents d
         WHERE d.doc_id < 2000
           AND d.doc_id NOT IN (SELECT id FROM comp WHERE component < id)""",
    "d_neardup_clusters" ->
      // Same edge fixture + recursive closure as d_neardup_drop; the report
      // is one group-count over the component labels (clusters of size >= 2).
      """WITH RECURSIVE
         e AS (SELECT id_a, id_b FROM read_parquet('/root/repo/target/fixtures/neardup_edges.parquet/*.parquet')),
         nodes AS (SELECT id_a AS id FROM e UNION SELECT id_b FROM e),
         sym AS (SELECT id_a AS u, id_b AS v FROM e UNION SELECT id_b, id_a FROM e),
         reach AS (
           SELECT id AS root, id AS node FROM nodes
           UNION
           SELECT r.root, s.v FROM reach r JOIN sym s ON r.node = s.u),
         comp AS (SELECT root AS id, min(node) AS component FROM reach GROUP BY root)
         SELECT component, CAST(count(*) AS BIGINT) AS n_members
         FROM comp GROUP BY component HAVING count(*) >= 2""",
    "d_neardup_embed" ->
      // Edge-fixture oracle (embed_edges = the sign-LSH -> exact-cosine
      // verified pairs over the planted-dup corpus); DuckDB rebuilds the
      // same corpus arithmetically (ids only — the vectors never matter
      // past the fixture), recomputes the transitive closure, keep-min,
      // and the anti-join tail.
      """WITH RECURSIVE
         e AS (SELECT id_a, id_b FROM read_parquet('/root/repo/target/fixtures/embed_edges.parquet/*.parquet')),
         corpus AS (
           SELECT vec_id FROM embeddings
           UNION ALL SELECT vec_id + 1000000 FROM embeddings WHERE vec_id % 7 = 0
           UNION ALL SELECT vec_id + 2000000 FROM embeddings WHERE vec_id % 14 = 0),
         nodes AS (SELECT id_a AS id FROM e UNION SELECT id_b FROM e),
         sym AS (SELECT id_a AS u, id_b AS v FROM e UNION SELECT id_b, id_a FROM e),
         reach AS (
           SELECT id AS root, id AS node FROM nodes
           UNION
           SELECT r.root, s.v FROM reach r JOIN sym s ON r.node = s.u),
         comp AS (SELECT root AS id, min(node) AS component FROM reach GROUP BY root)
         SELECT c.vec_id FROM corpus c
         WHERE c.vec_id NOT IN (SELECT id FROM comp WHERE component < id)""",
    "d_neardup_embed_clusters" ->
      // Group-count over the embed-edge closure (clusters of size >= 2).
      """WITH RECURSIVE
         e AS (SELECT id_a, id_b FROM read_parquet('/root/repo/target/fixtures/embed_edges.parquet/*.parquet')),
         nodes AS (SELECT id_a AS id FROM e UNION SELECT id_b FROM e),
         sym AS (SELECT id_a AS u, id_b AS v FROM e UNION SELECT id_b, id_a FROM e),
         reach AS (
           SELECT id AS root, id AS node FROM nodes
           UNION
           SELECT r.root, s.v FROM reach r JOIN sym s ON r.node = s.u),
         comp AS (SELECT root AS id, min(node) AS component FROM reach GROUP BY root)
         SELECT component, CAST(count(*) AS BIGINT) AS n_members
         FROM comp GROUP BY component HAVING count(*) >= 2""",
    "s_ann_cosine" ->
      // Direct oracle: double-accumulated cosine matches VecDot/VecNorm
      // (both fold the array in index order; the 1e-9 canon grid absorbs
      // sub-ulp summation drift, and the rank-10/11 gap is ~0.02).
      """WITH e AS (
           SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
         q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
         s AS (
           SELECT e.vec_id,
                  list_sum(list_transform(range(1, len(e.v)+1), i -> e.v[i] * q.qv[i]))
                  / (sqrt(list_sum(list_transform(e.v, x -> x*x)))
                     * sqrt(list_sum(list_transform(q.qv, x -> x*x)))) AS cos
           FROM e, q WHERE e.vec_id <> 0)
         SELECT vec_id, cos FROM s ORDER BY cos DESC, vec_id LIMIT 10""",
    "s_ann_lsh" ->
      """WITH b AS (
           SELECT vec_id, band, band_val FROM read_parquet('/root/repo/target/fixtures/lsh_bands.parquet/*.parquet')),
         cnt AS (SELECT band, band_val, count(*) AS n FROM b GROUP BY band, band_val),
         ok AS (SELECT b.* FROM b JOIN cnt USING (band, band_val) WHERE cnt.n <= 4096),
         cand AS (
           SELECT DISTINCT a.vec_id AS id_a, bb.vec_id AS id_b
           FROM ok a JOIN ok bb ON a.band = bb.band AND a.band_val = bb.band_val
                                AND a.vec_id < bb.vec_id),
         e AS (
           SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
         n AS (SELECT vec_id, sqrt(list_sum(list_transform(v, x -> x*x))) AS nrm FROM e),
         p AS (
           SELECT c.id_a, c.id_b,
                  list_sum(list_transform(range(1, len(ea.v)+1), i -> ea.v[i] * eb.v[i]))
                    / (na.nrm * nb.nrm) AS cos
           FROM cand c
           JOIN e ea ON c.id_a = ea.vec_id JOIN e eb ON c.id_b = eb.vec_id
           JOIN n na ON c.id_a = na.vec_id JOIN n nb ON c.id_b = nb.vec_id)
         SELECT id_a, id_b, cos FROM p WHERE cos >= 0.4""",
    "s_ann_ivf" ->
      // Index/probe-fixture oracle: the trained quantizer's list assignments
      // and the query's probe set are materialized; DuckDB recomputes the
      // probe filter and the cosine rank (consecutive-gap >= 9e-7 at this
      // SF, so double summation drift cannot flip the top-10).
      """WITH ix AS (
           SELECT vec_id, list_id FROM read_parquet('/root/repo/target/fixtures/ivf_index.parquet/*.parquet')),
         p AS (SELECT list_id FROM read_parquet('/root/repo/target/fixtures/ivf_probes_single.parquet/*.parquet')),
         e AS (
           SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
         q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
         cand AS (
           SELECT ix.vec_id, ix.list_id FROM ix JOIN p USING (list_id)
           WHERE ix.vec_id <> 0),
         s AS (
           SELECT c.vec_id, c.list_id,
                  list_sum(list_transform(range(1, len(e.v)+1), i -> e.v[i] * q.qv[i]))
                  / (sqrt(list_sum(list_transform(e.v, x -> x*x)))
                     * sqrt(list_sum(list_transform(q.qv, x -> x*x)))) AS cos
           FROM cand c JOIN e ON c.vec_id = e.vec_id, q)
         SELECT vec_id, list_id FROM s ORDER BY cos DESC, vec_id LIMIT 10""",
    "s_ann_ivf_batch_probe" ->
      """WITH ix AS (
           SELECT vec_id, list_id FROM read_parquet('/root/repo/target/fixtures/ivf_index.parquet/*.parquet')),
         qp AS (SELECT query_id, list_id FROM read_parquet('/root/repo/target/fixtures/ivf_probes_batch.parquet/*.parquet')),
         e AS (
           SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
         n AS (SELECT vec_id, sqrt(list_sum(list_transform(v, x -> x*x))) AS nrm FROM e),
         cand AS (
           SELECT qp.query_id, ix.vec_id FROM ix JOIN qp USING (list_id)
           WHERE ix.vec_id >= 3),
         s AS (
           SELECT c.query_id, c.vec_id,
                  list_sum(list_transform(range(1, len(ev.v)+1), i -> ev.v[i] * qv.v[i]))
                    / (nv.nrm * nq.nrm) AS cos
           FROM cand c
           JOIN e ev ON c.vec_id = ev.vec_id JOIN e qv ON c.query_id = qv.vec_id
           JOIN n nv ON c.vec_id = nv.vec_id JOIN n nq ON c.query_id = nq.vec_id),
         r AS (
           SELECT query_id, vec_id,
                  row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rn
           FROM s)
         SELECT query_id, vec_id, CAST(rn AS INT) AS rn FROM r WHERE rn <= 5""",
    "p_sample" ->
      // Gate-fixture oracle: the xxhash64 gates are materialized via
      // Sampling.auditGate; DuckDB re-applies the cut comparisons
      // (trainTestSplit 0.2, stratified en->0.5 default 1.0).
      """WITH g AS (
           SELECT doc_id, g_split, g_strat FROM read_parquet('/root/repo/target/fixtures/sample_gates.parquet/*.parquet')),
         d AS (
           SELECT dd.doc_id, dd.lang, g.g_split, g.g_strat
           FROM documents dd JOIN g USING (doc_id))
         SELECT 'train' AS part, doc_id FROM d WHERE g_split >= 200000
         UNION ALL
         SELECT 'test' AS part, doc_id FROM d WHERE g_split < 200000
         UNION ALL
         SELECT 'strat' AS part, doc_id FROM d
         WHERE CASE WHEN lang = 'en' THEN g_strat < 500000 ELSE TRUE END""",
    "p_cap_exact" ->
      """WITH g AS (
           SELECT doc_id, g_capx FROM read_parquet('/root/repo/target/fixtures/sample_gates.parquet/*.parquet')),
         d AS (
           SELECT dd.doc_id, dd.lang, g.g_capx
           FROM documents dd JOIN g USING (doc_id)),
         r AS (
           SELECT doc_id, lang,
                  row_number() OVER (PARTITION BY lang ORDER BY g_capx ASC, doc_id ASC) AS rn
           FROM d)
         SELECT doc_id, lang FROM r WHERE rn <= 40""",
    "p_weighted" ->
      // clamp(n_chars/400, 0, 1) gate cut in the same IEEE op order as
      // weightedSample (greatest then least then *1e6 then trunc)
      """WITH g AS (
           SELECT doc_id, g_weighted FROM read_parquet('/root/repo/target/fixtures/sample_gates.parquet/*.parquet'))
         SELECT d.doc_id
         FROM documents d JOIN g USING (doc_id)
         WHERE g.g_weighted <
           CAST(trunc(least(greatest(CAST(d.n_chars AS DOUBLE) / 400.0, 0.0), 1.0)
                      * 1000000) AS BIGINT)""",
    "p_balance" ->
      // Mirrors balanceToMix arithmetic exactly (same IEEE double ops in the
      // same order): shareSum over sorted keys, T = min(n/share'), frac =
      // least(1, share'*T/n), cut = trunc(frac*1e6); gate from the fixture.
      """WITH g AS (
           SELECT doc_id, g_mix FROM read_parquet('/root/repo/target/fixtures/sample_gates.parquet/*.parquet')),
         tgt(lang, share) AS (VALUES ('de', 0.25), ('en', 0.5), ('fr', 0.25)),
         ts AS (SELECT 0.25 + 0.5 + 0.25 AS tot),
         cnt AS (
           SELECT d.lang, CAST(count(*) AS BIGINT) AS n
           FROM documents d JOIN tgt t ON d.lang = t.lang GROUP BY d.lang),
         j AS (
           SELECT t.lang, t.share, coalesce(c.n, 0) AS n
           FROM tgt t LEFT JOIN cnt c ON t.lang = c.lang),
         tv AS (SELECT min(CAST(n AS DOUBLE) / (share / (SELECT tot FROM ts))) AS t FROM j),
         cuts AS (
           SELECT lang,
                  CAST(trunc(CASE
                    WHEN n = 0 THEN 0.0
                    WHEN CAST(n AS DOUBLE) / (share / (SELECT tot FROM ts)) = (SELECT t FROM tv)
                      THEN 1.0
                    ELSE least(1.0, (share / (SELECT tot FROM ts)) * (SELECT t FROM tv) / n)
                    END * 1000000) AS BIGINT) AS cut
           FROM j)
         SELECT d.doc_id, d.lang
         FROM documents d
         JOIN g ON d.doc_id = g.doc_id
         JOIN cuts c ON d.lang = c.lang
         WHERE g.g_mix < c.cut""",
    "s_ann_quantized" ->
      """WITH q AS (
           SELECT list_transform(embedding, x -> CAST(floor(x*1000) AS BIGINT)) AS qv
           FROM embeddings WHERE vec_id = 0)
         SELECT vec_id,
                CAST(list_sum(list_transform(
                  list_zip(list_transform(embedding, x -> CAST(floor(x*1000) AS BIGINT)), qv),
                  p -> p[1]*p[2])) AS BIGINT) AS dot
         FROM embeddings, q WHERE vec_id <> 0
         ORDER BY dot DESC, vec_id LIMIT 10""",
    "s_ann_ivf_batch" ->
      """WITH q AS (
           SELECT vec_id AS query_id,
                  list_transform(embedding, x -> CAST(floor(x*1000) AS BIGINT)) AS qv
           FROM embeddings WHERE vec_id < 3),
         c AS (
           SELECT vec_id,
                  list_transform(embedding, x -> CAST(floor(x*1000) AS BIGINT)) AS cv
           FROM embeddings WHERE vec_id >= 3),
         s AS (
           SELECT q.query_id, c.vec_id,
                  CAST(list_sum(list_transform(list_zip(c.cv, q.qv), p -> p[1]*p[2])) AS BIGINT) AS dot
           FROM c CROSS JOIN q),
         r AS (
           SELECT query_id, vec_id, dot,
                  row_number() OVER (PARTITION BY query_id ORDER BY dot DESC, vec_id) AS rn
           FROM s)
         SELECT query_id, vec_id, dot, CAST(rn AS INT) AS rn FROM r WHERE rn <= 5""",
    "t_tokens" ->
      """SELECT doc_id,
                len(regexp_extract_all(text, '\S+')) AS n_ws,
                len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_bpe
         FROM documents""",
    "t_filter_audit" ->
      // Mirrors filterWithAudit: first-failing-stage CASE chain with
      // NULL-gate-rejects (coalesce FALSE), zero-filled stage list.
      """WITH f AS (
           SELECT CASE
             WHEN NOT coalesce(length(text) BETWEEN 50 AND 400, FALSE) THEN 'length'
             WHEN NOT coalesce(
               len(regexp_extract_all(lower(text), '[a-z]+')) >= 5
               AND length(text) >= 20 AND length(text) <= 100000
               AND len(list_distinct(regexp_extract_all(lower(text), '[a-z]+'))) * 10
                   >= len(regexp_extract_all(lower(text), '[a-z]+')) * 3
               AND len(regexp_extract_all(text, '[.!?,;:]')) * 5 <= length(text),
               FALSE) THEN 'quality'
             WHEN NOT coalesce(len(regexp_extract_all(text, '[0-9]')) * 10 <= length(text),
               FALSE) THEN 'digits'
             ELSE 'kept' END AS stage
           FROM documents),
         s(stage, ord) AS (VALUES ('length', 0), ('quality', 1), ('digits', 2), ('kept', 3)),
         c AS (SELECT stage, CAST(count(*) AS BIGINT) AS n_rows FROM f GROUP BY stage)
         SELECT s.stage, CAST(s.ord AS INT) AS ord, coalesce(c.n_rows, 0) AS n_rows
         FROM s LEFT JOIN c USING (stage)""",
    "t_quality" ->
      """SELECT source,
                CAST(sum(len(regexp_extract_all(lower(text), '[a-z]+'))) AS BIGINT) AS words,
                CAST(sum(len(list_distinct(regexp_extract_all(lower(text), '[a-z]+')))) AS BIGINT) AS distinct_words,
                CAST(sum(len(regexp_extract_all(text, '[.!?,;:]'))) AS BIGINT) AS punct,
                CAST(sum(CASE WHEN len(regexp_extract_all(lower(text), '[a-z]+')) >= 5
                          AND length(text) >= 20 AND length(text) <= 100000
                          AND len(list_distinct(regexp_extract_all(lower(text), '[a-z]+'))) * 10
                              >= len(regexp_extract_all(lower(text), '[a-z]+')) * 3
                          AND len(regexp_extract_all(text, '[.!?,;:]')) * 5 <= length(text)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
                count(*) AS n
         FROM documents GROUP BY source""",
    "t_langid" ->
      """WITH h AS (
           SELECT doc_id,
             len(regexp_extract_all(lower(text), '\b(the|and|of|to|in|is|that|it|was|for)\b')) AS c_en,
             len(regexp_extract_all(lower(text), '\b(el|la|de|que|y|en|un|una|por|con)\b')) AS c_es,
             len(regexp_extract_all(lower(text), '\b(le|la|les|de|et|un|une|dans|pour|que)\b')) AS c_fr,
             len(regexp_extract_all(lower(text), '\b(der|die|das|und|ist|von|mit|den|des|ein)\b')) AS c_de
           FROM documents)
         SELECT doc_id,
                CASE WHEN c_en >= c_es AND c_en >= c_fr AND c_en >= c_de AND c_en > 0 THEN 'en'
                     WHEN c_es >= c_fr AND c_es >= c_de AND c_es > 0 THEN 'es'
                     WHEN c_fr >= c_de AND c_fr > 0 THEN 'fr'
                     WHEN c_de > 0 THEN 'de'
                     ELSE 'unknown' END AS lang_pred
         FROM h""",
    "t_repetition" ->
      // Mirrors RepetitionStats' shared definitions: non-empty '\n' lines;
      // ASCII [a-z0-9]+ words of lower(text); n-grams joined by ' ' with
      // char length incl. spaces; top tie-break (count desc, len desc, g
      // asc); dup coverage = distinct covered word positions.
      """WITH base AS (
           SELECT doc_id, text,
                  regexp_extract_all(lower(text), '[a-z0-9]+') AS words
           FROM documents WHERE text IS NOT NULL
         ),
         lineg AS (
           SELECT doc_id, l, count(*) AS c, len(l) AS ll
           FROM base, unnest(string_split(text, chr(10))) AS t(l)
           WHERE len(l) > 0
           GROUP BY doc_id, l
         ),
         linestats AS (
           SELECT doc_id,
                  CAST(sum(c) AS BIGINT) AS n_lines,
                  CAST(sum(c * ll) AS BIGINT) AS line_chars,
                  CAST(sum(CASE WHEN c >= 2 THEN c ELSE 0 END) AS BIGINT) AS dup_lines,
                  CAST(sum(CASE WHEN c >= 2 THEN c * ll ELSE 0 END) AS BIGINT) AS dup_line_chars
           FROM lineg GROUP BY doc_id
         ),
         wordstats AS (
           SELECT doc_id, CAST(len(words) AS BIGINT) AS n_words,
                  CAST(coalesce(list_sum(list_transform(words, w -> len(w))), 0) AS BIGINT) AS word_chars
           FROM base
         ),
         occ AS (
           SELECT doc_id, n, i, array_to_string(words[i:i+n-1], ' ') AS g
           FROM base,
                unnest([2,3,4,5,10]) AS nn(n),
                unnest(range(1, greatest(len(words)-n+2, 1))) AS t(i)
         ),
         cnt AS (
           SELECT doc_id, n, g, count(*) AS c FROM occ GROUP BY doc_id, n, g
         ),
         top AS (
           SELECT doc_id, n, CAST(c * len(g) AS BIGINT) AS top_chars
           FROM (SELECT doc_id, n, g, c,
                        row_number() OVER (PARTITION BY doc_id, n
                          ORDER BY c DESC, len(g) DESC, g ASC) AS rn
                 FROM cnt WHERE n <= 4)
           WHERE rn = 1
         ),
         duppos AS (
           SELECT DISTINCT o.doc_id, o.n, u.p
           FROM occ o
           JOIN cnt cn ON o.doc_id = cn.doc_id AND o.n = cn.n AND o.g = cn.g
                       AND cn.c >= 2 AND o.n >= 5,
                unnest(range(o.i, o.i + o.n)) AS u(p)
         ),
         cov AS (
           SELECT d.doc_id, d.n,
                  CAST(sum(len(b.words[CAST(d.p AS INT)])) AS BIGINT) AS cov_chars
           FROM duppos d JOIN base b ON d.doc_id = b.doc_id
           GROUP BY d.doc_id, d.n
         )
         SELECT b.doc_id,
                coalesce(ls.n_lines, 0) AS n_lines,
                coalesce(ls.dup_lines, 0) AS dup_lines,
                coalesce(ls.dup_line_chars, 0) AS dup_line_chars,
                coalesce(ls.line_chars, 0) AS line_chars,
                ws.n_words, ws.word_chars,
                coalesce(t2.top_chars, 0) AS top2_chars,
                coalesce(t3.top_chars, 0) AS top3_chars,
                coalesce(t4.top_chars, 0) AS top4_chars,
                coalesce(c5.cov_chars, 0) AS dup5_cov_chars,
                coalesce(c10.cov_chars, 0) AS dup10_cov_chars,
                (ws.n_words > 0
                 AND coalesce(ls.dup_lines, 0) * 10 <= coalesce(ls.n_lines, 0) * 3
                 AND coalesce(ls.dup_line_chars, 0) * 5 <= coalesce(ls.line_chars, 0)
                 AND coalesce(t2.top_chars, 0) * 5 <= ws.word_chars
                 AND coalesce(t3.top_chars, 0) * 100 <= ws.word_chars * 18
                 AND coalesce(t4.top_chars, 0) * 100 <= ws.word_chars * 16
                 AND coalesce(c5.cov_chars, 0) * 100 <= ws.word_chars * 15
                 AND coalesce(c10.cov_chars, 0) * 10 <= ws.word_chars) AS gopher_pass
         FROM base b
         JOIN wordstats ws ON b.doc_id = ws.doc_id
         LEFT JOIN linestats ls ON b.doc_id = ls.doc_id
         LEFT JOIN top t2 ON b.doc_id = t2.doc_id AND t2.n = 2
         LEFT JOIN top t3 ON b.doc_id = t3.doc_id AND t3.n = 3
         LEFT JOIN top t4 ON b.doc_id = t4.doc_id AND t4.n = 4
         LEFT JOIN cov c5 ON b.doc_id = c5.doc_id AND c5.n = 5
         LEFT JOIN cov c10 ON b.doc_id = c10.doc_id AND c10.n = 10""",
    "t_gopher_quality" ->
      // Engine-parity regexes: explicit whitespace class (Java \s has \x0B,
      // RE2's doesn't); RE2 multiline is already \n-only (Spark side uses
      // the (?d) UNIX_LINES flag for the same semantics).
      """WITH f AS (
           SELECT doc_id,
                  len(regexp_extract_all(text, '[^ \t\n\x0B\f\r]+')) AS n_words,
                  length(regexp_replace(text, '[ \t\n\x0B\f\r]', '', 'g')) AS word_chars,
                  len(regexp_extract_all(text, '[^ \t\n\x0B\f\r]*[A-Za-z][^ \t\n\x0B\f\r]*')) AS n_alpha_words,
                  len(regexp_extract_all(text, '(?m)^[^\n]+')) AS n_lines,
                  len(regexp_extract_all(text, '(?m)^[ \t]*[-*•]')) AS n_bullet_lines,
                  len(regexp_extract_all(text, '(?m)(\.{3}|…)[ \t]*$')) AS n_ellipsis_lines,
                  len(regexp_extract_all(text, '#')) AS n_hash,
                  len(regexp_extract_all(text, '\.{3}|…')) AS n_ellipsis,
                  (CASE WHEN regexp_matches(lower(text), '\bthe\b') THEN 1 ELSE 0 END
                   + CASE WHEN regexp_matches(lower(text), '\bbe\b') THEN 1 ELSE 0 END
                   + CASE WHEN regexp_matches(lower(text), '\bto\b') THEN 1 ELSE 0 END
                   + CASE WHEN regexp_matches(lower(text), '\bof\b') THEN 1 ELSE 0 END
                   + CASE WHEN regexp_matches(lower(text), '\band\b') THEN 1 ELSE 0 END
                   + CASE WHEN regexp_matches(lower(text), '\bthat\b') THEN 1 ELSE 0 END
                   + CASE WHEN regexp_matches(lower(text), '\bhave\b') THEN 1 ELSE 0 END
                   + CASE WHEN regexp_matches(lower(text), '\bwith\b') THEN 1 ELSE 0 END
                  ) AS n_stop_distinct
           FROM documents WHERE text IS NOT NULL)
         SELECT *,
                (n_words >= 50 AND n_words <= 100000
                 AND word_chars >= n_words * 3 AND word_chars <= n_words * 10
                 AND n_hash * 10 <= n_words
                 AND n_ellipsis * 10 <= n_words
                 AND n_bullet_lines * 10 <= n_lines * 9
                 AND n_ellipsis_lines * 10 <= n_lines * 3
                 AND n_alpha_words * 10 >= n_words * 8
                 AND n_stop_distinct >= 2) AS q_pass
         FROM f""",
    "t_unigram_lp" ->
      // Same tokenization/vocab/fixed-point rules as UnigramLM: top-500
      // terms by (count desc, term asc), OOV scores as count 1, per-term
      // round(ln(c/N)*1e6) summed as BIGINT (ln agrees bitwise JVM vs
      // DuckDB; the 1e-6 grid absorbs any sub-ulp drift).
      """WITH toks AS (
           SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
           FROM documents WHERE text IS NOT NULL
         ),
         tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM toks),
         vocab AS (
           SELECT term, CAST(count(*) AS BIGINT) AS c FROM toks
           GROUP BY term ORDER BY c DESC, term ASC LIMIT 500
         )
         SELECT t.doc_id,
                CAST(sum(CAST(round(ln(CAST(coalesce(v.c, 1) AS DOUBLE)
                    / (SELECT n FROM tot)) * 1e6) AS BIGINT)) AS BIGINT) AS logprob_fp,
                CAST(count(*) AS BIGINT) AS n_tok
         FROM toks t LEFT JOIN vocab v ON t.term = v.term
         GROUP BY t.doc_id""",
    "t_bigram_lp" ->
      // Mirrors BigramLogProbFp: same vocab/tie-break rules, same IEEE
      // arithmetic shape (0.5*(cb/cp) + 0.5*(cu/N)), chr(1)-joined bigram
      // keys, first token scores plain unigram.
      """WITH d AS (
           SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS words
           FROM documents WHERE text IS NOT NULL),
         toks AS (
           SELECT doc_id, p, words[p] AS cur,
                  CASE WHEN p > 1 THEN words[p-1] END AS prev
           FROM d, unnest(range(1, len(words)+1)) AS t(p)),
         tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM toks),
         uni AS (
           SELECT cur AS term, CAST(count(*) AS BIGINT) AS c FROM toks
           GROUP BY cur ORDER BY c DESC, term ASC LIMIT 500),
         big AS (
           SELECT prev || chr(1) || cur AS bg, CAST(count(*) AS BIGINT) AS c
           FROM toks WHERE prev IS NOT NULL
           GROUP BY prev || chr(1) || cur ORDER BY c DESC, bg ASC LIMIT 1000),
         lp AS (
           -- first token OR out-of-vocabulary predecessor: unigram backoff
           -- (an OOV-prev denominator would make the bigram term exceed 1)
           SELECT t.doc_id,
                  CAST(round(ln(CASE WHEN t.prev IS NULL OR up.c IS NULL
                    THEN CAST(coalesce(uc.c, 1) AS DOUBLE) / (SELECT n FROM tot)
                    ELSE 0.5 * (CAST(coalesce(b.c, 0) AS DOUBLE) / up.c)
                       + 0.5 * (CAST(coalesce(uc.c, 1) AS DOUBLE) / (SELECT n FROM tot))
                    END) * 1e6) AS BIGINT) AS v
           FROM toks t
           LEFT JOIN uni uc ON t.cur = uc.term
           LEFT JOIN uni up ON t.prev = up.term
           LEFT JOIN big b ON t.prev || chr(1) || t.cur = b.bg)
         SELECT doc_id, CAST(sum(v) AS BIGINT) AS logprob_fp,
                CAST(count(*) AS BIGINT) AS n_tok
         FROM lp GROUP BY doc_id""",
    "t_classifier" ->
      // Two class-conditional unigram models (lang='en' positive, other
      // non-null langs negative; null-lang rows train NEITHER side but are
      // still scored), same vocab/tie-break/fixed-point rules as
      // t_unigram_lp; score = per-term difference of the two rounded
      // log-likelihoods, summed (kernel computes sum_pos - sum_neg —
      // identical by integer linearity).
      """WITH d AS (
           SELECT doc_id, lang, regexp_extract_all(lower(text), '[a-z0-9]+') AS words
           FROM documents WHERE text IS NOT NULL),
         toks AS (SELECT doc_id, unnest(words) AS term FROM d),
         ptoks AS (SELECT unnest(words) AS term FROM d WHERE lang = 'en'),
         ntoks AS (SELECT unnest(words) AS term FROM d WHERE lang <> 'en'),
         ptot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM ptoks),
         ntot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM ntoks),
         pv AS (SELECT term, CAST(count(*) AS BIGINT) AS c FROM ptoks
                GROUP BY term ORDER BY c DESC, term ASC LIMIT 300),
         nv AS (SELECT term, CAST(count(*) AS BIGINT) AS c FROM ntoks
                GROUP BY term ORDER BY c DESC, term ASC LIMIT 300)
         SELECT t.doc_id,
                CAST(sum(
                  CAST(round(ln(CAST(coalesce(pv.c, 1) AS DOUBLE)
                      / (SELECT n FROM ptot)) * 1e6) AS BIGINT)
                  - CAST(round(ln(CAST(coalesce(nv.c, 1) AS DOUBLE)
                      / (SELECT n FROM ntot)) * 1e6) AS BIGINT)) AS BIGINT) AS score_fp,
                CAST(count(*) AS BIGINT) AS n_tok
         FROM toks t
         LEFT JOIN pv ON t.term = pv.term
         LEFT JOIN nv ON t.term = nv.term
         GROUP BY t.doc_id""",
    "t_trigram_lp" ->
      // Mirrors TrigramLogProbFp: longest-available-context dispatch
      // (unigram backoff / 0.5*bi+0.5*uni / 0.5*tri+0.25*bi+0.25*uni),
      // identical left-associated IEEE arithmetic, chr(1)-joined keys,
      // same (count desc, key asc) tie-breaks at every vocabulary boundary.
      """WITH d AS (
           SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS words
           FROM documents WHERE text IS NOT NULL),
         toks AS (
           SELECT doc_id, p, words[p] AS cur,
                  CASE WHEN p > 1 THEN words[p-1] END AS prev,
                  CASE WHEN p > 2 THEN words[p-2] END AS prev2
           FROM d, unnest(range(1, len(words)+1)) AS t(p)),
         tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM toks),
         uni AS (
           SELECT cur AS term, CAST(count(*) AS BIGINT) AS c FROM toks
           GROUP BY cur ORDER BY c DESC, term ASC LIMIT 500),
         big AS (
           SELECT prev || chr(1) || cur AS bg, CAST(count(*) AS BIGINT) AS c
           FROM toks WHERE prev IS NOT NULL
           GROUP BY prev || chr(1) || cur ORDER BY c DESC, bg ASC LIMIT 1000),
         tri AS (
           SELECT prev2 || chr(1) || prev || chr(1) || cur AS tg,
                  CAST(count(*) AS BIGINT) AS c
           FROM toks WHERE prev2 IS NOT NULL
           GROUP BY prev2 || chr(1) || prev || chr(1) || cur
           ORDER BY c DESC, tg ASC LIMIT 2000),
         lp AS (
           SELECT t.doc_id,
                  CAST(round(ln(CASE
                    WHEN t.prev IS NULL OR up.c IS NULL
                    THEN CAST(coalesce(uc.c, 1) AS DOUBLE) / (SELECT n FROM tot)
                    WHEN t.prev2 IS NULL OR b2.c IS NULL
                    THEN 0.5 * (CAST(coalesce(b.c, 0) AS DOUBLE) / up.c)
                       + 0.5 * (CAST(coalesce(uc.c, 1) AS DOUBLE) / (SELECT n FROM tot))
                    ELSE 0.5 * (CAST(coalesce(g.c, 0) AS DOUBLE) / b2.c)
                       + 0.25 * (CAST(coalesce(b.c, 0) AS DOUBLE) / up.c)
                       + 0.25 * (CAST(coalesce(uc.c, 1) AS DOUBLE) / (SELECT n FROM tot))
                    END) * 1e6) AS BIGINT) AS v
           FROM toks t
           LEFT JOIN uni uc ON t.cur = uc.term
           LEFT JOIN uni up ON t.prev = up.term
           LEFT JOIN big b ON t.prev || chr(1) || t.cur = b.bg
           LEFT JOIN big b2 ON t.prev2 || chr(1) || t.prev = b2.bg
           LEFT JOIN tri g ON t.prev2 || chr(1) || t.prev || chr(1) || t.cur = g.tg)
         SELECT doc_id, CAST(sum(v) AS BIGINT) AS logprob_fp,
                CAST(count(*) AS BIGINT) AS n_tok
         FROM lp GROUP BY doc_id""",
    "t_5gram_lp" ->
      // Mirrors NgramLogProbFp at order 5 (shared CTE chain, see
      // fiveGramLpCtes): longest-available-context dispatch, dyadic
      // weights, identical IEEE arithmetic, chr(1)-joined keys, identical
      // vocabulary tie-breaks, per-level NULL joins = trie contiguity.
      s"""$fiveGramLpCtes
         SELECT doc_id, CAST(sum(v) AS BIGINT) AS logprob_fp,
                CAST(count(*) AS BIGINT) AS n_tok
         FROM lp GROUP BY doc_id""",
    "t_ppl_buckets" ->
      // CCNet tertile split on the 5-gram scores: ppl_fp = (-lp) // n_tok
      // (floor == truncation on non-negatives, matching Spark's integral
      // divide), thresholds = the ceil(n/3)-th / ceil(2n/3)-th smallest
      // sampled ppl (sample = the materialized "sample"-op hash gate at
      // cut 500000 == fraction 0.5), ties keep the lower bucket — the
      // exact contract of UnigramLM.perplexityBucketsExact.
      s"""$fiveGramLpCtes,
         score AS (
           SELECT doc_id, CAST(sum(v) AS BIGINT) AS lp,
                  CAST(count(*) AS BIGINT) AS nt
           FROM lp GROUP BY doc_id),
         ppl AS (SELECT doc_id, (-lp) // nt AS ppl_fp FROM score WHERE nt > 0),
         g AS (
           SELECT doc_id, g_ppl FROM read_parquet('/root/repo/target/fixtures/sample_gates.parquet/*.parquet')),
         samp AS (
           SELECT p.ppl_fp FROM ppl p JOIN g USING (doc_id)
           WHERE g.g_ppl < 500000),
         r AS (SELECT ppl_fp, row_number() OVER (ORDER BY ppl_fp) AS rn FROM samp),
         nn AS (SELECT CAST(count(*) AS BIGINT) AS c FROM samp),
         t1 AS (SELECT max(ppl_fp) AS v FROM r WHERE rn <= (SELECT (c + 2) // 3 FROM nn)),
         t2 AS (SELECT max(ppl_fp) AS v FROM r WHERE rn <= (SELECT (2 * c + 2) // 3 FROM nn))
         SELECT doc_id, ppl_fp,
                CASE WHEN ppl_fp <= (SELECT v FROM t1) THEN 'head'
                     WHEN ppl_fp <= (SELECT v FROM t2) THEN 'middle'
                     ELSE 'tail' END AS bucket
         FROM ppl""",
    "t_ppl_buckets_lang" -> pplBucketsLangSql,
    "t_ccnet_select" ->
      // The composed CCNet selection = the per-language bucket oracle
      // minus the tail bucket (keep = head+middle).
      s"SELECT * FROM ($pplBucketsLangSql) WHERE bucket <> 'tail'",
    "t_tfidf" ->
      """WITH d AS (SELECT doc_id, text FROM documents WHERE text IS NOT NULL),
         n AS (SELECT CAST(count(*) AS DOUBLE) AS nd FROM d),
         tc AS (
           SELECT doc_id, term, CAST(count(*) AS INT) AS tf
           FROM (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
                 FROM d)
           GROUP BY doc_id, term),
         dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tc GROUP BY term),
         idf AS (
           SELECT term, df,
                  CAST(round(ln(((SELECT nd FROM n) + 1.0) / (df + 1.0)) * 1e6) AS BIGINT) AS idf_fp
           FROM dfreq),
         s AS (
           SELECT t.doc_id, t.term, t.tf, i.df, CAST(t.tf AS BIGINT) * i.idf_fp AS score_fp
           FROM tc t JOIN idf i ON t.term = i.term),
         r AS (
           SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score_fp DESC, term) AS rn
           FROM s)
         SELECT doc_id, term, tf, df, score_fp, CAST(rn AS INT) AS rn FROM r WHERE rn <= 3""",
    "t_redact" ->
      """SELECT doc_id,
                regexp_replace(regexp_replace(text, '[0-9]+', '<NUM>', 'g'),
                               '[aeiou]{2,}', '<VOWELS>', 'g') AS redacted,
                len(regexp_extract_all(text, '[0-9]+')) AS n_num
         FROM documents""",
    "d_dup_spans" ->
      """WITH toks AS (
           SELECT doc_id,
                  regexp_extract_all(lower(regexp_replace(text, '[^a-z0-9\s]', ' ', 'gi')), '[a-z0-9]+') AS ts
           FROM documents),
         grams AS (
           SELECT doc_id,
                  unnest(list_distinct([array_to_string(ts[i:i+2], ' ')
                                        for i in generate_series(1, greatest(len(ts)-2, 0))])) AS span
           FROM toks)
         SELECT span, count(*) AS n_docs FROM grams GROUP BY span HAVING count(*) >= 5""",
    "t_top_terms" ->
      """SELECT term, count(*) AS df FROM (
           SELECT doc_id,
                  unnest(list_distinct(regexp_extract_all(
                    lower(regexp_replace(text, '[^a-z0-9\s]', ' ', 'gi')), '[a-z0-9]+'))) AS term
           FROM documents)
         GROUP BY term ORDER BY df DESC, term LIMIT 50""",
    "e_window" ->
      """SELECT date_trunc('hour', ts) AS h, event_type, count(*) AS n,
                CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS value_c
         FROM events GROUP BY h, event_type""",
    "e_sessions" ->
      """SELECT user_id, CAST(sum(new_sess) AS BIGINT) AS n_sessions FROM (
           SELECT user_id,
                  CASE WHEN lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                         OR epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                            > 1800000000 THEN 1 ELSE 0 END AS new_sess
           FROM events) GROUP BY user_id""",
    "e_except" ->
      """SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
         EXCEPT
         SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'""",
    "j_asof_purchase" ->
      // DuckDB's NATIVE ASOF JOIN adjudicates the union+window sort-merge
      // as-of — an independent implementation, not a SQL transliteration.
      // The right side pre-reduces duplicate (user, ts) purchases to the
      // max-event_id row, mirroring tieBreak.
      """SELECT e.event_id, e.user_id, e.ts, e.event_type, p.p_event_id, p.p_value_c
         FROM (SELECT event_id, user_id, ts, event_type FROM events
               WHERE event_type <> 'purchase') e
         ASOF LEFT JOIN (
           SELECT user_id AS p_user, ts AS p_ts,
                  max_by(event_id, event_id) AS p_event_id,
                  max_by(CAST(round(value * 100) AS BIGINT), event_id) AS p_value_c
           FROM events
           WHERE event_type = 'purchase' AND user_id IS NOT NULL AND ts IS NOT NULL
           GROUP BY 1, 2
         ) p ON e.user_id = p.p_user AND e.ts >= p.p_ts""",
    "j_range_window" ->
      """SELECT e.event_id, e.ts, w.w_id
         FROM (SELECT event_id, ts FROM events WHERE event_type = 'click') e
         JOIN (SELECT event_id AS w_id, ts AS w_start, ts + INTERVAL 2 HOUR AS w_end
               FROM events WHERE event_type = 'purchase' AND event_id % 10 = 0) w
           ON e.ts >= w.w_start AND e.ts < w.w_end""",
    "m_meta" ->
      """SELECT 'image' AS media_type, 'png' AS format, count(*) AS n,
                CAST(sum(CAST(octet_length(encode(text)) AS BIGINT)) AS BIGINT) AS total_bytes,
                min(octet_length(encode(text))) AS min_bytes,
                max(octet_length(encode(text))) AS max_bytes
         FROM documents""",
    "m_decode" ->
      // the decoder must reproduce the GENERATION-TIME ground truth from
      // raw bytes alone (the query never reads the true_* columns)
      """SELECT doc_id, true_format AS format, true_width AS width,
                true_height AS height, true_frames AS n_frames,
                (true_format <> 'unknown') AS ok
         FROM read_parquet('/root/repo/target/fixtures/media.parquet/*.parquet')""",
    "m_audio" ->
      """SELECT doc_id, true_format AS format, true_channels AS channels,
                true_sample_rate AS sample_rate, true_bits AS bits,
                true_samples AS n_samples, (true_format <> 'unknown') AS ok
         FROM read_parquet('/root/repo/target/fixtures/audio.parquet/*.parquet')""",
    "m_codec_audio" ->
      """SELECT doc_id, true_format AS format, true_channels AS channels,
                true_sample_rate AS sample_rate, true_bits AS bits,
                true_samples AS n_samples, (true_format <> 'unknown') AS ok
         FROM read_parquet('/root/repo/target/fixtures/codec_audio.parquet/*.parquet')""",
    "m_video" ->
      """SELECT doc_id, true_format AS format, true_width AS width,
                true_height AS height, true_duration_ms AS duration_ms,
                (true_format <> 'unknown') AS ok
         FROM read_parquet('/root/repo/target/fixtures/video.parquet/*.parquet')""",
    // seq_* oracles read the fixture Verify materializes from the SAME
    // deterministic generator the queries run (DataGen.Seq20kFixturePath) —
    // every standard-suite check re-expressed over the materialized rows
    "v_oov_rate" ->
      // list-lambda mirror of the codegen'd array pass; HUGEINT guards the
      // n_oov*10^6 product and // is the same true integral division
      """WITH seq AS (
           SELECT * FROM read_parquet('/root/repo/target/fixtures/seq20k.parquet/*.parquet')),
         p AS (
           SELECT source, count(*) AS n_rows,
                  CAST(sum(CASE WHEN tokens IS NULL THEN 0 ELSE len(tokens) END) AS BIGINT) AS n_tokens,
                  CAST(sum(CASE WHEN tokens IS NULL THEN 0 ELSE
                    len(list_filter(tokens, t -> t IS NULL OR t < 0 OR t >= 50257)) END) AS BIGINT) AS n_oov
           FROM seq GROUP BY source)
         SELECT source, n_rows, n_tokens, n_oov,
                CASE WHEN n_tokens > 0
                     THEN CAST((CAST(n_oov AS HUGEINT) * 1000000) // n_tokens AS BIGINT)
                END AS oov_rate_fp
         FROM p""",
    "v_oov_shift" ->
      """WITH seq AS (
           SELECT * FROM read_parquet('/root/repo/target/fixtures/seq20k.parquet/*.parquet')),
         prof AS (
           SELECT source,
                  CAST(sum(CASE WHEN tokens IS NULL THEN 0 ELSE len(tokens) END) AS BIGINT) AS n_tokens,
                  CAST(sum(CASE WHEN tokens IS NULL THEN 0 ELSE
                    len(list_filter(tokens, t -> t IS NULL OR t < 0 OR t >= 50257)) END) AS BIGINT) AS oov_ref,
                  CAST(sum(CASE WHEN tokens IS NULL THEN 0 ELSE
                    len(list_filter(tokens, t -> t IS NULL OR t < 0 OR t >= 25128)) END) AS BIGINT) AS oov_cur
           FROM seq GROUP BY source)
         SELECT source,
                CASE WHEN n_tokens > 0 THEN CAST((CAST(oov_ref AS HUGEINT) * 1000000) // n_tokens AS BIGINT) END AS ref_rate_fp,
                CASE WHEN n_tokens > 0 THEN CAST((CAST(oov_cur AS HUGEINT) * 1000000) // n_tokens AS BIGINT) END AS cur_rate_fp,
                CASE WHEN n_tokens > 0 THEN CAST((CAST(oov_cur AS HUGEINT) * 1000000) // n_tokens
                                              - (CAST(oov_ref AS HUGEINT) * 1000000) // n_tokens AS BIGINT) END AS delta_fp,
                CASE WHEN n_tokens > 0 AND abs((CAST(oov_cur AS HUGEINT) * 1000000) // n_tokens
                                             - (CAST(oov_ref AS HUGEINT) * 1000000) // n_tokens) > 10000
                     THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS breach
         FROM prof""",
    "v_pad_layout" ->
      // re-derives all three layout verdicts from the raw materialized
      // arrays with DuckDB list primitives: suffix-only ⇔ the first pad
      // sits exactly (width - npads + 1) from the left (count+position
      // pin every pad into the suffix), last real token via a pad-free
      // filtered list's [-1]
      """WITH seq AS (
           SELECT * FROM read_parquet('/root/repo/target/fixtures/seqpad20k.parquet/*.parquet')),
         m AS (
           SELECT source, n_tok,
                  len(tokens) AS width,
                  len(list_filter(tokens, x -> x = 0)) AS npads,
                  list_position(tokens, 0) AS first_pad,
                  list_filter(tokens, x -> x <> 0) AS real_toks
           FROM seq)
         SELECT source,
                CAST(sum(CASE WHEN npads > 0 AND first_pad <> width - npads + 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_interior_pad,
                CAST(sum(CASE WHEN len(real_toks) = 0 OR real_toks[-1] <> 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_missing_eos,
                CAST(sum(CASE WHEN width - npads <> n_tok THEN 1 ELSE 0 END) AS BIGINT) AS n_len_mismatch,
                count(*) AS n_rows
         FROM m GROUP BY source""",
    "v_token_drift" ->
      // exact re-derivation: unnest the SAME remapped token streams (pmod
      // mirrored as ((t % m) + m) % m for negative ids), exact per-source
      // per-token counts, the same (cnt desc, token asc) top-20 watchlist,
      // HUGEINT // fixed-point rates, LEFT-join current with 0 for absent
      """WITH seq AS (
           SELECT * FROM read_parquet('/root/repo/target/fixtures/seq20k.parquet/*.parquet')
           WHERE tokens IS NOT NULL AND source IS NOT NULL),
         tok AS (
           SELECT s.source,
                  ((t.tok % 101) + 101) % 101 AS rtok,
                  CASE WHEN s.source = 'forums' THEN ((t.tok % 51) + 51) % 51
                       ELSE ((t.tok % 101) + 101) % 101 END AS ctok
           FROM seq s, LATERAL (SELECT unnest(s.tokens) AS tok) t),
         totals AS (SELECT source, count(*) AS total FROM tok GROUP BY source),
         refc AS (SELECT source, rtok AS token, count(*) AS cnt FROM tok GROUP BY source, rtok),
         curc AS (SELECT source, ctok AS token, count(*) AS cnt FROM tok GROUP BY source, ctok),
         reftop AS (
           SELECT source, token, cnt,
                  row_number() OVER (PARTITION BY source ORDER BY cnt DESC, token ASC) AS rk
           FROM refc),
         deltas AS (
           -- a watchlist token absent from current has rate 0, not NULL
           SELECT r.source,
                  CAST((CAST(COALESCE(c2.cnt, 0) AS HUGEINT) * 1000000) // t.total AS BIGINT)
                    - CAST((CAST(r.cnt AS HUGEINT) * 1000000) // t.total AS BIGINT) AS d
           FROM reftop r
           JOIN totals t ON t.source = r.source
           LEFT JOIN (SELECT source, token, cnt FROM curc) c2
             ON c2.source = r.source AND c2.token = r.token
           WHERE r.rk <= 20)
         SELECT d0.source,
                CAST(count(*) AS BIGINT) AS n_top,
                CAST(sum(CASE WHEN abs(d) > 500 THEN 1 ELSE 0 END) AS BIGINT) AS n_breach,
                CAST(max(abs(d)) AS BIGINT) AS max_abs_delta_fp,
                CAST(CASE WHEN sum(CASE WHEN abs(d) > 500 THEN 1 ELSE 0 END) > 0
                     THEN 1 ELSE 0 END AS BIGINT) AS breach
         FROM deltas d0 GROUP BY d0.source""",
    "v_reconcile" ->
      // mirror of the mutation + full-outer per-key count compare
      """WITH docs AS (SELECT doc_id FROM documents),
         rightt AS (
           SELECT doc_id FROM docs WHERE doc_id % 13 <> 0
           UNION ALL SELECT doc_id FROM docs WHERE doc_id % 17 = 0
           UNION ALL SELECT doc_id + 10000000 FROM docs WHERE doc_id % 19 = 0),
         l AS (SELECT doc_id, count(*) AS nl FROM docs WHERE doc_id IS NOT NULL GROUP BY doc_id),
         r AS (SELECT doc_id, count(*) AS nr FROM rightt WHERE doc_id IS NOT NULL GROUP BY doc_id),
         j AS (
           SELECT CASE WHEN r.nr IS NULL THEN 'left_only'
                       WHEN l.nl IS NULL THEN 'right_only'
                       WHEN l.nl <> r.nr THEN 'count_mismatch'
                       ELSE 'match' END AS disposition,
                  COALESCE(l.nl, 0) AS nl, COALESCE(r.nr, 0) AS nr
           FROM l FULL OUTER JOIN r ON l.doc_id = r.doc_id)
         SELECT disposition,
                CAST(count(*) AS BIGINT) AS n_keys,
                CAST(sum(nl) AS BIGINT) AS n_rows_left,
                CAST(sum(nr) AS BIGINT) AS n_rows_right
         FROM j GROUP BY disposition""",
    "v_ref_table" ->
      // mirror: same shifted-orphan mutation, anti-join against region,
      // per-key orphan counts in the engine's violation-row shape
      """WITH fact AS (
           SELECT n_regionkey FROM nation
           UNION ALL SELECT n_regionkey + 100 FROM nation WHERE n_nationkey % 5 = 0),
         orphans AS (
           SELECT f.n_regionkey AS key, count(*) AS cnt
           FROM fact f LEFT JOIN region r ON f.n_regionkey = r.r_regionkey
           WHERE f.n_regionkey IS NOT NULL AND r.r_regionkey IS NULL
           GROUP BY f.n_regionkey)
         SELECT 'refTable(n_regionkey->r_regionkey)' AS constraint_id,
                'n_regionkey' AS path,
                'orphan rows=' || CAST(cnt AS VARCHAR) AS actual,
                CAST(key AS BIGINT) AS key
         FROM orphans""",
    "v_triage" ->
      // mirror: same synthetic violations frame, same digit-fold, top-3 per
      // check via row_number (the oracle may window-sort; the engine may not)
      """WITH v AS (SELECT source AS constraint_id,
                'lang=' || lang || ' n=' || CAST(n_chars AS VARCHAR) AS actual,
                CAST(doc_id AS VARCHAR) AS doc_id FROM documents),
         g AS (SELECT constraint_id,
                      regexp_replace(actual, '[0-9]+', '#', 'g') AS pattern,
                      count(*) AS n, min(actual) AS exemplar_actual,
                      min(doc_id) AS exemplar_doc_id
               FROM v GROUP BY 1, 2),
         r AS (SELECT *, row_number() OVER (PARTITION BY constraint_id
                                            ORDER BY n DESC, pattern ASC) AS rk
               FROM g)
         SELECT constraint_id, pattern, CAST(n AS BIGINT) AS n,
                exemplar_actual, exemplar_doc_id
         FROM r WHERE rk <= 3""",
    "v_diff_examples" ->
      // v_row_parity's per-key mirror, keeping the key, non-match only,
      // smallest 25 keys
      """WITH docs AS (SELECT * FROM documents),
         kept AS (SELECT * FROM docs WHERE doc_id % 13 <> 0),
         mutated AS (SELECT doc_id,
                CASE WHEN doc_id % 7 = 0 THEN text || 'x' ELSE text END AS text,
                lang, source, n_chars FROM kept),
         rightt AS (
           SELECT * FROM mutated
           UNION ALL SELECT * FROM docs WHERE doc_id % 17 = 0
           UNION ALL SELECT doc_id + 10000000 AS doc_id, text, lang, source, n_chars
             FROM docs WHERE doc_id % 19 = 0),
         l AS (SELECT doc_id, text, lang, source, n_chars, count(*) AS nl
               FROM docs WHERE doc_id IS NOT NULL GROUP BY ALL),
         r AS (SELECT doc_id, text, lang, source, n_chars, count(*) AS nr
               FROM rightt WHERE doc_id IS NOT NULL GROUP BY ALL),
         cells AS (
           SELECT COALESCE(l.doc_id, r.doc_id) AS k,
                  COALESCE(l.nl, 0) AS nl, COALESCE(r.nr, 0) AS nr
           FROM l FULL OUTER JOIN r
             ON l.doc_id = r.doc_id
            AND l.text IS NOT DISTINCT FROM r.text
            AND l.lang IS NOT DISTINCT FROM r.lang
            AND l.source IS NOT DISTINCT FROM r.source
            AND l.n_chars IS NOT DISTINCT FROM r.n_chars),
         perkey AS (
           SELECT k, sum(nl) AS nl, sum(nr) AS nr,
                  max(CASE WHEN nl <> nr THEN 1 ELSE 0 END) AS cell_diff
           FROM cells GROUP BY k),
         d AS (
           SELECT k, CASE WHEN nl = 0 THEN 'right_only'
                          WHEN nr = 0 THEN 'left_only'
                          WHEN nl <> nr THEN 'count_mismatch'
                          WHEN cell_diff = 1 THEN 'content_mismatch'
                          ELSE 'match' END AS disposition, nl, nr
           FROM perkey)
         SELECT k AS doc_id, disposition,
                CAST(nl AS BIGINT) AS n_rows_left,
                CAST(nr AS BIGINT) AS n_rows_right
         FROM d WHERE disposition <> 'match'
         ORDER BY doc_id LIMIT 25""",
    "v_col_diff" ->
      // mirror of the per-column multiset compare: DuckDB compares
      // list_sort'd value lists per key per column where Spark compares
      // hi/lo-split hash-sum fingerprints — same multiset semantics;
      // compared keys = present both sides with equal multiplicity
      """WITH docs AS (SELECT * FROM documents),
         mut AS (SELECT doc_id,
                CASE WHEN doc_id % 7 = 0 THEN text || 'x' ELSE text END AS text,
                CASE WHEN doc_id % 23 = 0 THEN lang || 'x' ELSE lang END AS lang,
                source,
                CASE WHEN doc_id % 11 = 0 THEN n_chars + 1 ELSE n_chars END AS n_chars
           FROM docs WHERE doc_id % 13 <> 0),
         rightt AS (
           SELECT doc_id, text, lang, source, n_chars FROM mut
           UNION ALL SELECT doc_id, text, lang, source, n_chars
             FROM docs WHERE doc_id % 17 = 0),
         l AS (SELECT doc_id, count(*) AS n,
                      list_sort(list(text)) AS m_text, list_sort(list(lang)) AS m_lang,
                      list_sort(list(source)) AS m_source, list_sort(list(n_chars)) AS m_nc
               FROM docs WHERE doc_id IS NOT NULL GROUP BY doc_id),
         r AS (SELECT doc_id, count(*) AS n,
                      list_sort(list(text)) AS m_text, list_sort(list(lang)) AS m_lang,
                      list_sort(list(source)) AS m_source, list_sort(list(n_chars)) AS m_nc
               FROM rightt WHERE doc_id IS NOT NULL GROUP BY doc_id),
         j AS (SELECT l.m_text AS lt, l.m_lang AS lg, l.m_source AS ls, l.m_nc AS ln,
                      r.m_text AS rt, r.m_lang AS rg, r.m_source AS rs, r.m_nc AS rn
               FROM l JOIN r ON l.doc_id = r.doc_id AND l.n = r.n)
         SELECT 'lang' AS col_name, CAST(count(*) AS BIGINT) AS n_keys_compared,
                CAST(COALESCE(sum(CASE WHEN lg <> rg THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_keys_differing FROM j
         UNION ALL
         SELECT 'n_chars', CAST(count(*) AS BIGINT),
                CAST(COALESCE(sum(CASE WHEN ln <> rn THEN 1 ELSE 0 END), 0) AS BIGINT) FROM j
         UNION ALL
         SELECT 'source', CAST(count(*) AS BIGINT),
                CAST(COALESCE(sum(CASE WHEN ls <> rs THEN 1 ELSE 0 END), 0) AS BIGINT) FROM j
         UNION ALL
         SELECT 'text', CAST(count(*) AS BIGINT),
                CAST(COALESCE(sum(CASE WHEN lt <> rt THEN 1 ELSE 0 END), 0) AS BIGINT) FROM j""",
    "v_row_parity" ->
      // mirror of the content mutation + per-(key, full-row) count compare:
      // DuckDB groups on the raw column tuple where Spark groups on the
      // xxhash64 row fingerprint — same multiset semantics, engine-native
      // representation each side (null-safe tuple equality via
      // IS NOT DISTINCT FROM)
      """WITH docs AS (SELECT * FROM documents),
         kept AS (SELECT * FROM docs WHERE doc_id % 13 <> 0),
         mutated AS (SELECT doc_id,
                CASE WHEN doc_id % 7 = 0 THEN text || 'x' ELSE text END AS text,
                lang, source, n_chars FROM kept),
         rightt AS (
           SELECT * FROM mutated
           UNION ALL SELECT * FROM docs WHERE doc_id % 17 = 0
           UNION ALL SELECT doc_id + 10000000 AS doc_id, text, lang, source, n_chars
             FROM docs WHERE doc_id % 19 = 0),
         l AS (SELECT doc_id, text, lang, source, n_chars, count(*) AS nl
               FROM docs WHERE doc_id IS NOT NULL GROUP BY ALL),
         r AS (SELECT doc_id, text, lang, source, n_chars, count(*) AS nr
               FROM rightt WHERE doc_id IS NOT NULL GROUP BY ALL),
         cells AS (
           SELECT COALESCE(l.doc_id, r.doc_id) AS k,
                  COALESCE(l.nl, 0) AS nl, COALESCE(r.nr, 0) AS nr
           FROM l FULL OUTER JOIN r
             ON l.doc_id = r.doc_id
            AND l.text IS NOT DISTINCT FROM r.text
            AND l.lang IS NOT DISTINCT FROM r.lang
            AND l.source IS NOT DISTINCT FROM r.source
            AND l.n_chars IS NOT DISTINCT FROM r.n_chars),
         perkey AS (
           SELECT k, sum(nl) AS nl, sum(nr) AS nr,
                  max(CASE WHEN nl <> nr THEN 1 ELSE 0 END) AS cell_diff
           FROM cells GROUP BY k),
         d AS (
           SELECT CASE WHEN nl = 0 THEN 'right_only'
                       WHEN nr = 0 THEN 'left_only'
                       WHEN nl <> nr THEN 'count_mismatch'
                       WHEN cell_diff = 1 THEN 'content_mismatch'
                       ELSE 'match' END AS disposition, nl, nr
           FROM perkey)
         SELECT disposition, CAST(count(*) AS BIGINT) AS n_keys,
                CAST(sum(nl) AS BIGINT) AS n_rows_left,
                CAST(sum(nr) AS BIGINT) AS n_rows_right
         FROM d GROUP BY disposition""",
    "v_pad_waste" ->
      // exact mirror over the materialized padded corpus: pad counts via
      // list_filter, HUGEINT floor division for the fixed-point rate
      """WITH seq AS (
           SELECT * FROM read_parquet('/root/repo/target/fixtures/seqpad20k.parquet/*.parquet')),
         m AS (
           SELECT source,
                  CAST(count(*) AS BIGINT) AS n_rows,
                  CAST(sum(len(tokens)) AS BIGINT) AS n_tokens,
                  CAST(sum(len(list_filter(tokens, x -> x = 0))) AS BIGINT) AS n_pad
           FROM seq GROUP BY source)
         SELECT source, n_rows, n_tokens, n_pad,
                CASE WHEN n_tokens > 0
                     THEN CAST((CAST(n_pad AS HUGEINT) * 1000000) // n_tokens AS BIGINT)
                     ELSE CAST(0 AS BIGINT) END AS waste_fp
         FROM m""",
    "v_segments" ->
      // re-derives segment lengths from raw arrays: separator positions via
      // generate_series + index, a sentinel at len+1 closes the trailing
      // run (counted only when non-empty), lag() turns positions into
      // lengths — the window re-derivation of the kernel's single pass
      """WITH seq AS (
           SELECT * FROM read_parquet('/root/repo/target/fixtures/seqpacked20k.parquet/*.parquet')),
         sep AS (
           SELECT s.doc_id, s.source, i.g AS p
           FROM seq s, LATERAL (SELECT unnest(generate_series(1, len(s.tokens))) AS g) i
           WHERE s.tokens[i.g] = 2),
         allp AS (
           SELECT doc_id, source, p, FALSE AS is_sentinel FROM sep
           UNION ALL
           SELECT doc_id, source, len(tokens) + 1, TRUE FROM seq),
         segs AS (
           SELECT doc_id, source, is_sentinel,
                  p - COALESCE(lag(p) OVER (PARTITION BY doc_id ORDER BY p), 0) - 1 AS seg_len
           FROM allp),
         bad AS (
           SELECT doc_id, source,
                  sum(CASE WHEN (NOT is_sentinel OR seg_len > 0)
                            AND (seg_len < 1 OR seg_len > 12) THEN 1 ELSE 0 END) AS n_bad
           FROM segs GROUP BY doc_id, source)
         SELECT source,
                CAST(sum(CASE WHEN n_bad > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_bad_rows,
                CAST(sum(n_bad) AS BIGINT) AS n_bad_segments,
                count(*) AS n_rows
         FROM bad GROUP BY source""",
    "seq_quarantine" ->
      // per-row re-derivation of the ROW-LOCAL verdicts (the split ignores
      // cross-row checks by contract): entry counts follow the engine's
      // conventions — one entry per failing leaf, except the element-domain
      // check which emits one entry PER offending element
      """WITH seq AS (
           SELECT * FROM read_parquet('/root/repo/target/fixtures/seq20k.parquet/*.parquet')),
         f AS (
           SELECT
             CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END
               + CASE WHEN doc_id IS NOT NULL AND NOT regexp_matches(doc_id, '^doc-[0-9]{12}$') THEN 1 ELSE 0 END
               + CASE WHEN source IS NULL THEN 1 ELSE 0 END
               + CASE WHEN n_tok IS NOT NULL AND NOT (n_tok >= 1 AND n_tok <= 8192) THEN 1 ELSE 0 END
               + CASE WHEN tokens IS NOT NULL AND n_tok IS NOT NULL AND len(tokens) <> n_tok THEN 1 ELSE 0 END
               + CASE WHEN tokens IS NOT NULL THEN len(list_filter(tokens, x -> x IS NULL OR x < 0 OR x > 50256)) ELSE 0 END
               + CASE WHEN tokens IS NOT NULL AND NOT list_contains(tokens, 1) THEN 1 ELSE 0 END
               + CASE WHEN tokens IS NOT NULL AND NOT (len(tokens) >= 1 AND len(tokens) <= 8192) THEN 1 ELSE 0 END
               AS entries
           FROM seq)
         SELECT CAST(sum(CASE WHEN entries = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_clean,
                CAST(sum(CASE WHEN entries > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_quarantined,
                CAST(sum(CASE WHEN entries > 0 THEN entries ELSE 0 END) AS BIGINT) AS n_entries
         FROM f""",
    "seq_validate" ->
      """WITH seq AS (
           SELECT * FROM read_parquet('/root/repo/target/fixtures/seq20k.parquet/*.parquet')),
         binned AS (
           SELECT source AS grp, CAST(floor(n_tok / 2.0) AS BIGINT) AS bin
           FROM seq WHERE n_tok IS NOT NULL AND source IS NOT NULL),
         obs AS (SELECT grp, bin, count(*) AS obs FROM binned GROUP BY grp, bin),
         gt AS (SELECT grp, CAST(sum(obs) AS BIGINT) AS grp_total FROM obs GROUP BY grp),
         bt AS (SELECT bin, CAST(sum(obs) AS BIGINT) AS bin_total FROM obs GROUP BY bin),
         tot AS (SELECT CAST(sum(obs) AS BIGINT) AS n_total FROM obs),
         chi AS (
           SELECT gt.grp, sum(CASE
                    WHEN CAST(gt.grp_total AS DOUBLE) * bt.bin_total / tot.n_total > 0
                    THEN (COALESCE(obs.obs,0) - CAST(gt.grp_total AS DOUBLE) * bt.bin_total / tot.n_total)
                       * (COALESCE(obs.obs,0) - CAST(gt.grp_total AS DOUBLE) * bt.bin_total / tot.n_total)
                       / (CAST(gt.grp_total AS DOUBLE) * bt.bin_total / tot.n_total)
                    ELSE 0 END) AS chi2
           FROM gt CROSS JOIN bt
           LEFT JOIN obs ON obs.grp = gt.grp AND obs.bin = bt.bin
           CROSS JOIN tot GROUP BY gt.grp),
         v AS (
           SELECT 'nonnull(doc_id)' AS constraint_id, count(*) AS n FROM seq WHERE doc_id IS NULL
           UNION ALL SELECT 'regex(doc_id)', count(*) FROM seq
             WHERE doc_id IS NOT NULL AND NOT regexp_matches(doc_id, '^doc-[0-9]{12}$')
           UNION ALL SELECT 'nonnull(source)', count(*) FROM seq WHERE source IS NULL
           UNION ALL SELECT 'range(n_tok)', count(*) FROM seq
             WHERE n_tok IS NOT NULL AND NOT (n_tok >= 1 AND n_tok <= 8192)
           UNION ALL SELECT 'lengthConsistent(tokens,n_tok)', count(*) FROM seq
             WHERE tokens IS NOT NULL AND n_tok IS NOT NULL AND len(tokens) <> n_tok
           UNION ALL SELECT 'elemRange(tokens)',
             COALESCE(CAST(sum(len(list_filter(tokens, x -> x IS NULL OR x < 0 OR x > 50256))) AS BIGINT), 0)
             FROM seq WHERE tokens IS NOT NULL
           UNION ALL SELECT 'contains(tokens)', count(*) FROM seq
             WHERE tokens IS NOT NULL AND NOT list_contains(tokens, 1)
           UNION ALL SELECT 'sizeBounds(tokens)', count(*) FROM seq
             WHERE tokens IS NOT NULL AND NOT (len(tokens) >= 1 AND len(tokens) <= 8192)
           UNION ALL SELECT 'unique(doc_id)', (SELECT count(*) FROM (
             SELECT doc_id FROM seq WHERE doc_id IS NOT NULL
             GROUP BY doc_id HAVING count(*) > 1))
           UNION ALL SELECT 'ref(source->source)', (SELECT count(DISTINCT source) FROM seq
             WHERE source IS NOT NULL
               AND source NOT IN ('web','books','code','wiki','forums'))
           UNION ALL SELECT 'drift(n_tok by source)', (SELECT count(*) FROM chi WHERE chi2 > 100.0))
         SELECT constraint_id, CAST(n AS BIGINT) AS n FROM v WHERE n > 0""",
    "seq_decontaminate" ->
      """WITH corpus AS (
           SELECT row_number() OVER () AS rid, doc_id, tokens
           FROM read_parquet('/root/repo/target/fixtures/seq20k.parquet/*.parquet')
           WHERE n_tok >= 13),
         bench_w AS (
           SELECT DISTINCT b.tokens[i.g:i.g+12] AS w
           FROM read_parquet('/root/repo/target/fixtures/seq20k_bench.parquet/*.parquet') b,
                LATERAL (SELECT unnest(generate_series(1, greatest(len(b.tokens)-12, 0))) AS g) i),
         corpus_w AS (
           SELECT DISTINCT c.rid, c.doc_id, c.tokens[i.g:i.g+12] AS w
           FROM corpus c,
                LATERAL (SELECT unnest(generate_series(1, greatest(len(c.tokens)-12, 0))) AS g) i),
         hits AS (
           SELECT cw.doc_id, count(*) AS n_overlap
           FROM corpus_w cw JOIN bench_w bw ON cw.w = bw.w
           GROUP BY cw.doc_id)
         SELECT count(*) AS n_contaminated,
                CAST(sum(n_overlap) AS BIGINT) AS total_overlap
         FROM hits""",
    "seq_report" ->
      """WITH seq AS (
           SELECT * FROM read_parquet('/root/repo/target/fixtures/seq20k.parquet/*.parquet')),
         p AS (
           SELECT (doc_id IS NOT NULL)
              AND (doc_id IS NULL OR regexp_matches(doc_id, '^doc-[0-9]{12}$'))
              AND (source IS NOT NULL)
              AND (n_tok IS NULL OR (n_tok >= 1 AND n_tok <= 8192))
              AND (tokens IS NULL OR n_tok IS NULL OR len(tokens) = n_tok)
              AND (tokens IS NULL OR len(list_filter(tokens, x -> x IS NULL OR x < 0 OR x > 50256)) = 0)
              AND (tokens IS NULL OR list_contains(tokens, 1))
              AND (tokens IS NULL OR (len(tokens) >= 1 AND len(tokens) <= 8192)) AS ok
           FROM seq)
         SELECT count(*) AS rows,
                CAST(sum(CASE WHEN ok THEN 1 ELSE 0 END) AS BIGINT) AS pass,
                CAST(sum(CASE WHEN ok THEN 0 ELSE 1 END) AS BIGINT) AS fail
         FROM p""")
}

package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Edge-case hardening: empty inputs, empty arrays, all-null columns,
  * unicode keys — the engine must degrade to empty outputs, never throw. */
class EdgeSpec extends SparkSpec {
  import spark.implicits._

  private lazy val compiled =
    DataGen.standardSuite(spark, 16).compile(Seq_.schema).toOption.get

  test("empty input: zero violations, zero report rows, empty summary") {
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], Seq_.schema)
    val r = compiled.run(empty)
    assert(r.violations.count() === 0)
    assert(r.report.count() === 0)
    val json = ReportSink.summaryJson(r, "empty")
    assert(json.contains("\"fail_by_check\":{}"))
  }

  test("empty token arrays: size/contains fire, elemRange passes vacuously") {
    val df = Seq(("d1", Seq.empty[Int], 0, "web")).toDF("doc_id", "tokens", "n_tok", "source")
    val r = compiled.run(df)
    val ids = r.violations.select("constraint_id").as[String].collect().toSet
    assert(ids.exists(_.startsWith("sizeBounds"))) // minItems 1
    assert(ids.exists(_.startsWith("contains"))) // BOS missing
    assert(!ids.exists(_.startsWith("elemRange"))) // vacuous truth over []
  }

  test("all-null key column: every row lands in one bucket, nonnull fires per row") {
    val df = Seq.fill(10)((null: String, Seq(1, 2), 2, "web"))
      .toDF("doc_id", "tokens", "n_tok", "source")
    val r = compiled.run(df)
    assert(r.violations.filter(col("constraint_id") === "nonnull(doc_id)").count() === 10)
    assert(r.report.count() === 1) // xxhash64(null) -> one bucket; still counted
    assert(r.report.agg(sum("rows")).as[Long].head() === 10)
  }

  test("unicode doc_ids survive the round trip and violate regex cleanly") {
    val df = Seq(("doc-000000000001", Seq(1), 1, "web"), ("файл-42", Seq(1), 1, "web"),
      ("📄-7", Seq(1), 1, "web")).toDF("doc_id", "tokens", "n_tok", "source")
    val r = compiled.run(df)
    val bad = r.violations.filter(col("constraint_id") === "regex(doc_id)")
      .select("doc_id").as[String].collect().toSet
    assert(bad === Set("файл-42", "📄-7"))
  }

  test("dedup/similarity ops on empty frames return empty, not errors") {
    val emptyDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(graft.ops.Dedup.exact(emptyDocs, "text", "doc_id").count() === 0)
    assert(graft.ops.Dedup.minhashLsh(emptyDocs, "text", "doc_id",
      numHashes = 16, bands = 4).count() === 0)
    val emptyEmb = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("vec_id", LongType),
        StructField("embedding", ArrayType(FloatType)))))
    assert(graft.ops.Similarity.cosineLshPairs(emptyEmb, "embedding", "vec_id").count() === 0)
  }

  test("TextAnalysis on empty and whitespace-only text") {
    val df = Seq((1L, ""), (2L, "   "), (3L, "\t\n")).toDF("doc_id", "text")
    val p = graft.ops.TextAnalysis.profile(df, "text").collect()
    assert(p.forall(_.getAs[Int]("n_ws_tokens") === 0))
    assert(p.forall(_.getAs[String]("lang_pred") === "unknown"))
    assert(p.forall(!_.getAs[Boolean]("quality_pass")))
  }

  test("round-2 ops degrade to empty/identity on empty inputs, never throw") {
    import graft.ops._
    val emptyDocs = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("doc_id", LongType), StructField("text", StringType))))
    assert(Dedup.dropNearDups(emptyDocs, "text", "doc_id").count() === 0)
    assert(Dedup.duplicatedSpans(emptyDocs, "text").count() === 0)
    assert(Dedup.boilerplateRatio(emptyDocs, "text", "doc_id").count() === 0)
    val emptyPairs = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("id_a", LongType), StructField("id_b", LongType))))
    assert(Dedup.connectedComponents(emptyPairs).count() === 0)
    assert(Sampling.capStrata(emptyDocs, "text", "doc_id", 10).count() === 0)
    val (tr, te) = Sampling.trainTestSplit(emptyDocs, "doc_id", 0.5)
    assert(tr.count() === 0 && te.count() === 0)
    // empty benchmark: nothing is contaminated; full corpus survives
    val toks = Seq((1L, Seq(1, 2, 3))).toDF("doc_id", "tokens")
    val emptyBench = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("tokens", ArrayType(IntegerType)))))
    assert(Decontaminate.overlapReport(toks, "tokens", "doc_id", emptyBench, "tokens").count() === 0)
    assert(Decontaminate.dropContaminated(toks, "tokens", "doc_id", emptyBench, "tokens").count() === 1)
    // IVF on empty input yields the degenerate model without throwing
    val emptyEmb = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("vec_id", LongType),
        StructField("embedding", ArrayType(FloatType)))))
    val m = Ivf.train(emptyEmb, "embedding", nlist = 4)
    assert(m.nlist >= 1)
  }

  test("quality-filter ops on degenerate inputs") {
    import graft.ops.{TextAnalysis, UnigramLM}
    // tokenless docs count toward N (their text is non-null) but never
    // appear in the output; idf = ln((2+1)/(1+1)), tf breaks the rank
    val df = Seq((1L, "beta alpha beta"), (2L, "!!! ...")).toDF("doc_id", "text")
    val tfidf = TextAnalysis.tfidfTopTerms(df, "text", "doc_id", 5).collect()
    assert(tfidf.forall(_.getLong(0) === 1L)) // doc 2 tokenless -> absent
    val idf = math.round(math.log(3.0 / 2.0) * 1e6)
    assert(tfidf.map(r => (r.getString(1), r.getLong(4), r.getInt(5))).toSeq ===
      Seq(("beta", 2 * idf, 1), ("alpha", idf, 2)))
    // an all-null / tokenless training corpus is a loud error, not a model
    val nullDocs = Seq((1L, null: String)).toDF("doc_id", "text")
    intercept[IllegalArgumentException] { UnigramLM.train(nullDocs, "text", 10) }
    // repetition profile on a single character
    val one = TextAnalysis.repetitionProfile(Seq((1L, "a")).toDF("doc_id", "text"), "text")
      .collect()(0)
    assert((1 to 11).map(one.getLong(_)) === Seq(1, 0, 0, 1, 1, 1, 0, 0, 0, 0, 0))
    assert(one.getBoolean(12) === true) // 1 clean word passes every ratio
    // balanceToMix on an empty frame: empty out, no division blowups
    val emptyDocs2 = Seq.empty[(Long, String)].toDF("doc_id", "lang")
    assert(graft.ops.Sampling.balanceToMix(emptyDocs2, "lang", "doc_id",
      Map("en" -> 1.0)).count() === 0)
  }
}

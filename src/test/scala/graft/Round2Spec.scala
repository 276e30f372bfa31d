package graft

import graft.ops._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-2 additions: additionalItems (ArrayTailRange), string-item checks,
  * float-enum EPSILON parity, uniqueItems duplicate spans, JSON `type`
  * conformance, static additionalProperties, bounded dedup aggregation,
  * guarded/candidate-driven jaccard + topK, ragged-vector null semantics. */
class Round2Spec extends SparkSpec {
  import spark.implicits._

  private def runSuite(df: org.apache.spark.sql.DataFrame, suite: ConstraintSuite) = {
    val compiled = suite.compile(df.schema).fold(
      es => fail(s"suite failed to compile: ${es.map(_.msg).mkString("; ")}"),
      identity)
    compiled.run(df)
  }

  // --- C12 completion: additionalItems (reference schema.rs:727-735) ---

  test("ArrayTailRange: elements past the positional prefix, per-element spans") {
    val df = Seq(
      ("a", Seq(999, 5, 6, 7)),   // prefix element unconstrained; tail ok
      ("b", Seq(999, 5, 60, 7)),  // tail index 2 out of range
      ("c", Seq(999)),            // no tail -> passes
      ("d", Seq.empty[Int])
    ).toDF("doc_id", "xs")
    val r = runSuite(df, ConstraintSuite("doc_id", Seq(ArrayTailRange("xs", 2, 0, 10))))
    val v = r.violations.collect().map(x =>
      (x.getAs[String]("doc_id"), x.getAs[String]("path"), x.getAs[String]("actual")))
    assert(v.toSet === Set(("b", "xs.2", "60")))
  }

  test("ArrayTailRange: selfCheck rejects non-numeric element types") {
    val schema = StructType(Seq(
      StructField("doc_id", StringType),
      StructField("xs", ArrayType(StringType))))
    val errs = ConstraintSuite("doc_id", Seq(ArrayTailRange("xs", 2, 0, 10))).compile(schema)
    assert(errs.isLeft)
    assert(errs.left.toOption.get.exists(_.isInstanceOf[SuiteError.TypeMismatch]))
  }

  test("ArrayElemRange: selfCheck rejects array<string> (compile-time, not executor crash)") {
    val schema = StructType(Seq(
      StructField("doc_id", StringType),
      StructField("xs", ArrayType(StringType))))
    val errs = ConstraintSuite("doc_id", Seq(ArrayElemRange("xs", 0, 10))).compile(schema)
    assert(errs.isLeft)
    assert(errs.left.toOption.get.exists(_.isInstanceOf[SuiteError.TypeMismatch]))
  }

  // --- string items (items.pattern / items.minLength) ---

  test("ArrayElemPattern: every element matches; per-element spans") {
    val df = Seq(
      ("a", Seq("tok_1", "tok_2")),
      ("b", Seq("tok_1", "BAD"))).toDF("doc_id", "xs")
    val r = runSuite(df, ConstraintSuite("doc_id", Seq(ArrayElemPattern("xs", "^tok_[0-9]+$"))))
    val v = r.violations.collect().map(x =>
      (x.getAs[String]("doc_id"), x.getAs[String]("path"), x.getAs[String]("actual")))
    assert(v.toSet === Set(("b", "xs.1", "BAD")))
  }

  test("ArrayElemLength: element char-length bounds") {
    val df = Seq(("a", Seq("abc", "defg")), ("b", Seq("abc", "x"))).toDF("doc_id", "xs")
    val r = runSuite(df, ConstraintSuite("doc_id", Seq(ArrayElemLength("xs", Some(2), Some(5)))))
    val v = r.violations.collect().map(x => (x.getAs[String]("doc_id"), x.getAs[String]("path")))
    assert(v.toSet === Set(("b", "xs.1")))
  }

  // --- float-enum EPSILON (reference macros.rs:189) ---

  test("EnumIn epsilon: f64::EPSILON compare for fractional enums") {
    val eps = 2.220446049250313e-16
    // 0.1+0.2 is 5.55e-17 above 0.3: exact isin would reject it, the
    // reference's abs(a-b) < f64::EPSILON accepts it (macros.rs:189)
    val df = Seq(("a", 0.3), ("b", 0.1 + 0.2), ("c", 0.4)).toDF("doc_id", "x")
    val exact = runSuite(df, ConstraintSuite("doc_id", Seq(EnumIn("x", Seq(0.3, 0.5)))))
    assert(exact.violations.select("doc_id").as[String].collect().toSet === Set("b", "c"))
    val epsed = runSuite(df, ConstraintSuite("doc_id", Seq(EnumIn("x", Seq(0.3, 0.5), epsilon = eps))))
    assert(epsed.violations.select("doc_id").as[String].collect().toSet === Set("c"))
  }

  test("EnumIn epsilon: values within epsilon pass, outside fail") {
    val eps = 1e-9
    val df = Seq(("a", 1.0), ("b", 1.0 + 1e-10), ("c", 1.1)).toDF("doc_id", "x")
    val r = runSuite(df, ConstraintSuite("doc_id", Seq(EnumIn("x", Seq(1.0), epsilon = eps))))
    assert(r.violations.select("doc_id").as[String].collect().toSet === Set("c"))
  }

  test("EnumIn epsilon: non-numeric enum values rejected at compile") {
    val schema = StructType(Seq(StructField("doc_id", StringType), StructField("x", DoubleType)))
    val errs = ConstraintSuite("doc_id", Seq(EnumIn("x", Seq("a"), epsilon = 1e-9))).compile(schema)
    assert(errs.isLeft)
  }

  // --- uniqueItems duplicate spans (reference schema.rs:744-752 NotUnique) ---

  test("ArrayUniqueItems: spans carry duplicate index and first-occurrence index") {
    val df = Seq(("a", Seq(1, 2, 1, 3, 2))).toDF("doc_id", "xs")
    val r = runSuite(df, ConstraintSuite("doc_id", Seq(ArrayUniqueItems("xs"))))
    val v = r.violations.collect().map(x =>
      (x.getAs[String]("path"), x.getAs[String]("bound"), x.getAs[String]("actual")))
    assert(v.toSet === Set(
      ("xs.2", "duplicate of xs.0", "1"),
      ("xs.4", "duplicate of xs.1", "2")))
  }

  // --- JSON `type` keyword conformance (C1, macros.rs:26-114) ---

  test("JsonTypeIs: static conformance incl. draft-07 type arrays") {
    val schema = StructType(Seq(
      StructField("doc_id", StringType),
      StructField("n", LongType),
      StructField("xs", ArrayType(IntegerType))))
    def errsOf(c: RowConstraint) = ConstraintSuite("doc_id", Seq(c)).compile(schema)
    assert(errsOf(JsonTypeIs("n", Seq("integer"))).isRight)
    assert(errsOf(JsonTypeIs("n", Seq("number"))).isRight)
    assert(errsOf(JsonTypeIs("n", Seq("string"))).isLeft)
    assert(errsOf(JsonTypeIs("n", Seq("string", "number"))).isRight) // type: ["string","number"]
    assert(errsOf(JsonTypeIs("xs", Seq("array"))).isRight)
    assert(errsOf(JsonTypeIs("xs", Seq("integer"), element = true)).isRight)
    assert(errsOf(JsonTypeIs("xs", Seq("string"), element = true)).isLeft)
    assert(errsOf(JsonTypeIs("n", Seq("bogus"))).isLeft)
  }

  test("StructKeysIn: root additionalProperties:false is a compile-time check") {
    val schema = StructType(Seq(
      StructField("doc_id", StringType),
      StructField("extra", LongType)))
    assert(ConstraintSuite("doc_id", Seq(StructKeysIn("", Seq("doc_id", "extra")))).compile(schema).isRight)
    val bad = ConstraintSuite("doc_id", Seq(StructKeysIn("", Seq("doc_id")))).compile(schema)
    assert(bad.isLeft)
    assert(bad.left.toOption.get.exists(_.msg.contains("extra")))
  }

  // --- ragged-vector null semantics (VecDot / LongArrayEqCount) ---

  test("VecDot / LongArrayEqCount: mismatched lengths yield NULL, not a truncated score") {
    val df = Seq(
      (Seq(1.0f, 2.0f), Seq(3.0f, 4.0f)),
      (Seq(1.0f, 2.0f), Seq(3.0f))).toDF("a", "b")
    val dots = df.select(graft.functions.VecFunctions.vec_dot(col("a"), col("b")).as("d"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(dots.toSeq === Seq(Some(11.0), None))
    val ldf = Seq((Seq(1L, 2L), Seq(1L, 3L)), (Seq(1L, 2L), Seq(1L))).toDF("a", "b")
    val eqs = ldf.select(graft.functions.VecFunctions.long_array_eq_count(col("a"), col("b")).as("c"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getInt(0)))
    assert(eqs.toSeq === Seq(Some(1), None))
  }

  // --- bounded dedup aggregation ---

  test("Dedup.exact: dup_ids bounded by maxDupIds even for a hot duplicate group") {
    val hot = (1L to 500L).map(i => (i, "same text")) :+ (1000L, "unique")
    val df = hot.toDF("doc_id", "text")
    val got = Dedup.exact(df, "text", "doc_id", maxDupIds = 10).collect()
    assert(got.length === 1)
    val row = got.head
    assert(row.getAs[Long]("n") === 500)
    assert(row.getAs[Long]("keep_id") === 1L)
    assert(row.getAs[Seq[Long]]("dup_ids") === (2L to 11L)) // 10 smallest dups, sorted
  }

  test("dropExactDups: min_by keep-one matches the window formulation") {
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val got = Dedup.dropExactDups(df, "text", "doc_id")
    assert(got.columns.toSeq === df.columns.toSeq) // schema preserved
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(md5(col("text"))).orderBy(col("doc_id"))
    val want = df.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select("doc_id").as[Long].collect().toSet
    assert(got.select("doc_id").as[Long].collect().toSet === want)
  }

  // --- guarded / candidate-driven quadratic stages ---

  test("ngramJaccard: oversized blocks are dropped, not joined quadratically") {
    val block = (1L to 50L).map(i => (i, "common words here", "big"))
    val small = Seq((100L, "alpha beta gamma", "sm"), (101L, "alpha beta gamma", "sm"))
    val df = (block ++ small).toDF("doc_id", "text", "src")
    val got = Dedup.ngramJaccard(df, "text", "doc_id", Seq("src"), maxBlock = 10)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got === Set((100L, 101L))) // the 50-row block never produced pairs
  }

  test("minContainment surfaces asymmetric near-dups that symmetric Jaccard drops") {
    val short = (1 to 10).map(i => s"w$i")
    val long = short ++ (11 to 100).map(i => s"w$i") // contains ALL of short
    val df = Seq((1L, long.mkString(" "), "s"), (2L, short.mkString(" "), "s"))
      .toDF("doc_id", "text", "src")
    // jaccard = 10/100 = 0.1 < 0.8 -> symmetric filter alone finds nothing
    val sym = Dedup.ngramJaccard(df, "text", "doc_id", Seq("src"), minJaccard = 0.8)
    assert(sym.count() === 0)
    // containment = 10/10 = 1.0 -> the OR filter surfaces the quotation pair
    val got = Dedup.ngramJaccard(df, "text", "doc_id", Seq("src"),
      minJaccard = 0.8, minContainment = Some(0.9)).collect()
    assert(got.length === 1 && got.head.getAs[Double]("containment") === 1.0)
  }

  test("TokenNgramHashes: windows containing NULL tokens never match real windows") {
    val rows = Seq(
      org.apache.spark.sql.Row(1L, Seq[Integer](5, null, 7)),
      org.apache.spark.sql.Row(2L, Seq[Integer](5, 0, 7)))
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("tokens", ArrayType(IntegerType, containsNull = true))))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
    val h = df.select(col("doc_id"), Decontaminate.spanHashes(col("tokens"), 3).as("hs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(h(1L).isEmpty)      // null-bearing window skipped entirely
    assert(h(2L).size === 1)   // the real (5,0,7) window hashes normally
  }

  test("ngramJaccardFor: candidate verification matches the blocked self-join") {
    val df = Seq(
      (1L, "alpha beta gamma delta", "s"),
      (2L, "alpha beta gamma delta", "s"),
      (3L, "totally different words", "s")).toDF("doc_id", "text", "src")
    val cands = Seq((1L, 2L), (1L, 3L)).toDF("id_a", "id_b")
    val got = Dedup.ngramJaccardFor(df, "text", "doc_id", cands, minJaccard = 0.8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 2L)))
  }

  test("topKForCandidates ranks only within the candidate set") {
    val df = Seq(
      (1L, Seq(1.0f, 0.0f)),
      (2L, Seq(0.9f, 0.1f)),
      (3L, Seq(0.0f, 1.0f))).toDF("vec_id", "embedding")
    val cands = Seq((1L, 2L), (1L, 3L)).toDF("id_a", "id_b")
    val got = Similarity.topKForCandidates(df, "embedding", "vec_id", cands, k = 1)
      .filter(col("id_a") === 1L).select("id_b").as[Long].collect()
    assert(got.toSeq === Seq(2L))
  }

  test("topKPerRow: oversized blocks guarded") {
    val big = (1L to 30L).map(i => (i, Seq(1.0f, 0.0f), "big"))
    val small = Seq((100L, Seq(1.0f, 0.0f), "sm"), (101L, Seq(0.9f, 0.1f), "sm"))
    val df = (big ++ small).toDF("vec_id", "embedding", "blk")
    val got = Similarity.topKPerRow(df, "embedding", "vec_id", "blk", k = 1, maxBlock = 10)
    assert(got.select("id_a").as[Long].collect().toSet === Set(100L, 101L))
  }

  // --- checkpoint resume robustness ---

  test("completedBuckets: existing-but-empty checkpoint dir resumes as empty set") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt-empty").toString
    assert(Checkpoint.completedBuckets(spark, dir, "run1") === Set.empty[Int])
  }

  // --- IVF ANN (index-backed scale path) ---

  test("Ivf: train/index/search finds planted cluster neighbors via probed lists") {
    // three well-separated 4-d clusters, 30 points each
    def cluster(base: Array[Float], from: Int): Seq[(Long, Seq[Float])] =
      (0 until 30).map(i => ((from + i).toLong,
        base.zipWithIndex.map { case (b, d) => b + 0.01f * ((i + d) % 5) }.toSeq))
    val data = cluster(Array(10f, 0f, 0f, 0f), 0) ++
      cluster(Array(0f, 10f, 0f, 0f), 100) ++
      cluster(Array(0f, 0f, 10f, 0f), 200)
    val df = data.toDF("vec_id", "embedding")
    val model = Ivf.train(df, "embedding", nlist = 3, iters = 3)
    assert(model.nlist === 3)
    val indexed = Ivf.index(df, "embedding", model).cache()
    // every cluster lands in ONE list (separation >> spread)
    val listsPerCluster = indexed
      .groupBy((col("vec_id") / 100).cast("int").as("c"))
      .agg(countDistinct("list_id").as("nl"))
      .select("nl").as[Long].collect()
    assert(listsPerCluster.forall(_ === 1L))
    // probing 1 list returns only same-cluster neighbors
    val q = Array(10.0, 0.0, 0.0, 0.0)
    val hits = Ivf.searchTopK(indexed, "embedding", "vec_id", model, q, k = 5, nprobe = 1)
      .select("vec_id").as[Long].collect()
    assert(hits.length === 5 && hits.forall(_ < 100))
  }

  test("Ivf: training is deterministic across input partitioning (fixed-point sums)") {
    val data = (0 until 200).map(i => (i.toLong, Seq.tabulate(4)(d => ((i * 31 + d * 7) % 100) / 100.0f)))
    val df = data.toDF("vec_id", "embedding")
    val m1 = Ivf.train(df.repartition(2), "embedding", nlist = 4, iters = 2)
    val m2 = Ivf.train(df.repartition(7), "embedding", nlist = 4, iters = 2)
    assert(m1.centroids.map(_.toSeq).toSeq === m2.centroids.map(_.toSeq).toSeq)
  }

  // --- PSI drift ---

  test("Drift.psi: skewed group scores high vs pooled, uniform groups stay low") {
    // a, b: uniform over bins 0-9; c: all mass on bins 0-4 — PSI is vs the
    // POOLED mix, so a/b pick up a little drift from c's contamination
    // (~0.1) while c's missing upper support blows past 1.0
    val stable = (0 until 500).map(i => ("a", (i % 100).toDouble)) ++
      (0 until 500).map(i => ("b", (i % 100).toDouble))
    val skewed = (0 until 500).map(i => ("c", (i % 50).toDouble))
    val df = (stable ++ skewed).toDF("source", "x")
    val psis = Drift.psi(df, "x", "source", 10.0).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(psis("a") < 0.3 && psis("b") < 0.3)
    assert(psis("c") > 1.0)
    val vios = DriftPSI("x", "source", 10.0, threshold = 0.5).run(df).collect()
    assert(vios.length === 1 && vios.head.getAs[String]("key") === "c")
  }

  // --- connected components + end-to-end near-dup removal ---

  test("connectedComponents: transitive closure over pair chains") {
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L), (9L, 8L)).toDF("id_a", "id_b")
    val cc = Dedup.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 6L -> 5L, 8L -> 8L, 9L -> 8L))
  }

  test("connectedComponents: converges on a longer chain within diameter iterations") {
    val chain = (1L until 8L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val cc = Dedup.connectedComponents(chain, maxIter = 10).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc.values.toSet === Set(1L))
    assert(cc.keySet === (1L to 8L).toSet)
  }

  test("dropEmbeddingNearDups: semantic clones collapse to one survivor per cluster") {
    // 3 clusters of 5 near-identical vectors + 5 scattered singletons
    def clone(base: Array[Float], id: Long, j: Int) =
      (id, base.zipWithIndex.map { case (b, d) => b + 0.001f * ((j + d) % 3) }.toSeq)
    val clusters = (0 until 3).flatMap { c =>
      val base = Array.tabulate(8)(d => if (d == c) 10f else 0f)
      (0 until 5).map(j => clone(base, c * 100L + j, j))
    }
    val singles = (0 until 5).map(i =>
      (500L + i, Array.tabulate(8)(d => ((i * 13 + d * 7) % 10 - 5).toFloat).toSeq))
    val df = (clusters ++ singles).toDF("vec_id", "embedding")
    val kept = Dedup.dropEmbeddingNearDups(df, "embedding", "vec_id",
      threshold = 0.999, bands = 8, planesPerBand = 4)
      .select("vec_id").as[Long].collect().toSet
    assert(kept.intersect(Set(0L, 100L, 200L)) === Set(0L, 100L, 200L)) // reps survive
    assert(kept.count(_ < 500L) === 3) // each cluster reduced to exactly one
    assert((500L until 505L).forall(kept.contains)) // singletons untouched
  }

  test("dropNearDups: chained near-dups collapse to ONE survivor (pairs are not groups)") {
    val base = (1 to 60).map(i => s"w$i")
    val a = base.mkString(" ")                                   // 1
    val b = (base.take(55) ++ (1 to 5).map(i => s"x$i")).mkString(" ") // ~a
    val c = (base.take(50) ++ (1 to 10).map(i => s"x$i")).mkString(" ") // ~b, farther from a
    val unrelated = (100 to 160).map(i => s"z$i").mkString(" ")
    val df = Seq((1L, a), (2L, b), (3L, c), (4L, unrelated)).toDF("doc_id", "text")
    val kept = Dedup.dropNearDups(df, "text", "doc_id", numHashes = 128, bands = 32,
      shingleK = 1, threshold = 0.7).select("doc_id").as[Long].collect().toSet
    // {1,2,3} form one chained cluster -> survivor 1; 4 untouched
    assert(kept === Set(1L, 4L))
  }

  // --- token-span dedup + benchmark decontamination ---

  test("TokenNgramHashes: one distinct hash per distinct window; short arrays empty") {
    val df = Seq(
      (1L, Seq(1, 2, 3, 4)),
      (2L, Seq(9, 1, 2, 3)), // shares window (1,2,3) with row 1
      (3L, Seq(1, 2))        // shorter than n -> no windows
    ).toDF("doc_id", "tokens")
    val h = df.select(col("doc_id"),
      Decontaminate.spanHashes(col("tokens"), 3).as("hs")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(h(1L).size === 2 && h(2L).size === 2 && h(3L).isEmpty)
    assert(h(1L).intersect(h(2L)).size === 1) // the shared (1,2,3) window
  }

  test("duplicatedTokenSpans: planted shared token span found across sequences") {
    val shared = Seq(7, 8, 9, 10, 11)
    val df = Seq(
      (1L, Seq(1, 2) ++ shared),
      (2L, shared ++ Seq(3, 4)),
      (3L, Seq(20, 21) ++ shared ++ Seq(22)),
      (4L, Seq(30, 31, 32, 33, 34, 35))).toDF("doc_id", "tokens")
    val dup = Decontaminate.duplicatedTokenSpans(df, "tokens", n = 5, minDocs = 3).collect()
    assert(dup.length === 1 && dup.head.getAs[Long]("n_docs") === 3)
  }

  test("overlapReport / dropContaminated: benchmark 13-gram leakage flagged and removed") {
    val leak = (100 to 112).toSeq // a 13-token benchmark window
    val corpus = Seq(
      (1L, (1 to 20).toSeq),
      (2L, (1 to 5) ++ leak ++ Seq(900)), // contaminated
      (3L, (50 to 80).toSeq)).toDF("doc_id", "tokens")
    val benchmark = Seq((Seq(99) ++ leak ++ Seq(113, 114))).map(Tuple1(_)).toDF("tokens")
    val rep = Decontaminate.overlapReport(corpus, "tokens", "doc_id", benchmark, "tokens")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rep === Map(2L -> 1L))
    val clean = Decontaminate.dropContaminated(corpus, "tokens", "doc_id", benchmark, "tokens")
      .select("doc_id").as[Long].collect().toSet
    assert(clean === Set(1L, 3L))
  }

  // --- deterministic sampling ---

  test("Sampling: hash-gated splits are disjoint, exhaustive, and partitioning-independent") {
    val df = (0L until 5000L).map(i => (i, s"t$i")).toDF("doc_id", "text")
    val (train, test) = Sampling.trainTestSplit(df, "doc_id", 0.2)
    val trainIds = train.select("doc_id").as[Long].collect().toSet
    val testIds = test.select("doc_id").as[Long].collect().toSet
    assert(trainIds.intersect(testIds).isEmpty)
    assert(trainIds.size + testIds.size === 5000)
    assert(math.abs(testIds.size - 1000) < 150) // binomial around 20%
    // same membership at different partitioning (sample() would differ)
    val (_, test2) = Sampling.trainTestSplit(df.repartition(13), "doc_id", 0.2)
    assert(test2.select("doc_id").as[Long].collect().toSet === testIds)
    // a kept row stays kept at a larger fraction (nested samples)
    val s10 = Sampling.deterministicSample(df, "doc_id", 0.1).select("doc_id").as[Long].collect().toSet
    val s30 = Sampling.deterministicSample(df, "doc_id", 0.3).select("doc_id").as[Long].collect().toSet
    assert(s10.subsetOf(s30))
  }

  test("Sampling: stratified fractions and approximate per-stratum caps") {
    val df = ((0L until 4000L).map(i => (i, "web")) ++ (4000L until 4500L).map(i => (i, "books")))
      .toDF("doc_id", "source")
    val strat = Sampling.stratifiedSample(df, "source", "doc_id", Map("web" -> 0.25))
    val bySrc = strat.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc("books") === 500) // default fraction 1.0 keeps everything
    assert(math.abs(bySrc("web") - 1000) < 150)
    val capped = Sampling.capStrata(df, "source", "doc_id", maxRows = 600)
    val byCap = capped.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byCap("books") === 500) // under cap: untouched
    assert(math.abs(byCap("web") - 600) < 120)
  }

  test("duplicatedSpans + boilerplateRatio: repeated passages flagged across docs") {
    val boiler = "subscribe to our newsletter today"
    val df = Seq(
      (1L, s"unique words one $boiler"),
      (2L, s"different things two $boiler"),
      (3L, s"more stuff three $boiler"),
      (4L, "completely unrelated content here now")).toDF("doc_id", "text")
    val spans = Dedup.duplicatedSpans(df, "text", spanWords = 5, minDocs = 3)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(spans.toSeq === Seq((boiler, 3L)))
    val ratios = Dedup.boilerplateRatio(df, "text", "doc_id", spanWords = 5, minDocs = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(ratios(1L) === 1L && ratios(4L) === 0L) // docs 1-3 contain the span once
  }

  test("Multimodal.sampleFrames: deterministic frame downsample") {
    // id 1 is an animated GIF in MediaGen's class layout (id % 5 == 1)
    val media = MediaGen.mediaTable(spark, 2).toDF().filter(col("doc_id") === 1L)
    val feats = Multimodal.decodeFeatures(spark, media)
    val sampled = Multimodal.sampleFrames(feats, everyN = 2).head()
    val orig = feats.head()
    assert(sampled.feature.length === (orig.feature.length + 1) / 2)
    assert(sampled.n_frames === math.max(1, (orig.n_frames + 1) / 2))
    assert(sampled.feature.toSeq === orig.feature.zipWithIndex.collect {
      case (v, i) if i % 2 == 0 => v
    }.toSeq)
  }

  test("TextAnalysis.topTerms: document frequency with deterministic ties") {
    val df = Seq(
      (1L, "alpha beta alpha"), // alpha counted once per doc (DF, not TF)
      (2L, "alpha gamma"),
      (3L, "beta delta")).toDF("doc_id", "text")
    val got = TextAnalysis.topTerms(df, "text", 3).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq === Seq(("alpha", 2L), ("beta", 2L), ("delta", 1L)))
  }

  // --- round-2 code-review regression fixes ---

  test("BoundedMinList: string ids survive buffer reuse (UTF8String copied into the buffer)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-strids").toString
    (0 until 100).map(i => (f"id-$i%03d", s"text-${i % 10}"))
      .toDF("doc_id", "text").write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir) // parquet scan -> reused row buffers
    val got = Dedup.exact(df, "text", "doc_id", maxDupIds = 3).collect()
    assert(got.length === 10)
    got.foreach { r =>
      val keep = r.getAs[String]("keep_id")
      val dups = r.getAs[scala.collection.Seq[String]]("dup_ids").toList
      // ids of group k are id-00k, id-01k, ... ascending; cap at 3
      assert(dups.length === 3 && dups === dups.sorted && !dups.contains(keep))
      assert((keep +: dups).forall(_.startsWith("id-")))
      assert((keep +: dups).distinct.size === 4) // no buffer-aliased repeats
    }
  }

  test("decimal element arrays are rejected at compile, not on executors") {
    val schema = StructType(Seq(
      StructField("doc_id", StringType),
      StructField("xs", ArrayType(DecimalType(10, 2)))))
    assert(ConstraintSuite("doc_id", Seq(ArrayElemRange("xs", 0, 10))).compile(schema).isLeft)
    assert(ConstraintSuite("doc_id", Seq(ArrayTailRange("xs", 1, 0, 10))).compile(schema).isLeft)
  }

  test("ArrayUniqueItems: null-only duplicates still produce a violation row") {
    val df = Seq(("a", Seq[Integer](null, null)), ("b", Seq[Integer](1, 2)))
      .toDF("doc_id", "xs")
    val r = runSuite(df, ConstraintSuite("doc_id", Seq(ArrayUniqueItems("xs"))))
    // report says row 'a' fails — the violations frame must agree
    val v = r.violations.collect()
    assert(v.length === 1 && v.head.getAs[String]("doc_id") === "a")
    val rep = r.report.agg(sum("fail")).collect()(0).getLong(0)
    assert(rep === 1L)
  }

  test("loader: enum+const compile to their intersection; disjoint pair rejects all") {
    val both = """{"type":"object","properties":{"n_tok":{"enum":[5, 7],"const":5}}}"""
    val df = Seq(("a", 5), ("b", 7), ("c", 9)).toDF("doc_id", "n_tok")
    val c1 = JsonSchema.parse(both, "doc_id").toOption.get.compile(df.schema).toOption.get
    assert(c1.run(df).violations.select("doc_id").as[String].collect().toSet === Set("b", "c"))
    val disjoint = """{"type":"object","properties":{"n_tok":{"enum":[5],"const":6}}}"""
    val c2 = JsonSchema.parse(disjoint, "doc_id").toOption.get.compile(df.schema).toOption.get
    assert(c2.run(df).violations.count() === 3) // Never: nothing satisfies both
  }

  test("loader: type inside tuple items / additionalItems / map properties is CHECKED") {
    val schema = StructType(Seq(
      StructField("doc_id", StringType),
      StructField("tokens", ArrayType(IntegerType)),
      StructField("props", MapType(StringType, DoubleType))))
    // positional string type vs array<int> column -> compile error
    val tup = """{"type":"object","properties":{"tokens":{"items":[{"type":"string"}]}}}"""
    assert(JsonSchema.parse(tup, "doc_id").toOption.get.compile(schema).isLeft)
    // additionalItems type mismatch -> compile error
    val ai = """{"type":"object","properties":{"tokens":{
                  "items":[{"minimum":0}],"additionalItems":{"type":"string"}}}}"""
    assert(JsonSchema.parse(ai, "doc_id").toOption.get.compile(schema).isLeft)
    // map property declaring a non-numeric value type vs map<string,double> -> error
    val mp = """{"type":"object","properties":{"props":{"properties":{"k":{"type":"string"}}}}}"""
    assert(JsonSchema.parse(mp, "doc_id").toOption.get.compile(schema).isLeft)
    // conforming declarations pass, duplicates collapse
    val ok = """{"type":"object","properties":{"tokens":{
                  "items":[{"type":"integer"},{"type":"integer"}]},
                "props":{"properties":{"k":{"type":"number"},"j":{"type":"number"}}}}}"""
    assert(JsonSchema.parse(ok, "doc_id").toOption.get.compile(schema).isRight)
  }

  test("sampling ops compose: capStrata after a split samples independently") {
    // same-gate ops would make this degenerate (train side has gate>=cut,
    // cap filters gate<cut2 -> empty); per-op hash tags keep them independent
    val df = (0L until 4000L).map(i => (i, "web")).toDF("doc_id", "source")
    val (train, _) = Sampling.trainTestSplit(df, "doc_id", 0.5)
    val n = train.count()
    val capped = Sampling.capStrata(train, "source", "doc_id", maxRows = 500)
    val kept = capped.count()
    assert(kept > 350 && kept < 650, s"expected ~500 of $n, got $kept")
  }

  test("boilerplateRatio: short/null docs keep a row with n_spans=0") {
    val df = Seq(
      (1L, "one two three four five six"),
      (2L, "tiny"),                 // fewer words than spanWords
      (3L, null: String)
    ).toDF("doc_id", "text")
    val got = Dedup.boilerplateRatio(df, "text", "doc_id", spanWords = 5, minDocs = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(3))).toMap
    assert(got.keySet === Set(1L, 2L, 3L)) // one row per input doc, always
    assert(got(2L) === ((0L, 0.0)) && got(3L) === ((0L, 0.0)))
  }

  test("connectedComponents: non-convergence is surfaced, not silent") {
    val chain = (1L until 10L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    intercept[IllegalStateException] {
      Dedup.connectedComponents(chain, maxIter = 2, failOnNonConvergence = true).collect()
    }
    // and with enough iterations the same input converges cleanly
    val cc = Dedup.connectedComponents(chain, maxIter = 20, failOnNonConvergence = true)
    assert(cc.select("component").distinct().count() === 1)
  }

  test("capStrata caps the NULL stratum too") {
    val rows = (0L until 1000L).map(i => (i, null: String)) ++
      (1000L until 1100L).map(i => (i, "books"))
    val df = rows.toDF("doc_id", "source")
    val capped = Sampling.capStrata(df, "source", "doc_id", maxRows = 100)
    val byKey = capped.groupBy("source").count().collect()
      .map(r => Option(r.getString(0)).getOrElse("<null>") -> r.getLong(1)).toMap
    assert(byKey("books") === 100) // at cap: untouched
    assert(byKey("<null>") < 200) // capped to ~100, not kept wholesale
  }

  // --- cross-batch streaming uniqueness (flatMapGroupsWithState) ---

  test("duplicateKeysStream: duplicates detected ACROSS micro-batches via custom state") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[String]
    val stream = input.toDF().withColumnRenamed("value", "doc_id")
    val q = graft.streaming.StreamValidate.duplicateKeysStream(stream, "doc_id")
      .writeStream.format("memory").queryName("dups_out").outputMode("update").start()
    try {
      input.addData("a", "b")
      q.processAllAvailable() // batch 1: all first-seen, no events
      assert(spark.sql("select * from dups_out").count() === 0)
      input.addData("a", "c", "c")
      q.processAllAvailable() // batch 2: 'a' re-appears (cross-batch), 'c' twice (in-batch)
      val out = spark.sql("select key, dup_count from dups_out").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(out === Map("a" -> 1L, "c" -> 1L))
      input.addData("a")
      q.processAllAvailable() // batch 3: 'a' again → dup_count grows
      val out3 = spark.sql("select key, dup_count from dups_out").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(out3("a") === 2L)
    } finally q.stop()
  }
}

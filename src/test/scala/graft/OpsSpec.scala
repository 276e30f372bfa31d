package graft

import graft.ops._
import org.apache.spark.sql.functions._

/** Tests for the training-pipeline operators: dedup, similarity, text
  * analysis, multimodal plumbing. */
class OpsSpec extends SparkSpec {
  import spark.implicits._

  private val docsDir = "/root/testdata/sf0.01"
  private lazy val docs = spark.read.parquet(s"$docsDir/documents.parquet").cache()
  private lazy val embs = spark.read.parquet(s"$docsDir/embeddings.parquet").cache()

  test("Dedup.exact finds planted exact duplicates and nothing else") {
    val base = Seq(
      (1L, "alpha beta gamma"), (2L, "alpha beta gamma"),
      (3L, "unique text here"), (4L, "alpha beta gamma"), (5L, "another one"))
      .toDF("doc_id", "text")
    val got = Dedup.exact(base, "text", "doc_id").collect()
    assert(got.length === 1)
    val row = got.head
    assert(row.getAs[Long]("n") === 3)
    assert(row.getAs[Long]("keep_id") === 1L)
    assert(row.getAs[Seq[Long]]("dup_ids") === Seq(2L, 4L))
  }

  test("dropExactDups keeps exactly one copy per content group (smallest id)") {
    val base = Seq(
      (1L, "alpha beta"), (2L, "alpha beta"), (3L, "unique"), (4L, "alpha beta"))
      .toDF("doc_id", "text")
    val kept = Dedup.dropExactDups(base, "text", "doc_id")
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(1L, 3L))
  }

  test("shingles: distinct word k-grams") {
    val df = Seq((1, "a b c d")).toDF("id", "t")
    val s2 = df.select(Dedup.shingles(col("t"), 2).as("s")).as[Seq[String]].head()
    assert(s2.toSet === Set("a b", "b c", "c d"))
    val s1 = df.select(Dedup.shingles(col("t"), 1).as("s")).as[Seq[String]].head()
    assert(s1.toSet === Set("a", "b", "c", "d"))
  }

  test("MinHash LSH: near-identical docs pair up; unrelated do not") {
    val words = (1 to 60).map(i => s"w$i").mkString(" ")
    val nearDup = (1 to 59).map(i => s"w$i").mkString(" ") + " different"
    val unrelated = (100 to 160).map(i => s"x$i").mkString(" ")
    val df = Seq((1L, words), (2L, nearDup), (3L, unrelated)).toDF("doc_id", "text")
    val pairs = Dedup.minhashLsh(df, "text", "doc_id", numHashes = 64, bands = 16,
      shingleK = 2, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L)))
  }

  test("SimHash: identical → distance 0; near-dup small; unrelated far") {
    val words = (1 to 60).map(i => s"w$i").mkString(" ")
    val nearDup = (1 to 58).map(i => s"w$i").mkString(" ") + " differs here"
    val unrelated = (100 to 160).map(i => s"x$i").mkString(" ")
    val df = Seq((1L, words), (2L, words), (3L, nearDup), (4L, unrelated))
      .toDF("doc_id", "text")
    val sims = df.select(col("doc_id"), Dedup.simhash(Dedup.shingles(col("text"), 2)).as("s"))
      .as[(Long, Long)].collect().toMap
    assert(sims(1L) === sims(2L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sims(1L), sims(3L)) < ham(sims(1L), sims(4L)))
    val pairs = Dedup.simhashPairs(df, "text", "doc_id", shingleK = 2, maxHamming = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("ngramJaccard: exact integer inter/union and threshold") {
    val df = Seq(
      (1L, "a b c d e", "s1"), (2L, "a b c d x", "s1"), (3L, "p q r s t", "s1"))
      .toDF("doc_id", "text", "src")
    val got = Dedup.ngramJaccard(df, "text", "doc_id", Seq("src"), shingleK = 1,
      minJaccard = 0.6).collect()
    assert(got.length === 1)
    assert(got.head.getAs[Long]("id_a") === 1L && got.head.getAs[Long]("id_b") === 2L)
    assert(got.head.getAs[Int]("inter") === 4 && got.head.getAs[Int]("uni") === 6)
  }

  test("Similarity: brute-force top-k is exact; quantizedDot is integer-stable") {
    val q = embs.filter(col("vec_id") === 0)
    val topk = Similarity.bruteForceTopK(embs.filter(col("vec_id") =!= 0), "embedding",
      "vec_id", q, "embedding", 10).collect()
    assert(topk.length === 10)
    // verify descending and matches a locally computed best
    val sims = topk.map(_.getAs[Double]("cos"))
    assert(sims.sameElements(sims.sorted.reverse))
    val dots = embs.filter(col("vec_id") =!= 0).join(broadcast(q.select(col("embedding").as("q"))))
      .select(col("vec_id"), Similarity.quantizedDot(col("embedding"), col("q")).as("d"))
      .as[(Long, Long)].collect()
    assert(dots.length === embs.count() - 1)
  }

  test("Similarity: LSH pairs ⊆ brute-force pairs at same threshold, decent recall") {
    val thr = 0.8
    // brute-force ground truth on the 500-vector sf0.001 set
    val small = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val l = small.select(col("vec_id").as("id_a"), col("embedding").as("v_a"))
    val r = small.select(col("vec_id").as("id_b"), col("embedding").as("v_b"))
    val truth = l.crossJoin(r).filter(col("id_a") < col("id_b"))
      .withColumn("cos", Similarity.cosine(col("v_a"), col("v_b")))
      .filter(col("cos") >= thr)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lsh = Similarity.cosineLshPairs(small, "embedding", "vec_id", thr,
      bands = 8, planesPerBand = 4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(lsh.subsetOf(truth), s"false positives: ${lsh.diff(truth)}")
    if (truth.nonEmpty) {
      val recall = lsh.intersect(truth).size.toDouble / truth.size
      assert(recall >= 0.5, s"recall $recall too low (truth=${truth.size}, lsh=${lsh.size})")
    }
  }

  test("TextAnalysis: token counts, quality, langid, fingerprint determinism") {
    val df = Seq(
      (1L, "The cat and the dog sat on the mat, and that was it."),
      (2L, "el la de que y en un una por con el la"),
      (3L, "x")).toDF("doc_id", "text")
    val p = TextAnalysis.profile(df, "text").collect().map(r =>
      r.getAs[Long]("doc_id") -> r).toMap
    assert(p(1L).getAs[String]("lang_pred") === "en")
    assert(p(2L).getAs[String]("lang_pred") === "es")
    assert(p(3L).getAs[String]("lang_pred") === "unknown")
    assert(p(1L).getAs[Boolean]("quality_pass"))
    assert(!p(3L).getAs[Boolean]("quality_pass"))
    assert(p(1L).getAs[Int]("n_ws_tokens") === 13)
    // fingerprint ignores case + whitespace reflow
    val fp = Seq((1L, "Hello  World"), (2L, "hello world"), (3L, "other"))
      .toDF("id", "t").select(TextAnalysis.fingerprint(col("t")).as("f"))
      .as[String].collect()
    assert(fp(0) === fp(1))
    assert(fp(0) !== fp(2))
  }

  test("TextAnalysis: profile runs over real documents without shuffles") {
    val prof = TextAnalysis.profile(docs, "text")
    assert(prof.count() === docs.count())
    val plan = prof.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), "profile must be a narrow projection")
  }

  test("Multimodal: binary plumbing — real decode, batch shape, meta profile") {
    val bin = Multimodal.asBinaryTable(docs, "doc_id", "text")
    assert(bin.schema("payload").dataType.typeName === "binary")
    val prof = Multimodal.metaProfile(bin).collect()
    assert(prof.length === 1 && prof.head.getAs[Long]("n") === docs.count())
    // real image payloads -> real decoded features (one row per valid image)
    val media = MediaGen.mediaTable(spark, 50).toDF()
    val feats = Multimodal.decodeFeatures(spark, media)
    assert(feats.count() === 40) // 10 of 50 are planted-corrupt (id % 5 == 4)
    val one = feats.head()
    assert(one.feature.length === 8)
    val resized = Multimodal.resizeFeatures(feats, 4)
    assert(resized.head().feature.length === 4)
  }

  test("Streaming: row-local validation + windowed counts on a rate-less batch-as-stream") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("doc_id", StringType), StructField("n_tok", IntegerType),
      StructField("ts", TimestampType)))
    val dir = java.nio.file.Files.createTempDirectory("graft-stream").toString
    Seq(("doc-1", 5, java.sql.Timestamp.valueOf("2024-01-01 00:00:00")),
      ("doc-2", -3, java.sql.Timestamp.valueOf("2024-01-01 00:01:00")))
      .toDF("doc_id", "n_tok", "ts").write.parquet(s"$dir/in")
    val suite = ConstraintSuite("doc_id", Seq(Range("n_tok", 1, 100)))
      .compile(schema).toOption.get
    val stream = spark.readStream.schema(schema).parquet(s"$dir/in")
    val q = graft.streaming.StreamValidate.violationsStream(suite, stream)
      .writeStream.format("memory").queryName("vio_out").outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val out = spark.sql("select * from vio_out").collect()
    assert(out.length === 1 && out.head.getAs[String]("doc_id") === "doc-2")
  }
}

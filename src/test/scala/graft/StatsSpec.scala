package graft

import org.apache.spark.sql.functions._

/** Tests for sketch stats, TableIO, SMJ referential path, and the windowed
  * streaming monitor. */
class StatsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val corpus = DataGen.sequences(spark, 5000, maxLen = 16).cache()

  test("numericProfile: per-source sketch profile") {
    val p = Stats.numericProfile(corpus, "n_tok", "source").collect()
    assert(p.length === DataGen.SOURCES.size + 1) // + scraped-mystery
    val web = p.find(_.getString(0) == "web").get
    assert(web.getAs[Long]("n") > 0 && web.getAs[Seq[Double]]("quantiles").length === 5)
  }

  test("countMinSketch: one binary sketch per group") {
    val cms = Stats.countMinSketch(corpus, "n_tok", "source").collect()
    assert(cms.forall(_.getAs[Array[Byte]]("cms").nonEmpty))
  }

  test("sampledTokenHistogram: deterministic sample, plausible counts") {
    val h1 = Stats.sampledTokenHistogram(corpus, "tokens", "doc_id", 0.2)
    val h2 = Stats.sampledTokenHistogram(corpus, "tokens", "doc_id", 0.2)
    assert(h1.collect().map(_.toString).sorted.sameElements(h2.collect().map(_.toString).sorted))
    // BOS token dominates (one per non-defect sequence)
    val top = h1.orderBy(desc("n")).limit(1).select("token").as[Int].head()
    assert(top === DataGen.BOS)
  }

  test("topKWorstBuckets: ordered, bounded") {
    val compiled = DataGen.standardSuite(spark, 16).compile(Seq_.schema).toOption.get
    val rep = compiled.bucketReport(compiled.annotate(corpus))
    val top = Stats.topKWorstBuckets(rep, 5).collect()
    assert(top.length === 5)
    val fails = top.map(_.getAs[Long]("fail"))
    assert(fails.sameElements(fails.sorted.reverse))
  }

  test("TableIO: bucketed write + read round-trip; format is a config swap") {
    val dir = java.nio.file.Files.createTempDirectory("graft-tio").toString
    val compiled = DataGen.standardSuite(spark, 16).compile(Seq_.schema).toOption.get
    val ann = compiled.annotate(corpus).select(col("doc_id"), col(compiled.BUCKET).as("bucket"))
    TableIO.default.writeBucketed(ann, s"$dir/t", "bucket")
    val back = TableIO.default.read(spark, s"$dir/t")
    assert(back.count() === corpus.count())
    // partition pruning on the bucket column reaches the scan
    val plan = back.filter(col("bucket") === 3).queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(bucket"), plan.take(1500))
  }

  test("RefIntegrity without broadcast falls back to a shuffle join (AQE may re-plan)") {
    val dim = DataGen.sourcesDim(spark)
    val plan = RefIntegrity("source", dim, "source", broadcastDim = false)
      .run(corpus).queryExecution.executedPlan.toString
    // without the hint the physical join is planner's choice; assert it's an
    // anti-join either way and the violations are identical to broadcast mode
    assert(plan.contains("LeftAnti"), plan.take(1500))
    val a = RefIntegrity("source", dim, "source", broadcastDim = false).run(corpus)
      .select("key").as[String].collect().toSet
    val b = RefIntegrity("source", dim, "source", broadcastDim = true).run(corpus)
      .select("key").as[String].collect().toSet
    assert(a === b)
  }

  test("windowedViolationCounts: streaming monitor emits per-window counts") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("doc_id", StringType), StructField("n_tok", IntegerType),
      StructField("ts", TimestampType)))
    val dir = java.nio.file.Files.createTempDirectory("graft-stream3").toString
    Seq(
      ("d1", -1, java.sql.Timestamp.valueOf("2024-01-01 00:00:30")),
      ("d2", 5, java.sql.Timestamp.valueOf("2024-01-01 00:01:00")),
      ("d3", -2, java.sql.Timestamp.valueOf("2024-01-01 00:07:00")))
      .toDF("doc_id", "n_tok", "ts").write.parquet(s"$dir/in")
    val suite = ConstraintSuite("doc_id", Seq(Range("n_tok", 1, 100)))
      .compile(schema).toOption.get
    val stream = spark.readStream.schema(schema).parquet(s"$dir/in")
    val q = graft.streaming.StreamValidate
      .windowedViolationCounts(suite, stream, "ts", "5 minutes", "10 minutes")
      .writeStream.format("memory").queryName("wvc").outputMode("update").start()
    q.processAllAvailable(); q.stop()
    val rows = spark.sql("select * from wvc").collect()
    assert(rows.map(_.getAs[Long]("violations")).sum === 2)
  }

  test("correlationStats: exact sums, reproducible pearson_fp, null edges") {
    // y = 2x (perfect), z = -x (perfect negative), w constant (zero var)
    val df = Seq((1.0, 2.0, -1.0, 5.0), (2.0, 4.0, -2.0, 5.0),
      (3.0, 6.0, -3.0, 5.0)).toDF("x", "y", "z", "w")
    val rows = Stats.correlationStats(df, Seq("x", "y", "z", "w")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val xy = rows(("x", "y"))
    assert(xy.getLong(2) == 3)
    assert(xy.getDecimal(3).longValueExact == 600) // Σx cents
    assert(xy.getDecimal(7).longValueExact == 280000) // Σxy = 100*200+...
    assert(xy.getLong(8) == 1000000L) // pearson exactly +1
    assert(rows(("x", "z")).getLong(8) == -1000000L)
    assert(rows(("x", "w")).isNullAt(8)) // zero-variance guard -> null
    // pairwise deletion: the null-y row drops from (x,y) but not (x,z)
    val dfn = Seq((Option(1.0), Option(2.0), Option(10.0)),
      (Option(2.0), Option.empty[Double], Option(20.0)),
      (Option(3.0), Option(6.0), Option(30.0))).toDF("x", "y", "z")
    val rn = Stats.correlationStats(dfn, Seq("x", "y", "z")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(rn(("x", "y")).getLong(2) == 2 && rn(("x", "z")).getLong(2) == 3)
    assert(rn(("x", "y")).getDecimal(3).longValueExact == 400) // row 2's x excluded
    intercept[IllegalArgumentException](Stats.correlationStats(df, Seq("x")))
    intercept[IllegalArgumentException](Stats.correlationStats(df, Seq("x", "x")))
    intercept[IllegalArgumentException](
      Stats.correlationStats(df.withColumn("s", lit("a")), Seq("x", "s")))
  }
}

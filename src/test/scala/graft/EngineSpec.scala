package graft

import org.apache.spark.sql.functions._

/** End-to-end engine tests over the deterministic synthetic corpus
  * (SURVEY.md §5.2 #5-#7, #9-#10). */
class EngineSpec extends SparkSpec {
  import spark.implicits._

  private val N = 20000L
  private lazy val corpus = DataGen.sequences(spark, N, maxLen = 32).cache()
  private lazy val suite = DataGen.standardSuite(spark, maxLen = 32)
  private lazy val compiled = suite.compile(Seq_.schema).fold(
    es => fail(es.map(_.msg).mkString("; ")), identity)
  private lazy val result = compiled.run(corpus, persistAnnotated = true)

  test("flagship run: planted defects of every class are detected") {
    val byCheck = result.violations.groupBy("constraint_id").count()
      .as[(String, Long)].collect().toMap
    // range defects: ids ≡ 0 (mod 101) → n_tok=0; (mod 103) → 9000
    val expectRange = (0L until N).count(i => i % 101 == 0 || (i % 103 == 0 && i % 101 != 0))
    assert(byCheck("range(n_tok)") === expectRange)
    // null doc_id: mod 127
    assert(byCheck("nonnull(doc_id)") === (0L until N).count(_ % 127 == 0))
    // malformed doc_id: mod 131, not already null
    assert(byCheck("regex(doc_id)") === (0L until N).count(i => i % 131 == 0 && i % 127 != 0))
    // every class fires at least once
    assert(byCheck.keySet.exists(_.startsWith("lengthConsistent")))
    assert(byCheck.keySet.exists(_.startsWith("elemRange")))
    assert(byCheck.keySet.exists(_.startsWith("contains")))
    assert(byCheck.keySet.exists(_.startsWith("unique")))
    assert(byCheck.keySet.exists(_.startsWith("ref")))
    assert(byCheck.keySet.exists(_.startsWith("drift")))
  }

  test("per-bucket invariant: pass + fail == rows, summed == N") {
    val rep = result.report
    assert(rep.filter(col("pass") + col("fail") =!= col("rows")).count() === 0)
    val tot = rep.agg(sum("rows")).as[Long].head()
    assert(tot === N)
  }

  test("uniqueness: planted duplicates found across partitions") {
    val dups = result.violations.filter(col("constraint_id") === "unique(doc_id)")
      .select("doc_id").as[String].collect().toSet
    // ids ≡ 0 (mod 997), id>0 reuse doc_id of id-1; both ids must not be
    // null/malformed for the duplicate pair to exist under the same doc_id
    val expected = (1L until N).filter(_ % 997 == 0)
      .filter(i => i % 127 != 0 && i % 131 != 0 && (i - 1) % 127 != 0 && (i - 1) % 131 != 0)
      .map(i => f"doc-${i - 1}%012d").toSet
    assert(dups === expected)
  }

  test("referential: orphan source detected, dimension broadcast") {
    val refV = result.violations.filter(col("constraint_id").startsWith("ref("))
    assert(refV.select("doc_id").as[String].collect().toSet === Set("scraped-mystery"))
    // plan must contain a broadcast join, not a shuffle join
    val aggVio = compiled.aggViolations(corpus).get
    val plan = aggVio.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"expected broadcast join in:\n$plan")
  }

  test("drift: the shifted source (forums) flags, others do not") {
    val drifted = result.violations.filter(col("constraint_id").startsWith("drift("))
      .select("doc_id").as[String].collect().toSet
    assert(drifted === Set("forums"))
  }

  test("reproducibility: identical violations + report at parallelism 2 vs 8 (N vs 4N proxy)") {
    val c2 = DataGen.sequences(spark, 5000, maxLen = 32, parts = 2)
    val c8 = DataGen.sequences(spark, 5000, maxLen = 32, parts = 8)
    val r2 = compiled.run(c2)
    val r8 = compiled.run(c8)
    val v2 = r2.violations.collect().map(_.toString).sorted
    val v8 = r8.violations.collect().map(_.toString).sorted
    assert(v2.sameElements(v8))
    val rep2 = r2.report.collect().map(_.toString).sorted
    val rep8 = r8.report.collect().map(_.toString).sorted
    assert(rep2.sameElements(rep8))
  }

  test("resume: completed buckets are pruned; resumed + completed == full (SURVEY.md §5.2 #7)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    val runId = "run-1"
    val small = DataGen.sequences(spark, 3000, maxLen = 32)
    val r = compiled.run(small)
    // simulate: first half of buckets completed before a crash
    val firstHalf = r.report.filter(col("bucket_id") < compiled.nBuckets / 2)
    Checkpoint.write(firstHalf, dir, runId)
    val done = Checkpoint.completedBuckets(spark, dir, runId)
    assert(done.nonEmpty && done.forall(_ < compiled.nBuckets / 2))
    val remaining = Checkpoint.resumeFilter(small, compiled, done)
    val rResume = compiled.run(remaining)
    // resumed report covers exactly the complement
    val resumedBuckets = rResume.report.select("bucket_id").as[Int].collect().toSet
    assert(resumedBuckets.intersect(done).isEmpty)
    // union of completed + resumed row counts == full
    val fullRows = r.report.agg(sum("rows")).as[Long].head()
    val doneRows = firstHalf.agg(sum("rows")).as[Long].head()
    val resumedRows = rResume.report.agg(sum("rows")).as[Long].head()
    assert(doneRows + resumedRows === fullRows)
  }

  test("per-row token-array equality invariant vs source (north rule)") {
    // round-trip: ingest → annotate → project original columns must be
    // bit-identical to the source, token arrays included (multiset compare —
    // doc_id is NOT a safe join key: duplicates are planted defects)
    val roundTrip = compiled.annotate(corpus).select(corpus.columns.toSeq.map(col): _*)
    assert(roundTrip.exceptAll(corpus).count() === 0)
    assert(corpus.exceptAll(roundTrip).count() === 0)
  }

  test("single-pass plan: row-local checks produce no shuffle before the bucket agg") {
    val ann = compiled.annotate(corpus)
    val plan = ann.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"row-local projection must be narrow:\n$plan")
    // the report is exactly one aggregation exchange over the projection
    val rep = compiled.bucketReport(ann)
    val repPlan = rep.queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(repPlan).size <= 1, s"report should shuffle once:\n$repPlan")
  }

  test("datagen determinism: same seed-free generator, same content at any partitioning") {
    val a = DataGen.sequences(spark, 2000, maxLen = 16, parts = 3).collect().map(_.toString).sorted
    val b = DataGen.sequences(spark, 2000, maxLen = 16, parts = 7).collect().map(_.toString).sorted
    assert(a.sameElements(b))
  }

  test("split: clean side keeps the original schema; counts agree with the report") {
    val (clean, quarantined) = compiled.split(corpus)
    assert(clean.columns.toSeq == corpus.columns.toSeq) // original schema, no flags
    assert(quarantined.columns.toSeq == corpus.columns.toSeq :+ "violations")
    val nClean = clean.count()
    val nQuar = quarantined.count()
    assert(nClean + nQuar == N)
    // split and report derive from the same row-local flags — exact agreement
    val rep = result.report.agg(sum("pass"), sum("fail")).head()
    assert(rep.getLong(0) == nClean && rep.getLong(1) == nQuar)
    // every quarantined row carries at least one entry; entry total equals
    // the row-local violation frame's row count (same accumulate-all rules)
    val entries = quarantined.agg(
      min(size(col("violations"))), sum(size(col("violations")))).head()
    assert(entries.getInt(0) >= 1)
    val rowLocal = result.violations
      .filter(!col("constraint_id").startsWith("unique(") &&
        !col("constraint_id").startsWith("ref(") &&
        !col("constraint_id").startsWith("drift("))
      .count()
    assert(entries.getLong(1) == rowLocal)
  }
}

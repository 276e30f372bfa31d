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

  test("whole-stage codegen covers the scalar-check validation projection") {
    // Scalar-only suites stay fully inside codegen. Array checks use custom
    // CodegenFallback expressions (tight per-row JVM loops) which exclude
    // their Project from WholeStageCodegen — a deliberate trade: per-row
    // interpretation overhead instead of per-ELEMENT lambda interpretation.
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
}

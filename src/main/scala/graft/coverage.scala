package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.AttributeReference
import org.apache.spark.sql.types.StructType

/** Suite COVERAGE audit: which input columns does a validation suite
  * actually check, and which does it silently ignore? The reference has no
  * analog (a serde-walk validates exactly the fields its schema mentions and
  * cannot see the ones it doesn't); at 10^12 rows an unvalidated column is
  * an unbounded liability, so the audit is a first-class report.
  *
  * Column attribution is derived from the CONSTRAINT EXPRESSIONS themselves,
  * not from naming conventions: each row check is analyzed as a projection
  * of its `pred`/`vios` over an EMPTY frame of the input schema, and each
  * agg check's `run` is planned against the same empty frame — in both
  * cases every input attribute the ANALYZED plan references counts
  * (attribute identity by exprId, so a dimension table's columns in a
  * referential join are never mis-attributed to the input). Purely
  * driver-side — no data is read.
  */
object Coverage {

  /** One input column's coverage: the ids of every check that reads it.
    * `checkIds` empty ⇔ the suite never looks at the column. */
  final case class ColumnCoverage(column: String, checkIds: Seq[String]) {
    def covered: Boolean = checkIds.nonEmpty
  }

  /** Per-column coverage of `compiled` over `schema`, one entry per
    * TOP-LEVEL input column in schema order. The suite's `keyCol` is
    * attributed like any other reference (bucketing reads it, but only a
    * real check — NonNull, Unique, ... — marks it covered). */
  def audit(spark: SparkSession, compiled: CompiledSuite,
      schema: StructType): Seq[ColumnCoverage] = {
    val empty = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
    val inputIds: Map[Long, String] =
      empty.queryExecution.analyzed.output.map(a => a.exprId.id -> a.name).toMap
    // attribute by exprId over the ANALYZED plan; leaf nodes are excluded
    // (a relation leaf lists its whole output as "expressions" — presence
    // in the scan is not use)
    def usedIn(df: DataFrame): Set[String] =
      df.queryExecution.analyzed.collect { case node if node.children.nonEmpty =>
        node.expressions.flatMap(_.collect {
          case ar: AttributeReference if inputIds.contains(ar.exprId.id) =>
            inputIds(ar.exprId.id)
        })
      }.flatten.toSet
    val all: Seq[(String, Set[String])] =
      compiled.rowChecks.map(c => c.id -> usedIn(empty.select(c.pred, c.vios))) ++
        compiled.aggChecks.map(c => c.id -> usedIn(c.run(empty)))
    schema.fieldNames.toSeq.map { f =>
      ColumnCoverage(f, all.collect { case (id, refs) if refs(f) => id }.sorted)
    }
  }

  /** The columns `audit` found no check for — the report's headline. */
  def uncovered(spark: SparkSession, compiled: CompiledSuite,
      schema: StructType): Seq[String] =
    audit(spark, compiled, schema).filterNot(_.covered).map(_.column)

  /** DataFrame form for sinks/joins: (column, n_checks, check_ids). */
  def auditDf(spark: SparkSession, compiled: CompiledSuite,
      schema: StructType): DataFrame = {
    import spark.implicits._
    audit(spark, compiled, schema)
      .map(c => (c.column, c.checkIds.length.toLong, c.checkIds))
      .toDF("column", "n_checks", "check_ids")
  }
}

package graft

import org.apache.spark.sql.types._

/** Core data model for the constraint-validation engine.
  *
  * Input shape is fixed by the north rule's `input_hint`: a table of
  * pre-tokenized training sequences. Violation rows reproduce the
  * reference's span-annotated error contract — (meta, span, value) from
  * `/root/reference/verify/src/impls/schemars/errors.rs:11-21` maps to
  * (constraint_id, path, bound/actual); the dotted path format follows
  * `Keys::dotted` (`/root/reference/verify/src/span.rs:101-103`).
  */
final case class Seq_(doc_id: String, tokens: Array[Int], n_tok: Int, source: String)

object Seq_ {
  val schema: StructType = StructType(Seq(
    StructField("doc_id", StringType),
    StructField("tokens", ArrayType(IntegerType, containsNull = false)),
    StructField("n_tok", IntegerType),
    StructField("source", StringType)))
}

/** One constraint failure. `path` is the dotted location (`tokens.17` for
  * element 17), empty string for row-level/root violations — matching the
  * reference's empty root span (`verify/examples/schemars_json.rs:72-75`).
  * Errors accumulate: a row violating k constraints yields k rows
  * (reference `Errors::add_assign`, errors.rs:411-415).
  */
final case class Violation(
    constraint_id: String,
    path: String,
    bound: String,
    actual: String,
    doc_id: String,
    bucket_id: Int)

/** Per-bucket pass/fail lineage row. Buckets are a FIXED hash partitioning
  * (`pmod(xxhash64(key), nBuckets)`) so reports are identical across
  * cluster sizes / parallelism levels — `spark_partition_id()` would not be
  * (SURVEY.md §7.4).
  */
final case class BucketReport(
    run_id: String,
    bucket_id: Int,
    rows: Long,
    pass: Long,
    fail: Long,
    fail_by_check: Map[String, Long],
    completed_at: java.sql.Timestamp)

/** Errors raised by the suite's compile-time self-check — the analog of the
  * reference's schema self-validation (`RootSchema::verify`,
  * verify/src/impls/schemars/verify.rs:9-171; error kinds errors.rs:169-181).
  */
sealed trait SuiteError { def msg: String }
object SuiteError {
  final case class UnknownColumn(col: String, ctx: String) extends SuiteError {
    def msg = s"unknown column '$col' in $ctx"
  }
  final case class TypeMismatch(col: String, expected: String, got: DataType, ctx: String) extends SuiteError {
    def msg = s"column '$col' in $ctx: expected $expected, got ${got.simpleString}"
  }
  final case class InvalidPattern(pattern: String, err: String) extends SuiteError {
    def msg = s"invalid regex '$pattern': $err"
  }
  final case class InvalidBounds(ctx: String, lo: Double, hi: Double) extends SuiteError {
    def msg = s"inverted bounds in $ctx: min=$lo > max=$hi"
  }
  final case class EmptyEnum(ctx: String) extends SuiteError {
    def msg = s"empty enum value set in $ctx"
  }
  final case class MissingDefinition(name: String) extends SuiteError {
    def msg = s"reference to missing named constraint '$name'"
  }
  final case class Unsupported(ctx: String, why: String) extends SuiteError {
    def msg = s"unsupported in $ctx: $why"
  }
}

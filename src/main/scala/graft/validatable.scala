package graft

import org.apache.spark.sql.{Dataset, Encoder}

/** Typed-API boundary — the analog of the reference's `#[derive(Verify)]`
  * (`verify-macros/src/lib.rs:352-389`), where `verify()` derives the schema
  * from the TYPE at call time: here the suite compiles against the
  * `Encoder[T]` schema, so column references and types are checked against
  * the case class before any data is touched.
  */
object Validatable {

  /** Compile a suite against T's encoder schema (derive-analog). */
  def compile[T: Encoder](suite: ConstraintSuite): Either[List[SuiteError], CompiledSuite] =
    suite.compile(implicitly[Encoder[T]].schema)

  /** One-call typed validation: `Validatable.verify(ds, suite)`. */
  def verify[T: Encoder](ds: Dataset[T], suite: ConstraintSuite,
      persistAnnotated: Boolean = false): Either[List[SuiteError], ValidationResult] =
    compile[T](suite).map(_.run(ds.toDF(), persistAnnotated = persistAnnotated))

  /** Syntax: `import Validatable.syntax._; ds.verify(suite)`. */
  object syntax {
    implicit final class VerifyOps[T](private val ds: Dataset[T]) extends AnyVal {
      def verify(suite: ConstraintSuite)(implicit enc: Encoder[T])
          : Either[List[SuiteError], ValidationResult] =
        Validatable.verify(ds, suite)
    }
  }
}

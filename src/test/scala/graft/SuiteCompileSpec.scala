package graft

import org.apache.spark.sql.types._

/** Suite self-check tests (SURVEY.md §5.2 #3): invalid suites are rejected at
  * compile time, before any data is touched — ports the reference's schema
  * self-validation cases (`verify/tests/schemars.rs:108-141`): invalid regex
  * (InvalidPattern), missing definition (MissingDefinition), plus the
  * engine-side additions (unknown column, inverted bounds). */
class SuiteCompileSpec extends SparkSpec {
  import spark.implicits._

  private lazy val schema = Seq(("a", 1, Seq(1))).toDF("doc_id", "x", "arr").schema

  private def errsOf(s: ConstraintSuite): List[SuiteError] =
    s.compile(schema).left.toOption.getOrElse(Nil).toList

  test("invalid regex rejected (InvalidPattern, errors.rs:169-181)") {
    val es = errsOf(ConstraintSuite("doc_id", Seq(Regex("doc_id", "[[[["))))
    assert(es.exists(_.isInstanceOf[SuiteError.InvalidPattern]))
  }

  test("missing named constraint rejected (MissingDefinition)") {
    val es = errsOf(ConstraintSuite("doc_id", Seq(NamedRef("nope"))))
    assert(es.exists { case SuiteError.MissingDefinition("nope") => true; case _ => false })
  }

  test("unknown column rejected") {
    val es = errsOf(ConstraintSuite("doc_id", Seq(Range("missing_col", 0, 1))))
    assert(es.exists { case SuiteError.UnknownColumn("missing_col", _) => true; case _ => false })
  }

  test("inverted bounds rejected") {
    val es = errsOf(ConstraintSuite("doc_id", Seq(Range("x", 10, 1))))
    assert(es.exists(_.isInstanceOf[SuiteError.InvalidBounds]))
  }

  test("type mismatch rejected (array check on scalar)") {
    val es = errsOf(ConstraintSuite("doc_id", Seq(ArrayElemRange("x", 0, 1))))
    assert(es.exists(_.isInstanceOf[SuiteError.TypeMismatch]))
  }

  test("errors accumulate: all problems reported at once") {
    val es = errsOf(ConstraintSuite("doc_id", Seq(
      Regex("doc_id", "[[[["), Range("x", 10, 1), NonNull("ghost"))))
    assert(es.size === 3)
  }

  test("multipleOf 0 rejected (reference silently skips; we fail fast)") {
    val es = errsOf(ConstraintSuite("doc_id", Seq(MultipleOf("x", 0.0))))
    assert(es.exists(_.isInstanceOf[SuiteError.Unsupported]))
  }

  test("valid suite compiles") {
    assert(ConstraintSuite("doc_id", Seq(
      Range("x", 0, 10), ArrayElemRange("arr", 0, 100), Regex("doc_id", "^a"))).compile(schema).isRight)
  }
}

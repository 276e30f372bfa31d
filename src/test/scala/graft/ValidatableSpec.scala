package graft

import org.apache.spark.sql.functions._

case class TypedSeq(doc_id: String, tokens: Seq[Int], n_tok: Int, source: String)

/** Typed Dataset API — derive-analog tests (`#[derive(Verify)]`). */
class ValidatableSpec extends SparkSpec {
  import spark.implicits._
  import Validatable.syntax._

  private val suite = ConstraintSuite("doc_id", Seq(
    NonNull("doc_id"), Range("n_tok", 1, 100), LengthConsistent("tokens", "n_tok")))

  test("ds.verify(suite): schema derived from the case class encoder") {
    val ds = Seq(
      TypedSeq("a", Seq(1, 2), 2, "web"),
      TypedSeq("b", Seq(1), 5, "web")).toDS()
    val r = ds.verify(suite).fold(es => fail(es.map(_.msg).mkString(";")), identity)
    assert(r.violations.select("doc_id").as[String].collect().toSet === Set("b"))
  }

  test("type errors caught at the encoder schema, pre-data (derive-analog self-check)") {
    val bad = ConstraintSuite("doc_id", Seq(Range("source", 0, 1))) // string col, numeric check
    val es = Validatable.compile[TypedSeq](bad).left.toOption.get
    assert(es.exists(_.isInstanceOf[SuiteError.TypeMismatch]))
  }
}

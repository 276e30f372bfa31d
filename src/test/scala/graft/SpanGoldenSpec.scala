package graft

import org.apache.spark.sql.functions._

/** Span-semantics golden test (SURVEY.md §5.2 #2): ports the reference's
  * executable example `/root/reference/verify/examples/schemars_json.rs:50-75`
  * — the value `{ some_str: …, some_inner: { inner_value, inner_values },
  * unexpected_property }` with expected violation spans
  * `some_inner.inner_value`, `some_inner.inner_values.1`,
  * `unexpected_property`, and the missing-required error.
  *
  * Mapping note: the reference validates one anonymous root object, so its
  * missing-required span is the EMPTY root path; our rows are the root
  * object and columns its properties, so the engine reports the richer
  * `some_int` path for the same error. Dotted nesting and array-index
  * segments match `Keys::dotted` (span.rs:101-103) exactly.
  */
case class GoldenInner(inner_value: Double, inner_values: Seq[String])
case class GoldenDoc(doc_id: String, some_str: String, some_int: Option[Int],
    some_inner: GoldenInner, props: Map[String, Int])

class SpanGoldenSpec extends SparkSpec {
  import spark.implicits._

  test("golden: the four reference violation spans") {
    val df = Seq(
      GoldenDoc("row1", "not empty", None,
        GoldenInner(7.0, Seq("value", "2")),
        Map("unexpected_property" -> 2))).toDF()

    val suite = ConstraintSuite("doc_id", Seq(
      // enum violation at some_inner.inner_value (reference: enum [1,"value"])
      EnumIn("some_inner.inner_value", Seq(1.0)),
      // per-item type/enum violation at some_inner.inner_values.1
      ArrayElemIn("some_inner.inner_values", Seq("value")),
      // additionalProperties: false ⇒ UnknownProperty at unexpected_property
      MapKeysIn("props", Seq("expected_key")),
      // required some_int missing (reference span: empty root)
      NonNull("some_int")))

    val compiled = suite.compile(df.schema).fold(es => fail(es.map(_.msg).mkString("; ")), identity)
    val paths = compiled.run(df).violations.select("path").as[String].collect().toSet
    assert(paths === Set(
      "some_inner.inner_value",
      "some_inner.inner_values.1",
      "props.unexpected_property",
      "some_int"))
  }
}

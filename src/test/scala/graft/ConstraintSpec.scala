package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Per-leaf constraint unit tests (SURVEY.md §5.2 #1): each check gets known
  * good/bad rows; assert exact violation tuples (constraint_id, path, bound,
  * actual) — reproducing the reference error cases named in the mapping. */
class ConstraintSpec extends SparkSpec {
  import spark.implicits._

  private def runSuite(df: org.apache.spark.sql.DataFrame, suite: ConstraintSuite) = {
    val compiled = suite.compile(df.schema).fold(
      es => fail(s"suite failed to compile: ${es.map(_.msg).mkString("; ")}"),
      identity)
    compiled.run(df)
  }

  private def vioTuples(r: ValidationResult): Set[(String, String, String, String)] =
    r.violations.select("constraint_id", "path", "bound", "actual", "doc_id")
      .collect().map(x => (x.getString(0), x.getString(1), x.getString(4), x.getString(3))).toSet

  test("Range: LessThanExpected / MoreThanExpected analogs (macros.rs:261-315)") {
    val df = Seq(("a", 5), ("b", 0), ("c", 100)).toDF("doc_id", "n_tok")
    val r = runSuite(df, ConstraintSuite("doc_id", Seq(Range("n_tok", 1, 50))))
    val v = r.violations.collect().map(x => (x.getAs[String]("doc_id"), x.getAs[String]("actual"))).toSet
    assert(v === Set(("b", "0"), ("c", "100")))
    assert(r.violations.select("path").distinct().as[String].collect().toSet === Set("n_tok"))
  }

  test("Range: exclusive bounds") {
    val df = Seq(("a", 1.0), ("b", 0.0), ("c", 10.0)).toDF("doc_id", "x")
    val r = runSuite(df, ConstraintSuite("doc_id",
      Seq(Range("x", 0, 10, exclusiveMin = true, exclusiveMax = true))))
    assert(r.violations.select("doc_id").as[String].collect().toSet === Set("b", "c"))
  }

  test("Range: null value passes (presence is NonNull's job)") {
    val df = Seq(("a", Some(5)), ("b", None)).toDF("doc_id", "x")
    val r = runSuite(df, ConstraintSuite("doc_id", Seq(Range("x", 1, 50))))
    assert(r.violations.count() === 0)
  }

  test("NonNull: RequiredProperty analog (errors.rs)") {
    val df = Seq(("a", Some("x")), ("b", None)).toDF("doc_id", "s")
    val r = runSuite(df, ConstraintSuite("doc_id", Seq(NonNull("s"))))
    val v = r.violations.collect()
    assert(v.length === 1 && v(0).getAs[String]("doc_id") === "b"
      && v(0).getAs[String]("actual") === "<null>")
  }

  test("MultipleOf: f64 modulo (macros.rs:250-259)") {
    val df = Seq(("a", 9), ("b", 10)).toDF("doc_id", "x")
    val r = runSuite(df, ConstraintSuite("doc_id", Seq(MultipleOf("x", 3.0))))
    assert(r.violations.select("doc_id").as[String].collect().toSet === Set("b"))
  }

  test("Regex: NoPatternMatch analog; compiled once at suite compile") {
    val df = Seq(("a", "doc-000000000001"), ("b", "BAD 2")).toDF("doc_id", "s")
    val r = runSuite(df, ConstraintSuite("doc_id", Seq(Regex("s", "^doc-[0-9]{12}$"))))
    assert(r.violations.select("doc_id").as[String].collect().toSet === Set("b"))
  }

  test("LengthBounds: TooShort/TooLong analogs, char-counted (macros.rs:356-376)") {
    // 4-char non-ASCII string: char semantics must match the reference's
    // chars().count(), not byte length.
    val df = Seq(("a", "héllo"), ("b", "hi"), ("c", "toolongstring"), ("d", "héll")).toDF("doc_id", "s")
    val r = runSuite(df, ConstraintSuite("doc_id", Seq(LengthBounds("s", Some(4), Some(6)))))
    assert(r.violations.select("doc_id").as[String].collect().toSet === Set("b", "c"))
  }

  test("EnumIn: InvalidEnumValue analog (macros.rs:116-241)") {
    val df = Seq(("a", "web"), ("b", "mystery")).toDF("doc_id", "src")
    val r = runSuite(df, ConstraintSuite("doc_id", Seq(EnumIn("src", Seq("web", "books")))))
    assert(r.violations.select("doc_id").as[String].collect().toSet === Set("b"))
  }

  test("Never rejects all, Always accepts all (bool schemas, macros.rs:6-24)") {
    val df = Seq(("a", 1)).toDF("doc_id", "x")
    assert(runSuite(df, ConstraintSuite("doc_id", Seq(Never()))).violations.count() === 1)
    assert(runSuite(df, ConstraintSuite("doc_id", Seq(Always()))).violations.count() === 0)
  }

  test("ArrayElemRange: per-element spans `col.i` (items schema, schema.rs:708-717)") {
    val df = Seq(("a", Seq(1, 2, 3)), ("b", Seq(1, -1, 99))).toDF("doc_id", "tokens")
    val r = runSuite(df, ConstraintSuite("doc_id", Seq(ArrayElemRange("tokens", 0, 50))))
    val v = r.violations.select("doc_id", "path", "actual").collect()
      .map(x => (x.getString(0), x.getString(1), x.getString(2))).toSet
    assert(v === Set(("b", "tokens.1", "-1"), ("b", "tokens.2", "99")))
  }

  test("ArrayElemIn: element enum with per-element spans") {
    val df = Seq(("a", Seq("x", "y")), ("b", Seq("x", "z"))).toDF("doc_id", "tags")
    val r = runSuite(df, ConstraintSuite("doc_id", Seq(ArrayElemIn("tags", Seq("x", "y")))))
    val v = r.violations.select("path", "actual").collect()
      .map(x => (x.getString(0), x.getString(1))).toSet
    assert(v === Set(("tags.1", "z")))
  }

  test("ArrayContainsValue: MustContain analog (schema.rs:773-784)") {
    val df = Seq(("a", Seq(1, 5)), ("b", Seq(5, 9))).toDF("doc_id", "tokens")
    val r = runSuite(df, ConstraintSuite("doc_id", Seq(ArrayContainsValue("tokens", 1))))
    assert(r.violations.select("doc_id").as[String].collect().toSet === Set("b"))
  }

  test("ArraySizeBounds: NotEnoughItems/TooManyItems analogs (schema.rs:787-805)") {
    val df = Seq(("a", Seq(1, 2)), ("b", Seq[Int]()), ("c", Seq(1, 2, 3, 4))).toDF("doc_id", "t")
    val r = runSuite(df, ConstraintSuite("doc_id", Seq(ArraySizeBounds("t", Some(1), Some(3)))))
    assert(r.violations.select("doc_id").as[String].collect().toSet === Set("b", "c"))
  }

  test("ArrayUniqueItems: NotUnique analog, within-row (schema.rs:738-755)") {
    val df = Seq(("a", Seq(1, 2, 3)), ("b", Seq(1, 2, 1))).toDF("doc_id", "t")
    val r = runSuite(df, ConstraintSuite("doc_id", Seq(ArrayUniqueItems("t"))))
    assert(r.violations.select("doc_id").as[String].collect().toSet === Set("b"))
  }

  test("LengthConsistent: size(tokens) == n_tok invariant") {
    val df = Seq(("a", Seq(1, 2), 2), ("b", Seq(1, 2), 3)).toDF("doc_id", "tokens", "n_tok")
    val r = runSuite(df, ConstraintSuite("doc_id", Seq(LengthConsistent("tokens", "n_tok"))))
    val v = r.violations.collect()
    assert(v.length === 1 && v(0).getAs[String]("actual") === "2 != 3")
  }

  test("TypeIs: static schema conformance (C1) — mismatch is a compile error") {
    val df = Seq(("a", 1)).toDF("doc_id", "x")
    assert(ConstraintSuite("doc_id", Seq(TypeIs("x", IntegerType))).compile(df.schema).isRight)
    val bad = ConstraintSuite("doc_id", Seq(TypeIs("x", StringType))).compile(df.schema)
    assert(bad.isLeft)
    assert(bad.left.toOption.get.exists(_.isInstanceOf[SuiteError.TypeMismatch]))
  }

  test("MapKeysIn: UnknownProperty analog with path col.key (schema.rs:941-956)") {
    val df = Seq(("a", Map("k1" -> 1)), ("b", Map("k1" -> 1, "unexpected_property" -> 2)))
      .toDF("doc_id", "props")
    val r = runSuite(df, ConstraintSuite("doc_id", Seq(MapKeysIn("props", Seq("k1", "k2")))))
    val v = r.violations.select("doc_id", "path").collect()
      .map(x => (x.getString(0), x.getString(1))).toSet
    assert(v === Set(("b", "props.unexpected_property")))
  }

  test("MapRequiredKeys: per-missing-key violations (schema.rs:992-998)") {
    val df = Seq(("a", Map("k1" -> 1, "k2" -> 2)), ("b", Map("k2" -> 2))).toDF("doc_id", "props")
    val r = runSuite(df, ConstraintSuite("doc_id", Seq(MapRequiredKeys("props", Seq("k1", "k2")))))
    val v = r.violations.select("doc_id", "path").collect()
      .map(x => (x.getString(0), x.getString(1))).toSet
    assert(v === Set(("b", "props.k1")))
  }

  test("MapSizeBounds: min/maxProperties (schema.rs:971-989)") {
    val df = Seq(("a", Map("k1" -> 1)), ("b", Map[String, Int]())).toDF("doc_id", "props")
    val r = runSuite(df, ConstraintSuite("doc_id", Seq(MapSizeBounds("props", Some(1), None))))
    assert(r.violations.select("doc_id").as[String].collect().toSet === Set("b"))
  }

  test("MapKeyPattern: propertyNames (schema.rs:874-883)") {
    val df = Seq(("a", Map("ok_key" -> 1)), ("b", Map("Bad Key" -> 1))).toDF("doc_id", "props")
    val r = runSuite(df, ConstraintSuite("doc_id", Seq(MapKeyPattern("props", "^[a-z_]+$"))))
    val v = r.violations.select("doc_id", "path").collect()
      .map(x => (x.getString(0), x.getString(1))).toSet
    assert(v === Set(("b", "props.Bad Key")))
  }

  test("MapValueRange: patternProperties value routing (schema.rs:914-939)") {
    val df = Seq(
      ("a", Map("num_x" -> 5, "other" -> 999)),
      ("b", Map("num_y" -> 999))).toDF("doc_id", "props")
    val r = runSuite(df, ConstraintSuite("doc_id", Seq(MapValueRange("props", "^num_", 0, 100))))
    val v = r.violations.select("doc_id", "path").collect()
      .map(x => (x.getString(0), x.getString(1))).toSet
    assert(v === Set(("b", "props.num_y")))
  }

  test("combinators: allOf / anyOf / oneOf / not / if-then-else (K1-K5)") {
    val df = Seq(("a", 5), ("b", 50), ("c", 500)).toDF("doc_id", "x")
    // allOf: both must hold
    val all = runSuite(df, ConstraintSuite("doc_id",
      Seq(All("r", Seq(Range("x", 0, 100), MultipleOf("x", 5.0))))))
    assert(all.violations.select("doc_id").as[String].collect().toSet === Set("c"))
    // anyOf: in [0,10] or multiple of 50
    val any = runSuite(df, ConstraintSuite("doc_id",
      Seq(AnyOf("r", Seq(Range("x", 0, 10), MultipleOf("x", 50.0))))))
    assert(any.violations.filter(col("constraint_id") === "anyOf(r)")
      .select("doc_id").as[String].collect().toSet === Set.empty[String])
    // c=500 is a multiple of 50 → passes; make a failing case
    val df2 = Seq(("d", 7)).toDF("doc_id", "x")
    val any2 = runSuite(df2, ConstraintSuite("doc_id",
      Seq(AnyOf("r", Seq(Range("x", 10, 20), MultipleOf("x", 2.0))))))
    // NoneValid analog: summary + ALL inner errors (schema.rs:199-237)
    assert(any2.violations.filter(col("constraint_id") === "anyOf(r)").count() === 1)
    assert(any2.violations.count() === 3)
    // oneOf: exactly one
    val one = runSuite(df, ConstraintSuite("doc_id",
      Seq(OneOf("r", Seq(Range("x", 0, 100), Range("x", 0, 10))))))
    // a=5 satisfies both → MoreThanOneValid; b=50 exactly one; c=500 none
    val oneV = one.violations.collect().map(x => (x.getAs[String]("doc_id"), x.getAs[String]("actual"))).toSet
    assert(oneV === Set(("a", "2 valid"), ("c", "0 valid")))
    // not: ValidNot analog (schema.rs:316-333)
    val not = runSuite(df, ConstraintSuite("doc_id", Seq(NotC("r", Range("x", 400, 600)))))
    assert(not.violations.select("doc_id").as[String].collect().toSet === Set("c"))
    // if x<=50 then multiple of 5, else multiple of 100
    val ite = runSuite(df, ConstraintSuite("doc_id",
      Seq(IfThenElse("r", Range("x", 0, 50), MultipleOf("x", 5.0), Some(MultipleOf("x", 100.0))))))
    assert(ite.violations.count() === 0)
    val ite2 = runSuite(Seq(("e", 49), ("f", 150)).toDF("doc_id", "x"),
      ConstraintSuite("doc_id",
        Seq(IfThenElse("r", Range("x", 0, 50), MultipleOf("x", 5.0), Some(MultipleOf("x", 100.0))))))
    assert(ite2.violations.select("doc_id").as[String].collect().toSet === Set("e", "f"))
  }

  test("NamedRef: $ref resolution from definitions (K6, schema.rs:124-150)") {
    val df = Seq(("a", 5), ("b", 500)).toDF("doc_id", "x")
    val suite = ConstraintSuite("doc_id",
      rowChecks = Seq(All("main", Seq(NamedRef("smallNumber")))),
      definitions = Map("smallNumber" -> Range("x", 0, 100)))
    val r = runSuite(df, suite)
    assert(r.violations.select("doc_id").as[String].collect().toSet === Set("b"))
  }

  test("accumulate-all-errors: k failing constraints ⇒ k violation rows (errors.rs:411-415)") {
    val df = Seq(("BAD", Seq(-5), 99)).toDF("doc_id", "tokens", "n_tok")
    val suite = ConstraintSuite("doc_id", Seq(
      Regex("doc_id", "^doc-"),
      Range("n_tok", 1, 50),
      ArrayElemRange("tokens", 0, 10),
      LengthConsistent("tokens", "n_tok")))
    val r = runSuite(df, suite)
    assert(r.violations.count() === 4) // no short-circuiting across constraints
    assert(r.violations.select("constraint_id").distinct().count() === 4)
  }
}

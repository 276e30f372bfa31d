package graft

import org.apache.spark.sql.functions._

/** Runtime JSON Schema loading — ports the shape of the reference's
  * hand-written schema test (`verify/tests/schemars.rs:38-105`: type +
  * enum + maxItems + per-item checks + required) onto a columnar table. */
class JsonSchemaSpec extends SparkSpec {
  import spark.implicits._

  private val schemaJson =
    """{
      "type": "object",
      "required": ["doc_id", "n_tok"],
      "properties": {
        "doc_id": { "type": "string", "pattern": "^doc-[0-9]+$", "maxLength": 20 },
        "n_tok":  { "type": "integer", "minimum": 1, "maximum": 100 },
        "source": { "enum": ["web", "books"] },
        "tokens": {
          "type": "array",
          "items": { "minimum": 0, "maximum": 50 },
          "minItems": 1, "maxItems": 4, "uniqueItems": true,
          "contains": { "const": 1 }
        }
      }
    }"""

  private lazy val df = Seq(
    ("doc-1", 5, "web", Seq(1, 2)), // clean
    ("BAD", 0, "spam", Seq(99, 99, 0, 7, 8)), // violates everything
    (null: String, 50, "books", Seq(1))) // missing required doc_id
    .toDF("doc_id", "n_tok", "source", "tokens")

  test("reference-style runtime schema compiles and finds every violation class") {
    val suite = JsonSchema.parse(schemaJson, "doc_id")
      .fold(es => fail(es.map(_.msg).mkString("; ")), identity)
    val compiled = suite.compile(df.schema)
      .fold(es => fail(es.map(_.msg).mkString("; ")), identity)
    val r = compiled.run(df)
    val byDoc = r.violations.groupBy("doc_id").count().collect()
      .map(x => Option(x.getString(0)).getOrElse("<null>") -> x.getLong(1)).toMap
    assert(!byDoc.contains("doc-1")) // clean row: zero violations
    // BAD row: regex, range, enum, elemRange (99,99 at idx 0,1 → 2 rows),
    // sizeBounds(>4), uniqueItems, contains = 8 violation rows
    assert(byDoc("BAD") === 8L)
    val ids = r.violations.filter(col("doc_id") === "BAD")
      .select("constraint_id").as[String].collect().toSet
    assert(ids === Set("regex(doc_id)", "range(n_tok)", "enum(source)",
      "elemRange(tokens)", "sizeBounds(tokens)", "uniqueItems(tokens)", "contains(tokens)"))
  }

  test("per-element spans come through from a runtime schema") {
    val suite = JsonSchema.parse(schemaJson, "doc_id").toOption.get
    val compiled = suite.compile(df.schema).toOption.get
    val paths = compiled.run(df).violations
      .filter(col("constraint_id") === "elemRange(tokens)")
      .select("path").as[String].collect().toSet
    assert(paths === Set("tokens.0", "tokens.1")) // the two 99s
  }

  test("$ref resolution + missing definition error (schemars.rs:108-141 analog)") {
    val withRef =
      """{"type":"object","definitions":{"smallNum":{"minimum":0,"maximum":9}},
         "properties":{"n_tok":{"$ref":"#/definitions/smallNum"}}}"""
    val suite = JsonSchema.parse(withRef, "doc_id").toOption.get
    val compiled = suite.compile(df.schema).toOption.get
    assert(compiled.run(df).violations
      .filter(col("constraint_id") === "range(n_tok)").count() === 1) // n_tok=50

    val missing = """{"type":"object","properties":{"n_tok":{"$ref":"#/definitions/nope"}}}"""
    val es = JsonSchema.parse(missing, "doc_id").left.toOption.get
    assert(es.exists(_.isInstanceOf[SuiteError.MissingDefinition]))
    val external = """{"type":"object","properties":{"n_tok":{"$ref":"http://x/y"}}}"""
    assert(JsonSchema.parse(external, "doc_id").isLeft)
  }

  test("invalid regex inside a runtime schema rejected at suite compile") {
    val bad = """{"type":"object","properties":{"doc_id":{"pattern":"[[[["}}}"""
    val suite = JsonSchema.parse(bad, "doc_id").toOption.get
    val es = suite.compile(df.schema).left.toOption.get
    assert(es.exists(_.isInstanceOf[SuiteError.InvalidPattern]))
  }

  test("boolean false schema rejects all rows; combinators compose") {
    val never = """{"type":"object","properties":{"source":false}}"""
    val s1 = JsonSchema.parse(never, "doc_id").toOption.get.compile(df.schema).toOption.get
    assert(s1.run(df).violations.count() === 3)

    val anyOf =
      """{"type":"object","properties":{"n_tok":{
           "anyOf":[{"minimum":40,"maximum":60},{"multipleOf":5}]}}}"""
    val s2 = JsonSchema.parse(anyOf, "doc_id").toOption.get.compile(df.schema).toOption.get
    // 5→multiple of 5 ok; 0→multiple of 5 ok; 50→both → all pass
    assert(s2.run(df).violations.count() === 0)
    val oneOf =
      """{"type":"object","properties":{"n_tok":{
           "oneOf":[{"minimum":40,"maximum":60},{"multipleOf":5}]}}}"""
    val s3 = JsonSchema.parse(oneOf, "doc_id").toOption.get.compile(df.schema).toOption.get
    // 50 satisfies BOTH → MoreThanOneValid violation; 5 and 0 exactly one
    val v = s3.run(df).violations.collect()
    assert(v.length === 1 && v.head.getAs[String]("actual") === "2 valid")
  }

  test("malformed JSON and missing properties are parse-time errors") {
    assert(JsonSchema.parse("{not json", "k").isLeft)
    assert(JsonSchema.parse("""{"type":"object"}""", "k").isLeft)
  }
}

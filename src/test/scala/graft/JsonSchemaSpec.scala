package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType, IntegerType, LongType, MapType, StringType}

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

  test("invalid regex inside a runtime schema rejected at PARSE (RootSchema::verify timing)") {
    // eager: the reference reports bad patterns in the schema self-check,
    // not first-use — and so must we, or a schema that ALSO has $ref errors
    // would lose the pattern error entirely (three-error port below)
    val bad = """{"type":"object","properties":{"doc_id":{"pattern":"[[[["}}}"""
    val errs = JsonSchema.parse(bad, "doc_id")
      .left.toOption.getOrElse(fail("expected parse errors"))
    assert(errs.exists(_.isInstanceOf[SuiteError.InvalidPattern]))
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

  // ------------------------------------------------------------------
  // round 2: type keyword, object keywords, tuple items, strictness
  // ------------------------------------------------------------------

  test("type keyword compiles to static conformance (C1, macros.rs:26-114)") {
    val s = """{"type":"object","properties":{"doc_id":{"type":"integer"}}}"""
    val suite = JsonSchema.parse(s, "doc_id").toOption.get
    val es = suite.compile(df.schema).left.toOption.get // doc_id is string
    assert(es.exists { case SuiteError.TypeMismatch("doc_id", "integer", _, _) => true; case _ => false })

    val ok = """{"type":"object","properties":{"n_tok":{"type":"integer"},
                 "doc_id":{"type":["string","null"]},
                 "tokens":{"type":"array","items":{"type":"integer"}}}}"""
    assert(JsonSchema.parse(ok, "doc_id").toOption.get.compile(df.schema).isRight)

    val badElem = """{"type":"object","properties":{"tokens":{"items":{"type":"string"}}}}"""
    assert(JsonSchema.parse(badElem, "doc_id").toOption.get.compile(df.schema).isLeft)
  }

  test("minimum AND exclusiveMinimum both apply (strictest per side, draft-07)") {
    // minimum=5 + exclusiveMinimum=3 must reject 3<x<5 (x>=5 is the
    // effective bound); the old orElse kept only '>3'
    val s = """{"type":"object","properties":{"n_tok":{"minimum":5,"exclusiveMinimum":3}}}"""
    val compiled = JsonSchema.parse(s, "doc_id").toOption.get.compile(df.schema).toOption.get
    val data = Seq(("a", 4), ("b", 5), ("c", 2)).toDF("doc_id", "n_tok")
    val bad = compiled.run(data).violations.select("doc_id").as[String].collect().toSet
    assert(bad === Set("a", "c"))
    // exclusive wins when it is the stricter one
    val s2 = """{"type":"object","properties":{"n_tok":{"minimum":3,"exclusiveMinimum":5}}}"""
    val c2 = JsonSchema.parse(s2, "doc_id").toOption.get.compile(df.schema).toOption.get
    val bad2 = c2.run(Seq(("a", 5), ("b", 6)).toDF("doc_id", "n_tok"))
      .violations.select("doc_id").as[String].collect().toSet
    assert(bad2 === Set("a")) // 5 fails '>5'
  }

  test("tuple-form items + additionalItems (C12, schema.rs:718-735)") {
    val s = """{"type":"object","properties":{"tokens":{
                 "items":[{"minimum":0,"maximum":9},{"minimum":0,"maximum":9}],
                 "additionalItems":{"minimum":0,"maximum":50}}}}"""
    val compiled = JsonSchema.parse(s, "doc_id").toOption.get.compile(df.schema).toOption.get
    val data = Seq(
      ("a", Seq(1, 2, 30, 40)),  // ok: prefix in 0-9, tail in 0-50
      ("b", Seq(10, 2, 30)),     // pos 1 out of prefix range
      ("c", Seq(1, 2, 99))       // tail out of range
    ).toDF("doc_id", "tokens")
    val v = compiled.run(data).violations.collect()
      .map(x => (x.getAs[String]("doc_id"), x.getAs[String]("constraint_id"), x.getAs[String]("path")))
    assert(v.toSet === Set(
      ("b", "elemAt(tokens.1)", "tokens.0"),
      ("c", "elemTail(tokens.3+)", "tokens.2")))

    // additionalItems:false = no elements past the prefix
    val sf = """{"type":"object","properties":{"tokens":{
                  "items":[{"minimum":0}],"additionalItems":false}}}"""
    val cf = JsonSchema.parse(sf, "doc_id").toOption.get.compile(df.schema).toOption.get
    val badLen = cf.run(Seq(("a", Seq(1)), ("b", Seq(1, 2))).toDF("doc_id", "tokens"))
      .violations.select("doc_id").as[String].collect().toSet
    assert(badLen === Set("b"))
  }

  test("unsupported structural keywords error instead of silently under-validating") {
    // round 3: contains-SCHEMA and dependencies are now supported — assert
    // the still-unexpressible forms keep erroring
    // unhandled keyword inside a contains schema
    val c = """{"type":"object","properties":{"tokens":{"contains":{"multipleOf":3}}}}"""
    assert(JsonSchema.parse(c, "doc_id").isLeft)
    // unhandled keyword inside items
    val i = """{"type":"object","properties":{"tokens":{"items":{"multipleOf":2}}}}"""
    assert(JsonSchema.parse(i, "doc_id").isLeft)
    // malformed dependencies value (neither key array nor schema)
    val d = """{"type":"object","properties":{"n_tok":{"dependencies":{"a":5}}}}"""
    assert(JsonSchema.parse(d, "doc_id").isLeft)
    // unhandled keyword inside propertyNames
    val p = """{"type":"object","properties":{"m":{"propertyNames":{"multipleOf":2}}}}"""
    assert(JsonSchema.parse(p, "doc_id").isLeft)
    // annotations stay ignored
    val a = """{"type":"object","properties":{"n_tok":{"title":"x","description":"y","format":"int32"}}}"""
    assert(JsonSchema.parse(a, "doc_id").isRight)
  }

  test("fractional float enums load in EPSILON mode (macros.rs:189)") {
    val s = """{"type":"object","properties":{"score":{"enum":[0.3, 0.5]}}}"""
    val data = Seq(("a", 0.1 + 0.2), ("b", 0.4)).toDF("doc_id", "score")
    val compiled = JsonSchema.parse(s, "doc_id").toOption.get.compile(data.schema).toOption.get
    val bad = compiled.run(data).violations.select("doc_id").as[String].collect().toSet
    assert(bad === Set("b")) // 0.1+0.2 ≈ 0.3 within f64::EPSILON
  }

  test("object keywords on a MAP column compile to Map* constraints (C17-C22)") {
    val s = """{"type":"object","properties":{"props":{
                 "type":"object",
                 "required":["num_a"],
                 "properties":{"num_a":{"minimum":0,"maximum":10}},
                 "patternProperties":{"^pct_":{"minimum":0,"maximum":100}},
                 "propertyNames":{"pattern":"^[a-z_]+$"},
                 "maxProperties":3}}}"""
    val data = Seq(
      ("ok", Map("num_a" -> 5.0, "pct_x" -> 50.0)),
      ("badv", Map("num_a" -> 50.0)),
      ("missing", Map("pct_x" -> 500.0)),
      ("badkey", Map("num_a" -> 1.0, "BAD" -> 1.0))
    ).toDF("doc_id", "props")
    val compiled = JsonSchema.parse(s, "doc_id").toOption.get.compile(data.schema).toOption.get
    val v = compiled.run(data).violations.collect()
      .map(x => (x.getAs[String]("doc_id"), x.getAs[String]("constraint_id")))
    assert(v.toSet === Set(
      ("badv", "mapValueRange(props:^\\Qnum_a\\E$)"),
      ("missing", "mapRequired(props)"),
      ("missing", "mapValueRange(props:^pct_)"),
      ("badkey", "mapKeyPattern(props)")))
  }

  test("object keywords on a STRUCT column recurse with dotted paths (test_verify port)") {
    // adapts verify/tests/schemars.rs:38-105 to the typed-table world:
    // nested properties/required walk the struct; additionalProperties:false
    // and type mismatches are COMPILE errors (schemas are table-wide)
    val data = Seq(
      ("a", Inner(1.0, Seq("x", "yy"))),
      ("b", Inner(9.9, Seq("x", "yy", "zzz"))), // enum miss + maxItems
      ("c", Inner(2.5, null))                   // required inner_values missing
    ).toDF("doc_id", "some_inner")
    val s = """{"type":"object","properties":{"some_inner":{
                 "type":"object",
                 "required":["inner_values","inner_value"],
                 "properties":{
                   "inner_values":{"type":"array","maxItems":2,"items":{"type":"string"}},
                   "inner_value":{"enum":[1.0, 2.5]}}}}}"""
    val suite = JsonSchema.parse(s, "doc_id", tableSchema = Some(data.schema)).toOption.get
    val compiled = suite.compile(data.schema).toOption.get
    val v = compiled.run(data).violations.collect()
      .map(x => (x.getAs[String]("doc_id"), x.getAs[String]("constraint_id")))
    assert(v.toSet === Set(
      ("b", "enum(some_inner.inner_value)"),
      ("b", "sizeBounds(some_inner.inner_values)"),
      ("c", "nonnull(some_inner.inner_values)")))

    // the reference's unexpected_property / wrong-type / missing-required
    // trio surfaces at COMPILE time here
    val strict = """{"type":"object","additionalProperties":false,
                    "required":["some_int"],
                    "properties":{"doc_id":{"type":"boolean"}}}"""
    val es = JsonSchema.parse(strict, "doc_id", tableSchema = Some(data.schema))
      .toOption.get.compile(data.schema).left.toOption.get
    assert(es.exists(_.msg.contains("some_int")))            // RequiredProperty analog
    assert(es.exists(_.msg.contains("some_inner")))          // UnknownProperty analog
    assert(es.exists { case SuiteError.TypeMismatch("doc_id", "boolean", _, _) => true; case _ => false })
  }

  test("reference tests/schemars.rs:109-141 port: self-verify accumulates all three errors") {
    // one schema document carrying an invalid regex, a missing local $ref,
    // and an external $ref — RootSchema::verify reports ALL of them; so
    // must the loader (accumulate-all, never first-error-wins)
    val json =
      """{"$schema":"http://json-schema.org/draft-07/schema#","type":"object",
          "properties":{
            "invalid_string":{"type":"string","pattern":"[[[[\\"},
            "missing_local":{"$ref":"#/definitions/Missing"},
            "external_ref":{"$ref":"http://example.com/schema.json#/definitions/Something"}}}"""
    val errs = JsonSchema.parse(json, "doc_id")
      .left.toOption.getOrElse(fail("expected schema self-check errors"))
    assert(errs.exists(e => e.msg.contains("[[[[") || e.msg.toLowerCase.contains("pattern")),
      errs.map(_.msg).mkString("; "))
    assert(errs.exists(_.msg.contains("Missing")), errs.map(_.msg).mkString("; "))
    assert(errs.exists(e => e.msg.contains("example.com") || e.msg.toLowerCase.contains("external")),
      errs.map(_.msg).mkString("; "))
    assert(errs.size >= 3)
  }

  // ------------------------------------------------------------------
  // render: the loader's inverse (suites as versioned draft-07 config)
  // ------------------------------------------------------------------

  private val rtSchema = org.apache.spark.sql.types.StructType(Seq(
    sf("doc_id", StringType), sf("uid", StringType), sf("n_tok", LongType),
    sf("score", DoubleType), sf("source", StringType), sf("ratio", DoubleType),
    sf("tokens", ArrayType(LongType)), sf("tup", ArrayType(DoubleType)),
    sf("meta", MapType(StringType, LongType)),
    sf("attrs", MapType(StringType, StringType)),
    sf("hdr", org.apache.spark.sql.types.StructType(Seq(
      sf("a", StringType), sf("b", LongType)))),
    sf("flag", StringType), sf("mode", StringType)))
  private def sf(n: String, t: org.apache.spark.sql.types.DataType) =
    org.apache.spark.sql.types.StructField(n, t)
  private def rtParse(j: String) =
    JsonSchema.parse(j, "doc_id", tableSchema = Some(rtSchema), validateFormats = true)
      .fold(es => fail(es.map(_.msg).mkString("; ")), identity)

  test("render: rich canonical schema is a parse/render fixed point") {
    val j =
      """{
        "type": "object",
        "required": ["doc_id", "n_tok"],
        "additionalProperties": false,
        "dependencies": {"flag": ["source"]},
        "properties": {
          "doc_id": {"type": "string", "pattern": "^doc-[0-9]+$",
                     "minLength": 1, "maxLength": 20},
          "uid":    {"format": "uuid"},
          "n_tok":  {"type": "integer", "exclusiveMinimum": 0,
                     "maximum": 1152921504606846977},
          "score":  {"minimum": 0.5, "exclusiveMaximum": 0.9, "multipleOf": 0.1},
          "source": {"enum": ["web", "books"]},
          "ratio":  {"enum": [0.25, 1.5]},
          "tokens": {"type": "array",
                     "items": {"type": "integer", "minimum": 0, "maximum": 50,
                               "enum": [1, 2, 3]},
                     "minItems": 1, "maxItems": 8, "uniqueItems": true,
                     "contains": {"const": 1, "minimum": 0}},
          "tup":    {"items": [{"minimum": 0, "maximum": 1}, {"minimum": 5}],
                     "additionalItems": {"minimum": 9}},
          "meta":   {"required": ["k1"],
                     "patternProperties": {"^v": {"minimum": 0, "maximum": 10}},
                     "propertyNames": {"pattern": "^[a-z]+$",
                                       "minLength": 1, "maxLength": 8},
                     "minProperties": 1, "maxProperties": 50},
          "attrs":  {"propertyNames": {"enum": ["x", "y"]}},
          "hdr":    {"properties": {"a": {"type": "string"}, "b": {"minimum": 0}},
                     "required": ["a"], "additionalProperties": false},
          "flag":   {"anyOf": [false, {"pattern": "^y"}],
                     "not": {"enum": ["no"]},
                     "if": {"pattern": "^a"}, "then": {"minLength": 2},
                     "else": {"maxLength": 1}},
          "mode":   {"oneOf": [{"enum": ["a"]}, {"enum": ["b"]}]}
        }
      }"""
    val s1 = rtParse(j)
    // the big-integer bound routed to the exact form; the float enum got
    // the canonical epsilon — the render must preserve both
    assert(s1.rowChecks.exists(_.isInstanceOf[DecimalRange]))
    assert(s1.rowChecks.collect { case EnumIn("ratio", _, eps) => eps } ===
      Seq(JsonSchema.F64Epsilon))
    val rendered = JsonSchemaRender.render(s1)
      .fold(es => fail(es.map(_.msg).mkString("; ")), identity)
    val s2 = rtParse(rendered)
    assert(s2 === s1)
    // and the cycle is idempotent (canonical form re-renders identically)
    val rendered2 = JsonSchemaRender.render(s2)
      .fold(es => fail(es.map(_.msg).mkString("; ")), identity)
    assert(rendered2 === rendered)
  }

  test("render: suggested suite freezes to config and reloads check-identical") {
    val corpus = Seq(
      ("doc-1", 5L, "web"), ("doc-2", 9L, "books"), ("doc-3", 7L, "web"))
      .toDF("doc_id", "n_tok", "source")
    val sug = Suggest.suggest(corpus)
    val suite = ConstraintSuite("doc_id", sug.rowChecks, sug.aggChecks)
    val json = JsonSchemaRender.render(suite)
      .fold(es => fail(es.map(_.msg).mkString("; ")), identity)
    val reloaded = JsonSchema.parse(json, "doc_id", tableSchema = Some(corpus.schema))
      .fold(es => fail(es.map(_.msg).mkString("; ")), identity)
    // reload normalizes ORDER (sorted NonNulls first); SuiteDiff is the
    // order-insensitive identity — and the reloaded suite still compiles
    // and passes its own training data (the suggest guarantee, preserved)
    assert(SuiteDiff.identical(suite, reloaded))
    assert(reloaded.compile(corpus.schema).toOption.get.run(corpus).violations.isEmpty)
    // second cycle is exact: the normalized form is the fixed point
    val json2 = JsonSchemaRender.render(reloaded)
      .fold(es => fail(es.map(_.msg).mkString("; ")), identity)
    assert(JsonSchema.parse(json2, "doc_id", tableSchema = Some(corpus.schema))
      .toOption.get === reloaded)
  }

  test("render: engine-native checks round-trip via x-graft keywords") {
    val suite = ConstraintSuite("doc_id",
      rowChecks = Seq(
        TypeIs("tokens", ArrayType(IntegerType)),
        ColOrder("a", "b", allowEqual = false),
        LengthConsistent("tokens", "n_tok"),
        PadSuffixOnly("tokens", 0L),
        EndsWithToken("tokens", 2L, 0L),
        PadAwareLength("tokens", "n_tok", 0L),
        SegmentLengthBounds("tokens", 2L, 1L, 10L),
        TagDispatch("src_rules", "source", Map(
          "web" -> Range("n_tok", 1, 4096),
          "code" -> All("n_tok", Seq(Range("n_tok", 1, 8192),
            MultipleOf("n_tok", 1.0)))))),
      aggChecks = Seq(
        Unique("doc_id", salted = true, saltBuckets = 32),
        UniqueTuple(Seq("a", "b")),
        DriftChiSquare("n_tok", "source", 2.0, 100.0),
        DriftPSI("n_tok", "source", 2.0, 0.25),
        DriftKS("n_tok", "source", 2.0, 0.2),
        MonotonicWithin("g", "o", "v", strict = true),
        RefIntegrityTable("source", "/data/dims/sources", "source",
          broadcastDim = false, format = "parquet"),
        Compliance(Range("n_tok", 1, 8192), 980000L, Some("source")),
        Compliance(All("text", Seq(Regex("text", "^[a-z]"),
          LengthBounds("text", Some(10), None))), 990000L, None)),
      nBuckets = 128)
    val json = JsonSchemaRender.render(suite)
      .fold(es => fail(es.map(_.msg).mkString("; ")), identity)
    val reloaded = JsonSchema.parse(json, "doc_id", nBuckets = 128)
      .fold(es => fail(es.map(_.msg).mkString("; ")), identity)
    assert(reloaded === suite)
  }

  test("RefIntegrityTable: path-named dimension loads at run, orphans found") {
    val dir = java.nio.file.Files.createTempDirectory("reftable").toString
    Seq("web", "books").toDF("source").write.mode("overwrite").parquet(s"$dir/dims")
    val fact = Seq(("d1", "web"), ("d2", "spam"), ("d3", "spam"), ("d4", null))
      .toDF("doc_id", "source")
    val check = RefIntegrityTable("source", s"$dir/dims", "source")
    assert(check.selfCheck(fact.schema).isEmpty)
    val v = check.run(fact).collect()
    assert(v.length === 1)
    assert(v.head.getAs[String]("constraint_id") === "refTable(source->source)")
    assert(v.head.getAs[String]("bound") === s"in $dir/dims#source")
    assert(v.head.getAs[String]("actual") === "orphan rows=2")
    assert(v.head.getAs[String]("key") === "spam")
    // the dimension is read AS OF the run: append a dim row, re-run clean
    Seq("spam").toDF("source").write.mode("append").parquet(s"$dir/dims")
    assert(check.run(fact).isEmpty)
  }

  test("SuiteRepo: versioned suite config — append, load, cross-version diff") {
    val dir = java.nio.file.Files.createTempDirectory("suiterepo").toString
    assert(SuiteRepo.latestVersion(spark, dir).isEmpty)
    val v1s = ConstraintSuite("doc_id",
      Seq(Range("n_tok", 1, 8192), Regex("doc_id", "^doc-[0-9]+$")),
      Seq(Unique("doc_id")))
    assert(SuiteRepo.append(spark, dir, v1s) === 0L)
    // the loosened-bound bump
    val v2s = ConstraintSuite("doc_id",
      Seq(Range("n_tok", 1, 16384), Regex("doc_id", "^doc-[0-9]+$")),
      Seq(Unique("doc_id")))
    assert(SuiteRepo.append(spark, dir, v2s) === 1L)
    val (v, latest) = SuiteRepo.loadLatest(spark, dir, "doc_id").get
    assert(v === 1L && SuiteDiff.identical(latest, v2s))
    assert(SuiteDiff.identical(SuiteRepo.load(spark, dir, 0L, "doc_id"), v1s))
    val changes = SuiteRepo.diff(spark, dir, 0L, 1L, "doc_id")
    assert(changes.map(c => (c.check_id, c.change)) ===
      Seq(("range(n_tok)", "params_changed")))
    // a crash between document and marker leaves the version invisible
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$dir/version=2"))
    assert(SuiteRepo.latestVersion(spark, dir) === Some(1L))
    intercept[IllegalArgumentException](SuiteRepo.load(spark, dir, 2L, "doc_id"))
    // unrenderable suites never write
    val dim = Seq("web").toDF("source")
    intercept[IllegalArgumentException](SuiteRepo.append(spark, dir,
      ConstraintSuite("k", Nil, Seq(RefIntegrity("source", dim, "source")))))
    assert(SuiteRepo.latestVersion(spark, dir) === Some(1L))
  }

  test("render: unrenderable constructs fail LOUDLY, never drop silently") {
    def leftOf(s: ConstraintSuite): List[SuiteError] =
      JsonSchemaRender.render(s).left.getOrElse(fail("expected Left"))
    // referential check carries a DataFrame — must be re-attached at load
    val dim = Seq("web").toDF("source")
    assert(leftOf(ConstraintSuite("k", Nil,
      aggChecks = Seq(RefIntegrity("source", dim, "source"))))
      .exists(_.msg.contains("RefIntegrity")))
    // tag dispatch serializes, but a case with no subschema form (NonNull
    // has no value-position keyword) must fail loudly, not drop the case
    assert(leftOf(ConstraintSuite("k",
      Seq(TagDispatch("t", "t", Map("a" -> NonNull("x"))))))
      .exists(_.msg.contains("nonnull(x)")))
    // unresolved definitions
    assert(leftOf(ConstraintSuite("k", Seq(NamedRef("d")),
      definitions = Map("d" -> NonNull("x"))))
      .exists(_.msg.contains("definitions")))
    // non-canonical enum epsilon would silently change verdicts on reload
    assert(leftOf(ConstraintSuite("k", Seq(EnumIn("c", Seq(0.25, 1.5), epsilon = 0.0))))
      .exists(_.msg.contains("epsilon")))
    // unknown format names are annotations on reload — refuse to emit
    assert(leftOf(ConstraintSuite("k", Seq(FormatCheck("c", "nope"))))
      .exists(_.msg.contains("nope")))
    // two colliding keywords on one column
    assert(leftOf(ConstraintSuite("k", Seq(Regex("c", "^a"), Regex("c", "^b"))))
      .exists(_.msg.contains("duplicate keyword")))
    // compliance over NonNull: draft-07 has no value-position "not null"
    assert(leftOf(ConstraintSuite("k", Nil,
      aggChecks = Seq(Compliance(NonNull("c"), 990000L))))
      .exists(_.msg.contains("nonnull")))
  }
}

/** Struct fixture for the nested-properties (test_verify) port. */
case class Inner(inner_value: Double, inner_values: Seq[String])

package graft

import org.apache.spark.sql.functions._

/** Tests for K7 tag dispatch, C12 positional items, and salted uniqueness. */
class Constraint2Spec extends SparkSpec {
  import spark.implicits._

  test("TagDispatch: tag column routes to per-variant constraints (K7, schema.rs:614-660)") {
    val df = Seq(
      ("a", "image", 100), ("b", "image", 99999),
      ("c", "audio", 100), ("d", "audio", 5),
      ("e", "mystery", -1)).toDF("doc_id", "kind", "v")
    val suite = ConstraintSuite("doc_id", Seq(TagDispatch("media", "kind", Map(
      "image" -> Range("v", 0, 1000),
      "audio" -> Range("v", 10, 1000)))))
    val compiled = suite.compile(df.schema).toOption.get
    val vio = compiled.run(df).violations.select("doc_id").as[String].collect().toSet
    // unknown tag "mystery" is permissive (reference tagged_allow)
    assert(vio === Set("b", "d"))
  }

  test("TagDispatch resolves NamedRefs inside cases") {
    val df = Seq(("a", "t1", 5), ("b", "t1", 500)).toDF("doc_id", "kind", "v")
    val suite = ConstraintSuite("doc_id",
      rowChecks = Seq(TagDispatch("m", "kind", Map("t1" -> NamedRef("small")))),
      definitions = Map("small" -> Range("v", 0, 100)))
    val compiled = suite.compile(df.schema).toOption.get
    assert(compiled.run(df).violations.select("doc_id").as[String].collect().toSet === Set("b"))
  }

  test("ArrayElemAtRange: positional item check with 0-based span (C12, schema.rs:718-735)") {
    val df = Seq(
      ("a", Seq(1, 50)), ("b", Seq(999, 50)), ("c", Seq(1))).toDF("doc_id", "t")
    val suite = ConstraintSuite("doc_id", Seq(ArrayElemAtRange("t", 2, 0, 100)))
    val compiled = suite.compile(df.schema).toOption.get
    val r = compiled.run(df)
    assert(r.violations.count() === 0) // position 2 fine for a,b; missing for c passes
    val suite1 = ConstraintSuite("doc_id", Seq(ArrayElemAtRange("t", 1, 0, 100)))
    val v = suite1.compile(df.schema).toOption.get.run(df)
      .violations.select("doc_id", "path").collect()
      .map(x => (x.getString(0), x.getString(1))).toSet
    assert(v === Set(("b", "t.0")))
  }

  test("Unique salted == unsalted (two-phase count correctness under planted skew)") {
    // one hot key duplicated 500 times + unique tail
    val rows = (1 to 500).map(i => (s"hot", s"payload$i")) ++
      (1 to 1000).map(i => (s"k$i", "x")) :+ (("k1", "dup")) // k1 duplicated once
    val df = rows.toDF("doc_id", "payload")
    val plain = Unique("doc_id", salted = false).run(df)
      .select("key", "actual").as[(String, String)].collect().toSet
    val salted = Unique("doc_id", salted = true, saltBuckets = 16).run(df)
      .select("key", "actual").as[(String, String)].collect().toSet
    assert(plain === salted)
    assert(plain === Set(("hot", "count=500"), ("k1", "count=2")))
  }
}

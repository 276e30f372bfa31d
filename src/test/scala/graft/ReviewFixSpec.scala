package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Regression tests for the round-1 code-review findings. */
class ReviewFixSpec extends SparkSpec {
  import spark.implicits._

  test("duplicate constraint ids rejected at compile (would crash fail_by_check map)") {
    val schema = Seq(("a", 1)).toDF("doc_id", "v").schema
    val dup = ConstraintSuite("doc_id", Seq(Range("v", 0, 10), Range("v", 90, 100)))
    val es = dup.compile(schema).left.toOption.get
    assert(es.exists(_.msg.contains("duplicate constraint id")))
  }

  test("null array elements: report.fail and violations agree (both violate)") {
    val df = Seq(
      ("a", Seq[Integer](1, 2)),
      ("b", Seq[Integer](1, null))).toDF("doc_id", "tags")
    val suite = ConstraintSuite("doc_id", Seq(ArrayElemRange("tags", 0, 100)))
    val r = suite.compile(df.schema).toOption.get.run(df)
    val vio = r.violations.collect()
    assert(vio.length === 1 && vio.head.getAs[String]("doc_id") === "b"
      && vio.head.getAs[String]("actual") === "<null>"
      && vio.head.getAs[String]("path") === "tags.1")
    val rep = r.report.agg(sum("fail")).as[Long].head()
    assert(rep === 1) // matches the violation count
  }

  test("null elements in ArrayElemIn also violate consistently") {
    val df = Seq(("a", Seq[String]("x", null))).toDF("doc_id", "tags")
    val suite = ConstraintSuite("doc_id", Seq(ArrayElemIn("tags", Seq("x", "y"))))
    val r = suite.compile(df.schema).toOption.get.run(df)
    assert(r.violations.count() === 1)
    assert(r.report.agg(sum("fail")).as[Long].head() === 1)
  }

  test("non-string key column: agg-violation bucket matches report bucket") {
    val df = Seq((1L, "x"), (2L, "y"), (2L, "z")).toDF("id", "payload")
    val suite = ConstraintSuite("id", Seq(NonNull("id")), Seq(Unique("id")))
    val compiled = suite.compile(df.schema).toOption.get
    val vio = compiled.run(df).violations
      .filter(col("constraint_id") === "unique(id)").collect()
    assert(vio.length === 1)
    val vioBucket = vio.head.getAs[Int]("bucket_id")
    val expected = df.filter(col("id") === 2L)
      .select(compiled.bucketOf(col("id"))).distinct().as[Int].head()
    assert(vioBucket === expected) // native-typed hash, not the string cast
  }

  test("empty AnyOf/OneOf rejected at compile") {
    val schema = Seq(("a", 1)).toDF("doc_id", "v").schema
    assert(ConstraintSuite("doc_id", Seq(AnyOf("e", Nil))).compile(schema).isLeft)
    assert(ConstraintSuite("doc_id", Seq(OneOf("e", Nil))).compile(schema).isLeft)
  }

  test("literal dotted column name rejected at compile (col() would misparse)") {
    val schema = StructType(Seq(
      StructField("doc_id", StringType), StructField("meta.lang", StringType)))
    val es = ConstraintSuite("doc_id", Seq(NonNull("meta.lang"))).compile(schema)
    assert(es.isLeft)
  }

  test("summaryJson escapes quotes in user-supplied labels") {
    val df = Seq(("a", 500)).toDF("doc_id", "v")
    val suite = ConstraintSuite("doc_id",
      Seq(AnyOf("has \"quote\"", Seq(Range("v", 0, 10)))))
    val r = suite.compile(df.schema).toOption.get.run(df)
    val json = ReportSink.summaryJson(r, "run\"1")
    // must be parseable JSON despite the quotes
    assert(json.contains("run\\\"1") && json.contains("has \\\"quote\\\""))
  }
}

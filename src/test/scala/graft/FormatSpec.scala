package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class FormatSpec extends SparkSpec {
  import spark.implicits._

  private def verdicts(format: String, values: Seq[String]): Map[String, Boolean] = {
    val df = values.toDF("v")
    df.select(col("v"), FormatCheck("v", format).pred.as("ok"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
  }

  private def assertFormat(format: String, good: Seq[String], bad: Seq[String]): Unit = {
    val m = verdicts(format, good ++ bad)
    good.foreach(v => assert(m(v), s"$format should accept '$v'"))
    bad.foreach(v => assert(!m(v), s"$format should reject '$v'"))
  }

  test("email: pragmatic dot-atom @ hostname") {
    assertFormat("email",
      good = Seq("a@b.co", "user.name+tag@sub.example.com", "x_1-2@h0st"),
      bad = Seq("bad email@@x", "@no-local.com", "no-at-sign", "a@", "a@-bad.com",
        "a@dom..com", "sp ace@x.com"))
  }

  test("ipv4: octet ranges, no leading-zero ambiguity beyond single digits") {
    assertFormat("ipv4",
      good = Seq("0.0.0.0", "255.255.255.255", "192.168.1.10", "9.10.100.249"),
      bad = Seq("256.1.2.3", "1.2.3", "1.2.3.4.5", "01.2.3.4", "a.b.c.d", "1..2.3"))
  }

  test("ipv6: full and ::-compressed forms") {
    assertFormat("ipv6",
      good = Seq("2001:0db8:85a3:0000:0000:8a2e:0370:7334", "2001:db8::1",
        "::1", "::", "fe80::", "a:b:c:d:e:f:1:2"),
      bad = Seq("2001:db8", "1:2:3:4:5:6:7:8:9", "g::1", "1::2::3", "02001:db8::1"))
  }

  test("uuid: hex shape, case-insensitive") {
    assertFormat("uuid",
      good = Seq("123e4567-e89b-12d3-a456-426614174000",
        "ABCDEF01-2345-6789-abcd-ef0123456789"),
      bad = Seq("not-a-uuid", "123e4567e89b12d3a456426614174000",
        "123e4567-e89b-12d3-a456-42661417400", "123g4567-e89b-12d3-a456-426614174000"))
  }

  test("date / time / date-time: RFC 3339 shape (documented pragmatic bounds)") {
    assertFormat("date",
      good = Seq("2024-01-31", "1999-12-01"),
      bad = Seq("2024-13-01", "2024-00-10", "2024-01-32", "24-01-01", "2024/01/01"))
    assertFormat("time",
      good = Seq("23:59:59Z", "00:00:00+05:30", "12:30:45.123z", "23:59:60Z"),
      bad = Seq("24:00:00Z", "12:60:00Z", "12:00:00", "12:00:61Z"))
    assertFormat("date-time",
      good = Seq("2024-01-15T12:30:00Z", "2024-01-15t23:59:60.5-08:00"),
      bad = Seq("2024-13-01T12:00:00Z", "2024-01-15 12:30:00Z", "2024-01-15T25:00:00Z"))
  }

  test("hostname: RFC 1123 labels + 253-char total cap (non-regex conjunct)") {
    val label63 = "a" * 63
    val long253 = (Seq.fill(3)(label63) ++ Seq("a" * 61)).mkString(".") // 253 chars
    assert(long253.length == 253)
    assertFormat("hostname",
      good = Seq("example.com", "a", "sub-1.Example.ORG", label63, long253),
      bad = Seq("-bad.com", "bad-.com", "a..b", ("a" * 64) + ".com", long253 + "a"))
  }

  test("uri: absolute scheme:rest, no whitespace") {
    assertFormat("uri",
      good = Seq("https://example.com/a?b=1#c", "urn:isbn:0451450523", "mailto:a@b.co",
        "s3+x://bucket/key"),
      bad = Seq("example.com/no-scheme", "http://has space", "1http://x", ""))
  }

  test("null passes; selfCheck rejects unknown formats and non-string columns") {
    val df = Seq((Option("a@b.co"), 1L), (Option.empty[String], 2L)).toDF("e", "n")
    // null row passes (leaf null-stance)
    assert(df.filter(!FormatCheck("e", "email").pred).count() == 0)
    assert(FormatCheck("e", "email").selfCheck(df.schema).isEmpty)
    assert(FormatCheck("e", "klingon-date").selfCheck(df.schema).nonEmpty)
    assert(FormatCheck("n", "email").selfCheck(df.schema).nonEmpty)
    assert(FormatCheck("zzz", "email").selfCheck(df.schema).nonEmpty)
    // violation entry shape
    val v = Seq("nope").toDF("e")
      .select(explode(FormatCheck("e", "email").vios).as("v")).select("v.*").head()
    assert(v.getString(0) == "format(e,email)" && v.getString(2) == "format email" &&
      v.getString(3) == "nope")
  }

  test("jsonschema loader: format is annotation by default, assertion on opt-in; unknown stays ignored") {
    val schema =
      """{"type": "object", "properties": {
           "id": {"type": "string"},
           "contact": {"type": "string", "format": "email"},
           "custom": {"type": "string", "format": "klingon-date"}
         }}"""
    val table = StructType(Seq(
      StructField("id", StringType), StructField("contact", StringType),
      StructField("custom", StringType)))
    // default: ignored per draft-07 annotation semantics
    val off = JsonSchema.parse(schema, "id", tableSchema = Some(table))
      .fold(e => fail(e.map(_.msg).mkString(";")), identity)
    assert(!off.rowChecks.exists(_.id.startsWith("format(")))
    // opt-in: known format compiles to FormatCheck, unknown stays ignored
    val on = JsonSchema.parse(schema, "id", tableSchema = Some(table),
      validateFormats = true).fold(e => fail(e.map(_.msg).mkString(";")), identity)
    val fc = on.rowChecks.find(_.id == "format(contact,email)")
    assert(fc.isDefined)
    assert(!on.rowChecks.exists(_.id.contains("klingon")))
    // and the compiled check actually validates
    val df = Seq(("1", "ok@example.com", "x"), ("2", "broken", "y"))
      .toDF("id", "contact", "custom")
    assert(df.filter(!fc.get.pred).collect().map(_.getString(0)).toSeq == Seq("2"))
  }
}

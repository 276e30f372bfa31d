package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.VecFunctions._

/** Token-layout checks for right-padded training sequences: the pad-boundary
  * invariants ([content..., EOS, PAD*]) whose boundary is per-row dynamic,
  * so positional items can never reach them. Kernels are one-pass
  * zero-allocation codegen'd expressions (graft.functions.ArrayCountEq /
  * ArrayPadSuffixOk / ArrayLastNotEq). */
class PadLayoutSpec extends SparkSpec {
  import spark.implicits._

  private val PAD = 0L
  private val EOS = 2L

  test("kernels: hand vectors incl. empty, all-pad, null elements, null array") {
    val df = Seq(
      (1, Some(Seq(1, 5, 2, 0, 0))), // clean padded row
      (2, Some(Seq(1, 0, 5, 2, 0))), // interior pad
      (3, Some(Seq(0, 0, 0))), // all-pad
      (4, Some(Seq.empty[Int])), // empty
      (5, Some(Seq(1, 5, 2))), // pad-free
      (6, None) // null array
    ).toDF("id", "tokens")
    val got = df.select(col("id"),
      array_count_eq(col("tokens"), PAD).as("npad"),
      array_pad_suffix_ok(col("tokens"), PAD).as("sfx"),
      array_last_not_eq(col("tokens"), PAD).as("last"))
      .collect().map(r => r.getInt(0) ->
        ((if (r.isNullAt(1)) null else r.getLong(1),
          if (r.isNullAt(2)) null else r.getBoolean(2),
          if (r.isNullAt(3)) null else r.getLong(3)))).toMap
    assert(got(1) === ((2L, true, 2L)))
    assert(got(2) === ((2L, false, 2L))) // last REAL token robust to interior pad
    assert(got(3) === ((3L, true, null))) // no non-pad element exists
    assert(got(4) === ((0L, true, null)))
    assert(got(5) === ((0L, true, 2L)))
    assert(got(6) === ((null, null, null))) // null array -> null everywhere

    // null ELEMENTS: never equal anything (count), non-pad for the suffix
    // scan (corruption after padding began), skipped by the last-real scan
    val ne = spark.createDataFrame(
      java.util.List.of(
        org.apache.spark.sql.Row(1, Seq[Integer](1, null, 0, null)),
        org.apache.spark.sql.Row(2, Seq[Integer](1, 7, 0, 0))),
      StructType(Seq(StructField("id", IntegerType),
        StructField("tokens", ArrayType(IntegerType, containsNull = true)))))
    val g2 = ne.select(col("id"),
      array_count_eq(col("tokens"), PAD).as("npad"),
      array_pad_suffix_ok(col("tokens"), PAD).as("sfx"),
      array_last_not_eq(col("tokens"), PAD).as("last"))
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getBoolean(2),
        if (r.isNullAt(3)) null else r.getLong(3)))).toMap
    assert(g2(1) === ((1L, false, 1L))) // null after pad breaks the suffix
    assert(g2(2) === ((2L, true, 7L)))
  }

  test("kernels: FORCED codegen matches interpreted eval") {
    val df = Seq(
      Some(Seq(1, 5, 2, 0, 0)), Some(Seq(1, 0, 5, 2, 0)), Some(Seq(0, 0)),
      Some(Seq.empty[Int]), Some(Seq(9, 9, 9)), None).toDF("tokens")
    def evalAll(mode: String): Seq[String] = {
      val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
      spark.conf.set("spark.sql.codegen.factoryMode", mode)
      try df.select(
        array_count_eq(col("tokens"), PAD).as("npad"),
        array_pad_suffix_ok(col("tokens"), PAD).as("sfx"),
        array_last_not_eq(col("tokens"), PAD).as("last"))
        .collect().map(_.toString).toSeq
      finally prev match {
        case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
        case None => spark.conf.unset("spark.sql.codegen.factoryMode")
      }
    }
    val compiled = evalAll("CODEGEN_ONLY")
    assert(compiled === evalAll("NO_CODEGEN"))
    assert(compiled.size == 6)
  }

  test("constraints: preds, violation entries, and accumulate-all through the suite") {
    val df = Seq(
      ("d1", Seq(1, 5, 2, 0, 0), 3), // clean
      ("d2", Seq(1, 0, 5, 2, 0), 3), // interior pad only (non-pad count still 3)
      ("d3", Seq(1, 5, 7, 0, 0), 3), // missing EOS
      ("d4", Seq(1, 5, 2, 0, 0), 4), // wrong n_tok
      ("d5", Seq(0, 0, 0, 0, 0), 0), // all-pad: no EOS to find, counts consistent
      ("d6", Seq(1, 0, 7, 0, 0), 3) // interior pad + missing EOS + bad count (2 real)
    ).toDF("doc_id", "tokens", "n_tok")
    val suite = ConstraintSuite("doc_id", Seq(
      PadSuffixOnly("tokens", PAD),
      EndsWithToken("tokens", EOS, PAD),
      PadAwareLength("tokens", "n_tok", PAD)))
    val compiled = suite.compile(df.schema)
      .fold(es => fail(es.map(_.msg).mkString("; ")), identity)
    val v = compiled.run(df).violations
      .select(col("doc_id"), col("constraint_id"), col("bound"), col("actual"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3)))
    val byId = v.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    assert(byId("padSuffix(tokens)") === Set("d2", "d6"))
    assert(byId("endsWith(tokens)") === Set("d3", "d5", "d6"))
    assert(byId("padAwareLength(tokens,n_tok)") === Set("d4", "d6"))
    // entry shape: bound states the invariant, actual carries evidence
    val d5 = v.find(x => x._1 == "d5" && x._2 == "endsWith(tokens)").get
    assert(d5._3 == s"last non-pad token == $EOS" && d5._4 == "<none>")
    val d6len = v.find(x => x._1 == "d6" && x._2 == "padAwareLength(tokens,n_tok)").get
    assert(d6len._4 == "2 != 3")
  }

  test("selfCheck: integral arrays only, numeric length, unknown columns") {
    val s = StructType(Seq(
      StructField("toks", ArrayType(IntegerType)),
      StructField("ftoks", ArrayType(FloatType)),
      StructField("txt", StringType),
      StructField("n", IntegerType)))
    assert(PadSuffixOnly("toks", PAD).selfCheck(s).isEmpty)
    assert(PadSuffixOnly("ftoks", PAD).selfCheck(s).nonEmpty) // float == is rejected
    assert(PadSuffixOnly("txt", PAD).selfCheck(s).nonEmpty)
    assert(PadSuffixOnly("zzz", PAD).selfCheck(s).nonEmpty)
    assert(EndsWithToken("ftoks", EOS, PAD).selfCheck(s).nonEmpty)
    assert(EndsWithToken("toks", PAD, PAD).selfCheck(s).nonEmpty) // eos == pad can never pass
    assert(EndsWithToken("toks", EOS, PAD).selfCheck(s).isEmpty)
    assert(PadAwareLength("toks", "n", PAD).selfCheck(s).isEmpty)
    assert(PadAwareLength("toks", "txt", PAD).selfCheck(s).nonEmpty)
    assert(PadAwareLength("ftoks", "n", PAD).selfCheck(s).nonEmpty)
  }

  test("segments: hand vectors — empty/overlong/trailing/sep-free/null") {
    val df = Seq(
      (1, Some(Seq(5, 6, 2, 7, 2))), // two docs of 2 and 1 -> ok
      (2, Some(Seq(2, 5, 2))), // LEADING empty segment -> 1 bad
      (3, Some(Seq(5, 2, 2, 6, 2))), // consecutive seps -> 1 bad
      (4, Some(Seq(5, 6, 7, 8, 2))), // doc of 4 > max 3 -> 1 bad
      (5, Some(Seq(5, 2, 6, 7))), // valid unterminated trailing doc of 2
      (6, Some(Seq(5, 2, 6, 7, 8, 9))), // trailing doc of 4 > max -> 1 bad
      (7, Some(Seq(5, 6))), // sep-free: ONE segment, len 2 -> ok
      (8, Some(Seq(5, 6, 7, 8))), // sep-free segment of 4 > max -> 1 bad
      (9, Some(Seq.empty[Int])), // empty array: zero segments -> ok
      (10, Some(Seq(2))), // one leading empty segment -> 1 bad
      (11, None) // null array -> null
    ).toDF("id", "tokens")
    val got = df.select(col("id"),
      array_bad_segments(col("tokens"), 2L, 1L, 3L).as("bad"))
      .collect().map(r => r.getInt(0) ->
        (if (r.isNullAt(1)) null else r.getLong(1))).toMap
    assert(got === Map(1 -> 0L, 2 -> 1L, 3 -> 1L, 4 -> 1L, 5 -> 0L, 6 -> 1L,
      7 -> 0L, 8 -> 1L, 9 -> 0L, 10 -> 1L, 11 -> null))

    // forced codegen matches interpreted
    def evalAll(mode: String): Seq[String] = {
      val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
      spark.conf.set("spark.sql.codegen.factoryMode", mode)
      try df.select(array_bad_segments(col("tokens"), 2L, 1L, 3L))
        .collect().map(_.toString).toSeq
      finally prev match {
        case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
        case None => spark.conf.unset("spark.sql.codegen.factoryMode")
      }
    }
    assert(evalAll("CODEGEN_ONLY") === evalAll("NO_CODEGEN"))
  }

  test("SegmentLengthBounds: constraint wiring, selfCheck guards") {
    val df = Seq(
      ("d1", Seq(5, 6, 2, 7, 2)),
      ("d2", Seq(5, 2, 2, 6, 2))).toDF("doc_id", "tokens")
    val c = SegmentLengthBounds("tokens", 2L, 1L, 3L)
    val suite = ConstraintSuite("doc_id", Seq(c))
    val compiled = suite.compile(df.schema)
      .fold(es => fail(es.map(_.msg).mkString("; ")), identity)
    val v = compiled.run(df).violations
      .select(col("doc_id"), col("bound"), col("actual")).collect()
    assert(v.length == 1)
    assert(v.head.getString(0) == "d2")
    assert(v.head.getString(1) == "segments by 2 in [1,3]")
    assert(v.head.getString(2) == "1 bad segments")
    val s = df.schema
    assert(SegmentLengthBounds("zzz", 2L, 1L, 3L).selfCheck(s).nonEmpty)
    assert(SegmentLengthBounds("doc_id", 2L, 1L, 3L).selfCheck(s).nonEmpty)
    assert(SegmentLengthBounds("tokens", 2L, 5L, 3L).selfCheck(s).nonEmpty) // min > max
    assert(c.selfCheck(s).isEmpty)
  }

  test("packedSequences: planted defect classes are exact ground truth") {
    val n = 20000L
    val corpus = DataGen.packedSequences(spark, n)
    val bad = array_bad_segments(col("tokens"), DataGen.EOS.toLong, 1L,
      DataGen.MAX_SEG.toLong)
    val r = corpus.agg(
      sum((bad > 0).cast(LongType)),
      sum(bad),
      sum((bad === 0).cast(LongType))).collect().head
    val ids = 0L until n
    val expBadRows = ids.count(i =>
      i % DataGen.EMPTY_SEG_MOD == 0 || i % DataGen.LONG_SEG_MOD == 0).toLong
    // one bad segment per defect class; rows in both classes carry two
    val expBadSegs = ids.count(_ % DataGen.EMPTY_SEG_MOD == 0).toLong +
      ids.count(_ % DataGen.LONG_SEG_MOD == 0).toLong
    assert(r.getLong(0) == expBadRows)
    assert(r.getLong(1) == expBadSegs)
    assert(r.getLong(2) == n - expBadRows) // trailing-doc rows all pass
  }

  test("the validator certifies the packer: Packing output passes SegmentLengthBounds; a corrupted pack is caught") {
    // close the produce->validate loop: packSequences with sep=EOS emits
    // [doc1, EOS, doc2, EOS, doc3] — every segment is one document, so the
    // packer's output contract IS SegmentLengthBounds(sep=EOS, 1, context)
    val docs = DataGen.sequences(spark, 2000, maxLen = 24)
      .filter(col("tokens").isNotNull && !array_contains(col("tokens"), DataGen.EOS)
        && !array_contains(col("tokens"), DataGen.PAD) && col("doc_id").isNotNull)
    val context = 64
    val packs = ops.Packing.packSequences(docs, "tokens", "doc_id", context,
      sep = Some(DataGen.EOS)).toDF()
    val chk = SegmentLengthBounds("tokens", DataGen.EOS, 1L, context.toLong)
    val bad = packs.filter(!coalesce(chk.pred, lit(false))).count()
    assert(bad == 0L, s"packer output violated its own segment contract ($bad packs)")
    assert(packs.count() > 0)
    // corrupt one pack with a doubled separator; the validator must flag it
    val corrupted = packs.withColumn("tokens",
      when(col("pack_id") === packs.select(min("pack_id")).collect().head.getLong(0),
        flatten(array(slice(col("tokens"), 1, 1),
          array(lit(DataGen.EOS), lit(DataGen.EOS)),
          slice(col("tokens"), 2, 100000)))).otherwise(col("tokens")))
    assert(corrupted.filter(!coalesce(chk.pred, lit(false))).count() == 1L)
  }

  test("padWasteProfile: exact fixed-point waste; composes with the Compliance gate") {
    val df = Seq(
      ("web", Seq(1, 5, 2, 0, 0)), // 2 pads of 5
      ("web", Seq(1, 2, 0, 0, 0)), // 3 pads of 5 -> web: 5/10 = 500000
      ("code", Seq(1, 5, 6, 7, 2))) // 0 pads -> 0
      .toDF("source", "tokens")
    val w = Stats.padWasteProfile(df, "tokens", "source", PAD)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_pad"), r.getAs[Long]("waste_fp"))).toMap
    assert(w("web") === ((10L, 5L, 500000L)))
    assert(w("code") === ((5L, 0L, 0L)))

    // layout checks are ordinary RowConstraints: the statistical Compliance
    // gate composes without special cases — per-source pass rates of
    // PadSuffixOnly, breaching sources carry the planted ~1/11 defect rate
    val corpus = DataGen.paddedSequences(spark, 5000, maxLen = 32)
    val gate = Compliance(PadSuffixOnly("tokens", DataGen.PAD),
      minPassFp = 950000, groupBy = Some("source"))
    val suite = ConstraintSuite("doc_id", Nil, aggChecks = Seq(gate))
    val compiled = suite.compile(corpus.schema)
      .fold(es => fail(es.map(_.msg).mkString("; ")), identity)
    // ~9.1% of every source's rows carry the interior-pad defect, so a
    // 95% gate breaches every source
    val breached = compiled.run(corpus).violations
      .filter(col("constraint_id").startsWith("compliance("))
      .select("actual").collect()
    assert(breached.length == 5)
  }

  test("paddedSequences: planted defect classes are exact ground truth") {
    val n = 20000L
    val corpus = DataGen.paddedSequences(spark, n, maxLen = 32).cache()
    try {
      val suffixOk = PadSuffixOnly("tokens", DataGen.PAD.toLong).pred
      val endsOk = EndsWithToken("tokens", DataGen.EOS.toLong, DataGen.PAD.toLong).pred
      val lenOk = PadAwareLength("tokens", "n_tok", DataGen.PAD.toLong).pred
      val r = corpus.agg(
        sum((!suffixOk).cast(LongType)),
        sum((!endsOk).cast(LongType)),
        sum((!lenOk).cast(LongType)),
        sum((size(col("tokens")) =!= 32).cast(LongType))).collect().head
      val ids = 0L until n
      assert(r.getLong(0) == ids.count(_ % DataGen.INTERIOR_PAD_MOD == 0))
      assert(r.getLong(1) == ids.count(_ % DataGen.NO_EOS_MOD == 0))
      // interior pad shrinks the non-pad count; BAD_NTOK inflates n_tok —
      // both breach the pad-aware length, and +1 vs -1 can never cancel
      assert(r.getLong(2) == ids.count(i =>
        i % DataGen.INTERIOR_PAD_MOD == 0 || i % DataGen.BAD_NTOK_MOD == 0))
      assert(r.getLong(3) == 0L) // fixed batch width always
    } finally corpus.unpersist()
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based tests (SURVEY.md §5.2 #5): generated corpora with
  * violations injected at KNOWN ids — engine recall/precision must be exact,
  * and `pass + distinct-violating-rows == totalRows` per bucket.
  * (ScalaCheck generators driven manually: the scalatest-plus bridge isn't
  * on the offline classpath.) */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val suite = ConstraintSuite("doc_id", Seq(
    Range("n_tok", 1, 100),
    EnumIn("source", Seq("web", "books"))))

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  test("exact recall/precision on injected violations; pass+fail==rows per bucket") {
    val genRows = Gen.listOfN(200, for {
      id <- Gen.choose(0, 1000000)
      bad <- Gen.frequency(8 -> false, 2 -> true)
      nTok <- if (bad) Gen.oneOf(Gen.choose(-50, 0), Gen.choose(101, 500)) else Gen.choose(1, 100)
      src <- Gen.oneOf("web", "books")
    } yield (s"doc-$id", nTok, src))

    for (rows <- samples(genRows, 10)) {
      val distinctRows = rows.distinctBy(_._1) // unique ids: known ground truth
      val df = distinctRows.toDF("doc_id", "n_tok", "source")
      val compiled = suite.compile(df.schema).toOption.get
      val r = compiled.run(df)
      val expected = distinctRows.filter(x => x._2 < 1 || x._2 > 100).map(_._1).toSet
      val got = r.violations.select("doc_id").as[String].collect().toSet
      assert(got === expected) // exact recall AND precision
      val rep = r.report.collect()
      assert(rep.forall(x => x.getAs[Long]("pass") + x.getAs[Long]("fail") === x.getAs[Long]("rows")))
      assert(rep.map(_.getAs[Long]("rows")).sum === distinctRows.size)
    }
  }

  test("violation count is exactly the number of failing constraints per row") {
    val gen = Gen.listOfN(100, for {
      id <- Gen.choose(0, 1000000)
      nTok <- Gen.choose(-200, 300)
      src <- Gen.oneOf("web", "books", "spam", "junk")
    } yield (s"d-$id", nTok, src))
    for (rows <- samples(gen, 10)) {
      val d = rows.distinctBy(_._1)
      val df = d.toDF("doc_id", "n_tok", "source")
      val compiled = suite.compile(df.schema).toOption.get
      val expected = d.map { case (_, n, s) =>
        (if (n < 1 || n > 100) 1 else 0) + (if (s != "web" && s != "books") 1 else 0)
      }.sum
      assert(compiled.run(df).violations.count() === expected)
    }
  }

  test("ArrayTailRange matches a Scala model on random arrays (C12 additionalItems)") {
    val gen = Gen.listOfN(150, for {
      id <- Gen.choose(0, 1000000)
      xs <- Gen.listOf(Gen.choose(-20, 120))
    } yield (s"d-$id", xs))
    val c = ArrayTailRange("xs", fromPos = 3, min = 0, max = 100)
    for (rows <- samples(gen, 10)) {
      val d = rows.distinctBy(_._1)
      val df = d.toDF("doc_id", "xs")
      val compiled = ConstraintSuite("doc_id", Seq(c)).compile(df.schema).toOption.get
      // model: every element at 0-based index >= 2 must be in [0, 100]
      val expectedBad = d.filter { case (_, xs) =>
        xs.zipWithIndex.exists { case (v, i) => i >= 2 && (v < 0 || v > 100) }
      }.map(_._1).toSet
      val got = compiled.run(df).violations.select("doc_id").as[String].collect().toSet
      assert(got === expectedBad)
      // and the per-element spans name exactly the offending indices
      val spans = compiled.run(df).violations.select("doc_id", "path").as[(String, String)]
        .collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      d.foreach { case (id, xs) =>
        val bad = xs.zipWithIndex.collect {
          case (v, i) if i >= 2 && (v < 0 || v > 100) => s"xs.$i"
        }.toSet
        if (bad.nonEmpty) assert(spans(id) === bad)
      }
    }
  }

  test("EnumIn epsilon matches the reference float-compare model") {
    val eps = 1e-9
    val enumVals = Seq(0.25, 1.5, -3.75)
    val gen = Gen.listOfN(150, for {
      id <- Gen.choose(0, 1000000)
      base <- Gen.oneOf(enumVals)
      jitter <- Gen.oneOf(0.0, 1e-12, -1e-12, 1e-6, 0.5)
    } yield (s"d-$id", base + jitter))
    val c = EnumIn("x", enumVals, epsilon = eps)
    for (rows <- samples(gen, 10)) {
      val d = rows.distinctBy(_._1)
      val df = d.toDF("doc_id", "x")
      val compiled = ConstraintSuite("doc_id", Seq(c)).compile(df.schema).toOption.get
      val expectedBad = d.filter { case (_, v) =>
        !enumVals.exists(e => math.abs(v - e) < eps)
      }.map(_._1).toSet
      val got = compiled.run(df).violations.select("doc_id").as[String].collect().toSet
      assert(got === expectedBad)
    }
  }

  test("loader bound-merge: compiled Range accepts exactly the draft-07 intersection") {
    val boundGen = for {
      lo <- Gen.option(Gen.choose(-50, 50))
      xlo <- Gen.option(Gen.choose(-50, 50))
      hi <- Gen.option(Gen.choose(0, 100))
      xhi <- Gen.option(Gen.choose(0, 100))
    } yield (lo, xlo, hi, xhi)
    val values = (-60 to 110 by 7).map(_.toDouble)
    for ((lo, xlo, hi, xhi) <- samples(boundGen, 30)) {
      val kws = List(
        lo.map(v => s""""minimum":$v"""), xlo.map(v => s""""exclusiveMinimum":$v"""),
        hi.map(v => s""""maximum":$v"""), xhi.map(v => s""""exclusiveMaximum":$v""")).flatten
      // the engine rejects inverted effective bounds at compile (InvalidBounds)
      // — a deliberate stricter-than-draft-07 stance; skip those cases here
      val effMin = (lo.toList ++ xlo.toList).maxOption
      val effMax = (hi.toList ++ xhi.toList).minOption
      val inverted = (effMin, effMax) match {
        case (Some(a), Some(b)) => a > b
        case _ => false
      }
      if (kws.nonEmpty && !inverted) {
        val json = s"""{"type":"object","properties":{"x":{${kws.mkString(",")}}}}"""
        val df = values.zipWithIndex.map { case (v, i) => (s"d-$i", v) }.toDF("doc_id", "x")
        val compiled = JsonSchema.parse(json, "doc_id").toOption.get
          .compile(df.schema).toOption.get
        // draft-07 model: ALL present keywords apply independently
        def ok(v: Double) =
          lo.forall(v >= _) && xlo.forall(v > _) && hi.forall(v <= _) && xhi.forall(v < _)
        val expectedBad = values.zipWithIndex.collect {
          case (v, i) if !ok(v) => s"d-$i"
        }.toSet
        val got = compiled.run(df).violations.select("doc_id").as[String].collect().toSet
        assert(got === expectedBad, s"bounds lo=$lo xlo=$xlo hi=$hi xhi=$xhi")
      }
    }
  }

  // ---------------------------------------------------------------------
  // text kernels vs naive Scala models
  // ---------------------------------------------------------------------

  /** Independent word model: per-code-point simple lowercase, non-alnum →
    * separator (implemented via mapping + split, NOT the kernel's loop). */
  private def modelWords(text: String): Seq[String] = {
    val mapped = text.codePoints().toArray.map(Character.toLowerCase).map { cp =>
      if ((cp >= 'a' && cp <= 'z') || (cp >= '0' && cp <= '9')) cp.toChar.toString else " "
    }.mkString
    mapped.split("\\s+").toSeq.filter(_.nonEmpty)
  }

  private def modelRepetition(text: String): Seq[Long] = {
    val lines = text.split("\n", -1).toSeq.filter(_.nonEmpty)
    val lineCount = lines.groupBy(identity).view.mapValues(_.size).toMap
    def cps(s: String): Long = s.codePointCount(0, s.length).toLong
    val dup = lines.filter(l => lineCount(l) >= 2)
    val words = modelWords(text)
    def wins(k: Int): Seq[String] = words.sliding(k).filter(_.size == k).map(_.mkString(" ")).toSeq
    def top(k: Int): Long = {
      val c = wins(k).groupBy(identity).view.mapValues(_.size).toMap
      if (c.isEmpty) 0L
      else {
        val (g, n) = c.toSeq.minBy { case (g, n) => (-n, -g.length, g) }
        n.toLong * g.length
      }
    }
    def cov(k: Int): Long = {
      val ws = wins(k)
      val c = ws.groupBy(identity).view.mapValues(_.size).toMap
      val covered = Array.fill(words.size)(false)
      ws.zipWithIndex.foreach { case (g, i) =>
        if (c(g) >= 2) (i until i + k).foreach(covered(_) = true)
      }
      words.indices.filter(covered).map(i => words(i).length.toLong).sum
    }
    Seq(lines.size.toLong, dup.size.toLong, dup.map(cps).sum, lines.map(cps).sum,
      words.size.toLong, words.map(_.length.toLong).sum,
      top(2), top(3), top(4), cov(5), cov(10))
  }

  test("RepetitionStats and WordCounts match naive models on random text") {
    val genText = Gen.listOfN(60, Gen.frequency(
      10 -> Gen.alphaNumChar.map(_.toString),
      4 -> Gen.const(" "),
      2 -> Gen.const("\n"),
      1 -> Gen.oneOf("😀", "K", "ß", "É", ".", "!"), // emoji, Kelvin, eszett, E-acute
      2 -> Gen.oneOf("the", "spam spam", "aa bb"))).map(_.mkString)
    val texts = samples(genText, 250).distinct
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val got = graft.ops.TextAnalysis.repetitionProfile(df, "text", "id").collect()
      .map(r => r.getLong(0) -> (1 to 11).map(r.getLong(_))).toMap
    val gotWc = df.select(col("id"),
        graft.functions.TextFunctions.word_counts(col("text")).as("wc")).collect()
      .map(r => r.getLong(0) ->
        r.getSeq[org.apache.spark.sql.Row](1).map(x => x.getString(0) -> x.getInt(1))).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(got(i.toLong) === modelRepetition(t), s"repetition mismatch on: ${t.take(80)}")
      val wcModel = modelWords(t).groupBy(identity).view.mapValues(_.size)
        .toSeq.sortBy(_._1).map { case (w, c) => (w, c) }
      assert(gotWc(i.toLong) === wcModel, s"word-count mismatch on: ${t.take(80)}")
    }
  }

  test("dropExactDupsAgainst matches the naive set-difference model on random corpora") {
    import graft.ops.Dedup
    val genWord = Gen.oneOf("alpha", "beta", "gamma", "delta", "epsilon", "zeta")
    val genText = Gen.listOfN(4, genWord).map(_.mkString(" "))
    val genCase = for {
      corpusTexts <- Gen.listOfN(12, genText)
      batchTexts <- Gen.listOfN(10, Gen.oneOf(genText, Gen.oneOf(corpusTexts)))
      nullSlots <- Gen.listOfN(2, Gen.choose(0, 9))
    } yield (corpusTexts, batchTexts, nullSlots.toSet)
    for (((corpusTexts, batchTexts, nullSlots), k) <- samples(genCase, 8).zipWithIndex) {
      val corpus = corpusTexts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val batch = batchTexts.zipWithIndex.map { case (t, i) =>
        (1000L + i, if (nullSlots(i)) None else Some(t))
      }.toDF("doc_id", "text")
      val kept = Dedup.dropExactDupsAgainst(batch, "text", "doc_id",
        Dedup.exactSignatures(corpus, "text", "doc_id"))
        .select("doc_id").as[Long].collect().toSet
      // model: keep iff text is null OR not present verbatim in the corpus
      val corpusSet = corpusTexts.toSet
      val expected = batchTexts.zipWithIndex.collect {
        case (t, i) if nullSlots(i) || !corpusSet(t) => 1000L + i
      }.toSet
      assert(kept === expected, s"case $k")
    }
  }

  test("packSequencesFFD invariants hold on random mixed-length corpora") {
    import graft.ops.Packing
    val genRows = Gen.listOfN(60, for {
      id <- Gen.choose(0, 25) // duplicate ids on purpose
      len <- Gen.frequency(6 -> Gen.choose(1, 7), 3 -> Gen.choose(8, 15), 1 -> Gen.choose(16, 40))
      seed <- Gen.choose(0, 1000)
    } yield (s"d$id", Seq.tabulate(len)(j => seed + j)))
    for ((rows, k) <- samples(genRows, 6).zipWithIndex) {
      val df = rows.toDF("doc_id", "tokens")
      val out = Packing.packSequencesFFD(df, "tokens", "doc_id", context = 12, buckets = 3)
        .collect()
      // exactly-once accounting: every token lands in exactly one pack,
      // over-length rows truncated to context
      val expectedTok = rows.map(r => math.min(r._2.length, 12)).sum
      assert(out.map(_.n_tok).sum === expectedTok, s"case $k tokens")
      assert(out.forall(_.n_tok <= 12), s"case $k overflow")
      assert(out.map(_.pack_id).distinct.length === out.length, s"case $k ids")
      assert(out.filter(_.truncated).forall(p => p.n_docs == 1 && p.n_tok == 12), s"case $k trunc")
      // parallelism stability: identical pack set at another input layout
      val again = Packing.packSequencesFFD(df.repartition(7), "tokens", "doc_id",
        context = 12, buckets = 3).collect()
      assert(again.map(p => (p.pack_id, p.doc_ids, p.tokens)).toSet
        === out.map(p => (p.pack_id, p.doc_ids, p.tokens)).toSet, s"case $k stability")
    }
  }
}

package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-4 hardening: positive CSV header detection under split
  * perturbation, unique pack ids for duplicated memberships, per-symbol
  * Gopher symbol-ratio gates, sampled bigram-LM training, the trigram LM,
  * length-aware packing, streaming near-dup candidates, media metadata
  * decode, and pipeline resume. */
class Round4Spec extends SparkSpec {
  import spark.implicits._

  // ---------------------------------------------------------------------
  // CSV header: positive single-scan detection
  // ---------------------------------------------------------------------

  test("CsvCorpus header=true: exactly one header line per file under split perturbation") {
    import graft.sources.CsvCorpus
    val dir = java.nio.file.Files.createTempDirectory("csv_hdr4")
    // one big file (many splits at a tiny maxPartitionBytes) + one small one
    val bigLines = "doc_id,name" +: (1 to 2000).map(i => s"$i,row$i")
    java.nio.file.Files.write(dir.resolve("big.csv"),
      String.join("\n", bigLines: _*).getBytes("UTF-8"))
    java.nio.file.Files.write(dir.resolve("small.csv"),
      String.join("\n", "doc_id,name", "9001,last").getBytes("UTF-8"))
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("name", StringType)))
    def run(): (Long, Long) = {
      val (v, c) = CsvCorpus.readSplit(spark, dir.toString, schema, header = true)
      (v.count(), c.count())
    }
    val (v0, c0) = run()
    assert(v0 === 2001L && c0 === 0L)
    // perturb input splitting: a 4 KB split target forces the big file into
    // many blocks — exactly one of them has byte offset 0, so still exactly
    // one dropped line per file
    val conf = "spark.sql.files.maxPartitionBytes"
    val old = spark.conf.get(conf)
    try {
      spark.conf.set(conf, "4096")
      val (v1, c1) = run()
      assert(v1 === 2001L && c1 === 0L)
    } finally spark.conf.set(conf, old)
  }

  test("CsvCorpus header=true: a whitespace-only first line IS the header") {
    import graft.sources.CsvCorpus
    val dir = java.nio.file.Files.createTempDirectory("csv_hdr_ws")
    // physical line 1 is whitespace-only: it is the header slot, so the
    // first DATA line must survive (the round-3 min-line-id design would
    // have dropped "1,alpha" instead)
    java.nio.file.Files.write(dir.resolve("ws.csv"),
      String.join("\n", "   ", "1,alpha", "2,beta").getBytes("UTF-8"))
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("name", StringType)))
    val (v, c) = CsvCorpus.readSplit(spark, dir.toString, schema, header = true)
    assert(v.collect().map(_.getLong(0)).toSet === Set(1L, 2L))
    assert(c.count() === 0L)
  }

  // ---------------------------------------------------------------------
  // Packing: pack_id uniqueness under duplicated memberships
  // ---------------------------------------------------------------------

  test("packSequences: duplicated memberships get DISTINCT pack ids, deterministically") {
    import graft.ops.Packing
    // duplicate over-length rows: each emits its own truncated single-doc
    // pack — identical membership, must not collide on pack_id
    val big = Seq.tabulate(12)(i => i + 1)
    val df = Seq(
      ("dup", big), ("dup", big), ("dup", big),
      ("a", Seq(1, 2, 3)), ("a", Seq(1, 2, 3))) // full duplicate short rows
      .toDF("doc_id", "tokens")
    val out = Packing.packSequences(df, "tokens", "doc_id", context = 8, buckets = 4)
      .collect()
    assert(out.map(_.pack_id).distinct.length === out.length) // all unique
    assert(out.filter(_.truncated).length === 3)
    // exactly-once: total tokens preserved (truncated rows clipped to 8)
    assert(out.map(_.n_tok).sum === 3 * 8 + 2 * 3)
    // determinism: same input at different parallelism -> same id SET
    val again = Packing.packSequences(df.repartition(7), "tokens", "doc_id",
      context = 8, buckets = 4).collect()
    assert(again.map(_.pack_id).sorted.toSeq === out.map(_.pack_id).sorted.toSeq)
  }

  // ---------------------------------------------------------------------
  // Media: real pure-JVM header decode
  // ---------------------------------------------------------------------

  test("MediaCodec.sniff: golden dims per container format") {
    import graft.ops.MediaCodec
    def solid(w: Int, h: Int) = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      val g = img.createGraphics()
      g.setColor(new java.awt.Color(200, 100, 50)); g.fillRect(0, 0, w, h); g.dispose()
      img
    }
    assert(MediaCodec.sniff(MediaGen.encode("png", Seq(solid(20, 10))))
      === Some(MediaCodec.MediaMeta("png", 20, 10, 1)))
    assert(MediaCodec.sniff(MediaGen.encode("jpeg", Seq(solid(33, 7))))
      === Some(MediaCodec.MediaMeta("jpeg", 33, 7, 1)))
    assert(MediaCodec.sniff(MediaGen.encode("bmp", Seq(solid(5, 64))))
      === Some(MediaCodec.MediaMeta("bmp", 5, 64, 1)))
    // animated GIF: REAL frame count from walking the block structure
    assert(MediaCodec.sniff(MediaGen.encode("gif", Seq(solid(9, 9), solid(9, 9), solid(9, 9))))
      === Some(MediaCodec.MediaMeta("gif", 9, 9, 3)))
    // corrupt: garbage, truncated PNG signature, null, empty
    assert(MediaCodec.sniff("definitely not an image".getBytes("UTF-8")) === None)
    assert(MediaCodec.sniff(Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A, 0, 0)) === None)
    assert(MediaCodec.sniff(null) === None)
    assert(MediaCodec.sniff(Array.empty[Byte]) === None)
  }

  test("MediaCodec vs javax.imageio: independent dimension agreement on generated payloads") {
    import graft.ops.MediaCodec
    // the hand-rolled parser and the JDK's own readers must agree on every
    // valid generated payload — a cross-implementation check local to this
    // test (the oracle's check is vs generation-time ground truth)
    MediaGen.mediaTable(spark, 40).collect().filter(_.true_format != "unknown").foreach { r =>
      val meta = MediaCodec.sniff(r.payload)
        .getOrElse(fail(s"sniff failed for ${r.true_format} id=${r.doc_id}"))
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
      assert(meta.width === img.getWidth && meta.height === img.getHeight,
        s"id=${r.doc_id} fmt=${r.true_format}")
      assert(meta.format === r.true_format && meta.width === r.true_width &&
        meta.height === r.true_height && meta.nFrames === r.true_frames)
    }
  }

  test("Multimodal.decodeMeta: failure accounting and end-to-end fixture parity") {
    import graft.ops.Multimodal
    val media = MediaGen.mediaTable(spark, 100).toDF()
    val decoded = Multimodal.decodeMeta(spark, media).collect()
    assert(decoded.length === 100) // corrupt rows are COUNTED, not dropped
    val (ok, bad) = decoded.partition(_.ok)
    assert(bad.length === 20 && bad.forall(d => d.format == "unknown" && d.width == 0))
    assert(ok.groupBy(_.format).view.mapValues(_.length).toMap
      === Map("png" -> 20, "gif" -> 20, "jpeg" -> 20, "bmp" -> 20))
    // decoded meta equals generation ground truth row-by-row
    val truth = media.select("doc_id", "true_format", "true_width", "true_height", "true_frames")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2), r.getInt(3), r.getInt(4)))).toMap
    decoded.foreach { d =>
      assert(truth(d.doc_id) === ((d.format, d.width, d.height, d.n_frames)))
    }
  }

  test("Multimodal.decodeFeatures: real pixel decode — solid color means are exact") {
    import graft.ops.Multimodal
    val img = new java.awt.image.BufferedImage(16, 8,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    val g = img.createGraphics()
    g.setColor(new java.awt.Color(255, 0, 102)); g.fillRect(0, 0, 16, 8); g.dispose()
    val payload = MediaGen.encode("png", Seq(img)) // png is lossless
    val df = Seq((7L, payload)).toDF("doc_id", "payload")
    val f = Multimodal.decodeFeatures(spark, df).head()
    assert(f.width === 16 && f.height === 8 && f.n_frames === 1)
    assert(f.feature(0) === 1.0f) // mean R = 255/255
    assert(f.feature(1) === 0.0f) // mean G
    assert(math.abs(f.feature(2) - 102f / 255f) < 1e-6)
    // luminance = (255*299 + 102*114)/1000 = 87 -> bin 1 holds every pixel
    assert(f.feature(4) === 1.0f && f.feature(3) === 0.0f)
    assert(f.feature(7) === 16f / 24f) // aspect
  }

  // ---------------------------------------------------------------------
  // Gopher: per-symbol ratio gates
  // ---------------------------------------------------------------------

  test("gopherQualityPass: '#' and ellipsis ratios gate separately") {
    import graft.ops.TextAnalysis
    // 60 words with stopwords present, then 4 '#' chars + 4 "..." runs:
    // 8 combined symbol occurrences would fail the old combined gate
    // (8*10 > 66) but each symbol alone is 4 <= 0.1*66 — the published
    // per-symbol rule passes. The line must NOT end with an ellipsis (that
    // would trip the separate ellipsis-LINE gate), so the hashes come last.
    val words = "the cats and dogs have run to that park with glee " +
      (1 to 49).map(i => s"word$i").mkString(" ")
    val borderline = words + " ... ... ... ... ## ##"
    // 7 '#' tokens on top of the 60 words: 7*10 > 67 fails the hash ratio
    val tooManyHash = words + " # # # # # # #"
    val df = Seq(("b", borderline), ("h", tooManyHash)).toDF("id", "text")
    val out = df.select(col("id"),
        TextAnalysis.gopherQualityPass(col("text")).as("p"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(out("b") === true) // per-symbol: 4 <= 6 for each of hash/ellipsis
    assert(out("h") === false) // hash ratio alone fails
    // feature split: n_hash and n_ellipsis are separate exact counts now
    val f = graft.ops.TextAnalysis.gopherQualityFeatures(col("text")).toMap
    val counts = df.filter(col("id") === "b")
      .select(f("n_hash").as("h"), f("n_ellipsis").as("e")).head()
    assert(counts.getInt(0) === 4 && counts.getInt(1) === 4)
  }
}

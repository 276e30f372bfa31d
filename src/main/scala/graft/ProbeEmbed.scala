package graft

import org.apache.spark.sql.functions._

/** One-off probe for [[graft.ops.Dedup.dropNearDupsByEmbedding]] at the
  * million-vector scale, recorded in BASELINE.md: 1 M distinct hash-generated
  * base vectors (dim 64, the testdata embedding width) + 120 k PLANTED
  * near-duplicates — every id % 10 == 0
  * again at id+10 M scaled ×2 (exact cosine 1.0 under IEEE power-of-two
  * scaling), every id % 50 == 0 a THIRD time at id+20 M scaled ×0.5 (3-node
  * clusters that only transitive closure collapses). The probe requires the
  * result to be PLANTED-RATE-EXACT: exactly the 1 M base ids survive
  * (threshold 0.999 — the chance of an accidental ≥0.999 cosine between
  * independent 64-dim hash vectors is negligible, and the planted pairs sit
  * at 1.0 to the ulp).
  *
  * At this scale the 4-plane bands of the fixture-scale queries would put
  * ~70 k rows in every bucket (16 buckets/band) and the oversized-bucket
  * guard would rightly drop them all — planesPerBand must GROW with the
  * corpus (≈ log2(n) + slack: random-collision candidates per band scale
  * as n²/2^planes, so at 1.12 M rows 16 planes yield ~150 M accidental
  * candidates (measured: 90 s dedup + 283 s verify) while 24 planes yield
  * ~0.5 M). Dimensionality matters too: at dim 16 the same planes are so
  * correlated that bucket occupancy skews ~40× (measured — the bucket
  * self-join spilled >60 GB before the guard boundary), while at dim 64+
  * the sign bits are near-independent. Production embeddings are
  * 384-4096-dim, well inside the safe regime; recall for true near-dups is
  * governed by the BAND count, which stays fixed.
  *
  * Env: SPARK_GRAFT_CPUS (default 16).
  */
object ProbeEmbed {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt
    val spark = GraftSession.local(cpus, "probe-embed")
    spark.sparkContext.setLogLevel("WARN")

    val dim = 64
    val base = spark.range(0, 1000000)
      .select(col("id").as("vec_id"),
        transform(sequence(lit(0), lit(dim - 1)),
          i => (pmod(xxhash64(col("id"), i), lit(2000)).cast("float") / 1000f - 1f))
          .as("embedding"))
    def scaled(mod: Int, offset: Long, factor: Float) =
      base.filter(col("vec_id") % mod === 0)
        .select((col("vec_id") + offset).as("vec_id"),
          transform(col("embedding"), x => x * lit(factor)).as("embedding"))
    val corpus = base.union(scaled(10, 10000000L, 2.0f))
      .union(scaled(50, 20000000L, 0.5f))
      .localCheckpoint(true)
    val n = corpus.count()

    // SPARK_GRAFT_PROBE_DIAG=1: time the pipeline stages separately (band
    // explode, candidate generation, exact verify) before the composed run
    if (sys.env.get("SPARK_GRAFT_PROBE_DIAG").contains("1")) {
      import graft.ops.Similarity
      def timed[A](name: String)(body: => A): A = {
        val t = System.nanoTime()
        val r = body
        println(f"""{"diag":"$name","sec":${(System.nanoTime() - t) / 1e9}%.1f}""")
        r
      }
      val b = corpus.select(col("vec_id").as("id"), col("embedding").as("v"))
        .withColumn("nrm", Similarity.norm(col("v"))).filter(col("nrm") > 0).persist()
      val banded = b.select(col("id"),
        posexplode(graft.functions.VecFunctions.sign_lsh_bands(col("v"), 8, 24))
          .as(Seq("band", "band_val")))
      timed("banded-count")(println(s"banded=${banded.count()}"))
      val l = banded.select(col("band"), col("band_val"), col("id").as("id_a"))
      val r = banded.select(col("band"), col("band_val"), col("id").as("id_b"))
      val cand = l.join(r, Seq("band", "band_val")).filter(col("id_a") < col("id_b"))
        .select("id_a", "id_b")
      timed("raw-pairs")(println(s"rawPairs=${cand.count()}"))
      val deduped = cand.dropDuplicates("id_a", "id_b").persist()
      timed("dedup-pairs")(println(s"candidates=${deduped.count()}"))
      val verified = deduped
        .join(b.select(col("id").as("id_a"), col("v").as("v_a"), col("nrm").as("nrm_a")), Seq("id_a"))
        .join(b.select(col("id").as("id_b"), col("v").as("v_b"), col("nrm").as("nrm_b")), Seq("id_b"))
        .withColumn("cos", Similarity.dot(col("v_a"), col("v_b")) / (col("nrm_a") * col("nrm_b")))
        .filter(col("cos") >= 0.999)
      timed("verify")(println(s"verified=${verified.count()}"))
      b.unpersist(); deduped.unpersist()
    }

    val t0 = System.nanoTime()
    val survivors = graft.ops.Dedup.dropNearDupsByEmbedding(
      corpus, "embedding", "vec_id",
      threshold = 0.999, bands = 8, planesPerBand = 24, maxBucket = 4096)
    val kept = survivors.agg(count(lit(1)), max("vec_id")).head()
    val sec = (System.nanoTime() - t0) / 1e9
    val keptN = kept.getLong(0)
    val maxId = kept.getLong(1)
    println(f"""{"probe":"dropNearDupsByEmbedding","rows":$n,"kept":$keptN,""" +
      f""""max_survivor_id":$maxId,"sec":$sec%.1f,"rows_per_sec":${n / sec}%.0f}""")
    // planted-rate-exact: every planted duplicate dropped, every base row
    // kept (max id < 10 M proves no planted id survived)
    require(keptN == 1000000L && maxId < 10000000L,
      s"expected exactly the 1M base rows to survive, got $keptN (max id $maxId)")
    spark.stop()
  }
}

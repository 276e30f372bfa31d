package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Adversarial-SKEW probe (BASELINE.md evidence): the scaling corpus is
  * uniform, so this measures the engine's skew defenses doing their job —
  * the same operators on (a) a uniform corpus and (b) a hostile variant
  * with 90% of rows in ONE source stratum and a planted hot duplicate key
  * (0.5% of all rows share a single doc_id). Measured at local[8]:
  *
  *  - salted uniqueness (`Unique(salted=true)`): the hot key's copies
  *    spread over (key, row-hash-salt) pre-aggregation reducers;
  *  - `capStrata` (broadcast-cut approximate cap) over the 90% stratum;
  *  - `balanceToMix` down-sampling the hot stratum to a target mix.
  *
  * Prints one JSON line with uniform/skewed wall seconds per op and the
  * skew ratios. Acceptance bar (BASELINE.md): ratio ≤ ~1.5× — skew moves
  * constant factors, never degenerates into a single-reducer straggler.
  */
object ProbeSkew {

  private def session(cores: Int): SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft-probe-skew")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Deterministic corpus: (doc_id, source). `skewed=true` routes 90% of
    * rows to source "hot" (the rest uniform over 9 sources) and makes 1 in
    * 200 rows share the single doc_id "doc-hot" (a viral duplicate). */
  private def corpus(spark: SparkSession, n: Long, skewed: Boolean, parts: Int): DataFrame = {
    val ids = spark.range(0, n, 1, parts)
    val h = abs(xxhash64(col("id"), lit(7)))
    val src =
      if (!skewed) concat(lit("src"), pmod(h, lit(10L)).cast("string"))
      else when(pmod(h, lit(10L)) < 9, "hot")
        .otherwise(concat(lit("src"), pmod(abs(xxhash64(col("id"), lit(8))), lit(9L)).cast("string")))
    val docId =
      if (!skewed) format_string("doc-%012d", col("id"))
      else when(col("id") % 200 === 0, "doc-hot")
        .otherwise(format_string("doc-%012d", col("id")))
    ids.select(docId.as("doc_id"), src.as("source"))
  }

  private def timed(label: String)(f: => Long): (String, Double, Long) = {
    val t0 = System.nanoTime()
    val out = f
    ((label, (System.nanoTime() - t0) / 1e9, out))
  }

  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_SKEW_ROWS", "16000000").toLong
    val cores = sys.env.getOrElse("SPARK_GRAFT_SKEW_CPUS", "8").toInt
    val spark = session(cores)
    import graft.ops.Sampling

    def measure(skewed: Boolean): Map[String, Double] = {
      // row count in the path: a rerun with a different SPARK_GRAFT_SKEW_ROWS
      // must regenerate, not silently reuse the stale corpus
      val path = s"target/skewprobe/${if (skewed) "skewed" else "uniform"}_$n.parquet"
      if (!new java.io.File(path + "/_SUCCESS").exists())
        corpus(spark, n, skewed, parts = 64).write.mode("overwrite").parquet(path)
      val df = spark.read.parquet(path)
      df.count() // warm file listing + page cache comparably
      val targets =
        if (skewed) Map("hot" -> 0.5, "src0" -> 0.25, "src1" -> 0.25)
        else Map("src0" -> 0.4, "src1" -> 0.3, "src2" -> 0.3)
      val runs = Seq(
        timed("unique_salted") {
          Unique("doc_id", salted = true).run(df).count()
        },
        timed("cap_strata") {
          Sampling.capStrata(df.select("doc_id", "source"), "source", "doc_id",
            maxRows = n / 20).count()
        },
        timed("balance_mix") {
          Sampling.balanceToMix(df.select("doc_id", "source"), "source", "doc_id",
            targets).count()
        },
        // round 5: the EXACT per-stratum cap, now two-phase (BoundedMinRows
        // partial top-k) — under the old window-sort the 90% stratum
        // serialized into ONE task's sort; the bar is the same ≤1.5× ratio
        timed("cap_exact") {
          Sampling.capStrataExact(df.select("doc_id", "source"), "source", "doc_id",
            maxRows = 100000).count()
        })
      runs.map { case (l, t, _) => l -> t }.toMap
    }

    // warm the JIT on a small slice first
    val warm = corpus(spark, 100000, skewed = true, parts = cores)
    Unique("doc_id", salted = true).run(warm).count()

    // two passes per variant, report the second (steady-state) — the first
    // interleaved pass equalizes JIT/page-cache warmth across variants
    measure(skewed = false); measure(skewed = true)
    val uni = measure(skewed = false)
    val skw = measure(skewed = true)
    val ops = Seq("unique_salted", "cap_strata", "balance_mix", "cap_exact")
    val fields = ops.flatMap { op =>
      Seq(
        f""""${op}_uniform_sec":${uni(op)}%.2f""",
        f""""${op}_skewed_sec":${skw(op)}%.2f""",
        f""""${op}_ratio":${skw(op) / uni(op)}%.2f""")
    }
    println(s"""{"rows":$n,"cores":$cores,${fields.mkString(",")}}""")
    spark.stop()
  }
}

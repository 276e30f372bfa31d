package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Profiling-at-scale probe (BASELINE.md evidence): a documents-shaped
  * corpus of N rows, measuring
  *  - `Profiler.profile` — EXACT distincts: Spark plans one Expand branch
  *    per distinct-counted column (5 here), multiplying the scan,
  *  - `Profiler.profileApprox` — HLL++ sketches, ONE pass, no Expand,
  *  - `Suggest.suggest` — profileRaw + gated enum-domain fetches,
  * and reporting the worst HLL distinct-count error against the exact
  * profile (the accuracy the 10^12-row path trades the Expand away for).
  * Prints one JSON line.
  */
object ProbeProfile {

  private def docText(seed: Column): Column = {
    val words = (0 until 8).map(k =>
      concat(lit("w"), pmod(abs(xxhash64(seed, lit(k))), lit(30000L)).cast("string")))
    concat_ws(" ", words: _*)
  }

  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_PROFILE_ROWS", "16000000").toLong
    val cores = sys.env.getOrElse("SPARK_GRAFT_PROFILE_CPUS", "16").toInt
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft-probe-profile")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val path = s"target/profileprobe/docs_$n.parquet"
    if (!new java.io.File(path + "/_SUCCESS").exists())
      spark.range(0, n, 1, cores * 4)
        .select(
          col("id").as("doc_id"),
          docText(col("id")).as("text"),
          element_at(array(Seq("en", "es", "fr", "de", "pt").map(lit): _*),
            (pmod(abs(xxhash64(col("id"), lit(1))), lit(5L)) + 1).cast("int")).as("lang"),
          concat(lit("src"), pmod(abs(xxhash64(col("id"), lit(2))), lit(20L))
            .cast("string")).as("source"),
          (pmod(abs(xxhash64(col("id"), lit(3))), lit(400L)) + 40).as("n_chars"))
        .write.mode("overwrite").parquet(path)
    val docs = spark.read.parquet(path)

    def timed[A](f: => A): (Double, A) = {
      val t0 = System.nanoTime(); val out = f
      ((System.nanoTime() - t0) / 1e9, out)
    }

    // warm the scan path so the first timed run isn't charged for it
    docs.agg(count(lit(1))).collect()

    val (tApprox, approxRows) = timed(Profiler.profileApprox(docs).collect())
    val (tExact, exactRows) = timed(Profiler.profile(docs).collect())
    val (tSuggest, sug) = timed(Suggest.suggest(docs))

    val exactNd = exactRows.map(r => r.getString(0) -> r.getLong(4)).toMap
    val worstErrPct = approxRows.map { r =>
      val e = exactNd(r.getString(0)).toDouble
      if (e == 0) 0.0 else math.abs(r.getLong(4) - e) / e * 100.0
    }.max

    // the distribution face: exact percentile_disc (per-partition
    // value->count maps) vs the GK sketch, and the bounded-heap top-k —
    // all over (doc_id, n_chars): one unbounded-distinct column, one
    // low-cardinality column
    val qCols = Seq("doc_id", "n_chars")
    val (tQExact, qExact) = timed(Profiler.profileQuantiles(docs, qCols).collect())
    val (tQApprox, qApprox) = timed(Profiler.profileQuantilesApprox(docs, qCols).collect())
    val exactQ = qExact.map(r => (r.getString(0), r.getLong(2)) -> r.getLong(3)).toMap
    // GK error in RANKS; report the worst VALUE deviation in percent
    val worstQErrPct = qApprox.map { r =>
      val e = exactQ((r.getString(0), r.getLong(2))).toDouble
      if (e == 0) 0.0 else math.abs(r.getLong(3) - e) / math.abs(e) * 100.0
    }.max
    val (tTop, topRows) = timed(
      Profiler.topValues(docs, Seq("lang", "source", "n_chars"), 10).collect())
    // Misra-Gries twin: capacity 4096 >= every distinct count here (lang 5,
    // source 20, n_chars 400) -> err must come back 0 (self-certified exact)
    val (tTopA, topARows) = timed(
      Profiler.topValuesApprox(docs, Seq("lang", "source", "n_chars"), 10,
        capacity = 4096).collect())
    val mgErr = topARows.map(_.getLong(4)).max

    println(f"""{"rows":$n,"cores":$cores,"columns":${docs.columns.length},""" +
      f""""approx_sec":$tApprox%.2f,"approx_rows_per_sec":${n / tApprox}%.0f,""" +
      f""""exact_sec":$tExact%.2f,"exact_rows_per_sec":${n / tExact}%.0f,""" +
      f""""exact_over_approx":${tExact / tApprox}%.2f,""" +
      f""""suggest_sec":$tSuggest%.2f,"suggested_rules":${sug.rules.size},""" +
      f""""worst_hll_err_pct":$worstErrPct%.2f,""" +
      f""""quantile_exact_sec":$tQExact%.2f,"quantile_approx_sec":$tQApprox%.2f,""" +
      f""""worst_gk_value_err_pct":$worstQErrPct%.4f,""" +
      f""""topk_sec":$tTop%.2f,"topk_rows":${topRows.length},""" +
      f""""topk_mg_sec":$tTopA%.2f,"topk_mg_err":$mgErr}""")
    spark.stop()
  }
}

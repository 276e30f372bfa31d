package graft

import org.apache.spark.sql.functions._

/** One-off probe: chunk+pack throughput on the north-rule table shape at
  * 16 M sequences (recorded in BASELINE.md). The packing shuffle carries the
  * full token payload (inherent: packing MOVES data), so this measures the
  * realistic cost of the shaping step, not a metadata pass.
  *
  * Env: SPARK_PROBE_ROWS (default 16M), SPARK_GRAFT_CPUS (default 16). */
object ProbePack {
  def main(args: Array[String]): Unit = {
    val rows = sys.env.getOrElse("SPARK_PROBE_ROWS", "16000000").toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt
    val spark = GraftSession.local(cpus, "probe-pack")
    spark.sparkContext.setLogLevel("WARN")
    val corpus = DataGen.sequences(spark, rows, maxLen = 64)
      .filter(col("doc_id").isNotNull).select("doc_id", "tokens")
      .localCheckpoint(true) // generation excluded from the timing
    val inTokens = corpus.agg(sum(size(col("tokens")))).head().getLong(0)
    val t0 = System.nanoTime()
    val packs = ops.Packing.packSequences(
      ops.Packing.chunkLongSequences(corpus, "tokens", "doc_id", context = 2048)
        .withColumn("cid", concat(col("doc_id"), lit("#"), col("chunk_idx"))),
      "tokens", "cid", context = 2048, buckets = 256, sep = Some(0))
    val stats = packs.agg(count(lit(1)), sum(col("n_tok")), max(col("n_tok")),
      sum(col("truncated").cast("long"))).head()
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"""{"probe":"chunk+pack 2048-token contexts","rows":$rows,""" +
      f""""in_tokens":$inTokens,"packs":${stats.getLong(0)},"pack_tokens":${stats.getLong(1)},""" +
      f""""max_pack":${stats.getInt(2)},"truncated":${stats.getLong(3)},""" +
      f""""sec":$sec%.1f,"seq_per_s":${rows / sec / 1e6}%.2f M}""")
    require(stats.getInt(2) <= 2048 && stats.getLong(3) == 0, "pack invariant broken")
    spark.stop()
  }
}

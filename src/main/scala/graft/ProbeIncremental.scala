package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental-dedup throughput probe (BASELINE.md evidence): a stored
  * corpus of N docs vs a daily batch of N/100 docs (20% verbatim
  * re-crawls, 10% paraphrased near-dups, 70% fresh), measuring
  *  - the one-time signature/band INDEX builds (amortized across ingests),
  *  - `dropExactDupsAgainst` (batch sigs broadcast over one store scan),
  *  - `dropNearDupsAgainst` (band candidates + verification that shingles
  *    only candidate store docs).
  * Prints one JSON line with wall seconds and store-rows/s per op.
  */
object ProbeIncremental {

  private def docText(seed: Column): Column = {
    // ~14-word deterministic prose-ish text per row
    val words = (0 until 14).map(k =>
      concat(lit("w"), pmod(abs(xxhash64(seed, lit(k))), lit(5000L)).cast("string")))
    concat_ws(" ", words: _*)
  }

  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_INC_ROWS", "4000000").toLong
    val cores = sys.env.getOrElse("SPARK_GRAFT_INC_CPUS", "16").toInt
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft-probe-incremental")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ops.Dedup

    val storePath = s"target/incprobe/store_$n.parquet"
    if (!new java.io.File(storePath + "/_SUCCESS").exists())
      spark.range(0, n, 1, cores * 4)
        .select(col("id").as("doc_id"), docText(col("id")).as("text"))
        .write.mode("overwrite").parquet(storePath)
    val store = spark.read.parquet(storePath)

    val b = n / 100
    val batch = spark.range(0, b, 1, cores)
      .select((col("id") + 10 * n).as("doc_id"),
        when(col("id") % 10 < 2, docText(col("id") * 7 % n)) // verbatim re-crawl
          .when(col("id") % 10 < 3,
            concat(docText(col("id") * 13 % n), lit(" w1 w2"))) // paraphrase
          .otherwise(docText(col("id") + 5 * n)) // fresh
          .as("text"))
      .localCheckpoint(true) // the batch is a fixed input, not part of the cost

    def timed(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime(); val out = f
      ((System.nanoTime() - t0) / 1e9, out)
    }

    val (tSig, _) = timed {
      Dedup.exactSignatures(store, "text", "doc_id")
        .write.mode("overwrite").parquet("target/incprobe/sigs.parquet"); 0L
    }
    val sigs = spark.read.parquet("target/incprobe/sigs.parquet")
    val (tExact, keptExact) = timed(
      Dedup.dropExactDupsAgainst(batch, "text", "doc_id", sigs).count())

    val (tBandBuild, _) = timed {
      Dedup.minhashBandTable(store, "text", "doc_id", numHashes = 64, bands = 16,
          shingleK = 2)
        .write.mode("overwrite").parquet("target/incprobe/bands.parquet"); 0L
    }
    val bandTable = spark.read.parquet("target/incprobe/bands.parquet")
    val (tNear, keptNear) = timed(
      Dedup.dropNearDupsAgainst(batch, "text", "doc_id", store, "text", "doc_id",
        bandTable, numHashes = 64, bands = 16, shingleK = 2, minJaccard = 0.6).count())

    println(f"""{"store_rows":$n,"batch_rows":$b,"cores":$cores,""" +
      f""""sig_build_sec":$tSig%.2f,"exact_sec":$tExact%.2f,"exact_store_rows_per_sec":${n / tExact}%.0f,"exact_kept":$keptExact,""" +
      f""""band_build_sec":$tBandBuild%.2f,"near_sec":$tNear%.2f,"near_store_rows_per_sec":${n / tNear}%.0f,"near_kept":$keptNear}""")
    spark.stop()
  }
}

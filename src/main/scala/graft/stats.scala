package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sketch-based corpus statistics (SURVEY.md §2.4 "drift / stats"): the
  * approximate companions to the exact drift histograms — all single-pass
  * two-phase aggregations whose state is a fixed-size sketch, so they cost
  * one scan regardless of corpus size.
  */
object Stats {

  /** Per-group profile of a numeric column: count, min/max, approx distinct,
    * approx quantiles. One hash aggregation. */
  def numericProfile(df: DataFrame, valueCol: String, groupCol: String,
      probs: Seq[Double] = Seq(0.25, 0.5, 0.75, 0.95, 0.99)): DataFrame =
    df.groupBy(col(groupCol)).agg(
      count(lit(1)).as("n"),
      min(col(valueCol)).as("min"),
      max(col(valueCol)).as("max"),
      avg(col(valueCol).cast(DoubleType)).as("mean"),
      approx_count_distinct(col(valueCol)).as("approx_distinct"),
      percentile_approx(col(valueCol).cast(DoubleType),
        array(probs.map(lit): _*), lit(10000)).as("quantiles"))

  /** Count-min sketch of a column per group (Spark's built-in CMS agg);
    * returns the binary sketch for driver-side point queries / merging —
    * the frequency-sketch path for token-distribution drift at 10^12 scale
    * (exploded exact counts would shuffle the full token stream). */
  def countMinSketch(df: DataFrame, valueCol: String, groupCol: String,
      eps: Double = 0.001, confidence: Double = 0.99, seed: Int = 42): DataFrame =
    df.groupBy(col(groupCol)).agg(
      count_min_sketch(col(valueCol), lit(eps), lit(confidence), lit(seed)).as("cms"))

  /** Exact token histogram at a deterministic sample rate: explode only rows
    * whose key-hash lands under `rate` — scales the shuffle by `rate` while
    * staying reproducible (no rand()). */
  def sampledTokenHistogram(df: DataFrame, tokensCol: String, keyCol: String,
      rate: Double, buckets: Int = 1000000): DataFrame = {
    val keep = pmod(xxhash64(col(keyCol)), lit(buckets.toLong)) < (rate * buckets).toLong
    df.filter(keep)
      .select(explode(col(tokensCol)).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("n"))
  }

  /** Top-k worst buckets by violation count — the operational "where to look
    * first" view over a bucket report (global TakeOrdered, no full sort). */
  def topKWorstBuckets(report: DataFrame, k: Int): DataFrame =
    report.orderBy(desc("fail"), col("bucket_id")).limit(k)
}

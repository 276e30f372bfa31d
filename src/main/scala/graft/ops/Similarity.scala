package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Baseline: brute-force cosine top-k (one narrow scan per query batch,
  * broadcast of the queries). Scale path: random-hyperplane LSH bucketing —
  * the shuffle is keyed by (plane-sign bucket), and only bucket-local pairs
  * are scored. Hyperplanes are DETERMINISTIC functions of (plane, dim) via
  * xxhash64, so results are reproducible at any parallelism with no
  * driver-side randomness.
  */
object Similarity {

  /** Dot product of two float-array columns, accumulated in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Brute-force top-k nearest (cosine) to ONE query vector. The query side
    * is a 1-row frame → broadcast nested-loop join stays trivially cheap;
    * the scan side is embarrassingly parallel; top-k via global sort-limit
    * (Spark's TakeOrderedAndProject — no full sort materialization). */
  def bruteForceTopK(df: DataFrame, vecCol: String, idCol: String,
      query: DataFrame, queryVecCol: String, k: Int): DataFrame = {
    val q = broadcast(query.select(col(queryVecCol).as("__qv")))
    df.join(q)
      .withColumn("cos", cosine(col(vecCol), col("__qv")))
      .orderBy(desc("cos"), col(idCol))
      .select(col(idCol), col("cos"))
      .limit(k)
  }

  /** All-pairs brute-force top-k per row within a blocking column — the
    * exact-verification stage. */
  def topKPerRow(df: DataFrame, vecCol: String, idCol: String, blockCol: String,
      k: Int): DataFrame = {
    val l = df.select(col(blockCol), col(idCol).as("id_a"), col(vecCol).as("v_a"))
    val r = df.select(col(blockCol), col(idCol).as("id_b"), col(vecCol).as("v_b"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("id_a").orderBy(desc("cos"), col("id_b"))
    l.join(r, Seq(blockCol)).filter(col("id_a") =!= col("id_b"))
      .withColumn("cos", cosine(col("v_a"), col("v_b")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("id_a"), col("id_b"), col("cos"), col("rn"))
  }

  /** Deterministic random-hyperplane component: plane p, dimension d →
    * pseudo-gaussian-ish weight in {-2,-1,0,1,2} from xxhash64. Coarse
    * weights are fine for LSH sign buckets; no driver-side randomness. */
  private def planeWeight(p: Int, d: Column): Column =
    (pmod(xxhash64(lit(p), d), lit(5)) - 2).cast(DoubleType)

  /** Sign-LSH bucket id over `planes` hyperplanes (one long, bit per plane).
    * `planes` is a compile-time constant → the per-plane dot products unroll
    * into codegen'd expressions. */
  def lshBucket(vecCol: Column, planes: Int): Column =
    (0 until planes).map { p =>
      val d = aggregate(
        zip_with(vecCol, sequence(lit(0), size(vecCol) - 1),
          (x, i) => x.cast(DoubleType) * planeWeight(p, i)),
        lit(0.0), (acc, x) => acc + x)
      when(d > 0, lit(1L << p)).otherwise(0L)
    }.reduce((a, b) => a.bitwiseOR(b))

  /** IVF-style ANN: assign every vector to its LSH bucket, score only
    * bucket-local pairs, keep cosine ≥ threshold. Multi-probe: vectors are
    * also assigned to buckets at hamming distance 1 on the lowest
    * `probeBits` bits to cut boundary misses. */
  def cosineLshPairs(df: DataFrame, vecCol: String, idCol: String,
      threshold: Double = 0.9, planes: Int = 16, probeBits: Int = 2,
      maxBucket: Int = 4096): DataFrame = {
    val base = df.select(col(idCol).as("id"), col(vecCol).as("v"),
      lshBucket(col(vecCol), planes).as("b0"))
    // probe buckets: the bucket itself + flips of the lowest probeBits bits
    val probes = col("b0") +: (0 until probeBits).map(i => col("b0").bitwiseXOR(lit(1L << i)))
    val probed = base.select(col("id"), col("v"),
      explode(array_distinct(array(probes: _*))).as("bucket"))
    val bucketed = probed.withColumn("bucket_n", count(lit(1)).over(
      org.apache.spark.sql.expressions.Window.partitionBy("bucket")))
      .filter(col("bucket_n") <= maxBucket)
    val l = bucketed.select(col("bucket"), col("id").as("id_a"), col("v").as("v_a"))
    val r = bucketed.select(col("bucket"), col("id").as("id_b"), col("v").as("v_b"))
    l.join(r, Seq("bucket")).filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("cos", cosine(col("v_a"), col("v_b")))
      .filter(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
  }

  /** Integer-quantized dot product (floor(x*scale) per element) — exact across
    * engines, used by the DuckDB-oracle parity query. */
  def quantizedDot(a: Column, b: Column, scale: Int = 1000): Column = {
    val qa = transform(a, x => floor(x.cast(DoubleType) * scale).cast(LongType))
    val qb = transform(b, x => floor(x.cast(DoubleType) * scale).cast(LongType))
    aggregate(zip_with(qa, qb, (x, y) => x * y), lit(0L), (acc, x) => acc + x)
  }
}

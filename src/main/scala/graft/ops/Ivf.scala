package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** IVF (inverted-file) approximate nearest neighbor — the index-backed scale
  * path next to [[Similarity.cosineLshPairs]]: a coarse k-means quantizer
  * splits the corpus into `nlist` lists; a query probes only its `nprobe`
  * nearest lists, scanning ~nprobe/nlist of the data instead of all of it.
  *
  * Scale shape:
  *  - TRAIN is a few linear passes: assignment is one narrow projection
  *    (centroids ride inside a custom expression, no join); the centroid
  *    update is a (list, dim)-keyed aggregation — map-side combinable, at
  *    most nlist×dim result rows regardless of corpus size. Sums use
  *    FIXED-POINT longs, so trained centroids are bit-identical at any
  *    parallelism (double sums would depend on partition order).
  *  - INDEX is one projection; persist it partitioned/bucketed by `list_id`
  *    so a probe becomes partition pruning at the source.
  *  - SEARCH broadcasts nothing and shuffles nothing: filter on
  *    `list_id ∈ probes` (pushdown-able) + TakeOrderedAndProject top-k.
  *
  * Determinism: init picks the `nlist` rows with smallest `xxhash64(vec)` —
  * no driver randomness; Lloyd iterations are a fixed count.
  */
object Ivf {

  /** Trained coarse quantizer: `centroids(i)` is list i's center. */
  final case class Model(centroids: Array[Array[Double]]) {
    def nlist: Int = centroids.length
    /** nprobe nearest list ids to a query vector (driver-side, tiny). */
    def probesFor(query: Array[Double], nprobe: Int): Seq[Int] =
      centroids.zipWithIndex.map { case (c, i) =>
        var d = 0.0
        var j = 0
        val n = math.min(c.length, query.length)
        while (j < n) { val t = query(j) - c(j); d += t * t; j += 1 }
        (d, i)
      }.sortBy(x => (x._1, x._2)).take(math.max(1, nprobe)).map(_._2).toSeq
  }

  private val FpScale = 1L << 20 // fixed-point scale for parallelism-independent sums

  /** Assignment column for a vector column given trained centroids. */
  def listIdOf(vec: Column, model: Model): Column =
    graft.functions.VecFunctions.nearest_centroid(vec, model.centroids)

  /** Train `nlist` centroids with `iters` Lloyd steps over a DETERMINISTIC
    * content-hash sample of ≤ `maxTrainRows` vectors — quantizer quality
    * needs a representative sample, not the corpus, and each Lloyd step
    * explodes its input ×dim (full-corpus training at 10^12 rows would pay a
    * 6e13-row explode per iteration for no accuracy gain). The sample gate is
    * a pure function of vector content, so the trained model is identical at
    * any parallelism AND stable across reruns. Input vectors should be
    * bounded (|v| ≲ 1e3) — fixed-point sums at 2^20 scale hold ~9e12 rows
    * per (list, dim) cell before long overflow. */
  def train(df: DataFrame, vecCol: String, nlist: Int, iters: Int = 3,
      maxTrainRows: Long = 200000L): Model = {
    require(nlist > 0 && iters >= 0 && maxTrainRows > 0,
      "nlist > 0, iters >= 0, maxTrainRows > 0")
    val vecsAll = df.select(col(vecCol).as("v")).filter(col("v").isNotNull && size(col("v")) > 0)
    val total = vecsAll.count()
    val vecs0 =
      if (total <= maxTrainRows) vecsAll
      else {
        // 1e-9 gate granularity: the fraction floor stays honest up to
        // ~maxTrainRows·1e9 corpus rows (a 1e-6 denominator would 5x-overshoot
        // the cap already at 10^12 rows)
        val denom = 1000000000L
        val cut = math.max(1L, math.round(maxTrainRows.toDouble / total * denom))
        vecsAll.filter(pmod(xxhash64(col("v")), lit(denom)) < cut)
      }
    val vecs = vecs0.persist() // every Lloyd step re-reads the (small) sample
    try {
      // deterministic init: hash-sample ~32·nlist rows to the driver (tiny),
      // then farthest-point selection (k-means++ without RNG) — smallest-hash
      // alone could seed every centroid inside one dense cluster
      val sample: Array[Array[Double]] = vecs
        .withColumn("__h", xxhash64(col("v")))
        .orderBy(col("__h"), col("v").cast(StringType)) // total order even on hash ties
        .limit(math.max(nlist * 32, 256))
        .collect()
        .map(_.getSeq[Any](0).map(x => x.asInstanceOf[Number].doubleValue()).toArray)
      if (sample.isEmpty) return Model(Array(Array(0.0)))
      def d2(a: Array[Double], b: Array[Double]): Double = {
        var s = 0.0; var i = 0; val n = math.min(a.length, b.length)
        while (i < n) { val t = a(i) - b(i); s += t * t; i += 1 }
        s
      }
      val seeds = scala.collection.mutable.ArrayBuffer(sample.head)
      while (seeds.length < math.min(nlist, sample.length)) {
        // farthest point from the chosen set; ties resolve to the lowest index
        val next = sample.iterator.zipWithIndex
          .map { case (p, i) => (seeds.iterator.map(s => d2(p, s)).min, -i) }
          .zipWithIndex.maxBy { case ((d, negI), _) => (d, negI) }._2
        seeds += sample(next)
      }
      var centroids: Array[Array[Double]] = seeds.toArray
      var it = 0
      while (it < iters) {
        val model = Model(centroids)
        // (list, dim)-keyed fixed-point sums: two-phase agg, ≤ nlist×dim rows out
        val cells = vecs
          .select(listIdOf(col("v"), model).as("list_id"),
            posexplode(col("v")).as(Seq("dim", "x")))
          .groupBy(col("list_id"), col("dim"))
          .agg(sum(round(col("x").cast(DoubleType) * FpScale).cast(LongType)).as("s"),
            count(lit(1)).as("n"))
          .collect()
        val next = centroids.map(_.clone())
        cells.foreach { r =>
          val l = r.getInt(0); val d = r.getInt(1)
          if (l < next.length && d < next(l).length)
            next(l)(d) = r.getLong(2).toDouble / FpScale / r.getLong(3)
        }
        centroids = next // lists with no members keep their previous center
        it += 1
      }
      Model(centroids)
    } finally vecs.unpersist() // also covers the empty-sample early return and throws
  }

  /** The corpus with its IVF list assignment attached — persist this
    * partitioned by `list_id` so probes prune at the source. */
  def index(df: DataFrame, vecCol: String, model: Model): DataFrame =
    df.withColumn("list_id", listIdOf(col(vecCol), model))

  /** Top-k cosine neighbors of `query` scanning only `nprobe` lists of an
    * indexed corpus (output of [[index]]). One driver-side query — for the
    * production multi-query form see [[searchTopKBatch]]. */
  def searchTopK(indexed: DataFrame, vecCol: String, idCol: String,
      model: Model, query: Array[Double], k: Int, nprobe: Int): DataFrame = {
    val probes = model.probesFor(query, nprobe)
    val qLit = typedlit(query)
    indexed
      .filter(col("list_id").isin(probes: _*))
      .withColumn("cos", Similarity.cosine(col(vecCol), qLit))
      .orderBy(desc("cos"), col(idCol))
      .select(col(idCol), col("cos"), col("list_id"))
      .limit(k)
  }

  /** BATCHED top-k search: every query in `queries` gets its `k` nearest
    * corpus rows, probing only its `nprobe` closest lists — the production
    * ANN form (a per-query [[searchTopK]] loop would launch one job per
    * query and rescan the corpus each time).
    *
    * Scale shape:
    *  - per-query probes come from ONE narrow expression over the (small)
    *    query frame ([[graft.functions.NearestCentroids]]) — no driver
    *    round-trip per query, no join against a centroid table;
    *  - the UNION of probed lists (bounded by `nlist`, not by query count)
    *    is collected once and applied to the corpus as a STATIC `isin`
    *    filter — partition-PRUNABLE when the indexed corpus is stored
    *    `partitionBy("list_id")`, so unprobed lists are never read at all;
    *  - the (query_id, list_id, qv) explode is broadcast to the filtered
    *    corpus — the corpus never shuffles; each corpus row meets exactly
    *    the queries probing its list;
    *  - per-query top-k is one window over rows already cut down by the
    *    probe filter (partial top-k per partition would only matter when
    *    k × queries approaches the probed-row count).
    *
    * `queries` should be small relative to the corpus (it is broadcast and
    * evaluated twice); `score` defaults to cosine — pass
    * `Similarity.quantizedDot` for cross-engine-exact integer scores.
    * Returns (query_id, idCol, score, list_id, rn) with rn = 1..k by
    * (score desc, idCol). */
  def searchTopKBatch(indexed: DataFrame, vecCol: String, idCol: String,
      model: Model, queries: DataFrame, queryVecCol: String, queryIdCol: String,
      k: Int, nprobe: Int,
      score: (Column, Column) => Column = Similarity.cosine): DataFrame = {
    require(k >= 1 && nprobe >= 1, "k >= 1, nprobe >= 1")
    // output/internal names must not collide with the corpus id/vec columns
    val reserved = Set("query_id", "__qv", "score", "rn")
    require(!reserved.contains(idCol) && !reserved.contains(vecCol),
      s"idCol/vecCol must not be one of ${reserved.mkString(",")}")
    val qprobes = queries.select(
      col(queryIdCol).as("query_id"),
      col(queryVecCol).as("__qv"),
      explode(graft.functions.VecFunctions.nearest_centroids(
        col(queryVecCol), model.centroids, nprobe)).as("list_id"))
    // corpus narrowed to exactly the join inputs: extra corpus columns can't
    // collide with the query/score names, and the scan prunes to 3 columns
    val narrow = indexed.select(col("list_id"), col(idCol), col(vecCol))
    def searched(corpus: DataFrame): DataFrame = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("query_id").orderBy(desc("score"), col(idCol))
      corpus.join(broadcast(qprobes), Seq("list_id"))
        .withColumn("score", score(col(vecCol), col("__qv")))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= k)
        .select(col("query_id"), col(idCol), col("score"), col("list_id"), col("rn"))
    }
    // union of probed lists ≤ nlist ints — a driver collect bounded by the
    // MODEL size (not the data), buying a static pushdown filter
    val probed = qprobes.select("list_id").distinct().collect().map(_.getInt(0)).sorted
    if (probed.isEmpty) // no queries: empty result, SAME schema (incl. the
      searched(narrow.limit(0)) // score fn's real type) as a non-empty batch
    else searched(narrow.filter(col("list_id").isin(probed.toSeq.map(Int.box): _*)))
  }
}

package graft

import org.apache.spark.sql.functions._

/** One-off probes for the round-3 scale-frontier features, recorded in
  * BASELINE.md:
  *  - connected components on a multi-million-edge graph that MIXES long
  *    chains (the case label propagation could not finish) with dense
  *    near-dup-style cliques;
  *  - batched IVF search throughput over a 1 M-vector indexed corpus.
  *
  * Env: SPARK_GRAFT_CPUS (default 16).
  */
object ProbeGraph {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt
    val spark = GraftSession.local(cpus, "probe-graph")
    spark.sparkContext.setLogLevel("WARN")

    def timed[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"""{"probe":"$name","sec":${(System.nanoTime() - t0) / 1e9}%.1f}""")
      r
    }

    // --- CC: 2 M vertices in 2k chains of length 1000 (1.998 M edges) +
    // 2 M vertices in 100k STARS of 20 (hub + 19 spokes, 1.9 M edges) —
    // chains stress round count, stars stress per-round fan-in ---
    val chains = spark.range(0, 2000L * 1000)
      .filter(pmod(col("id"), lit(1000)) =!= 999)
      .select(col("id").as("id_a"), (col("id") + 1).as("id_b"))
    val base = 10000000L
    val cliques = spark.range(0, 100000L * 20)
      .filter(pmod(col("id"), lit(20)) =!= 0)
      .select((lit(base) + col("id")).as("id_a"),
        (lit(base) + col("id") - pmod(col("id"), lit(20))).as("id_b"))
    val pairs = chains.union(cliques).localCheckpoint(true)
    val nEdges = pairs.count()
    val labels = timed(s"connectedComponents: $nEdges edges (2k x 1000-chains + 100k x 20-stars)") {
      val l = graft.ops.Dedup.connectedComponents(pairs, maxIter = 20,
        failOnNonConvergence = true)
      val nComponents = l.select("component").distinct().count()
      val nVertices = l.count()
      println(s"""{"components":$nComponents,"vertices":$nVertices}""")
      require(nComponents == 2000 + 100000, s"wrong component count: $nComponents")
      l
    }

    // --- batched IVF: 1 M vectors, dim 16, nlist 64; 1000 queries, nprobe 4 ---
    val dim = 16
    val vecs = spark.range(0, 1000000)
      .select(col("id").as("vec_id"),
        transform(sequence(lit(0), lit(dim - 1)),
          i => (pmod(xxhash64(col("id"), i), lit(2000)).cast("float") / 1000f - 1f))
          .as("embedding"))
      .localCheckpoint(true)
    val model = timed("IVF train (nlist=64, 1M corpus, hash-sampled)") {
      graft.ops.Ivf.train(vecs, "embedding", nlist = 64, iters = 3)
    }
    val indexed = graft.ops.Ivf.index(vecs, "embedding", model).localCheckpoint(true)
    val queries = vecs.filter(col("vec_id") < 1000)
      .select(col("vec_id").as("qid"), col("embedding"))
    timed("batched IVF search: 1000 queries, k=10, nprobe=4 of 64 lists") {
      val n = graft.ops.Ivf.searchTopKBatch(indexed, "embedding", "vec_id", model,
        queries, "embedding", "qid", k = 10, nprobe = 4).count()
      println(s"""{"hits":$n}""")
      require(n == 10000, s"expected 10k hits, got $n")
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Round-6 probe: where does the near-dup pipeline wall go?
  * Breaks d_neardup_drop into stages, instruments the connected-components
  * loop per round, and A/B-tests convergence-detection variants. */
object ProbeCcR06 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.local(cpus.toInt, "graft-probe-cc")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe-cc] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s"); r
    }
    spark.range(100000).selectExpr("sum(id)").collect()

    def freeLocal(df: DataFrame): Unit =
      df.queryExecution.analyzed.foreach {
        case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.unpersist(false)
        case _ => ()
      }
    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
      val mins = sym.groupBy("src").agg(min("dst").as("__mn"))
        .select(col("src"), least(col("__mn"), col("src")).as("__m"))
      sym.join(mins, Seq("src"))
        .filter(col("dst") > col("src"))
        .select(col("dst").as("src"), col("__m").as("dst"))
        .distinct()
    }
    def smallStar(e: DataFrame): DataFrame = {
      val orient = e.select(
        greatest(col("src"), col("dst")).as("src"),
        least(col("src"), col("dst")).as("dst"))
        .filter(col("src") =!= col("dst"))
      val mins = orient.groupBy("src").agg(min("dst").as("__m"))
      val fromNbrs = orient.join(mins, Seq("src"))
        .filter(col("dst") =!= col("__m"))
        .select(col("dst").as("src"), col("__m").as("dst"))
      val fromSelf = mins.select(col("src"), col("__m").as("dst"))
      fromNbrs.union(fromSelf).distinct()
    }

    /** Instrumented clone of the ROUND-5 connectedComponents (checksum
      * convergence, eager vertices) — the A/B baseline. */
    def ccCurrent(pairs: DataFrame): DataFrame = {
      val vertices = t("  vertices checkpoint") {
        pairs.select(col("id_a").as("id"))
          .union(pairs.select(col("id_b").as("id"))).distinct().localCheckpoint(true)
      }
      def checksum(e: DataFrame): (Long, Long) = {
        val r = e.agg(count(lit(1)),
          coalesce(bit_xor(xxhash64(col("src"), col("dst"))), lit(0L))).head()
        (r.getLong(0), r.getLong(1))
      }
      var edges = t("  init edges checkpoint") {
        pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
          .filter(col("src") =!= col("dst")).distinct().localCheckpoint(true)
      }
      var sum = t("  init checksum")(checksum(edges))
      var iter = 0
      var converged = false
      while (iter < 20 && !converged && sum._1 > 0) {
        val next = t(s"  round $iter large+small+ckpt") {
          smallStar(largeStar(edges)).localCheckpoint(true)
        }
        val nextSum = t(s"  round $iter checksum")(checksum(next))
        println(s"[probe-cc]   round $iter edges: ${sum._1} -> ${nextSum._1}")
        freeLocal(edges)
        edges = next
        converged = nextSum == sum
        sum = nextSum
        iter += 1
      }
      val labels = t("  labels checkpoint") {
        val rootOf = edges.groupBy(col("src").as("id")).agg(min("dst").as("__c"))
        vertices.join(rootOf, Seq("id"), "left")
          .select(col("id"), coalesce(col("__c"), col("id")).as("component"))
          .localCheckpoint(true)
      }
      freeLocal(edges); freeLocal(vertices)
      labels
    }

    /** largeStar WITHOUT the intermediate distinct: the round still ends in
      * smallStar's final distinct, so the per-round edge SET (and with it
      * round count, convergence, labels) is unchanged — the A/B question is
      * pure cost: one exchange + stage barrier saved per round vs duplicate
      * (dst, min) rows riding smallStar's groupBy/join. */
    def largeStarNoDistinct(e: DataFrame): DataFrame = {
      val sym = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
      val mins = sym.groupBy("src").agg(min("dst").as("__mn"))
        .select(col("src"), least(col("__mn"), col("src")).as("__m"))
      sym.join(mins, Seq("src"))
        .filter(col("dst") > col("src"))
        .select(col("dst").as("src"), col("__m").as("dst"))
    }

    /** The ROUND-6 shipped form minus largeStar's intermediate distinct. */
    def ccVariant2(pairs: DataFrame): DataFrame = {
      def isStarForest(e: DataFrame): Boolean = {
        val bad = e.select(col("src").as("n"), lit(0).as("role"))
          .union(e.select(col("dst").as("n"), lit(1).as("role")))
          .groupBy("n").agg(min("role").as("mn"), max("role").as("mx"),
            sum(lit(1) - col("role")).as("fanout"))
          .filter((col("mn") === 0 && col("mx") === 1) || col("fanout") > 1)
        bad.isEmpty
      }
      val vertices = pairs.select(col("id_a").as("id"))
        .union(pairs.select(col("id_b").as("id"))).distinct()
      var edges = t("  init edges checkpoint") {
        pairs.select(
            greatest(col("id_a"), col("id_b")).as("src"),
            least(col("id_a"), col("id_b")).as("dst"))
          .filter(col("src") =!= col("dst")).distinct().localCheckpoint(true)
      }
      var converged = t("  init star test")(isStarForest(edges))
      var iter = 0
      while (iter < 20 && !converged) {
        val next = t(s"  round $iter large+small+ckpt") {
          smallStar(largeStarNoDistinct(edges)).localCheckpoint(true)
        }
        converged = t(s"  round $iter star test")(isStarForest(next))
        freeLocal(edges)
        edges = next
        iter += 1
      }
      val labels = t("  labels checkpoint") {
        val rootOf = edges.groupBy(col("src").as("id")).agg(min("dst").as("__c"))
        vertices.join(rootOf, Seq("id"), "left")
          .select(col("id"), coalesce(col("__c"), col("id")).as("component"))
          .localCheckpoint(true)
      }
      freeLocal(edges)
      labels
    }

    /** The ROUND-6 shipped form: star-forest convergence detection (no
      * wasted confirming round), lazy vertices (no eager checkpoint). */
    def ccVariant(pairs: DataFrame): DataFrame = {
      val vertices = pairs.select(col("id_a").as("id"))
        .union(pairs.select(col("id_b").as("id"))).distinct()
      def isStarForest(e: DataFrame): Boolean = {
        // star forest (with src>dst orientation): no node is both a child
        // (appears as src) and a root (appears as dst), and no child has
        // two distinct roots. One groupBy over the role-tagged endpoints.
        val bad = e.select(col("src").as("n"), lit(0).as("role"))
          .union(e.select(col("dst").as("n"), lit(1).as("role")))
          .groupBy("n").agg(min("role").as("mn"), max("role").as("mx"),
            sum(lit(1) - col("role")).as("fanout"))
          .filter((col("mn") === 0 && col("mx") === 1) || col("fanout") > 1)
        bad.isEmpty
      }
      var edges = t("  init edges checkpoint") {
        pairs.select(
            greatest(col("id_a"), col("id_b")).as("src"),
            least(col("id_a"), col("id_b")).as("dst"))
          .filter(col("src") =!= col("dst")).distinct().localCheckpoint(true)
      }
      var converged = t("  init star test")(isStarForest(edges))
      var iter = 0
      while (iter < 20 && !converged) {
        val next = t(s"  round $iter large+small+ckpt") {
          smallStar(largeStar(edges)).localCheckpoint(true)
        }
        converged = t(s"  round $iter star test")(isStarForest(next))
        freeLocal(edges)
        edges = next
        iter += 1
      }
      val labels = t("  labels checkpoint") {
        val rootOf = edges.groupBy(col("src").as("id")).agg(min("dst").as("__c"))
        vertices.join(rootOf, Seq("id"), "left")
          .select(col("id"), coalesce(col("__c"), col("id")).as("component"))
          .localCheckpoint(true)
      }
      freeLocal(edges)
      labels
    }

    val reps = math.max(1, sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "2").toInt)
    (1 to reps).foreach { rep =>
      println(s"--- rep $rep ---")
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        .filter(col("doc_id") < 2000)
      val (candidates, releaseLsh) = ops.Dedup.minhashLshCached(docs, "text", "doc_id",
        numHashes = 64, bands = 16, shingleK = 1, threshold = 0.7, maxBucket = 500)
      val verified = t("lsh+verify") {
        val v = ops.Dedup.ngramJaccardFor(docs, "text", "doc_id", candidates, 1, 0.7)
          .select("id_a", "id_b").persist()
        println(s"[probe-cc]   verified pairs: ${v.count()}")
        v
      }
      val cc1 = t("cc ROUND5 total") { ccCurrent(verified) }
      val cc2 = t("cc ROUND6 total") { ccVariant(verified) }
      val cc3 = t("cc ROUND6-nodistinct total") { ccVariant2(verified) }
      val diff = cc1.as("a").join(cc2.as("b"), Seq("id"))
        .filter(col("a.component") =!= col("b.component")).count()
      val diff3 = cc2.as("a").join(cc3.as("b"), Seq("id"))
        .filter(col("a.component") =!= col("b.component")).count()
      val c1 = cc1.count(); val c2 = cc2.count(); val c3 = cc3.count()
      println(s"[probe-cc] labels: round5=$c1 round6=$c2 nodistinct=$c3 " +
        s"mismatches=$diff/$diff3  " +
        (if (diff == 0 && diff3 == 0 && c1 == c2 && c2 == c3) "IDENTICAL" else "MISMATCH!"))
      freeLocal(cc1); freeLocal(cc2); freeLocal(cc3)
      verified.unpersist(); releaseLsh()
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Reconciliation-family throughput probe (BASELINE.md evidence): an
  * N-row snapshot vs a deterministic mutation of it (0.1% keys dropped,
  * 0.1% duplicated, 0.1% content-edited, 0.1% invented), measuring
  *  - `keyParity` (per-key counts + one full-outer join),
  *  - `rowParity` (per-(key, content-fingerprint) counts, 4 columns),
  *  - `columnDiff` (all-columns-in-one-pass fingerprint sums + equi-join),
  *  - `conservation` over a 3-way split of the snapshot.
  * Prints one JSON line with wall seconds and input-rows/s per op (input =
  * both sides, since each op scans both).
  */
object ProbeReconcile {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_RECON_ROWS", "16000000").toLong
    val cores = sys.env.getOrElse("SPARK_GRAFT_RECON_CPUS", "16").toInt
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft-probe-reconcile")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ops.Reconcile

    val path = s"target/reconprobe/snap_$n.parquet"
    if (!new java.io.File(path + "/_SUCCESS").exists())
      spark.range(0, n, 1, cores * 4)
        .select(col("id").as("doc_id"),
          concat(lit("t"), pmod(abs(xxhash64(col("id"), lit(1))), lit(100000L)).cast("string")).as("text"),
          pmod(abs(xxhash64(col("id"), lit(2))), lit(20L)).cast("string").as("source"),
          pmod(abs(xxhash64(col("id"), lit(3))), lit(8192L)).as("n_chars"))
        .write.mode("overwrite").parquet(path)
    val left = spark.read.parquet(path)
    val right = left
      .filter(col("doc_id") % 1000 =!= 0) // dropped
      .withColumn("text", when(col("doc_id") % 1000 === 1,
        concat(col("text"), lit("x"))).otherwise(col("text"))) // edited
      .unionByName(left.filter(col("doc_id") % 1000 === 2)) // duplicated
      .unionByName(left.filter(col("doc_id") % 1000 === 3)
        .withColumn("doc_id", col("doc_id") + n * 10)) // invented

    def time(label: String)(body: => Long): (String, Double, Long) = {
      val t0 = System.nanoTime()
      val out = body
      (label, (System.nanoTime() - t0) / 1e9, out)
    }

    // warmup: JIT + scan-path init
    left.limit(1000).count(); right.limit(1000).count()

    val total = 2L * n // both sides scanned by every op
    val results = Seq(
      time("keyParity") { Reconcile.keyParity(left, right, "doc_id").count() },
      time("rowParity") { Reconcile.rowParity(left, right, "doc_id").count() },
      time("columnDiff") { Reconcile.columnDiff(left, right, "doc_id").count() },
      time("conservation") {
        val a = left.filter(col("doc_id") % 3 === 0)
        val b = left.filter(col("doc_id") % 3 === 1)
        val c = left.filter(col("doc_id") % 3 === 2)
        Reconcile.conservation(left, "doc_id", Seq(a, b, c)).count()
      })
    val fields = results.map { case (l, s, rows) =>
      f""""$l":{"sec":$s%.2f,"rows_per_s":${(total / s).toLong},"out_rows":$rows}"""
    }
    println(s"""{"rows_per_side":$n,${fields.mkString(",")}}""")
    spark.stop()
  }
}

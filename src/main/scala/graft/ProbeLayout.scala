package graft

import org.apache.spark.sql.functions._

/** One-off probe: token-layout kernel throughput at training-shard scale —
  * the pad-boundary checks (ArrayCountEq / ArrayPadSuffixOk /
  * ArrayLastNotEq) over fixed-width padded batches and the packed-segment
  * scan (ArrayBadSegmentCount) over EOS-delimited packs. Every kernel is a
  * zero-shuffle single-pass projection, so throughput should track token
  * scan speed; the four-LONGs-per-source aggregate is the only exchange.
  * Recorded in BASELINE.md.
  *
  * Env: SPARK_PROBE_ROWS (default 4M), SPARK_PROBE_WIDTH (default 512
  * tokens/row), SPARK_GRAFT_CPUS (default 16). */
object ProbeLayout {
  def main(args: Array[String]): Unit = {
    val rows = sys.env.getOrElse("SPARK_PROBE_ROWS", "4000000").toLong
    val width = sys.env.getOrElse("SPARK_PROBE_WIDTH", "512").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt
    val spark = GraftSession.local(cpus, "probe-layout")
    spark.sparkContext.setLogLevel("WARN")
    val padded = DataGen.paddedSequences(spark, rows, maxLen = width)
      .localCheckpoint(true) // generation excluded from timings
    val packed = DataGen.packedSequences(spark, rows)
      .localCheckpoint(true)
    val packTokens = packed.agg(sum(size(col("tokens")))).head().getLong(0)
    def timed(name: String, nRows: Long, nTokens: Long)(body: => String): Unit = {
      val t0 = System.nanoTime()
      val detail = body
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"probe":"$name","rows":$nRows,"tokens":$nTokens,"sec":$sec%.1f,""" +
        f""""mrows_per_s":${nRows / sec / 1e6}%.2f,"gtok_per_s":${nTokens / sec / 1e9}%.2f,$detail}""")
    }
    timed("pad-layout x3 kernels", rows, rows * width) {
      val suffixOk = PadSuffixOnly("tokens", DataGen.PAD).pred
      val endsOk = EndsWithToken("tokens", DataGen.EOS, DataGen.PAD).pred
      val lenOk = PadAwareLength("tokens", "n_tok", DataGen.PAD).pred
      val r = padded.agg(
        sum((!suffixOk).cast("long")), sum((!endsOk).cast("long")),
        sum((!lenOk).cast("long")), count(lit(1))).head()
      require(r.getLong(3) == rows)
      s""""bad_suffix":${r.getLong(0)},"bad_eos":${r.getLong(1)},"bad_len":${r.getLong(2)}"""
    }
    timed("token-sketch", rows, rows * width) {
      // array-consuming MG summary: tokens never leave their map task
      val prof = Drift.tokenUnigramProfile(padded, "tokens", "source", 1024)
        .select(col("source"), size(col("sketch.items")).as("k"), col("sketch.err"))
        .collect()
      s""""groups":${prof.length},"max_err":${prof.map(_.getLong(2)).max}"""
    }
    timed("token-explode-exact", rows, rows * width) {
      // the formulation the sketch replaces: explode + exact counts (partial
      // agg collapses map-side, but every token row still enters an agg)
      val r = padded.select(col("source"), explode(col("tokens")).as("t"))
        .groupBy(col("source"), col("t")).count()
        .groupBy(col("source")).agg(count(lit(1)).as("distinct"), max("count"))
        .collect()
      s""""groups":${r.length},"max_distinct":${r.map(_.getLong(1)).max}"""
    }
    timed("segment-scan", rows, packTokens) {
      val bad = graft.functions.VecFunctions.array_bad_segments(
        col("tokens"), DataGen.EOS, 1L, DataGen.MAX_SEG)
      val r = packed.agg(sum((bad > 0).cast("long")), count(lit(1))).head()
      require(r.getLong(1) == rows)
      s""""bad_rows":${r.getLong(0)}"""
    }
    spark.stop()
  }
}

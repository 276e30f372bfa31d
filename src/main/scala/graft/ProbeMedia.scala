package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Media-decode throughput probe (BASELINE.md evidence for the multimodal
  * scale claims): materialize a corpus of REAL encoded payloads once, then
  * measure
  *  - header METADATA decode ([[graft.ops.Multimodal.decodeMeta]] — the
  *    scan-speed path: a few hundred byte reads per payload), and
  *  - full PIXEL decode + feature extraction ([[decodeFeatures]] — the
  *    expensive stage reserved for rows that survive filtering),
  * plus the WAV header path. Prints one JSON line with wall seconds,
  * payloads/s, and MB/s over the encoded bytes.
  */
object ProbeMedia {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_MEDIA_ROWS", "200000").toLong
    val cores = sys.env.getOrElse("SPARK_GRAFT_MEDIA_CPUS", "16").toInt
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft-probe-media")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val imgPath = s"target/mediaprobe/images_$n.parquet"
    val wavPath = s"target/mediaprobe/audio_$n.parquet"
    if (!new java.io.File(imgPath + "/_SUCCESS").exists())
      MediaGen.mediaTable(spark, n, parts = cores * 4)
        .toDF().select("doc_id", "payload")
        .write.mode("overwrite").parquet(imgPath)
    if (!new java.io.File(wavPath + "/_SUCCESS").exists())
      MediaGen.audioTable(spark, n, parts = cores * 4)
        .toDF().select("doc_id", "payload")
        .write.mode("overwrite").parquet(wavPath)
    val imgs = spark.read.parquet(imgPath)
    val wavs = spark.read.parquet(wavPath)
    val imgBytes = imgs.agg(sum(octet_length(col("payload")))).head().getLong(0)
    val wavBytes = wavs.agg(sum(octet_length(col("payload")))).head().getLong(0)

    import graft.ops.Multimodal
    def timed(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val out = f
      ((System.nanoTime() - t0) / 1e9, out)
    }
    // warm
    Multimodal.decodeMeta(spark, imgs.limit(10000)).filter(col("ok")).count()
    val (tMeta, okMeta) = timed(
      Multimodal.decodeMeta(spark, imgs).filter(col("ok")).count())
    val (tPix, okPix) = timed(Multimodal.decodeFeatures(spark, imgs).count())
    val (tWav, okWav) = timed(
      Multimodal.decodeAudioMeta(spark, wavs).filter(col("ok")).count())
    val mb = 1024.0 * 1024.0
    println(f"""{"rows":$n,"cores":$cores,"img_mb":${imgBytes / mb}%.1f,"wav_mb":${wavBytes / mb}%.1f,""" +
      f""""meta_sec":$tMeta%.2f,"meta_rows_per_sec":${n / tMeta}%.0f,"meta_mb_per_sec":${imgBytes / mb / tMeta}%.1f,"meta_ok":$okMeta,""" +
      f""""pixel_sec":$tPix%.2f,"pixel_rows_per_sec":${n / tPix}%.0f,"pixel_mb_per_sec":${imgBytes / mb / tPix}%.1f,"pixel_ok":$okPix,""" +
      f""""wav_sec":$tWav%.2f,"wav_rows_per_sec":${n / tWav}%.0f,"wav_ok":$okWav}""")
    spark.stop()
  }
}

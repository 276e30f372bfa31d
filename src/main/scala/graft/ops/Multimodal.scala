package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata structs; decode / feature-extract
  * stages run per-partition so a real decoder (JNI/FFI or columnar UDF)
  * drops in without changing the plan shape.
  *
  * The decode step itself is STUBBED (deterministic fake — no image/audio
  * libraries exist in this container); everything around it — schema,
  * batching, partition sizing, null/corrupt handling — is real and tested.
  */
object Multimodal {

  /** Typed metadata carried next to every payload. */
  val mediaMetaType: StructType = StructType(Seq(
    StructField("media_type", StringType), // "image" | "audio" | "video"
    StructField("format", StringType), // "png", "wav", …
    StructField("n_bytes", IntegerType)))

  final case class MediaFeatures(
      doc_id: Long,
      media_type: String,
      n_bytes: Int,
      width: Int,
      height: Int,
      n_frames: Int,
      feature: Array[Float])

  /** Wrap a text table as a binary-payload table (the sandbox has no real
    * media; payload = utf-8 bytes, metadata typed as an image). Real
    * pipelines read payloads via `spark.read.format("binaryFile")` or
    * parquet binary columns — same schema from here on. */
  def asBinaryTable(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast(LongType).as("doc_id"),
      encode(col(textCol), "UTF-8").as("payload"),
      struct(
        lit("image").as("media_type"),
        lit("png").as("format"),
        octet_length(col(textCol)).as("n_bytes")).as("meta"))

  /** STUB decoder: deterministic fake that stands in for an image decode.
    * Derives "dimensions" and an 8-dim "embedding" from payload bytes.
    * Replace the body with a real decoder (e.g. TwelveMonkeys/JavaCV) —
    * signature and batch shape stay identical. */
  private[ops] def stubDecode(payload: Array[Byte]): (Int, Int, Int, Array[Float]) = {
    val n = payload.length
    val width = (n % 256) + 1
    val height = ((n / 256) % 256) + 1
    val nFrames = 1
    // 8 deterministic pseudo-features from byte sums over 8 strides
    val feat = Array.tabulate(8) { k =>
      var s = 0L
      var i = k
      while (i < n) { s += (payload(i) & 0xFF); i += 8 }
      (s % 1000).toFloat / 1000f
    }
    (width, height, nFrames, feat)
  }

  /** Per-partition decode + feature extraction. `mapPartitions` (not per-row
    * UDF) so a real decoder can amortize native init per partition/batch —
    * the Spark-side analog of `mapInPandas` batch shape. Corrupt/null
    * payloads are skipped, not fatal. */
  def decodeFeatures(spark: SparkSession, df: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    df.select(col("doc_id"), col("payload"), col("meta.media_type").as("media_type"),
      col("meta.n_bytes").as("n_bytes"))
      .as[(Long, Array[Byte], String, Int)]
      .mapPartitions { it =>
        // real decoders initialize native context here, once per partition
        it.flatMap { case (id, payload, mt, nBytes) =>
          Option(payload).filter(_.nonEmpty).map { p =>
            val (w, h, f, feat) = stubDecode(p)
            MediaFeatures(id, mt, nBytes, w, h, f, feat)
          }
        }
      }
  }

  /** Resize/frame-sample stage (stub): deterministic downsample of the fake
    * feature — demonstrates a second chained per-partition stage. */
  def resizeFeatures(ds: Dataset[MediaFeatures], dims: Int): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.map(m => m.copy(feature = m.feature.take(dims))))
  }

  /** Frame-sample stage (stub): keep every `everyN`-th feature slot and
    * scale n_frames accordingly — the video analog of resize, deterministic,
    * chained per-partition like a real frame sampler would be. */
  def sampleFrames(ds: Dataset[MediaFeatures], everyN: Int): Dataset[MediaFeatures] = {
    require(everyN > 0, "everyN > 0")
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.map { m =>
      m.copy(
        n_frames = math.max(1, (m.n_frames + everyN - 1) / everyN),
        feature = m.feature.zipWithIndex.collect { case (v, i) if i % everyN == 0 => v })
    })
  }

  /** Pure-SQL metadata profile of a binary table — the oracle-checkable part
    * (byte length, format mix) needs no decode at all and pushes down. */
  def metaProfile(df: DataFrame): DataFrame =
    df.groupBy(col("meta.media_type").as("media_type"), col("meta.format").as("format"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("meta.n_bytes").cast(LongType)).as("total_bytes"),
        min(col("meta.n_bytes")).as("min_bytes"),
        max(col("meta.n_bytes")).as("max_bytes"))
}

package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata structs; decode / feature-extract
  * stages run per-partition so heavier decoders (JNI/FFI, columnar UDF)
  * drop in without changing the plan shape.
  *
  * The metadata decode is REAL: [[MediaCodec]] parses PNG/GIF/JPEG/BMP
  * container headers (dimensions, format, GIF frame count) from the raw
  * bytes — pure JVM, a few hundred byte reads per payload, scan-speed at
  * any scale. Pixel-level feature extraction ([[decodeFeatures]]) is also
  * real (full `javax.imageio` decode of the first frame); only the
  * embedding MODEL is a deterministic stand-in (channel means + luminance
  * histogram in place of a learned vision encoder, which cannot exist in
  * this sandbox).
  */
object Multimodal {

  /** Typed metadata carried next to every payload. */
  val mediaMetaType: StructType = StructType(Seq(
    StructField("media_type", StringType), // "image" | "audio" | "video"
    StructField("format", StringType), // "png", "gif", …
    StructField("n_bytes", IntegerType)))

  /** Header-decoded container metadata. `ok = false` rows carry the decode
    * FAILURE accounting (corrupt/truncated/unsupported payloads are counted
    * artifacts, never silent drops). */
  final case class MediaDecoded(
      doc_id: Long,
      format: String,
      width: Int,
      height: Int,
      n_frames: Int,
      n_bytes: Int,
      ok: Boolean)

  final case class MediaFeatures(
      doc_id: Long,
      media_type: String,
      n_bytes: Int,
      width: Int,
      height: Int,
      n_frames: Int,
      feature: Array[Float])

  /** Wrap a text table as a binary-payload table (payload = utf-8 bytes,
    * metadata typed as an image) — the schema-plumbing demo used by the
    * meta-profile query. Real pipelines read payloads via
    * `spark.read.format("binaryFile")` or parquet binary columns — same
    * schema from here on. */
  def asBinaryTable(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast(LongType).as("doc_id"),
      encode(col(textCol), "UTF-8").as("payload"),
      struct(
        lit("image").as("media_type"),
        lit("png").as("format"),
        octet_length(col(textCol)).as("n_bytes")).as("meta"))

  /** REAL metadata decode: sniff format from magic bytes and parse
    * dimensions + frame count from the container header
    * ([[MediaCodec.sniff]] — no image library, no full pixel decode).
    * Unparseable payloads surface as `ok = false` rows with format
    * "unknown" and zero dims. Narrow typed map — no shuffle; at 100 TB
    * this runs at scan speed and only the header bytes are touched. */
  def decodeMeta(spark: SparkSession, df: DataFrame,
      idCol: String = "doc_id", payloadCol: String = "payload"): Dataset[MediaDecoded] = {
    import spark.implicits._
    df.select(col(idCol).cast(LongType), col(payloadCol))
      .as[(Long, Array[Byte])]
      .map { case (id, p) =>
        val nb = if (p == null) 0 else p.length
        MediaCodec.sniff(p) match {
          case Some(m) => MediaDecoded(id, m.format, m.width, m.height, m.nFrames, nb, ok = true)
          case None => MediaDecoded(id, "unknown", 0, 0, 0, nb, ok = false)
        }
      }
  }

  /** Header-decoded audio metadata ([[MediaCodec.sniffAudio]] — WAV/RIFF
    * chunk walk, sample count from the data chunk's declared size, audio
    * payload never read). Same accounting contract as [[decodeMeta]]. */
  final case class AudioDecoded(
      doc_id: Long,
      format: String,
      channels: Int,
      sample_rate: Int,
      bits: Int,
      n_samples: Long,
      n_bytes: Int,
      ok: Boolean)

  /** REAL audio metadata decode — the audio face of [[decodeMeta]]. */
  def decodeAudioMeta(spark: SparkSession, df: DataFrame,
      idCol: String = "doc_id", payloadCol: String = "payload"): Dataset[AudioDecoded] = {
    import spark.implicits._
    df.select(col(idCol).cast(LongType), col(payloadCol))
      .as[(Long, Array[Byte])]
      .map { case (id, p) =>
        val nb = if (p == null) 0 else p.length
        MediaCodec.sniffAudio(p) match {
          case Some(a) =>
            AudioDecoded(id, a.format, a.channels, a.sampleRate, a.bitsPerSample,
              a.nSamples, nb, ok = true)
          case None => AudioDecoded(id, "unknown", 0, 0, 0, 0L, nb, ok = false)
        }
      }
  }

  /** Header-decoded video metadata ([[MediaCodec.sniffVideo]] — MP4 box
    * walk; `mdat` never read). Same accounting contract as
    * [[decodeMeta]]. */
  final case class VideoDecoded(
      doc_id: Long,
      format: String,
      width: Int,
      height: Int,
      duration_ms: Long,
      n_bytes: Int,
      ok: Boolean)

  /** REAL video metadata decode — the video face of [[decodeMeta]]. */
  def decodeVideoMeta(spark: SparkSession, df: DataFrame,
      idCol: String = "doc_id", payloadCol: String = "payload"): Dataset[VideoDecoded] = {
    import spark.implicits._
    df.select(col(idCol).cast(LongType), col(payloadCol))
      .as[(Long, Array[Byte])]
      .map { case (id, p) =>
        val nb = if (p == null) 0 else p.length
        MediaCodec.sniffVideo(p) match {
          case Some(v) =>
            VideoDecoded(id, v.format, v.width, v.height, v.durationMs, nb, ok = true)
          case None => VideoDecoded(id, "unknown", 0, 0, 0L, nb, ok = false)
        }
      }
  }

  /** The pluggable vision-featurizer seam: `init` runs ONCE per partition
    * (load a model, open a native/FFI context) and its handle feeds every
    * `featurize` call in that partition — the Spark-side analog of
    * `mapInPandas`'s batch-amortized model loading. Swapping a real
    * learned encoder in is a one-liner at the [[decodeFeatures]] call
    * site; the operator's plumbing (decode, accounting, ordering,
    * determinism) never changes. */
  final case class Featurizer[F](
      init: () => F,
      featurize: (F, java.awt.image.BufferedImage) => Array[Float])

  /** The default stand-in featurizer: a deterministic 8-dim feature (mean
    * R/G/B in [0,1], 4-bin luminance histogram fractions, aspect ratio
    * w/(w+h)) in place of a learned vision embedding, which cannot exist
    * in this sandbox. Stateless, so `init` yields Unit. */
  val defaultFeaturizer: Featurizer[Unit] = Featurizer[Unit](
    init = () => (),
    featurize = (_, img) => {
      val w = img.getWidth; val h = img.getHeight
      var sr = 0L; var sg = 0L; var sb = 0L
      val lumBins = new Array[Long](4)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val r = (rgb >> 16) & 0xFF; val g = (rgb >> 8) & 0xFF; val b = rgb & 0xFF
          sr += r; sg += g; sb += b
          // integer ITU-R 601 luma approximation
          val lum = (r * 299 + g * 587 + b * 114) / 1000
          lumBins(math.min(lum >> 6, 3)) += 1
          x += 1
        }
        y += 1
      }
      val n = w.toLong * h
      Array(
        sr.toFloat / (255f * n), sg.toFloat / (255f * n), sb.toFloat / (255f * n),
        lumBins(0).toFloat / n, lumBins(1).toFloat / n,
        lumBins(2).toFloat / n, lumBins(3).toFloat / n,
        w.toFloat / (w + h))
    })

  /** Per-partition pixel decode + feature extraction: full `javax.imageio`
    * decode of the first frame, then `featurizer` maps pixels to the
    * embedding ([[defaultFeaturizer]] unless a real encoder is plugged
    * in). `mapPartitions` (not per-row UDF) with the once-per-partition
    * `init` contract so a heavy encoder amortizes its load.
    * Corrupt/undecodable payloads are SKIPPED here; run [[decodeMeta]]
    * first when failure accounting matters (its ok=false rows are the
    * audit trail). Frame count comes from the header sniff (ImageIO reads
    * the first frame only). */
  def decodeFeatures[F](spark: SparkSession, df: DataFrame,
      idCol: String = "doc_id", payloadCol: String = "payload",
      featurizer: Featurizer[F] = defaultFeaturizer): Dataset[MediaFeatures] = {
    import spark.implicits._
    df.select(col(idCol).cast(LongType), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val handle = featurizer.init() // once per partition
        it.flatMap { case (id, payload) =>
          for {
            p <- Option(payload).filter(_.nonEmpty)
            meta <- MediaCodec.sniff(p)
            img <- try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(p)))
                   catch { case _: Exception => None }
          } yield {
            val w = img.getWidth; val h = img.getHeight
            val feat = featurizer.featurize(handle, img)
            val mediaType = if (meta.nFrames > 1) "video" else "image"
            MediaFeatures(id, mediaType, p.length, w, h, meta.nFrames, feat)
          }
        }
      }
  }

  /** Feature-vector downsample (deterministic post-stage; the plan-shape
    * slot where a real resize/projection stage runs). */
  def resizeFeatures(ds: Dataset[MediaFeatures], dims: Int): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.map(m => m.copy(feature = m.feature.take(dims))))
  }

  /** Frame-sample stage: keep every `everyN`-th feature slot and scale
    * n_frames accordingly — the video analog of resize, deterministic,
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

  /** Pure-SQL metadata profile of a binary table — byte length and format
    * mix need no decode at all and push down. */
  def metaProfile(df: DataFrame): DataFrame =
    df.groupBy(col("meta.media_type").as("media_type"), col("meta.format").as("format"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("meta.n_bytes").cast(LongType)).as("total_bytes"),
        min(col("meta.n_bytes")).as("min_bytes"),
        max(col("meta.n_bytes")).as("max_bytes"))
}

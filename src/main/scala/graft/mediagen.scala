package graft

import java.awt.image.BufferedImage
import javax.imageio.{IIOImage, ImageIO}
import javax.imageio.stream.MemoryCacheImageOutputStream
import org.apache.spark.sql.{Dataset, SparkSession}

/** Deterministic REAL media payloads for the multimodal operators: tiny
  * PNG/GIF/JPEG/BMP images encoded with the JDK's `javax.imageio` writers
  * (encode side only — the engine's decode path is the hand-rolled header
  * parser in [[graft.ops.MediaCodec]], so generator and decoder share no
  * code and the oracle row is a genuine cross-implementation check).
  *
  * Every payload is a pure function of the row id: format, dimensions,
  * frame count, and pixel content all derive from id hashes, so the fixture
  * is bit-identical at any parallelism. A deterministic slice of rows is
  * CORRUPT on purpose (garbage bytes / truncated signatures) with ground
  * truth marked `unknown` — the decoder's failure accounting is part of the
  * checked contract.
  */
object MediaGen {

  /** Fixture row: payload + generation-time ground truth. Queries must only
    * read (doc_id, payload, media_type); the true_* columns exist for the
    * DuckDB oracle and tests. */
  final case class MediaRow(
      doc_id: Long,
      payload: Array[Byte],
      media_type: String,
      true_format: String,
      true_width: Int,
      true_height: Int,
      true_frames: Int)

  @inline private def mix(id: Long, salt: Long): Long = {
    var h = id * 0x9E3779B97F4A7C15L + salt * 0xC2B2AE3D27D4EB4FL
    h ^= h >>> 33; h *= 0xFF51AFD7ED558CCDL; h ^= h >>> 33
    h & Long.MaxValue
  }

  /** Deterministic pixel pattern (pure function of id and position). */
  private def image(id: Long, w: Int, h: Int, frame: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = ((id * 31 + frame * 97 + x * 7 + y * 13) & 0xFF).toInt
        img.setRGB(x, y, (v << 16) | (((v * 3) & 0xFF) << 8) | ((v * 5) & 0xFF))
        x += 1
      }
      y += 1
    }
    img
  }

  /** Encode one or more frames with the JDK writer for `format` ("png",
    * "gif", "jpeg", "bmp"); multi-frame only for gif (write sequence). */
  def encode(format: String, frames: Seq[BufferedImage]): Array[Byte] = {
    val baos = new java.io.ByteArrayOutputStream()
    val ios = new MemoryCacheImageOutputStream(baos)
    val it = ImageIO.getImageWritersByFormatName(format)
    require(it.hasNext, s"no JDK ImageIO writer for $format")
    val writer = it.next()
    writer.setOutput(ios)
    try {
      if (frames.length == 1) writer.write(frames.head)
      else {
        writer.prepareWriteSequence(null)
        frames.foreach(im => writer.writeToSequence(new IIOImage(im, null, null), null))
        writer.endWriteSequence()
      }
    } finally {
      writer.dispose()
      ios.close()
    }
    baos.toByteArray
  }

  /** One deterministic row. id % 5 selects the class: png / animated gif /
    * jpeg / bmp / corrupt (alternating garbage and truncated-signature). */
  def row(id: Long): MediaRow = {
    val w = 1 + (mix(id, 1) % 96).toInt
    val h = 1 + (mix(id, 2) % 96).toInt
    (id % 5) match {
      case 0 =>
        MediaRow(id, encode("png", Seq(image(id, w, h, 0))), "image", "png", w, h, 1)
      case 1 =>
        val frames = 1 + (id % 3).toInt
        val payload = encode("gif", (0 until frames).map(f => image(id, w, h, f)))
        MediaRow(id, payload, if (frames > 1) "video" else "image", "gif", w, h, frames)
      case 2 =>
        MediaRow(id, encode("jpeg", Seq(image(id, w, h, 0))), "image", "jpeg", w, h, 1)
      case 3 =>
        MediaRow(id, encode("bmp", Seq(image(id, w, h, 0))), "image", "bmp", w, h, 1)
      case _ =>
        val payload =
          if (id % 10 == 4) Array.tabulate(32)(i => (mix(id, i) & 0xFF).toByte)
          else Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A,
            0x00, 0x00) // truncated: valid signature, no IHDR
        MediaRow(id, payload, "image", "unknown", 0, 0, 0)
    }
  }

  /** Distributed deterministic media table (no driver-side generation). */
  def mediaTable(spark: SparkSession, n: Long, parts: Int = 8): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(0, n, 1, parts).as[Long].mapPartitions(_.map(row))
  }
}

package graft.ops

/** Pure-JVM media HEADER decoders — no external libraries, no
  * `javax.imageio` on the read path: the container formats' published byte
  * layouts are parsed directly, so metadata extraction (format, dimensions,
  * frame count) costs a few hundred byte reads per payload regardless of
  * payload size. This is the hot-path shape a 100 TB multimodal scan needs:
  * header sniffing at scan speed, full pixel decode (see
  * [[Multimodal.decodeFeatures]]) reserved for the rows that survive
  * filtering.
  *
  * Supported containers (format sniffed from magic bytes, never from file
  * names): PNG (IHDR dims), GIF87a/89a (logical-screen dims + a real frame
  * count from walking the block structure), JPEG/JFIF (SOFn scan), BMP
  * (BITMAPINFOHEADER and the legacy BITMAPCOREHEADER). Truncated or
  * malformed payloads return None — callers surface them as counted
  * decode failures, never silent drops.
  */
object MediaCodec {

  /** Decoded container metadata. `nFrames` > 1 only for animated GIF (the
    * sandbox's stand-in for video payloads — same plumbing, real frames). */
  final case class MediaMeta(format: String, width: Int, height: Int, nFrames: Int)

  /** Decoded audio container metadata (WAV/RIFF): channel count, sample
    * rate, bits per sample, and the frame count derived from the data
    * chunk's declared size. */
  final case class AudioMeta(format: String, channels: Int, sampleRate: Int,
      bitsPerSample: Int, nSamples: Long)

  // ---- safe primitive reads (negative result = out of bounds) ----
  @inline private def u8(b: Array[Byte], i: Int): Int =
    if (i < b.length) b(i) & 0xFF else -1
  @inline private def u16be(b: Array[Byte], i: Int): Int =
    if (i + 1 < b.length) ((b(i) & 0xFF) << 8) | (b(i + 1) & 0xFF) else -1
  @inline private def u16le(b: Array[Byte], i: Int): Int =
    if (i + 1 < b.length) ((b(i + 1) & 0xFF) << 8) | (b(i) & 0xFF) else -1
  @inline private def i32be(b: Array[Byte], i: Int): Long =
    if (i + 3 < b.length)
      ((b(i) & 0xFFL) << 24) | ((b(i + 1) & 0xFFL) << 16) |
        ((b(i + 2) & 0xFFL) << 8) | (b(i + 3) & 0xFFL)
    else -1L
  @inline private def i32le(b: Array[Byte], i: Int): Long =
    if (i + 3 < b.length)
      ((b(i + 3) & 0xFFL) << 24) | ((b(i + 2) & 0xFFL) << 16) |
        ((b(i + 1) & 0xFFL) << 8) | (b(i) & 0xFFL)
    else -1L
  @inline private def ascii(b: Array[Byte], i: Int, s: String): Boolean =
    i + s.length <= b.length && s.indices.forall(k => (b(i + k) & 0xFF) == s.charAt(k))

  /** Sniff format from magic bytes and parse dimensions/frames from the
    * container header. None = not a supported container or malformed. */
  def sniff(bytes: Array[Byte]): Option[MediaMeta] = {
    if (bytes == null || bytes.length < 8) None
    else if (ascii(bytes, 1, "PNG") && u8(bytes, 0) == 0x89) png(bytes)
    else if (ascii(bytes, 0, "GIF87a") || ascii(bytes, 0, "GIF89a")) gif(bytes)
    else if (u8(bytes, 0) == 0xFF && u8(bytes, 1) == 0xD8) jpeg(bytes)
    else if (ascii(bytes, 0, "BM")) bmp(bytes)
    else None
  }

  /** PNG: 8-byte signature, then the IHDR chunk MUST be first
    * (length=13, type "IHDR", width/height as big-endian u32). */
  private def png(b: Array[Byte]): Option[MediaMeta] = {
    val sigOk = u8(b, 4) == 0x0D && u8(b, 5) == 0x0A && u8(b, 6) == 0x1A && u8(b, 7) == 0x0A
    if (!sigOk || i32be(b, 8) != 13L || !ascii(b, 12, "IHDR")) return None
    val w = i32be(b, 16); val h = i32be(b, 20)
    if (w <= 0 || h <= 0 || w > Int.MaxValue || h > Int.MaxValue) None
    else Some(MediaMeta("png", w.toInt, h.toInt, 1))
  }

  /** GIF: logical-screen dims at offset 6/8 (little-endian), then the block
    * stream is WALKED — skipping the global/local color tables, extension
    * sub-blocks, and LZW data blocks — counting image descriptors (0x2C),
    * which is the REAL frame count of an animated GIF. STRICT like the
    * other parsers: truncation or a garbage block tag anywhere before the
    * trailer returns None (a partial frame count would flip a corrupt
    * payload to ok=true with silently wrong metadata). */
  private def gif(b: Array[Byte]): Option[MediaMeta] = {
    val w = u16le(b, 6); val h = u16le(b, 8)
    if (w <= 0 || h <= 0) return None
    val packed = u8(b, 10)
    if (packed < 0) return None
    var pos = 13
    if ((packed & 0x80) != 0) pos += 3 * (1 << ((packed & 0x07) + 1)) // global color table
    var frames = 0
    var done = false
    // sub-block chains: {len u8, len bytes}... terminated by len == 0
    def skipSubBlocks(): Boolean = {
      var len = u8(b, pos)
      while (len > 0) { pos += 1 + len; len = u8(b, pos) }
      if (len < 0) false else { pos += 1; true } // consume the terminator
    }
    while (!done) {
      u8(b, pos) match {
        case 0x3B => done = true // trailer
        case 0x21 => // extension: label byte + sub-blocks
          pos += 2
          if (!skipSubBlocks()) return None
        case 0x2C => // image descriptor: 9 bytes + optional LCT + LZW code size + data
          val ip = u8(b, pos + 9)
          if (ip < 0) return None
          pos += 10
          if ((ip & 0x80) != 0) pos += 3 * (1 << ((ip & 0x07) + 1)) // local color table
          pos += 1 // LZW minimum code size
          if (!skipSubBlocks()) return None
          frames += 1
        case _ => return None // truncated or garbage block tag
      }
    }
    if (frames > 0) Some(MediaMeta("gif", w, h, frames)) else None
  }

  /** JPEG: walk the marker stream from SOI; dimensions live in the first
    * SOFn segment (C0-CF excluding C4 DHT / C8 JPG / CC DAC): precision u8,
    * height u16be, width u16be. Stops (None) at SOS/EOI with no SOF. */
  private def jpeg(b: Array[Byte]): Option[MediaMeta] = {
    var pos = 2
    while (pos < b.length) {
      // markers may be preceded by fill bytes 0xFF
      if (u8(b, pos) != 0xFF) return None
      var m = u8(b, pos + 1)
      var mp = pos + 1
      while (m == 0xFF) { mp += 1; m = u8(b, mp) }
      if (m < 0) return None
      pos = mp + 1
      m match {
        case 0xD8 | 0x01 => // SOI / TEM: standalone
        case r if r >= 0xD0 && r <= 0xD7 => // RSTn: standalone
        case 0xD9 | 0xDA => return None // EOI / SOS before any SOF
        case sof if sof >= 0xC0 && sof <= 0xCF && sof != 0xC4 && sof != 0xC8 && sof != 0xCC =>
          val h = u16be(b, pos + 3); val w = u16be(b, pos + 5)
          return if (w > 0 && h > 0) Some(MediaMeta("jpeg", w, h, 1)) else None
        case _ =>
          val len = u16be(b, pos)
          if (len < 2) return None
          pos += len
      }
    }
    None
  }

  /** WAV/RIFF: "RIFF" <size> "WAVE", then a chunk walk — the "fmt " chunk
    * (PCM layout: audio format u16le, channels u16le, sample rate u32le,
    * byte rate, block align, bits per sample) and the "data" chunk, whose
    * declared byte size / block-align gives the sample (frame) count
    * WITHOUT reading the audio payload. Chunks are word-aligned (odd sizes
    * pad one byte). None on truncation, a missing fmt/data chunk, or a
    * zero block-align. */
  def sniffAudio(bytes: Array[Byte]): Option[AudioMeta] = {
    if (bytes == null || bytes.length < 12) return None
    if (!ascii(bytes, 0, "RIFF") || !ascii(bytes, 8, "WAVE")) return None
    var pos = 12
    var channels = -1; var sampleRate = -1; var bits = -1; var blockAlign = -1
    var dataBytes = -1L
    while (pos + 8 <= bytes.length && (channels < 0 || dataBytes < 0)) {
      val size = i32le(bytes, pos + 4)
      // a chunk whose declared extent runs past the payload END (truncated
      // file, or an adversarial u32 size whose Int truncation would make
      // the position step <= 0 and wedge the loop) is malformed — reject,
      // never spin, never report metadata for bytes that are not there
      if (size < 0 || pos.toLong + 8 + size > bytes.length.toLong) return None
      if (ascii(bytes, pos, "fmt ")) {
        if (size < 16) return None
        channels = u16le(bytes, pos + 10)
        sampleRate = i32le(bytes, pos + 12).toInt
        blockAlign = u16le(bytes, pos + 20)
        bits = u16le(bytes, pos + 22)
      } else if (ascii(bytes, pos, "data")) {
        dataBytes = size
      }
      pos += 8 + size.toInt + (size.toInt & 1) // chunks are 2-byte aligned
    }
    if (channels <= 0 || sampleRate <= 0 || bits <= 0 || blockAlign <= 0 || dataBytes < 0) None
    else Some(AudioMeta("wav", channels, sampleRate, bits, dataBytes / blockAlign))
  }

  /** BMP: "BM" file header (14 bytes), then a DIB header whose declared
    * size selects the layout — BITMAPINFOHEADER family (>= 40: i32le dims,
    * negative height = top-down) or the legacy BITMAPCOREHEADER (12:
    * u16le dims). */
  private def bmp(b: Array[Byte]): Option[MediaMeta] = {
    val dib = i32le(b, 14)
    if (dib >= 40) {
      val w = i32le(b, 18); val hRaw = i32le(b, 22)
      val h = math.abs(hRaw.toInt)
      if (w <= 0 || w > Int.MaxValue || h <= 0) None
      else Some(MediaMeta("bmp", w.toInt, h, 1))
    } else if (dib == 12) {
      val w = u16le(b, 18); val h = u16le(b, 20)
      if (w <= 0 || h <= 0) None else Some(MediaMeta("bmp", w, h, 1))
    } else None
  }
}

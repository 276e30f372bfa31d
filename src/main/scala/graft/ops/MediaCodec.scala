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
    if (ascii(bytes, 0, "fLaC")) return flac(bytes)
    if (ascii(bytes, 0, "ID3") ||
        (u8(bytes, 0) == 0xFF && (u8(bytes, 1) & 0xE0) == 0xE0))
      return mp3(bytes).map(m =>
        // bitsPerSample is 0 for lossy MP3 (no fixed sample width exists)
        AudioMeta("mp3", m.channels, m.sampleRate, 0, m.nSamples))
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

  /** FLAC: "fLaC" magic, then the STREAMINFO metadata block MUST be first
    * (type 0, length 34 — the published layout): min/max block and frame
    * sizes, then a packed big-endian bit field — sample rate (20 bits),
    * channels-1 (3), bits-per-sample-1 (5), total samples (36). The audio
    * frames are never touched. None on truncation, a wrong first block, or
    * a zero sample rate (forbidden by the spec). Total-samples 0 means
    * "unknown" per the spec and is reported as 0, not rejected. */
  private def flac(b: Array[Byte]): Option[AudioMeta] = {
    // 4 magic + 4 block header + 34 STREAMINFO
    if (b.length < 42) return None
    val hdr = u8(b, 4)
    val blockType = hdr & 0x7F
    val blockLen = ((u8(b, 5) << 16) | (u8(b, 6) << 8) | u8(b, 7))
    if (blockType != 0 || blockLen != 34) return None
    // packed field starts at byte 18 (= 8 + 2+2+3+3)
    val sampleRate = (u8(b, 18) << 12) | (u8(b, 19) << 4) | (u8(b, 20) >> 4)
    val channels = ((u8(b, 20) >> 1) & 0x07) + 1
    val bits = (((u8(b, 20) & 0x01) << 4) | (u8(b, 21) >> 4)) + 1
    val totalSamples = ((u8(b, 21) & 0x0FL) << 32) |
      ((b(22) & 0xFFL) << 24) | ((b(23) & 0xFFL) << 16) |
      ((b(24) & 0xFFL) << 8) | (b(25) & 0xFFL)
    if (sampleRate <= 0) None
    else Some(AudioMeta("flac", channels, sampleRate, bits, totalSamples))
  }

  /** Parsed MPEG audio stream properties — the detail [[sniffAudio]]'s
    * uniform [[AudioMeta]] cannot carry. `version` is "1"/"2"/"2.5",
    * `layer` 1-3, `bitrateKbps` from the FIRST frame (later frames of a
    * VBR stream may differ; the walk validates each one independently). */
  final case class Mp3Meta(version: String, layer: Int, bitrateKbps: Int,
      sampleRate: Int, channels: Int, nFrames: Long, nSamples: Long)

  // published MPEG-audio tables (index 0 = free format, 15 = invalid —
  // both rejected; rows: [V1L1, V1L2, V1L3, V2L1, V2L2/L3])
  private val Mp3Bitrates: Array[Array[Int]] = Array(
    Array(0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448),
    Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384),
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320),
    Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256),
    Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160))
  private val Mp3Rates: Array[Array[Int]] = Array(
    Array(44100, 48000, 32000), // MPEG1
    Array(22050, 24000, 16000), // MPEG2
    Array(11025, 12000, 8000)) // MPEG2.5

  /** MP3 (MPEG audio): optional ID3v2 tag, then a strict frame-header walk
    * — each 4-byte header (sync, version, layer, bitrate index, sample-rate
    * index, padding, channel mode) determines its frame's byte length, so
    * counting frames (⇒ exact sample count and duration) touches 4 bytes
    * per ~400-byte frame and never decodes audio. None on: free-format or
    * invalid bitrate/sample-rate indices, reserved version/layer, a frame
    * extending past the payload (truncation), or sync lost mid-stream. An
    * ID3v1 trailer ("TAG", 128 bytes) is allowed after the last frame. */
  private def mp3(b: Array[Byte]): Option[Mp3Meta] = {
    var pos = 0
    if (ascii(b, 0, "ID3")) {
      if (b.length < 10) return None
      // syncsafe u28: 4 bytes of 7 bits each (high bit must be clear)
      val s = Seq(6, 7, 8, 9).map(u8(b, _))
      if (s.exists(v => v < 0 || (v & 0x80) != 0)) return None
      // ID3v2.4 footer flag (0x10): the tag carries a 10-byte trailer copy
      // of the header, NOT counted in the syncsafe size — skip it too or
      // the walk reads '3DI…' where it expects frame sync
      val footer = if ((u8(b, 5) & 0x10) != 0) 10 else 0
      pos = 10 + ((s(0) << 21) | (s(1) << 14) | (s(2) << 7) | s(3)) + footer
      if (pos >= b.length) return None
    }
    var version: String = null
    var layer = 0
    var bitrateKbps = 0
    var sampleRate = 0
    var channels = 0
    var nFrames = 0L
    var nSamples = 0L
    while (pos < b.length) {
      // ID3v1 trailer: exactly 128 bytes of "TAG…" after the last frame
      if (b.length - pos == 128 && ascii(b, pos, "TAG")) pos = b.length
      else {
        if (u8(b, pos) != 0xFF || (u8(b, pos + 1) & 0xE0) != 0xE0) return None
        val h1 = u8(b, pos + 1); val h2 = u8(b, pos + 2); val h3 = u8(b, pos + 3)
        if (h3 < 0) return None
        val verBits = (h1 >> 3) & 0x03 // 0=2.5, 1=reserved, 2=V2, 3=V1
        val layerBits = (h1 >> 1) & 0x03 // 0=reserved, 3-layerBits = layer
        if (verBits == 1 || layerBits == 0) return None
        val ver = verBits match { case 3 => "1"; case 2 => "2"; case _ => "2.5" }
        val lay = 4 - layerBits // 1, 2, or 3
        val brIdx = (h2 >> 4) & 0x0F
        val srIdx = (h2 >> 2) & 0x03
        if (brIdx == 0 || brIdx == 15 || srIdx == 3) return None
        val padding = (h2 >> 1) & 0x01
        val chMode = (h3 >> 6) & 0x03
        val brRow = if (verBits == 3) lay - 1 else if (lay == 1) 3 else 4
        val br = Mp3Bitrates(brRow)(brIdx)
        val sr = Mp3Rates(verBits match { case 3 => 0; case 2 => 1; case _ => 2 })(srIdx)
        val samplesPerFrame =
          if (lay == 1) 384
          else if (lay == 2) 1152
          else if (verBits == 3) 1152
          else 576 // Layer III, MPEG2/2.5
        val frameLen =
          if (lay == 1) (12 * br * 1000 / sr + padding) * 4
          else samplesPerFrame / 8 * br * 1000 / sr + padding
        if (frameLen <= 4) return None
        if (pos.toLong + frameLen > b.length.toLong) return None // truncated frame
        if (version == null) {
          version = ver; layer = lay; bitrateKbps = br; sampleRate = sr
          channels = if (chMode == 3) 1 else 2
        }
        nFrames += 1
        nSamples += samplesPerFrame
        pos += frameLen
      }
    }
    if (version == null) None
    else Some(Mp3Meta(version, layer, bitrateKbps, sampleRate, channels, nFrames, nSamples))
  }

  /** Detailed MPEG-audio stream properties (version/layer/bitrate and the
    * exact frame walk) — the rich face of the MP3 branch of
    * [[sniffAudio]]. */
  def sniffMp3(bytes: Array[Byte]): Option[Mp3Meta] =
    if (bytes == null || bytes.length < 4) None
    else if (ascii(bytes, 0, "ID3") ||
        (u8(bytes, 0) == 0xFF && (u8(bytes, 1) & 0xE0) == 0xE0)) mp3(bytes)
    else None

  /** Decoded video container metadata (MP4): presentation dimensions from
    * the first track with nonzero size, duration in milliseconds from the
    * movie header's timescale + duration. */
  final case class VideoMeta(format: String, width: Int, height: Int,
      durationMs: Long)

  /** MP4/ISO-BMFF: a strict box walk — `[size u32be][type 4cc]` (size 1 =
    * 64-bit largesize follows; size 0 = box extends to payload end), the
    * `moov` box's `mvhd` child gives timescale + duration (version 0:
    * 32-bit fields at data+12/+16; version 1: 64-bit at data+20/+24), each
    * `trak`'s `tkhd` carries presentation width/height as 16.16 fixed
    * point at the end of the box. None on truncation (a box extending past
    * the payload), a declared size smaller than the 8-byte header (which
    * would wedge the walk), a missing moov/mvhd, or a zero timescale. The
    * media data (`mdat`) is never read. */
  def sniffVideo(bytes: Array[Byte]): Option[VideoMeta] = {
    if (bytes == null || bytes.length < 16) return None
    // require a leading ftyp box — the MP4 magic
    if (!ascii(bytes, 4, "ftyp")) return None

    // walk boxes in [from, to); return the extent of the first `name` box
    def find(name: String, from: Int, to: Int): Option[(Int, Int)] = {
      var pos = from
      while (pos + 8 <= to) {
        val size0 = i32be(bytes, pos)
        val (dataStart, boxEnd) =
          if (size0 == 1L) {
            // 64-bit largesize
            val hi = i32be(bytes, pos + 8); val lo = i32be(bytes, pos + 12)
            if (hi < 0 || lo < 0) return None
            val sz = (hi << 32) | lo
            if (sz < 16) return None
            (pos + 16, pos.toLong + sz)
          } else if (size0 == 0L) (pos + 8, to.toLong)
          else if (size0 < 8L) return None // would wedge the walk
          else (pos + 8, pos.toLong + size0)
        if (boxEnd > to.toLong) return None // truncated box
        if (ascii(bytes, pos + 4, name)) return Some((dataStart, boxEnd.toInt))
        pos = boxEnd.toInt
      }
      None
    }

    for {
      (moovStart, moovEnd) <- find("moov", 0, bytes.length)
      (mvhdStart, mvhdEnd) <- find("mvhd", moovStart, moovEnd)
      meta <- {
        // every field read is bounded by the DECLARED box extent — a box
        // whose declared size is walk-valid but too small for its version's
        // layout must reject, not read the next sibling's bytes as metadata
        val ver = u8(bytes, mvhdStart)
        val (timescale, duration) =
          if (ver == 0 && mvhdStart + 20 <= mvhdEnd)
            (i32be(bytes, mvhdStart + 12), i32be(bytes, mvhdStart + 16))
          else if (ver == 1 && mvhdStart + 32 <= mvhdEnd) {
            val hi = i32be(bytes, mvhdStart + 24); val lo = i32be(bytes, mvhdStart + 28)
            (i32be(bytes, mvhdStart + 20),
              if (hi < 0 || lo < 0) -1L else (hi << 32) | lo)
          } else (-1L, -1L)
        if (timescale <= 0 || duration < 0) None
        else {
          // first trak with nonzero presentation dims (the video track)
          var dims: Option[(Int, Int)] = None
          var searchFrom = moovStart
          while (dims.isEmpty) {
            find("trak", searchFrom, moovEnd) match {
              case None => dims = Some((0, 0)) // no more traks
              case Some((trakStart, trakEnd)) =>
                find("tkhd", trakStart, trakEnd).foreach { case (tk, tkEnd) =>
                  val off = if (u8(bytes, tk) == 1) 88 else 76
                  if (tk + off + 8 <= tkEnd) { // dims inside the declared box
                    val w = i32be(bytes, tk + off); val h = i32be(bytes, tk + off + 4)
                    if (w > 0 && h > 0) dims = Some(((w >> 16).toInt, (h >> 16).toInt))
                  }
                }
                searchFrom = trakEnd
            }
          }
          dims.filter { case (w, h) => w > 0 && h > 0 }.map { case (w, h) =>
            VideoMeta("mp4", w, h, duration * 1000L / timescale)
          }
        }
      }
    } yield meta
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

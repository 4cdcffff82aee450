package graft.operators

import java.io.ByteArrayOutputStream

/** Pure-JVM builders and header parsers for the three public media
  * container formats the multimodal pipeline exercises:
  *
  *  - PNG (RFC 2083 / W3C PNG spec): 8-byte signature, then length-typed
  *    chunks; IHDR carries width/height as big-endian u32 and the color
  *    type that determines channel count.
  *  - JPEG (ITU-T T.81 / JFIF): marker stream; any SOFn marker carries
  *    precision, height/width as big-endian u16 and the component count.
  *  - WAV (RIFF/WAVE, Microsoft/IBM multimedia spec): little-endian RIFF
  *    chunks; the `fmt ` chunk carries channels / sample rate / bits.
  *
  * The PARSERS are the production path: a 100 TB corpus extracts
  * dimensions by reading a few hundred header bytes per blob — never by
  * decompressing pixels — so [[Multimodal.decodeFeatures]] stays a
  * map-only stage whose cost is IO, not codec CPU. The BUILDERS exist so
  * the container-less test environment can synthesize format-valid blobs
  * (real signatures, real chunk layout, real CRCs for PNG) around
  * deterministic payloads; MultimodalSpec cross-checks the parsers
  * against containers produced by the INDEPENDENT JDK encoders
  * (javax.imageio for PNG/JPEG, javax.sound.sampled for WAV).
  */
object MediaHeaders {

  sealed trait MediaInfo
  /** width/height in pixels; channels from PNG color type / JPEG ncomp. */
  final case class ImageInfo(width: Int, height: Int, channels: Int)
      extends MediaInfo
  /** channels / sampleRate from `fmt `; dataBytes is the `data` chunk
    * size (sample frames = dataBytes / blockAlign).
    */
  final case class AudioInfo(
      channels: Int, sampleRate: Int, bitsPerSample: Int, dataBytes: Int)
      extends MediaInfo

  private val PngSig =
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private def beU32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
      ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)

  private def beU16(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)

  private def leU32(b: Array[Byte], off: Int): Long =
    ((b(off + 3) & 0xffL) << 24) | ((b(off + 2) & 0xffL) << 16) |
      ((b(off + 1) & 0xffL) << 8) | (b(off) & 0xffL)

  private def leU16(b: Array[Byte], off: Int): Int =
    ((b(off + 1) & 0xff) << 8) | (b(off) & 0xff)

  /** Format-sniffing header parse: dispatches on the magic bytes, exactly
    * like a production ingest that cannot trust file extensions. Returns
    * None for unrecognized blobs (raw/opaque payloads).
    */
  def sniff(bytes: Array[Byte]): Option[MediaInfo] =
    if (isPng(bytes)) parsePng(bytes)
    else if (isJpeg(bytes)) parseJpeg(bytes)
    else if (isWav(bytes)) parseWav(bytes)
    else None

  def isPng(b: Array[Byte]): Boolean =
    b.length >= 8 && (0 until 8).forall(i => b(i) == PngSig(i))

  def isJpeg(b: Array[Byte]): Boolean =
    b.length >= 2 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8

  def isWav(b: Array[Byte]): Boolean =
    b.length >= 12 &&
      b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'

  /** IHDR is mandated to be the first chunk: width/height at fixed
    * offsets 16/20 (big-endian u32), color type at 25. Channels per the
    * spec's color-type table: 0 gray=1, 2 truecolor=3, 3 palette=1,
    * 4 gray+alpha=2, 6 truecolor+alpha=4.
    */
  def parsePng(b: Array[Byte]): Option[ImageInfo] =
    if (b.length < 26) None
    else {
      val colorType = b(25) & 0xff
      val channels = colorType match {
        case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
        case _ => 0
      }
      Some(ImageInfo(beU32(b, 16).toInt, beU32(b, 20).toInt, channels))
    }

  /** Walk the marker stream to the first SOFn (C0–CF except C4/C8/CC,
    * which are DHT/JPG/DAC): height at +3, width at +5 past the length
    * field, component count at +7. Standalone markers (TEM, RSTn) carry
    * no length field; everything else is skipped by its big-endian
    * length (which includes the length bytes themselves).
    */
  def parseJpeg(b: Array[Byte]): Option[ImageInfo] = {
    var i = 2
    while (i + 3 < b.length) {
      if ((b(i) & 0xff) != 0xff) return None // desynced marker stream
      val marker = b(i + 1) & 0xff
      if (marker == 0xff) { i += 1 } // fill byte
      else if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd7)) {
        i += 2 // standalone, no length
      } else if (marker >= 0xc0 && marker <= 0xcf &&
        marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
        val seg = i + 2
        if (seg + 8 > b.length) return None
        val h = beU16(b, seg + 3)
        val w = beU16(b, seg + 5)
        val ncomp = b(seg + 7) & 0xff
        return Some(ImageInfo(w, h, ncomp))
      } else if (marker == 0xd9) { return None } // EOI before any SOF
      else {
        val len = beU16(b, i + 2)
        if (len < 2) return None
        i += 2 + len
        if (marker == 0xda) return None // SOS: entropy data, SOF was missed
      }
    }
    None
  }

  /** Walk the RIFF chunk list for `fmt ` (channels u16 LE at +2, sample
    * rate u32 LE at +4, bits u16 LE at +14) and `data` (payload size).
    */
  def parseWav(b: Array[Byte]): Option[AudioInfo] = {
    var i = 12
    var channels = 0; var rate = 0; var bits = 0; var dataBytes = -1
    while (i + 8 <= b.length) {
      val id = new String(b, i, 4, "US-ASCII")
      val size = leU32(b, i + 4).toInt
      // the size field is UNTRUSTED input: a 32-bit value like
      // 0xFFFFFFF8 reads back as -8, making the walk advance by zero or
      // backward — an infinite loop on a crafted blob. Any size outside
      // [0, blob length] cannot be a real chunk: parse failure.
      if (size < 0 || size > b.length) return None
      if (id == "fmt " && i + 8 + 16 <= b.length) {
        channels = leU16(b, i + 8 + 2)
        rate = leU32(b, i + 8 + 4).toInt
        bits = leU16(b, i + 8 + 14)
      } else if (id == "data") {
        dataBytes = math.min(size, b.length - i - 8)
      }
      i += 8 + size + (size & 1) // chunks are word-aligned
    }
    if (channels > 0 && dataBytes >= 0)
      Some(AudioInfo(channels, rate, bits, dataBytes))
    else None
  }

  /** The container's payload section — the bytes a content checksum
    * covers: PNG IDAT data, JPEG entropy segment (post-SOS-header,
    * pre-EOI), WAV `data` chunk, else the whole blob.
    */
  def payloadSection(b: Array[Byte]): Array[Byte] =
    if (isPng(b)) {
      val out = new ByteArrayOutputStream()
      var i = 8
      var ok = true
      while (ok && i + 8 <= b.length) {
        val len = beU32(b, i).toInt
        // untrusted length: negative (u32 high bit) or over-long values
        // would stall or overshoot the walk — stop at the malformation
        if (len < 0 || len > b.length) ok = false
        else {
          val typ = new String(b, i + 4, 4, "US-ASCII")
          if (typ == "IDAT" && i + 8 + len <= b.length)
            out.write(b, i + 8, len)
          i += 12 + len
        }
      }
      out.toByteArray
    } else if (isJpeg(b)) {
      // bytes between the SOS header and the trailing EOI
      var i = 2
      while (i + 3 < b.length) {
        val marker = b(i + 1) & 0xff
        if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd7)) i += 2
        else if (marker == 0xda) {
          val len = beU16(b, i + 2)
          val start = i + 2 + len
          val end =
            if (b.length >= 2 && (b(b.length - 2) & 0xff) == 0xff &&
              (b(b.length - 1) & 0xff) == 0xd9) b.length - 2
            else b.length
          return java.util.Arrays.copyOfRange(b, math.min(start, end), end)
        } else {
          val len = beU16(b, i + 2)
          if (len < 2) return Array.emptyByteArray
          i += 2 + len
        }
      }
      Array.emptyByteArray
    } else if (isWav(b)) {
      var i = 12
      while (i + 8 <= b.length) {
        val size = leU32(b, i + 4).toInt
        // same untrusted-size guard as parseWav: never walk backward
        if (size < 0 || size > b.length) return Array.emptyByteArray
        if (new String(b, i, 4, "US-ASCII") == "data")
          return java.util.Arrays.copyOfRange(
            b, i + 8, math.min(i + 8 + size, b.length))
        i += 8 + size + (size & 1)
      }
      Array.emptyByteArray
    } else b

  // ── builders (synthetic fixtures: format-valid layout, real CRCs) ──

  private def writeBeU32(out: ByteArrayOutputStream, v: Long): Unit = {
    out.write(((v >> 24) & 0xff).toInt); out.write(((v >> 16) & 0xff).toInt)
    out.write(((v >> 8) & 0xff).toInt); out.write((v & 0xff).toInt)
  }

  private def writeLeU32(out: ByteArrayOutputStream, v: Long): Unit = {
    out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
    out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt)
  }

  private def writeLeU16(out: ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >> 8) & 0xff)
  }

  private def pngChunk(
      out: ByteArrayOutputStream, typ: String, data: Array[Byte]): Unit = {
    writeBeU32(out, data.length.toLong)
    val t = typ.getBytes("US-ASCII")
    out.write(t, 0, 4)
    out.write(data, 0, data.length)
    val crc = new java.util.zip.CRC32()
    crc.update(t); crc.update(data)
    writeBeU32(out, crc.getValue)
  }

  /** Header-valid truecolor PNG: signature + IHDR(w, h, 8-bit, color
    * type 2) + one IDAT carrying `payload` verbatim + IEND, each chunk
    * with its real CRC32. 57 bytes of framing around the payload.
    * (IDAT is not zlib-compressed pixel data, so pixel DECODERS reject
    * it — header parsers, the production path here, read it exactly as
    * they read a camera PNG.)
    */
  def buildPng(width: Int, height: Int, payload: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(payload.length + 64)
    out.write(PngSig, 0, 8)
    val ihdr = new ByteArrayOutputStream(13)
    writeBeU32(ihdr, width.toLong); writeBeU32(ihdr, height.toLong)
    ihdr.write(8); ihdr.write(2); ihdr.write(0); ihdr.write(0); ihdr.write(0)
    pngChunk(out, "IHDR", ihdr.toByteArray)
    pngChunk(out, "IDAT", payload)
    pngChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Header-valid baseline JPEG: SOI + SOF0 (8-bit precision, h/w,
    * 3 components) + SOS header + `payload` as the entropy segment +
    * EOI. 37 bytes of framing around the payload.
    */
  def buildJpeg(width: Int, height: Int, payload: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(payload.length + 48)
    out.write(0xff); out.write(0xd8) // SOI
    out.write(0xff); out.write(0xc0) // SOF0
    out.write(0x00); out.write(17)   // length = 8 + 3*3
    out.write(8)                     // precision
    out.write((height >> 8) & 0xff); out.write(height & 0xff)
    out.write((width >> 8) & 0xff); out.write(width & 0xff)
    out.write(3)                     // components
    Seq((1, 0x22, 0), (2, 0x11, 1), (3, 0x11, 1)).foreach {
      case (id, sampling, qt) =>
        out.write(id); out.write(sampling); out.write(qt)
    }
    out.write(0xff); out.write(0xda) // SOS
    out.write(0x00); out.write(12)   // length = 6 + 2*3
    out.write(3)
    Seq((1, 0x00), (2, 0x11), (3, 0x11)).foreach { case (id, tbl) =>
      out.write(id); out.write(tbl)
    }
    out.write(0); out.write(63); out.write(0) // spectral selection
    out.write(payload, 0, payload.length)
    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }

  // ── pixel codec (real zlib IDAT, full PNG filter set) ──────────────
  //
  // The header parsers above are the 100 TB default (dimensions without
  // codec CPU); the PIXEL codec below is the next rung — the decode an
  // operator needs when it must see CONTENT, not envelope (perceptual-
  // hash image dedup). Still map-only per blob; output is a fixed-size
  // feature, never the pixels, so nothing pixel-sized ever shuffles.

  /** Encode `rgb` (row-major, 3 bytes/pixel) as a REAL decodable
    * truecolor PNG: filter-0 scanlines, zlib-deflated IDAT, CRC'd
    * chunks. Independent decoders (javax.imageio) read it exactly —
    * MultimodalSpec pins that — unlike [[buildPng]], whose IDAT is an
    * opaque payload for header-parser fixtures.
    */
  def buildPixelPng(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == width * height * 3,
      s"need ${width * height * 3} RGB bytes, got ${rgb.length}")
    val raw = new Array[Byte](height * (1 + width * 3))
    var y = 0
    while (y < height) {
      // filter byte 0 (None) + the row verbatim
      System.arraycopy(rgb, y * width * 3, raw, y * (1 + width * 3) + 1, width * 3)
      y += 1
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw); deflater.finish()
    val zipped = new ByteArrayOutputStream(raw.length / 2 + 64)
    val buf = new Array[Byte](8192)
    while (!deflater.finished())
      zipped.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    val out = new ByteArrayOutputStream(zipped.size() + 64)
    out.write(PngSig, 0, 8)
    val ihdr = new ByteArrayOutputStream(13)
    writeBeU32(ihdr, width.toLong); writeBeU32(ihdr, height.toLong)
    ihdr.write(8); ihdr.write(2); ihdr.write(0); ihdr.write(0); ihdr.write(0)
    pngChunk(out, "IHDR", ihdr.toByteArray)
    pngChunk(out, "IDAT", zipped.toByteArray)
    pngChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Decoded pixel frame: `pixels` is row-major, `channels` bytes per
    * pixel (1 gray / 3 RGB / 4 RGBA — 8-bit depth only).
    */
  final case class PixelFrame(
      width: Int, height: Int, channels: Int, pixels: Array[Byte])

  /** REAL pixel decode of an 8-bit non-interlaced PNG: walk the chunks
    * (with the untrusted-size guards), inflate the concatenated IDAT
    * stream, and reverse the per-scanline filters — all five spec
    * filter types (None/Sub/Up/Average/Paeth), so PNGs written by
    * adaptive-filter encoders (javax.imageio picks per-row) decode
    * byte-exactly. Returns None for non-PNG blobs, non-8-bit depths,
    * palette/interlaced images, or malformed streams.
    */
  def decodePixelPng(b: Array[Byte]): Option[PixelFrame] = {
    if (!isPng(b) || b.length < 33) return None
    val width = beU32(b, 16).toInt
    val height = beU32(b, 20).toInt
    val bitDepth = b(24) & 0xff
    val colorType = b(25) & 0xff
    val interlace = b(28) & 0xff
    val channels = colorType match {
      case 0 => 1; case 2 => 3; case 4 => 2; case 6 => 4
      case _ => return None // palette (3) needs PLTE indirection: out of scope
    }
    if (bitDepth != 8 || interlace != 0 || width <= 0 || height <= 0)
      return None
    // concatenate IDAT payloads (same guarded walk as payloadSection)
    val idat = new ByteArrayOutputStream()
    var i = 8
    var ok = true
    while (ok && i + 8 <= b.length) {
      val len = beU32(b, i).toInt
      if (len < 0 || len > b.length) ok = false
      else {
        val typ = new String(b, i + 4, 4, "US-ASCII")
        if (typ == "IDAT" && i + 8 + len <= b.length)
          idat.write(b, i + 8, len)
        i += 12 + len
      }
    }
    // IHDR dimensions are as untrusted as the chunk sizes guarded above:
    // validate with LONG arithmetic BEFORE allocating — a crafted
    // width 2^30 × RGB int-overflows `height * (1 + width*channels)` to
    // a NegativeArraySizeException (escaping the Option contract), and
    // merely-huge dims force multi-GB buffers. zlib expands at most
    // ~1032× (1 literal byte per 2 stored bits, RFC 1951), so a raw
    // size beyond that bound of the IDAT bytes actually present cannot
    // inflate anyway and is rejected on the same line.
    val rawLen = (1L + width.toLong * channels) * height
    if (rawLen > Int.MaxValue.toLong || rawLen > 1032L * idat.size() + 64L)
      return None
    val rowBytes = width * channels
    val raw = new Array[Byte](rawLen.toInt)
    val inflater = new java.util.zip.Inflater()
    inflater.setInput(idat.toByteArray)
    var off = 0
    try {
      while (off < raw.length && !inflater.finished()) {
        val k = inflater.inflate(raw, off, raw.length - off)
        if (k == 0 && (inflater.needsInput() || inflater.needsDictionary()))
          return None // truncated stream or preset-dictionary zlib
        off += k
      }
    } catch { case _: java.util.zip.DataFormatException => return None }
    finally inflater.end()
    if (off != raw.length) return None // wrong-size stream
    // reverse the scanline filters in place into the pixel buffer
    val px = new Array[Byte](height * rowBytes)
    val bpp = channels
    var y = 0
    while (y < height) {
      val ft = raw(y * (1 + rowBytes)) & 0xff
      val src = y * (1 + rowBytes) + 1
      val dst = y * rowBytes
      var x = 0
      while (x < rowBytes) {
        val f = raw(src + x) & 0xff
        val a = if (x >= bpp) px(dst + x - bpp) & 0xff else 0 // left
        val up = if (y > 0) px(dst - rowBytes + x) & 0xff else 0 // above
        val c = if (x >= bpp && y > 0) px(dst - rowBytes + x - bpp) & 0xff
                else 0 // upper-left
        val recon = ft match {
          case 0 => f
          case 1 => f + a
          case 2 => f + up
          case 3 => f + (a + up) / 2
          case 4 =>
            // Paeth predictor (PNG spec §4.5.4)
            val p = a + up - c
            val pa = math.abs(p - a); val pb = math.abs(p - up)
            val pc = math.abs(p - c)
            f + (if (pa <= pb && pa <= pc) a else if (pb <= pc) up else c)
          case _ => return None // invalid filter type
        }
        px(dst + x) = (recon & 0xff).toByte
        x += 1
      }
      y += 1
    }
    Some(PixelFrame(width, height, channels, px))
  }

  /** Split a concatenated-PNG container into its member blobs: at each
    * cursor expect the 8-byte PNG signature, walk the chunk list (the
    * standard untrusted-size guards — negative or past-the-end lengths
    * stop the walk) to the IEND chunk, slice, repeat. Returns the
    * frames parsed BEFORE the first malformation — a truncated or
    * corrupted tail yields the clean prefix, never a spin or a throw.
    * This is the deterministic multi-frame "video" container the
    * synthetic corpus uses ([[graft.operators.Multimodal.attachVideoFrames]]):
    * real codecs differ, but the per-frame decode downstream is the
    * same real PNG pixel path either way.
    */
  def splitConcatenatedPngs(b: Array[Byte]): Seq[Array[Byte]] = {
    val out = Seq.newBuilder[Array[Byte]]
    var start = 0
    var ok = true
    while (ok && start + 8 <= b.length &&
        (0 until 8).forall(i => b(start + i) == PngSig(i))) {
      var i = start + 8
      var end = -1
      while (ok && end < 0 && i + 8 <= b.length) {
        val len = beU32(b, i).toInt
        if (len < 0 || len > b.length - i - 12) ok = false
        else {
          val typ = new String(b, i + 4, 4, "US-ASCII")
          i += 12 + len
          if (typ == "IEND") end = i
        }
      }
      if (end < 0) ok = false
      else {
        out += java.util.Arrays.copyOfRange(b, start, end)
        start = end
      }
    }
    out.result()
  }

  /** Canonical 44-byte-header PCM WAV around `payload` as the `data`
    * chunk (16-bit samples; frames = bytes / (channels·2)).
    */
  def buildWav(
      channels: Int, sampleRate: Int, payload: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(payload.length + 48)
    out.write("RIFF".getBytes("US-ASCII"), 0, 4)
    writeLeU32(out, 36L + payload.length)
    out.write("WAVE".getBytes("US-ASCII"), 0, 4)
    out.write("fmt ".getBytes("US-ASCII"), 0, 4)
    writeLeU32(out, 16L)
    writeLeU16(out, 1) // PCM
    writeLeU16(out, channels)
    writeLeU32(out, sampleRate.toLong)
    writeLeU32(out, sampleRate.toLong * channels * 2)
    writeLeU16(out, channels * 2)
    writeLeU16(out, 16)
    out.write("data".getBytes("US-ASCII"), 0, 4)
    writeLeU32(out, payload.length.toLong)
    out.write(payload, 0, payload.length)
    out.toByteArray
  }
}

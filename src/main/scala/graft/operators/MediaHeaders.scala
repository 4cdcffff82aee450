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

  // ── baseline JPEG pixel codec (real Huffman/DCT entropy path) ──────
  //
  // The JPEG rung of the pixel story: a REAL baseline sequential codec —
  // canonical Huffman tables read from the file's own DHT segments,
  // run-length AC decoding, dequantization, full 2-D IDCT — scoped to
  // 8-bit GRAYSCALE with no subsampling (the synthetic corpus is
  // gray-rendered; 3-component 4:2:0 adds chroma upsampling without
  // exercising any new entropy machinery, and is documented out of
  // scope in SURVEY §8). The ENCODER quantizes with a flat table of 8s:
  // a constant 8×8 block has only a DC coefficient 8·(g−128), exactly
  // divisible by the step, so block-constant images round-trip
  // LOSSLESSLY through the genuinely general lossy path — which is what
  // keeps the md5 block-formula oracle digit-exact over JPEG blobs.

  /** Natural-order index of each zigzag position (ISO/IEC 10918-1
    * Figure A.6 — the public scan order every JPEG file uses).
    */
  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  /** Encoder quant table: flat 8s (see the section comment — DC step 8
    * makes block-constant images lossless; a real pipeline would ship
    * per-quality tables through the same DQT plumbing).
    */
  private val PixelJpegQuant: Array[Int] = Array.fill(64)(8)

  // Encoder Huffman spec: VALID canonical tables built from counts, not
  // the Annex K defaults — 12 DC categories at length 4 (12 ≤ 16 codes,
  // none all-ones) and all 162 AC run/size symbols at length 8
  // (162 ≤ 256). Deliberately suboptimal but spec-legal; the DECODER
  // reads whatever tables the file declares, so it handles these AND
  // the standard tables other encoders (javax.imageio) write.
  private val DcBits: Array[Int] =
    Array(0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
  private val DcVals: Array[Int] = Array.tabulate(12)(identity)
  private val AcBits: Array[Int] =
    Array(0, 0, 0, 0, 0, 0, 0, 162, 0, 0, 0, 0, 0, 0, 0, 0)
  private val AcVals: Array[Int] =
    ((0x00 +: 0xF0 +: (for (r <- 0 to 15; s <- 1 to 10)
      yield (r << 4) | s)).sorted).toArray

  /** Canonical code assignment (code, length) per symbol — the JPEG
    * BITS/HUFFVAL convention: codes count up within a length, shift
    * left moving to the next.
    */
  private def canonicalCodes(
      bits: Array[Int], vals: Array[Int]): Map[Int, (Int, Int)] = {
    val m = Map.newBuilder[Int, (Int, Int)]
    var code = 0; var k = 0
    var len = 1
    while (len <= 16) {
      var i = 0
      while (i < bits(len - 1)) {
        m += vals(k) -> (code, len)
        code += 1; k += 1; i += 1
      }
      code <<= 1; len += 1
    }
    m.result()
  }

  /** Bit-serial writer with JPEG byte stuffing (0xFF → 0xFF 0x00) and
    * 1-padding on flush.
    */
  private final class JpegBitWriter(out: ByteArrayOutputStream) {
    private var acc = 0
    private var n = 0
    def write(bits: Int, count: Int): Unit = {
      var i = count - 1
      while (i >= 0) {
        acc = (acc << 1) | ((bits >>> i) & 1); n += 1
        if (n == 8) {
          out.write(acc)
          if (acc == 0xff) out.write(0x00)
          acc = 0; n = 0
        }
        i -= 1
      }
    }
    def flush(): Unit = if (n > 0) {
      val pad = (acc << (8 - n)) | ((1 << (8 - n)) - 1)
      out.write(pad)
      if (pad == 0xff) out.write(0x00)
      acc = 0; n = 0
    }
  }

  /** Magnitude category: bits needed for |v| (JPEG SSSS). */
  private def magCat(v: Int): Int =
    if (v == 0) 0 else 32 - Integer.numberOfLeadingZeros(math.abs(v))

  /** Exact separable double-precision FDCT (natural-order output). */
  private def fdct8(block: Array[Double]): Array[Double] = {
    val out = new Array[Double](64)
    var u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var s = 0.0
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            s += block(y * 8 + x) * CosTab(x * 8 + v) * CosTab(y * 8 + u)
            x += 1
          }
          y += 1
        }
        out(u * 8 + v) = 0.25 * s
        v += 1
      }
      u += 1
    }
    out
  }

  /** cos((2x+1)·u·π/16) scaled by 1/√2 at u = 0 — shared FDCT/IDCT
    * basis (ct(x·8+u)).
    */
  private val CosTab: Array[Double] = {
    val t = new Array[Double](64)
    var x = 0
    while (x < 8) {
      var u = 0
      while (u < 8) {
        t(x * 8 + u) = math.cos((2 * x + 1) * u * math.Pi / 16) *
          (if (u == 0) 1.0 / math.sqrt(2.0) else 1.0)
        u += 1
      }
      x += 1
    }
    t
  }

  /** Encode `gray` (row-major, 1 byte/pixel) as a REAL baseline
    * sequential grayscale JFIF: DQT/SOF0/DHT/SOS segments, per-block
    * FDCT + quantization + canonical-Huffman entropy coding with byte
    * stuffing, edge-replicated padding for non-multiple-of-8 dims.
    * Independent decoders (javax.imageio) read it exactly for
    * block-constant content — MultimodalSpec pins that.
    */
  def buildPixelJpeg(width: Int, height: Int, gray: Array[Byte]): Array[Byte] = {
    // SOF0 carries 16-bit dims; reject what the container cannot express
    // (and size the pixel check in Long so width*height cannot overflow
    // Int and let a wrong-sized array through)
    require(width >= 1 && width <= 0xffff && height >= 1 && height <= 0xffff,
      s"JPEG SOF0 dims must be 1..65535, got ${width}x$height")
    require(gray.length.toLong == width.toLong * height,
      s"need ${width.toLong * height} gray bytes, got ${gray.length}")
    val out = new ByteArrayOutputStream(gray.length / 2 + 512)
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    def segment(m: Int, body: Array[Int]): Unit = {
      marker(m)
      out.write((body.length + 2) >> 8); out.write((body.length + 2) & 0xff)
      body.foreach(out.write)
    }
    marker(0xd8) // SOI
    segment(0xdb, 0 +: Zigzag.map(PixelJpegQuant)) // DQT id 0, zigzag order
    segment(0xc0, Array(8, height >> 8, height & 0xff, width >> 8,
      width & 0xff, 1, 1, 0x11, 0)) // SOF0: 1 component, 1x1 sampling
    segment(0xc4, 0x00 +: (DcBits ++ DcVals)) // DHT DC 0
    segment(0xc4, 0x10 +: (AcBits ++ AcVals)) // DHT AC 0
    segment(0xda, Array(1, 1, 0x00, 0, 63, 0)) // SOS
    val bw = new JpegBitWriter(out)
    val dcCodes = canonicalCodes(DcBits, DcVals)
    val acCodes = canonicalCodes(AcBits, AcVals)
    val bw8 = (width + 7) / 8; val bh8 = (height + 7) / 8
    var dcPred = 0
    val blk = new Array[Double](64)
    var byi = 0
    while (byi < bh8) {
      var bxi = 0
      while (bxi < bw8) {
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            val sx = math.min(bxi * 8 + x, width - 1)
            val sy = math.min(byi * 8 + y, height - 1)
            blk(y * 8 + x) = (gray(sy * width + sx) & 0xff) - 128.0
            x += 1
          }
          y += 1
        }
        val coef = fdct8(blk)
        val q = new Array[Int](64)
        var j = 0
        while (j < 64) {
          q(j) = math.round(coef(j) / PixelJpegQuant(j)).toInt
          j += 1
        }
        val diff = q(0) - dcPred; dcPred = q(0)
        val t = magCat(diff)
        require(t <= 11, s"DC category $t out of table range")
        val (dc, dl) = dcCodes(t); bw.write(dc, dl)
        if (t > 0) bw.write(if (diff >= 0) diff else diff + (1 << t) - 1, t)
        var run = 0
        var k = 1
        while (k < 64) {
          val v = q(Zigzag(k))
          if (v == 0) run += 1
          else {
            while (run >= 16) {
              val (zc, zl) = acCodes(0xF0); bw.write(zc, zl); run -= 16
            }
            val s = magCat(v)
            require(s <= 10, s"AC size $s out of table range")
            val (ac, al) = acCodes((run << 4) | s); bw.write(ac, al)
            bw.write(if (v >= 0) v else v + (1 << s) - 1, s)
            run = 0
          }
          k += 1
        }
        if (run > 0) { val (ec, el) = acCodes(0x00); bw.write(ec, el) }
        bxi += 1
      }
      byi += 1
    }
    bw.flush()
    marker(0xd9)
    out.toByteArray
  }

  /** Canonical Huffman DECODER table from a DHT segment's BITS/HUFFVAL
    * (mincode/maxcode/valptr walk — ISO 10918-1 F.2.2.3).
    */
  private final class JpegHuffDec(bits: Array[Int], vals: Array[Int]) {
    private val minCode = new Array[Int](17)
    private val maxCode = new Array[Int](17)
    private val valPtr = new Array[Int](17)
    locally {
      var code = 0; var k = 0
      var l = 1
      while (l <= 16) {
        valPtr(l) = k; minCode(l) = code
        code += bits(l - 1); k += bits(l - 1)
        maxCode(l) = code - 1
        code <<= 1; l += 1
      }
    }
    def decode(r: JpegBitReader): Int = {
      var code = 0; var l = 0
      while (l < 16) {
        code = (code << 1) | r.readBit()
        l += 1
        if (bits(l - 1) > 0 && code <= maxCode(l))
          return vals(valPtr(l) + code - minCode(l))
      }
      throw new IllegalArgumentException("invalid huffman code")
    }
  }

  /** Bit-serial reader over the entropy segment: un-stuffs 0xFF 0x00,
    * throws on EOF or a bare marker mid-symbol (malformed stream — the
    * decoder's try/catch maps it to None), byte-aligns + consumes RSTn
    * at restart boundaries.
    */
  private final class JpegBitReader(b: Array[Byte], var pos: Int) {
    private var acc = 0
    private var n = 0
    def readBit(): Int = {
      if (n == 0) {
        if (pos >= b.length) throw new IllegalArgumentException("eof")
        var v = b(pos) & 0xff; pos += 1
        if (v == 0xff) {
          val nx = if (pos < b.length) b(pos) & 0xff else -1
          if (nx == 0x00) pos += 1
          else throw new IllegalArgumentException("marker inside symbol")
        }
        acc = v; n = 8
      }
      n -= 1
      (acc >>> n) & 1
    }
    def readBits(k: Int): Int = {
      var v = 0; var j = 0
      while (j < k) { v = (v << 1) | readBit(); j += 1 }
      v
    }
    def restartSync(): Unit = {
      n = 0 // discard pad bits
      if (pos + 2 > b.length || (b(pos) & 0xff) != 0xff ||
          (b(pos + 1) & 0xf8) != 0xd0)
        throw new IllegalArgumentException("expected restart marker")
      pos += 2
    }
  }

  private def jpegExtend(v: Int, t: Int): Int =
    if (v < (1 << (t - 1))) v - (1 << t) + 1 else v

  /** REAL pixel decode of a baseline sequential GRAYSCALE JPEG: marker
    * walk (untrusted-length guards), DQT/DHT tables read from the file,
    * canonical-Huffman entropy decode with byte unstuffing and restart
    * markers, dequantization, full double-precision IDCT, edge crop.
    * Returns None for non-JPEG blobs, color/subsampled/progressive/
    * arithmetic streams (documented grayscale-baseline scope), crafted
    * dimensions (the PNG guard's long-arithmetic discipline), or any
    * malformed segment — never throws, never spins.
    */
  def decodePixelJpeg(b: Array[Byte]): Option[PixelFrame] = {
    if (!isJpeg(b)) return None
    try decodePixelJpegImpl(b)
    catch { case _: RuntimeException => None }
  }

  private def decodePixelJpegImpl(b: Array[Byte]): Option[PixelFrame] = {
    val quant = Array.ofDim[Int](4, 64) // natural order
    val qSeen = new Array[Boolean](4)
    val dcTabs = new Array[JpegHuffDec](4)
    val acTabs = new Array[JpegHuffDec](4)
    var width = 0; var height = 0
    var compQ = 0
    var restart = 0
    var i = 2
    while (i + 2 <= b.length) {
      if ((b(i) & 0xff) != 0xff) return None
      val m = b(i + 1) & 0xff
      if (m == 0xff) i += 1 // fill byte
      else if (m == 0xd8 || m == 0x01 || (m >= 0xd0 && m <= 0xd7)) i += 2
      else {
        if (i + 4 > b.length) return None
        val len = beU16(b, i + 2)
        if (len < 2 || i + 2 + len > b.length) return None
        val seg = i + 4; val segEnd = i + 2 + len
        m match {
          case 0xdb => // DQT (possibly several tables per segment)
            var p = seg
            while (p < segEnd) {
              val pq = (b(p) >> 4) & 0xf; val tq = b(p) & 0xf
              if (pq != 0 || tq > 3 || p + 65 > segEnd) return None
              var k = 0
              while (k < 64) {
                quant(tq)(Zigzag(k)) = b(p + 1 + k) & 0xff; k += 1
              }
              qSeen(tq) = true
              p += 65
            }
          case 0xc4 => // DHT (possibly several tables per segment)
            var p = seg
            while (p < segEnd) {
              val tc = (b(p) >> 4) & 0xf; val th = b(p) & 0xf
              if (tc > 1 || th > 3 || p + 17 > segEnd) return None
              val bits = Array.tabulate(16)(j => b(p + 1 + j) & 0xff)
              val total = bits.sum
              if (total > 256 || p + 17 + total > segEnd) return None
              // canonical validity: assigning bits(l) codes at each
              // length must never overflow the code space (running
              // code count ≤ 2^len after each length) — an overfull
              // BITS array builds a table whose decode returns garbage
              // values in-bounds, breaking the malformed→None contract
              var code = 0; var l = 1
              while (l <= 16) {
                code += bits(l - 1)
                if (code > (1 << l)) return None
                code <<= 1; l += 1
              }
              val vals = Array.tabulate(total)(j => b(p + 17 + j) & 0xff)
              val t = new JpegHuffDec(bits, vals)
              if (tc == 0) dcTabs(th) = t else acTabs(th) = t
              p += 17 + total
            }
          case 0xc0 => // SOF0: baseline sequential only
            if (segEnd < seg + 9 || b(seg) != 8) return None
            height = beU16(b, seg + 1); width = beU16(b, seg + 3)
            // untrusted dims: long-arithmetic bound BEFORE any allocation
            if (width <= 0 || height <= 0 ||
                width.toLong * height > (1L << 26)) return None
            if ((b(seg + 5) & 0xff) != 1) return None // grayscale scope
            if ((b(seg + 7) & 0xff) != 0x11) return None // no subsampling
            compQ = b(seg + 8) & 0xf
          case x if x >= 0xc1 && x <= 0xcf && x != 0xc4 && x != 0xc8 =>
            return None // progressive/arithmetic/non-baseline SOF
          case 0xdd =>
            if (segEnd < seg + 2) return None
            restart = beU16(b, seg)
          case 0xda =>
            if (segEnd < seg + 6 || (b(seg) & 0xff) != 1) return None
            val td = (b(seg + 1 + 1) >> 4) & 0xf
            val ta = b(seg + 1 + 1) & 0xf
            if (width <= 0 || height <= 0 || !qSeen(compQ) ||
                dcTabs(td) == null || acTabs(ta) == null) return None
            return decodeJpegScanGray(
              b, segEnd, width, height, quant(compQ),
              dcTabs(td), acTabs(ta), restart)
          case 0xd9 => return None // EOI before any scan
          case _ => () // APPn / COM: skip by length
        }
        i += 2 + len
      }
    }
    None
  }

  private def decodeJpegScanGray(
      b: Array[Byte], start: Int, w: Int, h: Int,
      quant: Array[Int], dc: JpegHuffDec, ac: JpegHuffDec,
      restart: Int): Option[PixelFrame] = {
    val bw8 = (w + 7) / 8; val bh8 = (h + 7) / 8
    val px = new Array[Byte](w * h)
    val r = new JpegBitReader(b, start)
    val coef = new Array[Int](64)
    var dcPred = 0
    var mcu = 0
    var byi = 0
    while (byi < bh8) {
      var bxi = 0
      while (bxi < bw8) {
        if (restart > 0 && mcu > 0 && mcu % restart == 0) {
          r.restartSync(); dcPred = 0
        }
        java.util.Arrays.fill(coef, 0)
        val t = dc.decode(r)
        if (t > 11) return None
        val diff = if (t == 0) 0 else jpegExtend(r.readBits(t), t)
        dcPred += diff
        coef(0) = dcPred * quant(0)
        var k = 1
        var eob = false
        while (k < 64 && !eob) {
          val rs = ac.decode(r)
          val run = rs >> 4; val s = rs & 15
          if (s == 0) {
            if (run == 15) k += 16 else eob = true
          } else {
            k += run
            if (k > 63) return None
            coef(Zigzag(k)) = jpegExtend(r.readBits(s), s) * quant(Zigzag(k))
            k += 1
          }
        }
        // IDCT into the (cropped) pixel buffer
        var y = 0
        while (y < 8) {
          val yy = byi * 8 + y
          var x = 0
          while (x < 8) {
            val xx = bxi * 8 + x
            if (xx < w && yy < h) {
              var s = 0.0
              var u = 0
              while (u < 8) {
                var v = 0
                while (v < 8) {
                  val c = coef(u * 8 + v)
                  if (c != 0) s += c * CosTab(x * 8 + v) * CosTab(y * 8 + u)
                  v += 1
                }
                u += 1
              }
              val p = math.round(s / 4 + 128).toInt
              px(yy * w + xx) = math.max(0, math.min(255, p)).toByte
            }
            x += 1
          }
          y += 1
        }
        mcu += 1
        bxi += 1
      }
      byi += 1
    }
    Some(PixelFrame(w, h, 1, px))
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

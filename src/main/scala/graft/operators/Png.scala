package graft.operators

import java.util.zip.{CRC32, Deflater, Inflater}

/** A real PNG codec (pure JDK: `java.util.zip` for the zlib stream,
  * `CRC32` for chunk checksums) — the concrete decoder behind the
  * [[Multimodal.decodeFeatures]] seam for `image/png` payloads.
  *
  * Scope: non-interlaced 8-bit-per-channel images (gray, gray+alpha,
  * RGB, RGBA) — full chunk framing with CRC verification, multi-IDAT
  * reassembly, zlib inflate, and all five scanline filters (None, Sub,
  * Up, Average, Paeth) per the PNG specification §9 (public spec;
  * filter arithmetic is modulo-256 on unsigned bytes). Palette and
  * sub-byte depths are rejected loudly rather than mis-decoded.
  *
  * The encoder exists for deterministic test fixtures: it emits one
  * IHDR/IDAT/IEND stream with the scanline filter cycling `y % 5`, so a
  * decode exercises every filter type on every image taller than 4 rows.
  */
object Png {

  final val Signature: Array[Byte] =
    Array(137, 80, 78, 71, 13, 10, 26, 10).map(_.toByte)

  final case class Decoded(width: Int, height: Int, bitDepth: Int,
                           colorType: Int, pixels: Array[Byte]) {
    def channels: Int = Png.channels(colorType)
  }

  private def channels(colorType: Int): Int = colorType match {
    case 0 => 1 // grayscale
    case 2 => 3 // RGB
    case 4 => 2 // gray + alpha
    case 6 => 4 // RGBA
    case other => throw new IllegalArgumentException(
      s"unsupported PNG color type $other (palette/indexed not supported)")
  }

  // ---------------------------------------------------------------- encode

  /** Deterministic grayscale-8 encoder: `pixel(x, y)` ∈ [0, 256). */
  def encodeGray(width: Int, height: Int, pixel: (Int, Int) => Int): Array[Byte] =
    encode(width, height, 0, (x, y, _) => pixel(x, y))

  /** Deterministic 8-bit encoder for any supported color type:
    * `sample(x, y, channel)` ∈ [0, 256), channels per [[channels]].
    * Scanline filter cycles `y % 5`, so any image taller than 4 rows
    * exercises every filter type (with the correct `bpp` offsets for
    * multi-channel Sub/Average/Paeth). */
  def encode(width: Int, height: Int, colorType: Int,
             sample: (Int, Int, Int) => Int): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dimensions ${width}x$height")
    val bpp = channels(colorType)
    val stride = width * bpp
    // reconstructed scanline bytes, row-major — the filter predictors read
    // reconstructed (not source) neighbors, identical here for a lossless
    // encoder but laid out byte-wise so bpp offsets are explicit
    def at(x: Int, y: Int, c: Int): Int = sample(x, y, c) & 0xff
    val raw = new Array[Byte](height * (1 + stride))
    var pos = 0
    var y = 0
    while (y < height) {
      val filter = y % 5 // cycle all five filter types
      raw(pos) = filter.toByte
      pos += 1
      var i = 0
      while (i < stride) {
        val x = i / bpp
        val c = i % bpp
        val v = at(x, y, c)
        val left = if (x >= 1) at(x - 1, y, c) else 0
        val up = if (y >= 1) at(x, y - 1, c) else 0
        val ul = if (x >= 1 && y >= 1) at(x - 1, y - 1, c) else 0
        val pred = filter match {
          case 0 => 0
          case 1 => left
          case 2 => up
          case 3 => (left + up) / 2
          case 4 => paeth(left, up, ul)
        }
        raw(pos) = ((v - pred) & 0xff).toByte
        pos += 1
        i += 1
      }
      y += 1
    }
    val ihdr = new Array[Byte](13)
    writeIntBE(ihdr, 0, width)
    writeIntBE(ihdr, 4, height)
    ihdr(8) = 8 // bit depth
    ihdr(9) = colorType.toByte
    // compression=0, filter=0, interlace=0 already zero
    val out = new java.io.ByteArrayOutputStream()
    out.write(Signature)
    writeChunk(out, "IHDR", ihdr)
    writeChunk(out, "IDAT", deflate(raw))
    writeChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  private def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new Deflater(Deflater.DEFAULT_COMPRESSION)
    try {
      d.setInput(data)
      d.finish()
      val out = new java.io.ByteArrayOutputStream(data.length / 2 + 64)
      val buf = new Array[Byte](8192)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      out.toByteArray
    } finally d.end()
  }

  private def writeChunk(out: java.io.ByteArrayOutputStream, tpe: String,
                         data: Array[Byte]): Unit = {
    val len = new Array[Byte](4)
    writeIntBE(len, 0, data.length)
    out.write(len)
    val typeBytes = tpe.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    out.write(typeBytes)
    out.write(data)
    val crc = new CRC32()
    crc.update(typeBytes)
    crc.update(data)
    val c = new Array[Byte](4)
    writeIntBE(c, 0, crc.getValue.toInt)
    out.write(c)
  }

  private def writeIntBE(a: Array[Byte], off: Int, v: Int): Unit = {
    a(off) = (v >>> 24).toByte; a(off + 1) = (v >>> 16).toByte
    a(off + 2) = (v >>> 8).toByte; a(off + 3) = v.toByte
  }

  // ---------------------------------------------------------------- decode

  /** Full decode: chunk walk (CRC-verified) → IHDR dims → inflate IDAT →
    * unfilter. Returns the reconstructed raw pixel bytes, row-major,
    * `channels` bytes per pixel. */
  def decode(png: Array[Byte]): Decoded = {
    require(png.length >= 8 && Signature.indices.forall(i => png(i) == Signature(i)),
      "not a PNG (bad signature)")
    var pos = 8
    var width = 0
    var height = 0
    var bitDepth = 0
    var colorType = 0
    var seenIhdr = false
    val idat = new java.io.ByteArrayOutputStream()
    var done = false
    while (!done) {
      require(pos + 8 <= png.length, "truncated PNG (chunk header)")
      val len = readIntBE(png, pos)
      val tpe = new String(png, pos + 4, 4, java.nio.charset.StandardCharsets.US_ASCII)
      require(len >= 0 && pos + 12 + len <= png.length, s"truncated PNG ($tpe chunk)")
      val crc = new CRC32()
      crc.update(png, pos + 4, 4 + len)
      require(crc.getValue.toInt == readIntBE(png, pos + 8 + len),
        s"PNG CRC mismatch in $tpe chunk")
      tpe match {
        case "IHDR" =>
          require(len == 13, "bad IHDR length")
          width = readIntBE(png, pos + 8)
          height = readIntBE(png, pos + 12)
          bitDepth = png(pos + 16) & 0xff
          colorType = png(pos + 17) & 0xff
          require(png(pos + 20) == 0, "interlaced PNG not supported")
          require(bitDepth == 8, s"unsupported bit depth $bitDepth (8 only)")
          channels(colorType) // validates color type
          seenIhdr = true
        case "IDAT" => idat.write(png, pos + 8, len)
        case "IEND" => done = true
        case _ => // ancillary chunk — skip
      }
      pos += 12 + len
    }
    require(seenIhdr, "PNG missing IHDR")
    val bpp = channels(colorType)
    val stride = width * bpp
    val raw = inflate(idat.toByteArray, height * (1 + stride))
    require(raw.length == height * (1 + stride),
      s"PNG pixel data size mismatch: ${raw.length} vs ${height * (1 + stride)}")
    val pixels = new Array[Byte](height * stride)
    var y = 0
    while (y < height) {
      val filter = raw(y * (1 + stride)) & 0xff
      val src = y * (1 + stride) + 1
      val dst = y * stride
      var i = 0
      while (i < stride) {
        val x = raw(src + i) & 0xff
        val left = if (i >= bpp) pixels(dst + i - bpp) & 0xff else 0
        val up = if (y >= 1) pixels(dst - stride + i) & 0xff else 0
        val ul = if (i >= bpp && y >= 1) pixels(dst - stride + i - bpp) & 0xff else 0
        val v = filter match {
          case 0 => x
          case 1 => x + left
          case 2 => x + up
          case 3 => x + (left + up) / 2
          case 4 => x + paeth(left, up, ul)
          case other => throw new IllegalArgumentException(s"bad PNG filter type $other")
        }
        pixels(dst + i) = (v & 0xff).toByte
        i += 1
      }
      y += 1
    }
    Decoded(width, height, bitDepth, colorType, pixels)
  }

  private def inflate(data: Array[Byte], sizeHint: Int): Array[Byte] = {
    val inf = new Inflater()
    try {
      inf.setInput(data)
      val out = new java.io.ByteArrayOutputStream(math.max(sizeHint, 64))
      val buf = new Array[Byte](8192)
      while (!inf.finished()) {
        val n = inf.inflate(buf)
        if (n == 0 && inf.needsInput())
          throw new IllegalArgumentException("truncated zlib stream in PNG IDAT")
        out.write(buf, 0, n)
      }
      out.toByteArray
    } finally inf.end()
  }

  /** Paeth predictor (PNG spec §9.4). */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  private def readIntBE(a: Array[Byte], off: Int): Int =
    ((a(off) & 0xff) << 24) | ((a(off + 1) & 0xff) << 16) |
      ((a(off + 2) & 0xff) << 8) | (a(off + 3) & 0xff)

  /** Structural frame boundary for concatenated-PNG streams: chunk-walk
    * from `off` (which must hold a PNG signature) to the index just past
    * the IEND chunk's CRC. Splitting MUST be structural, not a
    * byte-signature scan — the 8 signature bytes can legitimately occur
    * inside compressed IDAT data, so a scan would split mid-frame. */
  def frameEnd(bytes: Array[Byte], off: Int): Int = {
    require(off + 8 <= bytes.length &&
      Signature.indices.forall(i => bytes(off + i) == Signature(i)),
      s"no PNG signature at offset $off")
    var pos = off + 8
    var tpe = ""
    while (tpe != "IEND") {
      require(pos + 8 <= bytes.length, "truncated PNG (chunk header)")
      val len = readIntBE(bytes, pos)
      tpe = new String(bytes, pos + 4, 4, java.nio.charset.StandardCharsets.US_ASCII)
      // long arithmetic: a crafted len near 2^31 would overflow the Int
      // sum, pass the bound check, and crash the walk with a raw
      // ArrayIndexOutOfBounds instead of this descriptive error
      require(len >= 0 && pos.toLong + 12 + len <= bytes.length, s"truncated PNG ($tpe chunk)")
      pos += 12 + len
    }
    pos
  }
}

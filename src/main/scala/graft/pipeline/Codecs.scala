package graft.pipeline

/** Real image codecs for the multimodal seam — public formats only,
  * decoded from bytes with no libraries: Windows BMP
  * (BITMAPINFOHEADER, uncompressed 24/32bpp) and binary PNM (P6 PPM /
  * P5 PGM, 8-bit). This replaces the stub for `image` payloads; audio
  * and video stay behind the documented stub (their codecs are not in
  * this container).
  *
  * Both formats are decoded fully — header AND pixels — so the
  * feature path reads real dimensions and real pixel statistics, and
  * a truncated or corrupt payload fails loudly instead of producing
  * fake features.
  */
object Codecs {

  /** Decoded raster: packed 0xRRGGBB pixels, row-major, top-down. */
  final case class Image(width: Int, height: Int, pixels: Array[Int]) {
    def meanLuma: Double =
      if (pixels.isEmpty) 0.0
      else pixels.map { p =>
        val r = (p >> 16) & 0xFF; val g = (p >> 8) & 0xFF; val b = p & 0xFF
        0.2126 * r + 0.7152 * g + 0.0722 * b
      }.sum / pixels.length
  }

  private def u16le(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8)
  private def i32le(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8) |
      ((b(i + 2) & 0xFF) << 16) | ((b(i + 3) & 0xFF) << 24)

  def isBmp(b: Array[Byte]): Boolean =
    b.length >= 2 && b(0) == 'B' && b(1) == 'M'
  def isPnm(b: Array[Byte]): Boolean =
    b.length >= 2 && b(0) == 'P' && (b(1) == '5' || b(1) == '6')

  /** Windows BMP: 14-byte file header + BITMAPINFOHEADER, BI_RGB
    * 24/32bpp, bottom-up (positive height) or top-down (negative).
    * Rows pad to 4-byte boundaries; pixels are stored BGR(A).
    */
  def decodeBmp(b: Array[Byte]): Image = {
    require(isBmp(b), "not a BMP: missing BM magic")
    require(b.length >= 54, s"BMP truncated: ${b.length} bytes")
    val dataOffset = i32le(b, 10)
    val dibSize = i32le(b, 14)
    require(dibSize >= 40, s"unsupported BMP DIB header size $dibSize")
    val width = i32le(b, 18)
    val rawHeight = i32le(b, 22)
    val topDown = rawHeight < 0
    val height = math.abs(rawHeight)
    val bpp = u16le(b, 28)
    val compression = i32le(b, 30)
    require(compression == 0, s"unsupported BMP compression $compression")
    require(bpp == 24 || bpp == 32, s"unsupported BMP bpp $bpp")
    require(width > 0 && height > 0, s"bad BMP dimensions ${width}x$rawHeight")
    val bytesPerPx = bpp / 8
    val rowStride = (width * bytesPerPx + 3) / 4 * 4
    require(b.length >= dataOffset + rowStride * height,
      s"BMP pixel data truncated: need ${dataOffset + rowStride * height}, have ${b.length}")
    val px = new Array[Int](width * height)
    var y = 0
    while (y < height) {
      val srcRow = if (topDown) y else height - 1 - y
      val base = dataOffset + srcRow * rowStride
      var x = 0
      while (x < width) {
        val i = base + x * bytesPerPx
        px(y * width + x) = ((b(i + 2) & 0xFF) << 16) |
          ((b(i + 1) & 0xFF) << 8) | (b(i) & 0xFF)
        x += 1
      }
      y += 1
    }
    Image(width, height, px)
  }

  /** Binary PNM: `P6` RGB or `P5` gray, ASCII header with
    * `#`-comments, 8-bit maxval, then raw samples.
    */
  def decodePnm(b: Array[Byte]): Image = {
    require(isPnm(b), "not a binary PNM: missing P5/P6 magic")
    val gray = b(1) == '5'
    var i = 2
    def skipWs(): Unit = {
      var going = true
      while (going && i < b.length) {
        val c = b(i).toChar
        if (c == '#') { while (i < b.length && b(i) != '\n') i += 1 }
        else if (c.isWhitespace) i += 1
        else going = false
      }
    }
    def int(): Int = {
      skipWs()
      val s = i
      while (i < b.length && (b(i) >= '0' && b(i) <= '9')) i += 1
      require(i > s, s"PNM header: expected integer at offset $s")
      new String(b, s, i - s, "US-ASCII").toInt
    }
    val width = int()
    val height = int()
    val maxval = int()
    require(maxval == 255, s"unsupported PNM maxval $maxval")
    require(width > 0 && height > 0, s"bad PNM dimensions ${width}x$height")
    i += 1 // single whitespace after maxval
    val spp = if (gray) 1 else 3
    require(b.length >= i + width * height * spp,
      s"PNM pixel data truncated: need ${i + width * height * spp}, have ${b.length}")
    val px = new Array[Int](width * height)
    var p = 0
    while (p < px.length) {
      val o = i + p * spp
      px(p) =
        if (gray) { val v = b(o) & 0xFF; (v << 16) | (v << 8) | v }
        else ((b(o) & 0xFF) << 16) | ((b(o + 1) & 0xFF) << 8) | (b(o + 2) & 0xFF)
      p += 1
    }
    Image(width, height, px)
  }

  /** Nearest-neighbor resize — pure integer pixel math, the
    * deterministic no-library kernel for the pipeline's image-resize
    * stage. Source coordinate = floor(dst * src / dstSize), the
    * standard NN mapping (no smoothing, bit-exact across platforms).
    */
  def resize(img: Image, w: Int, h: Int): Image = {
    require(w > 0 && h > 0, s"bad resize target ${w}x$h")
    val out = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      val sy = (y.toLong * img.height / h).toInt
      val srcRow = sy * img.width
      val dstRow = y * w
      var x = 0
      while (x < w) {
        out(dstRow + x) = img.pixels(srcRow + (x.toLong * img.width / w).toInt)
        x += 1
      }
      y += 1
    }
    Image(w, h, out)
  }

  /** Minimal 24bpp bottom-up BMP encoder — the test vector source and
    * the round-trip check for [[decodeBmp]].
    */
  def encodeBmp(img: Image): Array[Byte] = {
    val rowStride = (img.width * 3 + 3) / 4 * 4
    val dataSize = rowStride * img.height
    val out = new Array[Byte](54 + dataSize)
    def put32(i: Int, v: Int): Unit = {
      out(i) = v.toByte; out(i + 1) = (v >> 8).toByte
      out(i + 2) = (v >> 16).toByte; out(i + 3) = (v >> 24).toByte
    }
    out(0) = 'B'; out(1) = 'M'
    put32(2, out.length); put32(10, 54); put32(14, 40)
    put32(18, img.width); put32(22, img.height)
    out(26) = 1; out(28) = 24
    put32(34, dataSize)
    for (y <- 0 until img.height; x <- 0 until img.width) {
      val p = img.pixels(y * img.width + x)
      val base = 54 + (img.height - 1 - y) * rowStride + x * 3
      out(base) = (p & 0xFF).toByte
      out(base + 1) = ((p >> 8) & 0xFF).toByte
      out(base + 2) = ((p >> 16) & 0xFF).toByte
    }
    out
  }

  // ------------------------------------------------------------------
  // PNG — truecolor 8-bit (color type 2), written from the public spec
  // (RFC 2083 / W3C PNG): chunk walk, zlib IDAT via the JDK
  // Inflater/Deflater, full scanline defiltering (None/Sub/Up/Average/
  // Paeth). The dominant web-image container a crawl corpus actually
  // carries.
  // ------------------------------------------------------------------

  private val PngSig = Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A)
    .map(_.toByte)

  def isPng(b: Array[Byte]): Boolean =
    b.length >= 8 && PngSig.indices.forall(i => b(i) == PngSig(i))

  private def u32be(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xFF) << 24) | ((b(i + 1) & 0xFF) << 16) |
      ((b(i + 2) & 0xFF) << 8) | (b(i + 3) & 0xFF)

  /** Paeth predictor (PNG spec §6.6): nearest of left/up/up-left to
    * the linear estimate a + b − c, ties a > b > c.
    */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** PNG decode: signature + chunk walk (IHDR geometry, concatenated
    * IDAT zlib stream), inflate, per-scanline filter inversion. Only
    * the shape this corpus stores — 8-bit truecolor, no interlace — is
    * accepted; anything else fails typed, never silently.
    */
  def decodePng(b: Array[Byte]): Image = {
    require(isPng(b), "not a PNG: missing signature")
    var i = 8
    var w = 0; var h = 0
    val idat = new java.io.ByteArrayOutputStream()
    var sawEnd = false
    while (!sawEnd && i + 8 <= b.length) {
      val len = u32be(b, i)
      val typ = new String(b, i + 4, 4, "US-ASCII")
      // len is a u31 per the PNG spec; a crafted high-bit length would
      // read negative here and corrupt the chunk walk.
      require(len >= 0, s"PNG chunk $typ has invalid length")
      require(i + 12 + len <= b.length, s"PNG chunk $typ truncated")
      typ match {
        case "IHDR" =>
          require(len == 13, s"bad IHDR length $len")
          w = u32be(b, i + 8); h = u32be(b, i + 12)
          val depth = b(i + 16) & 0xFF; val color = b(i + 17) & 0xFF
          val interlace = b(i + 20) & 0xFF
          require(depth == 8 && color == 2,
            s"unsupported PNG depth/color $depth/$color (8-bit truecolor only)")
          require(interlace == 0, "interlaced PNG unsupported")
        case "IDAT" => idat.write(b, i + 8, len)
        case "IEND" => sawEnd = true
        case _      => () // ancillary chunks skipped
      }
      i += 12 + len
    }
    require(w > 0 && h > 0, s"bad PNG dimensions ${w}x$h")
    // Untrusted-input cap: (3w+1)*h must fit an Int allocation. 2^26
    // pixels (~192 MiB decoded) is far beyond any corpus thumbnail and
    // keeps one raster bounded per task.
    require(w.toLong * h <= (1L << 26),
      s"PNG dimensions ${w}x$h exceed decode cap (${1L << 26} pixels)")
    val inf = new java.util.zip.Inflater()
    inf.setInput(idat.toByteArray)
    val stride = w * 3
    val raw = new Array[Byte]((stride + 1) * h)
    var off = 0
    while (off < raw.length && !inf.finished()) {
      val n = inf.inflate(raw, off, raw.length - off)
      // n==0 without finish means the stream stalled (truncated input,
      // FDICT/preset-dictionary, or needsDictionary) — fail typed
      // rather than spinning; this codec decodes untrusted payloads.
      require(n > 0 || inf.finished(),
        if (inf.needsDictionary()) "PNG IDAT requires a preset dictionary (unsupported)"
        else "PNG IDAT stream stalled or truncated")
      off += n
    }
    inf.end()
    require(off == raw.length,
      s"PNG pixel data truncated: need ${raw.length}, inflated $off")
    // defilter in place: recon(x) depends on the reconstructed row above
    val recon = new Array[Int](stride * h)
    var y = 0
    while (y < h) {
      val ft = raw(y * (stride + 1)) & 0xFF
      var x = 0
      while (x < stride) {
        val cur = raw(y * (stride + 1) + 1 + x) & 0xFF
        val left = if (x >= 3) recon(y * stride + x - 3) else 0
        val up = if (y > 0) recon((y - 1) * stride + x) else 0
        val ul = if (y > 0 && x >= 3) recon((y - 1) * stride + x - 3) else 0
        val v = ft match {
          case 0 => cur
          case 1 => cur + left
          case 2 => cur + up
          case 3 => cur + ((left + up) / 2)
          case 4 => cur + paeth(left, up, ul)
          case other => throw new IllegalArgumentException(
            s"bad PNG filter type $other at row $y")
        }
        recon(y * stride + x) = v & 0xFF
        x += 1
      }
      y += 1
    }
    val px = Array.tabulate(w * h) { p =>
      val base = p * 3
      (recon(base) << 16) | (recon(base + 1) << 8) | recon(base + 2)
    }
    Image(w, h, px)
  }

  /** PNG encoder (truecolor 8-bit): the test-vector source and the
    * round-trip check for [[decodePng]]. Filter types CYCLE per row
    * (y % 5) so every defilter path is exercised by construction.
    */
  def encodePng(img: Image): Array[Byte] = {
    val stride = img.width * 3
    val recon = new Array[Int](stride * img.height)
    for (p <- 0 until img.width * img.height) {
      val v = img.pixels(p)
      recon(p * 3) = (v >> 16) & 0xFF
      recon(p * 3 + 1) = (v >> 8) & 0xFF
      recon(p * 3 + 2) = v & 0xFF
    }
    val raw = new Array[Byte]((stride + 1) * img.height)
    for (y <- 0 until img.height) {
      val ft = y % 5
      raw(y * (stride + 1)) = ft.toByte
      for (x <- 0 until stride) {
        val cur = recon(y * stride + x)
        val left = if (x >= 3) recon(y * stride + x - 3) else 0
        val up = if (y > 0) recon((y - 1) * stride + x) else 0
        val ul = if (y > 0 && x >= 3) recon((y - 1) * stride + x - 3) else 0
        val f = ft match {
          case 0 => cur
          case 1 => cur - left
          case 2 => cur - up
          case 3 => cur - ((left + up) / 2)
          case 4 => cur - paeth(left, up, ul)
        }
        raw(y * (stride + 1) + 1 + x) = (f & 0xFF).toByte
      }
    }
    val deflated = {
      val d = new java.util.zip.Deflater()
      d.setInput(raw); d.finish()
      val buf = new java.io.ByteArrayOutputStream()
      val tmp = new Array[Byte](8192)
      while (!d.finished()) buf.write(tmp, 0, d.deflate(tmp))
      d.end()
      buf.toByteArray
    }
    val out = new java.io.ByteArrayOutputStream()
    out.write(PngSig)
    def be(v: Int): Array[Byte] = Array((v >>> 24).toByte,
      (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    def chunk(typ: String, data: Array[Byte]): Unit = {
      out.write(be(data.length))
      val tb = typ.getBytes("US-ASCII")
      out.write(tb); out.write(data)
      val crc = new java.util.zip.CRC32()
      crc.update(tb); crc.update(data)
      out.write(be(crc.getValue.toInt))
    }
    val ihdr = new Array[Byte](13)
    def be32(a: Array[Byte], i: Int, v: Int): Unit = {
      a(i) = (v >>> 24).toByte; a(i + 1) = (v >>> 16).toByte
      a(i + 2) = (v >>> 8).toByte; a(i + 3) = v.toByte
    }
    be32(ihdr, 0, img.width); be32(ihdr, 4, img.height)
    ihdr(8) = 8; ihdr(9) = 2 // depth 8, truecolor
    chunk("IHDR", ihdr)
    chunk("IDAT", deflated)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  // ------------------------------------------------------------------
  // RIFF/WAVE PCM audio — the same public-container-format discipline
  // as BMP/PNM (header walk + raw samples, no codec library).
  // ------------------------------------------------------------------

  /** Decoded PCM audio: interleaved samples normalized to Int
    * (8-bit unsigned recentered to signed, 16-bit LE as-is).
    */
  final case class Audio(sampleRate: Int, channels: Int,
      bitsPerSample: Int, samples: Array[Int]) {
    def framesPerChannel: Int =
      if (channels == 0) 0 else samples.length / channels
    def durationSec: Double =
      if (sampleRate == 0) 0.0 else framesPerChannel.toDouble / sampleRate
    def rms: Double =
      if (samples.isEmpty) 0.0
      else math.sqrt(samples.map(s => s.toDouble * s).sum / samples.length)
  }

  def isWav(b: Array[Byte]): Boolean =
    b.length >= 12 &&
      b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'

  /** RIFF/WAVE PCM decoder: chunk walk over "fmt " + "data"
    * (format 1 = integer PCM, 8 or 16 bits). Malformed or compressed
    * payloads fail loudly — same policy as [[decodeBmp]].
    */
  def decodeWav(b: Array[Byte]): Audio = {
    require(isWav(b), "not a RIFF/WAVE payload")
    var pos = 12
    var sampleRate = 0
    var channels = 0
    var bits = 0
    var fmtSeen = false
    var samples: Array[Int] = null
    while (pos + 8 <= b.length && samples == null) {
      val id = new String(b, pos, 4, "US-ASCII")
      val size = i32le(b, pos + 4)
      require(size >= 0 && pos + 8 + size <= b.length,
        s"truncated WAV chunk $id ($size bytes at $pos)")
      id match {
        case "fmt " =>
          require(size >= 16, "fmt chunk too short")
          val audioFormat = u16le(b, pos + 8)
          require(audioFormat == 1, s"not integer PCM (format $audioFormat)")
          channels = u16le(b, pos + 10)
          sampleRate = i32le(b, pos + 12)
          bits = u16le(b, pos + 22)
          require(bits == 8 || bits == 16, s"unsupported bit depth $bits")
          require(channels > 0, "zero channels")
          fmtSeen = true
        case "data" =>
          require(fmtSeen, "data chunk before fmt")
          val n = if (bits == 8) size else size / 2
          val out = new Array[Int](n)
          var i = 0
          while (i < n) {
            out(i) =
              if (bits == 8) (b(pos + 8 + i) & 0xFF) - 128
              else (u16le(b, pos + 8 + 2 * i).toShort).toInt
            i += 1
          }
          samples = out
        case _ => // skip LIST/INFO/fact chunks
      }
      pos += 8 + size + (size & 1) // chunks are word-aligned
    }
    require(samples != null, "no data chunk")
    Audio(sampleRate, channels, bits, samples)
  }

  // ------------------------------------------------------------------
  // RIFF/AVI uncompressed-DIB video — the same public-container-walk
  // discipline as WAV/BMP: hdrl header walk for stream geometry, movi
  // walk for frames, each frame a BI_RGB 24bpp bottom-up DIB decoded
  // with the BMP row logic. No codec library; compressed streams fail
  // loudly.
  // ------------------------------------------------------------------

  /** Decoded video: per-frame rasters plus the frame clock. */
  final case class Video(width: Int, height: Int,
      microSecPerFrame: Int, frames: Array[Image]) {
    def nFrames: Int = frames.length
    def durationSec: Double = nFrames.toDouble * microSecPerFrame / 1e6
    def meanLuma: Double =
      if (frames.isEmpty) 0.0 else frames.map(_.meanLuma).sum / frames.length
  }

  def isAvi(b: Array[Byte]): Boolean =
    b.length >= 12 &&
      b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'A' && b(9) == 'V' && b(10) == 'I' && b(11) == ' '

  /** Every k-th frame, starting at frame 0; the frame clock stretches
    * by k so wall-clock duration is preserved — the pipeline's
    * frame-sampling stage (training corpora rarely keep every frame).
    */
  def sampleFrames(v: Video, every: Int): Video = {
    require(every >= 1, s"bad frame-sample stride $every")
    val kept = Array.newBuilder[Image]
    var i = 0
    while (i < v.frames.length) { kept += v.frames(i); i += every }
    Video(v.width, v.height, v.microSecPerFrame * every, kept.result())
  }

  /** Raw DIB pixel array (no file header): BI_RGB 24bpp, bottom-up
    * rows padded to 4 bytes — the payload of an AVI '00db' chunk.
    */
  private def decodeDib(b: Array[Byte], off: Int, len: Int,
      width: Int, height: Int): Image = {
    val rowStride = (width * 3 + 3) / 4 * 4
    require(len >= rowStride * height,
      s"DIB frame truncated: need ${rowStride * height}, have $len")
    val px = new Array[Int](width * height)
    var y = 0
    while (y < height) {
      val base = off + (height - 1 - y) * rowStride
      var x = 0
      while (x < width) {
        val i = base + x * 3
        px(y * width + x) = ((b(i + 2) & 0xFF) << 16) |
          ((b(i + 1) & 0xFF) << 8) | (b(i) & 0xFF)
        x += 1
      }
      y += 1
    }
    Image(width, height, px)
  }

  /** RIFF/AVI decoder: LIST hdrl (avih frame clock + strl vids
    * geometry, BI_RGB 24bpp only) then LIST movi ('00db'/'00dc'
    * frame chunks, decoded as raw DIBs). Anything compressed,
    * truncated, or missing fails loudly — same policy as
    * [[decodeBmp]]/[[decodeWav]].
    */
  def decodeAvi(b: Array[Byte]): Video = {
    require(isAvi(b), "not a RIFF/AVI payload")
    var usPerFrame = 0
    var width = 0
    var height = 0
    var bpp = 0
    var compression = -1
    var vidsSeen = false
    val frames = Array.newBuilder[Image]

    def walk(start: Int, end: Int, ctx: String): Unit = {
      var pos = start
      while (pos + 8 <= end) {
        val id = new String(b, pos, 4, "US-ASCII")
        val size = i32le(b, pos + 4)
        require(size >= 0 && pos + 8 + size <= end,
          s"truncated AVI chunk $id ($size bytes at $pos)")
        if (id == "LIST") {
          val sub = new String(b, pos + 8, 4, "US-ASCII")
          walk(pos + 12, pos + 8 + size, sub)
        } else (ctx, id) match {
          case ("hdrl", "avih") =>
            require(size >= 40, "avih chunk too short")
            usPerFrame = i32le(b, pos + 8)
            width = i32le(b, pos + 40)
            height = i32le(b, pos + 44)
          case ("strl", "strh") =>
            val fcc = new String(b, pos + 8, 4, "US-ASCII")
            if (fcc == "vids") vidsSeen = true
          case ("strl", "strf") if vidsSeen && compression < 0 =>
            require(size >= 40, "strf BITMAPINFOHEADER too short")
            bpp = u16le(b, pos + 8 + 14)
            compression = i32le(b, pos + 8 + 16)
          case ("movi", frameId)
              if frameId.endsWith("db") || frameId.endsWith("dc") =>
            require(compression == 0,
              s"not an uncompressed-DIB stream (biCompression $compression)")
            require(bpp == 24, s"unsupported AVI frame bpp $bpp")
            require(width > 0 && height > 0,
              s"bad AVI dimensions ${width}x$height")
            frames += decodeDib(b, pos + 8, size, width, height)
          case _ => // skip idx1 / JUNK / INFO chunks
        }
        pos += 8 + size + (size & 1) // chunks are word-aligned
      }
    }
    walk(12, b.length, "AVI ")
    require(vidsSeen, "no vids stream header")
    val fs = frames.result()
    require(fs.nonEmpty, "no frame chunks in movi list")
    Video(width, height, usPerFrame, fs)
  }

  /** Minimal single-stream uncompressed AVI encoder — test-vector
    * source and the round-trip check for [[decodeAvi]].
    */
  def encodeAvi(v: Video): Array[Byte] = {
    require(v.frames.nonEmpty, "cannot encode zero frames")
    val w = v.width
    val h = v.height
    val rowStride = (w * 3 + 3) / 4 * 4
    val frameSize = rowStride * h
    val moviSize = 4 + v.frames.length * (8 + frameSize)
    val hdrlSize = 4 + (8 + 56) + (8 + (4 + (8 + 56) + (8 + 40)))
    val riffSize = 4 + (8 + hdrlSize) + (8 + moviSize)
    val out = new Array[Byte](8 + riffSize)
    var p = 0
    def tag(s: String): Unit = {
      s.getBytes("US-ASCII").foreach { c => out(p) = c; p += 1 }
    }
    def put32(x: Int): Unit = {
      out(p) = x.toByte; out(p + 1) = (x >> 8).toByte
      out(p + 2) = (x >> 16).toByte; out(p + 3) = (x >> 24).toByte
      p += 4
    }
    def put16(x: Int): Unit = {
      out(p) = x.toByte; out(p + 1) = (x >> 8).toByte; p += 2
    }
    tag("RIFF"); put32(riffSize); tag("AVI ")
    tag("LIST"); put32(hdrlSize); tag("hdrl")
    tag("avih"); put32(56)
    put32(v.microSecPerFrame); put32(0); put32(0); put32(0)
    put32(v.frames.length); put32(0); put32(1); put32(frameSize)
    put32(w); put32(h); put32(0); put32(0); put32(0); put32(0)
    tag("LIST"); put32(4 + (8 + 56) + (8 + 40)); tag("strl")
    tag("strh"); put32(56)
    tag("vids"); tag("DIB "); put32(0); put16(0); put16(0); put32(0)
    put32(1) // dwScale
    put32(if (v.microSecPerFrame > 0) 1000000 / v.microSecPerFrame else 0)
    put32(0); put32(v.frames.length); put32(frameSize); put32(-1)
    put32(0); put16(0); put16(0); put16(w); put16(h)
    tag("strf"); put32(40)
    put32(40); put32(w); put32(h); put16(1); put16(24)
    put32(0); put32(frameSize); put32(0); put32(0); put32(0); put32(0)
    tag("LIST"); put32(moviSize); tag("movi")
    v.frames.foreach { img =>
      tag("00db"); put32(frameSize)
      for (y <- 0 until h; x <- 0 until w) {
        val c = img.pixels(y * w + x)
        val base = p + (h - 1 - y) * rowStride + x * 3
        out(base) = (c & 0xFF).toByte
        out(base + 1) = ((c >> 8) & 0xFF).toByte
        out(base + 2) = ((c >> 16) & 0xFF).toByte
      }
      p += frameSize
    }
    require(p == out.length, s"encoder layout drift: $p vs ${out.length}")
    out
  }

  /** Minimal 16-bit PCM WAV encoder — test-vector source and the
    * round-trip check for [[decodeWav]].
    */
  def encodeWav(a: Audio): Array[Byte] = {
    require(a.bitsPerSample == 16, "encoder writes 16-bit PCM")
    val dataSize = a.samples.length * 2
    val out = new Array[Byte](44 + dataSize)
    def put32(i: Int, v: Int): Unit = {
      out(i) = v.toByte; out(i + 1) = (v >> 8).toByte
      out(i + 2) = (v >> 16).toByte; out(i + 3) = (v >> 24).toByte
    }
    def put16(i: Int, v: Int): Unit = {
      out(i) = v.toByte; out(i + 1) = (v >> 8).toByte
    }
    def tag(i: Int, s: String): Unit =
      s.getBytes("US-ASCII").zipWithIndex.foreach { case (c, j) => out(i + j) = c }
    tag(0, "RIFF"); put32(4, 36 + dataSize); tag(8, "WAVE")
    tag(12, "fmt "); put32(16, 16); put16(20, 1); put16(22, a.channels)
    put32(24, a.sampleRate)
    put32(28, a.sampleRate * a.channels * 2)
    put16(32, a.channels * 2); put16(34, 16)
    tag(36, "data"); put32(40, dataSize)
    a.samples.zipWithIndex.foreach { case (s, i) => put16(44 + 2 * i, s) }
    out
  }
}

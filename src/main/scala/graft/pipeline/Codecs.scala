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
}

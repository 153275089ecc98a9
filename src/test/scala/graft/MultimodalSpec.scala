package graft

import org.apache.spark.sql.functions._

import graft.pipeline.{Codecs, Multimodal}
import graft.pipeline.Multimodal.{ImageDecoder, MediaItem, StubDecoder}

/** Plumbing tests for the multimodal pipeline: encoder round-trip,
  * partition-batched featurize, determinism, schema.
  */
class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  private def items = Seq(
    MediaItem(1L, "image", Array[Byte](100, 7, 1, 2), "a"),
    MediaItem(2L, "video", Array[Byte](33, 5), "a"),
    MediaItem(3L, "audio", Array[Byte](-1, -2, 3), "b"),
    MediaItem(4L, "image", Array.emptyByteArray, "b")
  ).toDS()

  test("featurize is deterministic and batch-shaped") {
    val out = Multimodal.featurize(items.repartition(3), StubDecoder)
      .collect().sortBy(_.media_id)
    assert(out.map(_.media_id).toSeq == Seq(1L, 2L, 3L, 4L))
    assert(out.map(_.n_bytes).toSeq == Seq(4, 2, 3, 0))
    // stub decode: width = b0 % 64 + 16
    assert(out(0).width == 100 % 64 + 16)
    assert(out(1).n_frames == 33 % 30 + 1) // video frames from b0
    assert(out(2).n_frames == (254 % 100) + 1) // audio frames from b1 (unsigned)
    assert(out(3).width == 16 && out(3).height == 16 && out(3).n_frames == 1)
    // running twice yields identical results (stub is pure)
    val again = Multimodal.featurize(items, StubDecoder).collect().sortBy(_.media_id)
    assert(out.toSeq == again.toSeq)
  }

  test("BMP codec: real header+pixel decode, padded rows, round-trip") {
    // 3x2 image with distinct per-pixel colors; 3*3=9-byte rows pad to 12
    val src = Codecs.Image(3, 2, Array(
      0xFF0000, 0x00FF00, 0x0000FF,
      0x102030, 0x405060, 0x708090))
    val bytes = Codecs.encodeBmp(src)
    assert(bytes.length == 54 + 12 * 2) // row stride padded to 4B
    val img = Codecs.decodeBmp(bytes)
    assert(img.width == 3 && img.height == 2)
    assert(img.pixels.toSeq == src.pixels.toSeq) // bottom-up storage undone
    assert(math.abs(img.meanLuma - src.meanLuma) < 1e-12)
    // corrupt/truncated data fails loudly
    intercept[IllegalArgumentException](Codecs.decodeBmp(bytes.take(40)))
    intercept[IllegalArgumentException](
      Codecs.decodeBmp("JUNKJUNKJUNK".getBytes("US-ASCII")))
  }

  test("PNG codec: zlib IDAT + all five filter types round-trip") {
    // 7 rows so the encoder's per-row filter cycle (y % 5) exercises
    // None/Sub/Up/Average/Paeth AND repeats two of them
    val w = 5; val h = 7
    val src = Codecs.Image(w, h,
      Array.tabulate(w * h)(i => (i * 0x01030B + 0xA0) & 0xFFFFFF))
    val bytes = Codecs.encodePng(src)
    assert(Codecs.isPng(bytes))
    val img = Codecs.decodePng(bytes)
    assert(img.width == w && img.height == h)
    assert(img.pixels.toSeq == src.pixels.toSeq)
    // 1x1 edge (no left/up neighbors on any filter path)
    val one = Codecs.Image(1, 1, Array(0x123456))
    assert(Codecs.decodePng(Codecs.encodePng(one)).pixels.toSeq == Seq(0x123456))
    // corrupt payloads fail loudly
    intercept[IllegalArgumentException](Codecs.decodePng(bytes.take(20)))
    intercept[IllegalArgumentException](
      Codecs.decodePng("JUNKJUNKJUNK".getBytes("US-ASCII")))
  }

  test("PNG codec: crafted/corrupt input fails typed, never hangs or overflows") {
    def u32(v: Long): Array[Byte] = Array(
      ((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
      ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
    val sig = Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)
    def chunk(typ: String, body: Array[Byte], lenOverride: Option[Long] = None) =
      u32(lenOverride.getOrElse(body.length.toLong)) ++
        typ.getBytes("US-ASCII") ++ body ++ u32(0L) // CRC unchecked
    def ihdr(w: Long, h: Long) =
      chunk("IHDR", u32(w) ++ u32(h) ++ Array[Byte](8, 2, 0, 0, 0))
    // negative (high-bit) chunk length → typed require, not a corrupt walk
    val negLen = sig ++ chunk("IHDR", Array.fill[Byte](13)(0),
      lenOverride = Some(0x80000001L))
    val e1 = intercept[IllegalArgumentException](Codecs.decodePng(negLen))
    assert(e1.getMessage.contains("invalid length"))
    // huge w*h (Int-overflow territory) → decode cap, not NegativeArraySize
    val huge = sig ++ ihdr(0x40000000L, 0x40000000L) ++
      chunk("IDAT", Array[Byte](0x78, 0x01)) ++ chunk("IEND", Array.empty)
    val e2 = intercept[IllegalArgumentException](Codecs.decodePng(huge))
    assert(e2.getMessage.contains("decode cap"))
    // a zlib stream that STALLS (FDICT preset-dictionary flags) must
    // fail typed instead of spinning the inflate loop forever
    val src = Codecs.Image(2, 2, Array(1, 2, 3, 4))
    val deflater = new java.util.zip.Deflater()
    deflater.setDictionary(Array[Byte](1, 2, 3))
    deflater.setInput(Array.fill[Byte](3 * 2 + 1)(0) ++ Array.fill[Byte](3 * 2 + 1)(0))
    deflater.finish()
    val dictStream = {
      val buf = new Array[Byte](256)
      val n = deflater.deflate(buf)
      buf.take(n)
    }
    val fdict = sig ++ ihdr(2, 2) ++ chunk("IDAT", dictStream) ++
      chunk("IEND", Array.empty)
    val e3 = intercept[IllegalArgumentException](Codecs.decodePng(fdict))
    assert(e3.getMessage.contains("dictionary") || e3.getMessage.contains("stalled"))
  }

  test("PNM codec: P6 RGB and P5 gray with comments decode") {
    val p6 = ("P6\n# a comment\n2 2\n255\n").getBytes("US-ASCII") ++
      Array[Byte](255.toByte, 0, 0, 0, 255.toByte, 0,
        0, 0, 255.toByte, 10, 20, 30)
    val rgb = Codecs.decodePnm(p6)
    assert(rgb.width == 2 && rgb.height == 2)
    assert(rgb.pixels.toSeq ==
      Seq(0xFF0000, 0x00FF00, 0x0000FF, 0x0A141E))
    val p5 = "P5\n3 1\n255\n".getBytes("US-ASCII") ++
      Array[Byte](0, 127, 255.toByte)
    val gray = Codecs.decodePnm(p5)
    assert(gray.pixels.toSeq == Seq(0x000000, 0x7F7F7F, 0xFFFFFF))
    intercept[IllegalArgumentException](
      Codecs.decodePnm("P6\n2 2\n255\nxx".getBytes("US-ASCII")))
  }

  test("PNG payloads dispatch through ImageDecoder and resizeImages") {
    val src = Codecs.Image(4, 3,
      Array.tabulate(12)(i => (i * 0x050307) & 0xFFFFFF))
    val png = Codecs.encodePng(src)
    assert(Multimodal.ImageDecoder.decode("image", png) == ((4, 3, 1)))
    val item = MediaItem(1L, "image", png, "s")
    val resized = Multimodal.resizeImages(
      Seq(item).toDS(), 2, 2).collect().head
    assert(Codecs.decodeBmp(resized.payload).width == 2)
  }

  test("ImageDecoder drives real decode through the featurize seam") {
    val bmp = Codecs.encodeBmp(Codecs.Image(5, 4, Array.fill(20)(0x336699)))
    val ppm = "P6\n7 3\n255\n".getBytes("US-ASCII") ++ Array.fill[Byte](63)(1)
    val real = Seq(
      MediaItem(1L, "image", bmp, "a"),
      MediaItem(2L, "image", ppm, "a"),
      MediaItem(3L, "video", Array[Byte](33, 5), "b") // still stubbed
    ).toDS()
    val out = Multimodal.featurize(real.repartition(2), ImageDecoder)
      .collect().sortBy(_.media_id)
    assert((out(0).width, out(0).height, out(0).n_frames) == ((5, 4, 1)))
    assert((out(1).width, out(1).height, out(1).n_frames) == ((7, 3, 1)))
    assert(out(2).n_frames == 33 % 30 + 1)
    // non-image bytes under kind=image must fail, not fake dimensions
    val junk = Seq(MediaItem(9L, "image", Array[Byte](1, 2, 3), "x")).toDS()
    intercept[org.apache.spark.SparkException](
      Multimodal.featurize(junk, ImageDecoder).collect())
  }

  test("WAV codec: real RIFF/WAVE PCM decode, chunk skip, round-trip") {
    // 16-bit stereo, 8kHz, 4 frames: a known interleaved ramp
    val samples = Array(100, -100, 2000, -2000, 30000, -30000, 0, 7)
    val wav = Codecs.encodeWav(Codecs.Audio(8000, 2, 16, samples))
    assert(Codecs.isWav(wav))
    val a = Codecs.decodeWav(wav)
    assert(a.sampleRate == 8000 && a.channels == 2 && a.bitsPerSample == 16)
    assert(a.framesPerChannel == 4)
    assert(a.samples.toSeq == samples.toSeq)
    assert(math.abs(a.durationSec - 4.0 / 8000) < 1e-12)

    // a LIST chunk between fmt and data must be skipped
    val listChunk = "LIST".getBytes("US-ASCII") ++ Array[Byte](4, 0, 0, 0) ++
      "INFO".getBytes("US-ASCII")
    val withList = wav.take(36) ++ listChunk ++ wav.drop(36)
    // patch the RIFF size for the inserted 12 bytes
    val riffSize = (wav.length - 8) + 12
    withList(4) = riffSize.toByte; withList(5) = (riffSize >> 8).toByte
    withList(6) = (riffSize >> 16).toByte; withList(7) = (riffSize >> 24).toByte
    val b = Codecs.decodeWav(withList)
    assert(b.samples.toSeq == samples.toSeq)

    // 8-bit mono: unsigned bytes recenter to signed
    val hdr8 = wav.take(44)
    // hand-build: fmt with bits=8, channels=1, then 3 bytes of data
    val w8 = java.nio.ByteBuffer.allocate(47).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    w8.put("RIFF".getBytes("US-ASCII")).putInt(39).put("WAVE".getBytes("US-ASCII"))
    w8.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(8000).putInt(8000).putShort(1).putShort(8)
    w8.put("data".getBytes("US-ASCII")).putInt(3)
    w8.put(0.toByte).put(128.toByte).put(255.toByte)
    val c = Codecs.decodeWav(w8.array())
    assert(c.samples.toSeq == Seq(-128, 0, 127))

    // compressed / malformed payloads fail loudly
    intercept[IllegalArgumentException](Codecs.decodeWav(hdr8.dropRight(1)))
  }

  test("AVI codec: real RIFF/AVI DIB decode, frame walk, round-trip") {
    // 3 frames of 5x3 with distinct, known pixels
    val frames = Array.tabulate(3) { f =>
      Codecs.Image(5, 3, Array.tabulate(15)(i => (f << 16) | (i * 17)))
    }
    val avi = Codecs.encodeAvi(Codecs.Video(5, 3, 40000, frames)) // 25 fps
    assert(Codecs.isAvi(avi) && !Codecs.isWav(avi))
    val v = Codecs.decodeAvi(avi)
    assert(v.width == 5 && v.height == 3 && v.nFrames == 3)
    assert(v.microSecPerFrame == 40000)
    assert(math.abs(v.durationSec - 0.12) < 1e-12)
    (0 until 3).foreach { f =>
      assert(v.frames(f).pixels.toSeq == frames(f).pixels.toSeq,
        s"frame $f pixel drift")
    }
    // truncating the movi payload fails loudly
    intercept[IllegalArgumentException](
      Codecs.decodeAvi(avi.dropRight(4)))
    // a WAV is RIFF but not AVI
    val wav = Codecs.encodeWav(Codecs.Audio(8000, 1, 16, Array(1, 2)))
    assert(!Codecs.isAvi(wav))
    intercept[IllegalArgumentException](Codecs.decodeAvi(wav))
  }

  test("CodecDecoder drives real WAV+AVI decode through the featurize seam") {
    val wav = Codecs.encodeWav(
      Codecs.Audio(16000, 1, 16, Array.tabulate(160)(i => i * 7 - 500)))
    val avi = Codecs.encodeAvi(Codecs.Video(8, 6, 33333,
      Array.fill(4)(Codecs.Image(8, 6, Array.tabulate(48)(_ * 3)))))
    val items = Seq(
      MediaItem(1L, "audio", wav, "a"),
      MediaItem(2L, "video", avi, "b")
    ).toDS()
    val out = Multimodal.featurize(items.repartition(2), Multimodal.CodecDecoder)
      .collect().sortBy(_.media_id)
    // audio maps (channels, bits, frames/channel) onto the contract
    assert((out(0).width, out(0).height, out(0).n_frames) == ((1, 16, 160)))
    // video maps (width, height, n_frames)
    assert((out(1).width, out(1).height, out(1).n_frames) == ((8, 6, 4)))
    // non-WAV audio / non-AVI video bytes fail loudly
    val junkA = Seq(MediaItem(9L, "audio", Array[Byte](1, 2, 3), "x")).toDS()
    intercept[org.apache.spark.SparkException](
      Multimodal.featurize(junkA, Multimodal.CodecDecoder).collect())
    val junkV = Seq(MediaItem(10L, "video", Array[Byte](4, 5, 6), "x")).toDS()
    intercept[org.apache.spark.SparkException](
      Multimodal.featurize(junkV, Multimodal.CodecDecoder).collect())
  }

  test("resize kernel: nearest-neighbor mapping is exact") {
    // 4x2 checker downsized to 2x1: NN picks floor(dst*src/dstSize),
    // so (0,0)←(0,0) and (1,0)←(2,0)
    val src = Codecs.Image(4, 2, Array(
      0x111111, 0x222222, 0x333333, 0x444444,
      0x555555, 0x666666, 0x777777, 0x888888))
    val down = Codecs.resize(src, 2, 1)
    assert(down.pixels.toSeq == Seq(0x111111, 0x333333))
    // upscale duplicates source pixels, never interpolates
    val up = Codecs.resize(Codecs.Image(2, 1, Array(0xAA0000, 0x00BB00)), 4, 2)
    assert(up.pixels.toSeq == Seq(
      0xAA0000, 0xAA0000, 0x00BB00, 0x00BB00,
      0xAA0000, 0xAA0000, 0x00BB00, 0x00BB00))
    intercept[IllegalArgumentException](Codecs.resize(src, 0, 4))
  }

  test("frame sampling keeps every k-th frame and stretches the clock") {
    val frames = Array.tabulate(7)(f => Codecs.Image(2, 1, Array(f, f)))
    val sampled = Codecs.sampleFrames(Codecs.Video(2, 1, 40000, frames), 3)
    assert(sampled.nFrames == 3) // frames 0, 3, 6
    assert(sampled.frames.map(_.pixels(0)).toSeq == Seq(0, 3, 6))
    assert(sampled.microSecPerFrame == 120000)
    // duration is preserved up to the dropped tail
    assert(math.abs(sampled.durationSec - 0.36) < 1e-12)
  }

  test("resizeImages and sampleVideoFrames rewrite payloads through the seam") {
    val bmp = Codecs.encodeBmp(
      Codecs.Image(4, 4, Array.tabulate(16)(i => i * 0x050505)))
    val avi = Codecs.encodeAvi(Codecs.Video(3, 2, 40000,
      Array.tabulate(6)(f => Codecs.Image(3, 2, Array.fill(6)(f)))))
    val wav = Codecs.encodeWav(Codecs.Audio(8000, 1, 16, Array(5, 6, 7)))
    val items = Seq(
      MediaItem(1L, "image", bmp, "s"),
      MediaItem(2L, "video", avi, "s"),
      MediaItem(3L, "audio", wav, "s")
    ).toDS()
    val out = Multimodal.sampleVideoFrames(
        Multimodal.resizeImages(items.repartition(2), 2, 2), 2)
      .collect().sortBy(_.media_id)
    // image: re-encoded BMP at the target size, NN pixels
    val img = Codecs.decodeBmp(out(0).payload)
    assert(img.width == 2 && img.height == 2)
    assert(img.pixels.toSeq == Seq(0x000000, 0x0A0A0A, 0x282828, 0x323232))
    // video: frames 0,2,4 at a stretched clock
    val v = Codecs.decodeAvi(out(1).payload)
    assert(v.nFrames == 3 && v.microSecPerFrame == 80000)
    assert(v.frames.map(_.pixels(0)).toSeq == Seq(0, 2, 4))
    // audio passes through both ops untouched
    assert(out(2).payload.toSeq == wav.toSeq)
  }

  test("mediaFromDocuments produces 16-byte md5 payloads with cycling kinds") {
    val docs = Seq((0L, "hello", "s0"), (1L, "world", "s1"), (2L, "again", "s2"))
      .toDF("doc_id", "text", "source")
    val media = Multimodal.mediaFromDocuments(spark, docs).collect().sortBy(_.media_id)
    assert(media.map(_.kind).toSeq == Seq("image", "audio", "video"))
    assert(media.forall(_.payload.length == 16))
    // payload equals unhex(md5(text))
    val expect = java.security.MessageDigest.getInstance("MD5")
      .digest("hello".getBytes("UTF-8"))
    assert(media(0).payload.toSeq == expect.toSeq)
  }
}

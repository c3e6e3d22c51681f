package graft

import java.io.ByteArrayOutputStream

import org.scalatest.funsuite.AnyFunSuite
import graft.images.{ImageSynth, PngCodec}

/** The thread-local PNG codec must interoperate bit-exactly with ImageIO in
  * both directions (it carries the payload invariant, B23). */
class PngCodecSpec extends AnyFunSuite {

  private def imageIoEncode(pixels: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    val data = img.getRaster.getDataBuffer.asInstanceOf[java.awt.image.DataBufferByte].getData
    var p = 0
    while (p < data.length) {
      data(p) = pixels(p + 2); data(p + 1) = pixels(p + 1); data(p + 2) = pixels(p)
      p += 3
    }
    val bos = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("roundtrip: our encoder -> our decoder is lossless") {
    for ((w, h) <- Seq((1, 1), (7, 3), (24, 24), (64, 64))) {
      val pixels = ImageSynth.pixelsFor(s"http://t/$w-$h", w, h)
      val png = PngCodec.encodeRgb(pixels, w, h)
      val (decoded, dw, dh) = PngCodec.decodeRgb(png)
      assert(dw == w && dh == h)
      assert(decoded.sameElements(pixels), s"roundtrip mismatch at ${w}x$h")
    }
  }

  test("our encoder's output decodes identically via ImageIO") {
    val pixels = ImageSynth.pixelsFor("http://t/x", 24, 24)
    val png = PngCodec.encodeRgb(pixels, 24, 24)
    val (viaImageIo, w, h) = ImageSynth.decodeRgbImageIO(png)
    assert(w == 24 && h == 24)
    assert(viaImageIo.sameElements(pixels))
  }

  test("ImageIO-encoded PNGs (filtered scanlines) decode via our codec") {
    // structured pixels so ImageIO's encoder picks non-trivial filters
    val w = 33; val h = 17
    val pixels = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val p = (y * w + x) * 3
      pixels(p) = (x * 7).toByte; pixels(p + 1) = (y * 11).toByte; pixels(p + 2) = ((x + y) * 3).toByte
    }
    val png = imageIoEncode(pixels, w, h)
    val decoded = PngCodec.decodeRgb(png)
    assert(decoded != null, "codec should handle ImageIO output for the 8-bit RGB subset")
    assert(decoded._1.sameElements(pixels))
  }

  test("non-PNG and unsupported PNGs return null (fallback path)") {
    assert(PngCodec.decodeRgb(Array[Byte](1, 2, 3)) == null)
    // grayscale image -> unsupported color type -> null
    val img = new java.awt.image.BufferedImage(4, 4, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val bos = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    assert(PngCodec.decodeRgb(bos.toByteArray) == null)
    // but the ImageSynth entry point still decodes it via the ImageIO fallback
    val (gray, gw, gh) = ImageSynth.decodeRgb(bos.toByteArray)
    assert(gw == 4 && gh == 4 && gray.length == 48)
  }

  test("adversarial payloads fail fast with clean errors, bounded time (ParseUtil timeout analogue)") {
    def be(i: Int): Array[Byte] = Array(((i >> 24) & 0xff).toByte,
      ((i >> 16) & 0xff).toByte, ((i >> 8) & 0xff).toByte, (i & 0xff).toByte)
    def chunk(tag: String, data: Array[Byte]): Array[Byte] = {
      val crc = new java.util.zip.CRC32()
      crc.update(tag.getBytes("US-ASCII")); crc.update(data)
      be(data.length) ++ tag.getBytes("US-ASCII") ++ data ++ be(crc.getValue.toInt)
    }
    val sig = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)

    // dimension bomb: header claims 65535x65535 (4.3 gigapixels)
    val bombIhdr = be(65535) ++ be(65535) ++ Array[Byte](8, 2, 0, 0, 0)
    val bomb = sig ++ chunk("IHDR", bombIhdr) ++ chunk("IEND", Array.emptyByteArray)
    val t0 = System.nanoTime()
    val e1 = intercept[IllegalArgumentException](PngCodec.decodeRgb(bomb))
    assert(e1.getMessage.contains("dimension bomb"))
    assert((System.nanoTime() - t0) < 1e9, "bomb must be rejected instantly")

    // corrupt chunk length pointing past the payload end
    val ok = PngCodec.encodeRgb(Array.fill(4 * 4 * 3)(7.toByte), 4, 4)
    val corrupt = ok.clone()
    corrupt(8) = 0x7f // IHDR length 0x7f00000d
    val e2 = intercept[IllegalArgumentException](PngCodec.decodeRgb(corrupt))
    assert(e2.getMessage.contains("corrupt PNG"))

    // the parse stage maps the failure to ParseStatus Failed (no wedge)
    import graft.jobs.{ParserJob, ParseStatusCodes}
    import graft.model.{CrawlStatus, Marks, WebPage}
    val page = WebPage(url = "http://bomb.test/x.html", status = CrawlStatus.FETCHED,
      content = bomb, markers = Map(Marks.FETCH -> "b-1"))
    val parsed = ParserJob.parsePage(page, graft.crawl.CrawlConfig(),
      graft.site.MapOutlinks(Map.empty), graft.url.RegexUrlFilter.acceptAll, "b-1")
    assert(parsed.parseStatus != null &&
      parsed.parseStatus.majorCode == ParseStatusCodes.Failed)
  }

  test("WAV/Y4M guards: oversized chunk sizes and dimension bombs are clean errors") {
    import graft.media.{WavCodec, Y4mCodec}
    // WAV data chunk claiming 2 GB with 8 bytes present
    val wav = WavCodec.encode(Array.fill(16)(100.toShort), 8000)
    val evil = wav.clone()
    // the data chunk size field sits at offset 40 in the canonical header
    evil(40) = 0xff.toByte; evil(41) = 0xff.toByte
    evil(42) = 0xff.toByte; evil(43) = 0x7f.toByte
    val e = intercept[IllegalArgumentException](WavCodec.decode(evil))
    assert(e.getMessage.contains("corrupt WAV"))

    // Y4M header claiming 100000x100000 frames
    val y4m = "YUV4MPEG2 W100000 H100000 F25:1 Ip A1:1 C420\nFRAME\n"
      .getBytes("US-ASCII")
    val e2 = intercept[IllegalArgumentException](Y4mCodec.decode(y4m))
    assert(e2.getMessage.contains("dimension bomb"))
  }
}

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
}

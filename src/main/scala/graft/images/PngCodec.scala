package graft.images

import java.io.ByteArrayOutputStream
import java.util.zip.{CRC32, Deflater, Inflater}

/** Minimal PNG codec for 8-bit truecolor (RGB) non-interlaced images.
  *
  * javax.imageio allocates a fresh java.util.zip.Inflater/Deflater per
  * image; each construction registers a PhantomCleanable on a GLOBAL
  * synchronized cleaner list, which serializes image decode across executor
  * threads (observed: 15/32 threads parked in Cleaner.register during
  * fetch). This codec keeps one Deflater/Inflater per thread (reset between
  * uses) and handles exactly the subset the engine produces — plus all five
  * PNG scanline filters, so it also decodes PNGs written by other encoders.
  * Falls back to ImageIO in [[ImageSynth.decodeRgb]] for anything else.
  */
object PngCodec {

  /** Decode ceiling — the Spark-idiomatic stand-in for the reference's 30 s
    * parse-timeout thread (parse/ParseUtil.java:141-154): an adversarial
    * header claiming a multi-gigapixel image must fail fast with a clean
    * exception (ParserJob maps it to ParseStatus Failed) instead of wedging
    * an executor core in allocation/inflate. 16.7M pixels = 50 MB RGB. */
  val MaxPixels: Long = 1L << 24

  private val Signature = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)

  private val deflaterLocal = new ThreadLocal[Deflater] {
    override def initialValue(): Deflater = new Deflater(Deflater.BEST_SPEED)
  }
  private val inflaterLocal = new ThreadLocal[Inflater] {
    override def initialValue(): Inflater = new Inflater()
  }

  private def writeChunk(out: ByteArrayOutputStream, tag: String, data: Array[Byte]): Unit = {
    def be(i: Int): Array[Byte] =
      Array(((i >> 24) & 0xff).toByte, ((i >> 16) & 0xff).toByte,
        ((i >> 8) & 0xff).toByte, (i & 0xff).toByte)
    out.write(be(data.length))
    val tagBytes = tag.getBytes("US-ASCII")
    out.write(tagBytes)
    out.write(data)
    val crc = new CRC32()
    crc.update(tagBytes)
    crc.update(data)
    out.write(be(crc.getValue.toInt))
  }

  /** Encode raw RGB bytes (3 per pixel, row-major) as a PNG. */
  def encodeRgb(pixels: Array[Byte], w: Int, h: Int): Array[Byte] = {
    require(pixels.length == w * h * 3, s"expected ${w * h * 3} bytes, got ${pixels.length}")
    val out = new ByteArrayOutputStream(pixels.length / 2 + 64)
    out.write(Signature)
    val ihdr = new Array[Byte](13)
    ihdr(0) = ((w >> 24) & 0xff).toByte; ihdr(1) = ((w >> 16) & 0xff).toByte
    ihdr(2) = ((w >> 8) & 0xff).toByte; ihdr(3) = (w & 0xff).toByte
    ihdr(4) = ((h >> 24) & 0xff).toByte; ihdr(5) = ((h >> 16) & 0xff).toByte
    ihdr(6) = ((h >> 8) & 0xff).toByte; ihdr(7) = (h & 0xff).toByte
    ihdr(8) = 8 // bit depth
    ihdr(9) = 2 // color type: truecolor
    ihdr(10) = 0; ihdr(11) = 0; ihdr(12) = 0
    writeChunk(out, "IHDR", ihdr)

    // scanlines with filter byte 0 (None)
    val stride = w * 3
    val raw = new Array[Byte](h * (stride + 1))
    var y = 0
    while (y < h) {
      raw(y * (stride + 1)) = 0
      System.arraycopy(pixels, y * stride, raw, y * (stride + 1) + 1, stride)
      y += 1
    }
    val deflater = deflaterLocal.get()
    deflater.reset()
    deflater.setInput(raw)
    deflater.finish()
    val zbuf = new ByteArrayOutputStream(raw.length / 2 + 64)
    val tmp = new Array[Byte](16 * 1024)
    while (!deflater.finished()) {
      val n = deflater.deflate(tmp)
      zbuf.write(tmp, 0, n)
    }
    writeChunk(out, "IDAT", zbuf.toByteArray)
    writeChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Decode a PNG to raw RGB bytes. Returns null when the image is not the
    * supported subset (8-bit truecolor non-interlaced) — callers fall back
    * to ImageIO. */
  def decodeRgb(png: Array[Byte]): (Array[Byte], Int, Int) = {
    if (png.length < 8 || !java.util.Arrays.equals(
        java.util.Arrays.copyOfRange(png, 0, 8), Signature)) return null
    def be(off: Int): Int =
      ((png(off) & 0xff) << 24) | ((png(off + 1) & 0xff) << 16) |
        ((png(off + 2) & 0xff) << 8) | (png(off + 3) & 0xff)

    var w = 0; var h = 0
    val idat = new ByteArrayOutputStream()
    var pos = 8
    var done = false
    while (!done && pos + 8 <= png.length) {
      val len = be(pos)
      val tag = new String(png, pos + 4, 4, "US-ASCII")
      val dataOff = pos + 8
      // a negative or past-the-end chunk length is corruption, not an
      // unsupported subset: fail fast (no wild position jumps, no fallback
      // hand-off to another decoder)
      if (len < 0 || dataOff + len.toLong + 4 > png.length)
        throw new IllegalArgumentException(
          s"corrupt PNG: chunk $tag declares $len bytes beyond the payload")
      tag match {
        case "IHDR" =>
          w = be(dataOff); h = be(dataOff + 4)
          if (w <= 0 || h <= 0 || w.toLong * h > MaxPixels)
            throw new IllegalArgumentException(
              s"PNG dimension bomb: ${w}x$h exceeds $MaxPixels pixels")
          val bitDepth = png(dataOff + 8)
          val colorType = png(dataOff + 9)
          val interlace = png(dataOff + 12)
          if (bitDepth != 8 || colorType != 2 || interlace != 0) return null
        case "IDAT" => idat.write(png, dataOff, len)
        case "IEND" => done = true
        case _ => // ancillary chunk, skip
      }
      pos = dataOff + len + 4 // skip crc
    }
    if (w <= 0 || h <= 0) return null

    val stride = w * 3
    val raw = new Array[Byte](h * (stride + 1))
    val inflater = inflaterLocal.get()
    inflater.reset()
    inflater.setInput(idat.toByteArray)
    var off = 0
    while (!inflater.finished() && off < raw.length) {
      val n = inflater.inflate(raw, off, raw.length - off)
      if (n == 0 && inflater.needsInput()) return null // truncated
      off += n
    }
    if (off != raw.length) return null

    // unfilter
    val out = new Array[Byte](h * stride)
    var y = 0
    while (y < h) {
      val filter = raw(y * (stride + 1)) & 0xff
      val rowIn = y * (stride + 1) + 1
      val rowOut = y * stride
      val prevOut = rowOut - stride
      var x = 0
      filter match {
        case 0 => System.arraycopy(raw, rowIn, out, rowOut, stride)
        case 1 => // Sub
          while (x < stride) {
            val left = if (x >= 3) out(rowOut + x - 3) & 0xff else 0
            out(rowOut + x) = ((raw(rowIn + x) & 0xff) + left).toByte
            x += 1
          }
        case 2 => // Up
          while (x < stride) {
            val up = if (y > 0) out(prevOut + x) & 0xff else 0
            out(rowOut + x) = ((raw(rowIn + x) & 0xff) + up).toByte
            x += 1
          }
        case 3 => // Average
          while (x < stride) {
            val left = if (x >= 3) out(rowOut + x - 3) & 0xff else 0
            val up = if (y > 0) out(prevOut + x) & 0xff else 0
            out(rowOut + x) = ((raw(rowIn + x) & 0xff) + ((left + up) >> 1)).toByte
            x += 1
          }
        case 4 => // Paeth
          while (x < stride) {
            val a = if (x >= 3) out(rowOut + x - 3) & 0xff else 0
            val b = if (y > 0) out(prevOut + x) & 0xff else 0
            val c = if (x >= 3 && y > 0) out(prevOut + x - 3) & 0xff else 0
            val p = a + b - c
            val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
            val pred = if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
            out(rowOut + x) = ((raw(rowIn + x) & 0xff) + pred).toByte
            x += 1
          }
        case _ => return null
      }
      y += 1
    }
    (out, w, h)
  }
}

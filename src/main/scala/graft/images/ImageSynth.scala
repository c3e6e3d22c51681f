package graft.images

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.url.UrlUtil

/** Deterministic synthesis of the crawl payload universe: the `images` table
  * of BASELINE.json's input_hint —
  * (image_id string, bytes binary, w int, h int, fmt string, caption string, phash long).
  *
  * Pixels are a pure function of the page URL (seeded xorshift RNG over
  * md5(url)), PNG-encoded (lossless), so any fetched payload can be
  * re-derived and verified bit-exactly / at PSNR>=40dB. `phash` is the first
  * 8 bytes of md5(rgb-pixel-bytes) — a perceptual-hash surrogate that also
  * drives deterministic synthetic outlink generation (FIXTURES.md §4).
  */
object ImageSynth {

  /** Page URL layout of the synthetic site: nHosts hosts, pages striped
    * across them. Keep in sync with [[pageIndexOf]]. */
  def urlOf(i: Long, nHosts: Int): String =
    s"http://host-${i % nHosts}.example/page-$i.html"

  private val PageRe = """page-(\d+)\.html""".r
  def pageIndexOf(url: String): Option[Long] =
    PageRe.findFirstMatchIn(url).map(_.group(1).toLong)

  private def md5(b: Array[Byte]): Array[Byte] =
    MessageDigest.getInstance("MD5").digest(b)

  private def longFrom(b: Array[Byte]): Long = {
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (b(i) & 0xffL); i += 1 }
    v
  }

  /** Raw RGB pixel bytes (3 per pixel), seeded by the url. xorshift64*. */
  def pixelsFor(url: String, w: Int, h: Int): Array[Byte] = {
    var state = longFrom(md5(url.getBytes(StandardCharsets.UTF_8))) | 1L
    val out = new Array[Byte](w * h * 3)
    var i = 0
    while (i < out.length) {
      state ^= state >>> 12; state ^= state << 25; state ^= state >>> 27
      val r = state * 0x2545F4914F6CDD1DL
      out(i) = (r >>> 56).toByte
      if (i + 1 < out.length) out(i + 1) = (r >>> 48).toByte
      if (i + 2 < out.length) out(i + 2) = (r >>> 40).toByte
      i += 3
    }
    out
  }

  // ImageIO's disk cache and per-call plugin-registry scans serialize
  // under concurrency (negative scaling past ~8 threads); use in-memory
  // streams and thread-local codec instances instead.
  ImageIO.setUseCache(false)

  private val pngWriter = new ThreadLocal[javax.imageio.ImageWriter] {
    override def initialValue(): javax.imageio.ImageWriter =
      ImageIO.getImageWritersByFormatName("png").next()
  }
  private val pngReader = new ThreadLocal[javax.imageio.ImageReader] {
    override def initialValue(): javax.imageio.ImageReader =
      ImageIO.getImageReadersByFormatName("png").next()
  }

  /** Encode raw RGB as PNG via the thread-local codec (see PngCodec for why
    * not ImageIO). */
  def encodePng(pixels: Array[Byte], w: Int, h: Int): Array[Byte] =
    PngCodec.encodeRgb(pixels, w, h)

  /** Decode to raw RGB. PNGs in the engine's subset decode through the
    * thread-local codec; JPEGs (the dominant real-corpus format) through
    * the from-scratch baseline JpegCodec; anything else falls back to
    * ImageIO. */
  def decodeRgb(bytes: Array[Byte]): (Array[Byte], Int, Int) = {
    if (JpegCodec.isJpeg(bytes)) return JpegCodec.decodeRgb(bytes)
    val fast = PngCodec.decodeRgb(bytes)
    if (fast != null) return fast
    decodeRgbImageIO(bytes)
  }

  def decodeRgbImageIO(bytes: Array[Byte]): (Array[Byte], Int, Int) = {
    val reader = pngReader.get()
    reader.setInput(new javax.imageio.stream.MemoryCacheImageInputStream(
      new ByteArrayInputStream(bytes)))
    val img = reader.read(0)
    val w = img.getWidth; val h = img.getHeight
    val out = new Array[Byte](w * h * 3)
    img.getRaster.getDataBuffer match {
      case db: java.awt.image.DataBufferByte
          if img.getType == BufferedImage.TYPE_3BYTE_BGR =>
        val data = db.getData
        var p = 0
        while (p < data.length) {
          out(p) = data(p + 2); out(p + 1) = data(p + 1); out(p + 2) = data(p)
          p += 3
        }
      case _ =>
        var p = 0
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            out(p) = ((rgb >> 16) & 0xff).toByte
            out(p + 1) = ((rgb >> 8) & 0xff).toByte
            out(p + 2) = (rgb & 0xff).toByte
            p += 3; x += 1
          }
          y += 1
        }
    }
    (out, w, h)
  }

  def phashOf(pixels: Array[Byte]): Long = longFrom(md5(pixels))

  /** Smooth deterministic test card (seeded gradients): the content class
    * a LOSSY codec can be PSNR-gated on — the white-noise `pixelsFor`
    * universe has no compressible structure, so no bitrate-sane JPEG
    * clears 40 dB on it, while gradients do. */
  def smoothPixelsFor(seed: Long, w: Int, h: Int): Array[Byte] = {
    val out = new Array[Byte](w * h * 3)
    def clamp(v: Long): Byte = math.max(0L, math.min(255L, v)).toByte
    var i = 0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        out(i) = clamp(x.toLong * 255 / math.max(1, w - 1) + (seed * 7) % 48)
        out(i + 1) = clamp(y.toLong * 255 / math.max(1, h - 1) + (seed * 11) % 48)
        out(i + 2) = clamp((x + y).toLong * 255 / math.max(1, w + h - 2) + (seed * 13) % 48)
        i += 3
        x += 1
      }
      y += 1
    }
    out
  }

  private val captionWords = Array(
    "amber", "basalt", "cobalt", "delta", "ember", "fjord", "garnet", "helix",
    "iris", "jade", "krypton", "lumen", "mica", "nadir", "onyx", "prism",
    "quartz", "raven", "sable", "topaz", "umbra", "vertex", "willow", "xenon",
    "yarrow", "zephyr")

  def captionFor(url: String, phash: Long): String = {
    val n = 4 + (phash & 3).toInt
    val sb = new StringBuilder(s"caption for $url:")
    var v = phash
    var k = 0
    while (k < n) {
      v = v * 6364136223846793005L + 1442695040888963407L
      sb.append(' ').append(captionWords(math.floorMod(v >>> 33, captionWords.length).toInt))
      k += 1
    }
    sb.toString
  }

  case class ImageRow(image_id: String, bytes: Array[Byte], w: Int, h: Int,
      fmt: String, caption: String, phash: Long)

  /** Build the image row for any page URL — pure, callable from executors
    * and from the refsim oracle alike. */
  def rowForUrl(url: String, w: Int, h: Int): ImageRow = {
    val pixels = pixelsFor(url, w, h)
    val png = encodePng(pixels, w, h)
    val phash = phashOf(pixels)
    ImageRow(UrlUtil.uuid3(url), png, w, h, "png", captionFor(url, phash), phash)
  }

  def rowFor(i: Long, nHosts: Int, w: Int, h: Int): ImageRow =
    rowForUrl(urlOf(i, nHosts), w, h)

  /** Distributed synthesis of the images table: generation is a pure
    * function of the range index, so it parallelizes with no shuffle and no
    * driver-side state — the pattern that scales to a 10^10-row universe.
    */
  def imagesDf(spark: SparkSession, nPages: Long, nHosts: Int,
      w: Int = 24, h: Int = 24, partitions: Int = 32): DataFrame = {
    import spark.implicits._
    spark.range(0, nPages, 1, partitions)
      .mapPartitions(_.map(i => rowFor(i, nHosts, w, h)))
      .toDF()
  }

  def writeImagesTable(spark: SparkSession, dir: String, nPages: Long,
      nHosts: Int, w: Int = 24, h: Int = 24, partitions: Int = 32): Unit =
    imagesDf(spark, nPages, nHosts, w, h, partitions)
      .write.mode("overwrite").parquet(dir)

  /** Peak signal-to-noise ratio between two equal-length RGB buffers, dB.
    * Infinity for identical buffers (the lossless PNG path). */
  def psnr(a: Array[Byte], b: Array[Byte]): Double = {
    require(a.length == b.length, s"pixel buffers differ in length: ${a.length} vs ${b.length}")
    var se = 0.0
    var i = 0
    while (i < a.length) {
      val d = (a(i) & 0xff) - (b(i) & 0xff)
      se += d.toDouble * d
      i += 1
    }
    val mse = se / a.length
    if (mse == 0) Double.PositiveInfinity
    else 10.0 * math.log10(255.0 * 255.0 / mse)
  }
}

package graft.media

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.US_ASCII

/** From-scratch YUV4MPEG2 (.y4m) codec — a REAL decoder for the
  * uncompressed member of the video family (mpv/ffmpeg's raw interchange
  * format; compressed codecs would plug into the same seam).
  *
  * Format per the public spec: a plain-text stream header
  * `YUV4MPEG2 W<w> H<h> F<num>:<den> [Ip A1:1 C420 ...]\n`, then per frame
  * a `FRAME[ params]\n` marker followed by the raw planar payload — for
  * C420: w*h luma (Y) bytes then (w/2)*(h/2) each of U and V.
  */
object Y4mCodec {

  /** One decoded frame: planar YUV420. `y` is the full-resolution luma
    * plane — the input to perceptual hashing / feature extraction. */
  final case class Frame(y: Array[Byte], u: Array[Byte], v: Array[Byte])
  final case class Video(w: Int, h: Int, fpsNum: Int, fpsDen: Int, frames: Vector[Frame]) {
    def durationMs: Long = if (fpsNum == 0) 0 else frames.size.toLong * 1000L * fpsDen / fpsNum
  }

  def encode(video: Video): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(s"YUV4MPEG2 W${video.w} H${video.h} F${video.fpsNum}:${video.fpsDen} Ip A1:1 C420\n"
      .getBytes(US_ASCII))
    video.frames.foreach { f =>
      require(f.y.length == video.w * video.h, "luma plane size mismatch")
      require(f.u.length == video.w * video.h / 4 && f.v.length == video.w * video.h / 4,
        "chroma plane size mismatch")
      out.write("FRAME\n".getBytes(US_ASCII))
      out.write(f.y); out.write(f.u); out.write(f.v)
    }
    out.toByteArray
  }

  def decode(bytes: Array[Byte]): Video = {
    var pos = 0
    def readLine(): String = {
      val start = pos
      while (pos < bytes.length && bytes(pos) != '\n') pos += 1
      require(pos < bytes.length, "unterminated y4m header line")
      pos += 1
      new String(bytes, start, pos - 1 - start, US_ASCII)
    }
    val header = readLine()
    require(header.startsWith("YUV4MPEG2"), "not a YUV4MPEG2 stream")
    val params = header.split(' ').drop(1)
    def param(p: Char): Option[String] =
      params.collectFirst { case s if s.nonEmpty && s.head == p => s.tail }
    val w = param('W').map(_.toInt).getOrElse(throw new IllegalArgumentException("no W"))
    val h = param('H').map(_.toInt).getOrElse(throw new IllegalArgumentException("no H"))
    // untrusted header dims: fail fast on a frame-size bomb before any
    // per-frame allocation (same ceiling policy as PngCodec.MaxPixels)
    require(w > 0 && h > 0 && w.toLong * h <= graft.images.PngCodec.MaxPixels,
      s"Y4M dimension bomb: ${w}x$h exceeds ${graft.images.PngCodec.MaxPixels} pixels")
    val (fn, fd) = param('F').map { f =>
      val Array(a, b) = f.split(':'); (a.toInt, b.toInt)
    }.getOrElse((25, 1))
    param('C').foreach(c => require(c.startsWith("420"), s"only C420 supported, got C$c"))
    val ySize = w * h
    val cSize = ySize / 4
    val frames = Vector.newBuilder[Frame]
    while (pos < bytes.length) {
      val marker = readLine()
      require(marker.startsWith("FRAME"), s"expected FRAME marker, got '$marker'")
      require(pos + ySize + 2 * cSize <= bytes.length, "truncated frame payload")
      val y = java.util.Arrays.copyOfRange(bytes, pos, pos + ySize); pos += ySize
      val u = java.util.Arrays.copyOfRange(bytes, pos, pos + cSize); pos += cSize
      val v = java.util.Arrays.copyOfRange(bytes, pos, pos + cSize); pos += cSize
      frames += Frame(y, u, v)
    }
    Video(w, h, fn, fd, frames.result())
  }
}

package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

import graft.images.ImageSynth

/** Multimodal column processing: image/audio/video as opaque binary columns
  * with typed metadata, processed in partition-sized batches (the Scala
  * analogue of a Pandas-UDF `mapInPandas` pipeline — same batch shape, same
  * schema contract, executed inside WholeStageCodegen-adjacent
  * `mapPartitions`).
  *
  * PNG and baseline JPEG decode/resize/feature-extract are REAL
  * (from-scratch PngCodec and JpegCodec — the latter covering the
  * dominant real-corpus image format incl. 4:2:0 subsampling, verified
  * against the JDK's independent decoder in JpegSpec); audio and video
  * are REAL for the uncompressed members of each family — RIFF/WAVE PCM16
  * (graft.media.WavCodec) and YUV4MPEG2 (graft.media.Y4mCodec), both
  * from-scratch decoders of public formats. Compressed AUDIO/VIDEO codecs
  * (MP3/Opus, H.264/VP9) are not in this container; non-WAV/non-Y4M
  * payloads fall back to a clearly-marked deterministic byte-window fake
  * so the distributed plumbing — schema, partitioning, batch shape —
  * stays total and tested either way.
  */
object Multimodal {

  case class ImageMeta(id: String, w: Int, h: Int, fmt: String, n_bytes: Int, phash: Long)
  case class Resized(id: String, bytes: Array[Byte], w: Int, h: Int)
  case class ImageFeature(id: String, feature: Array[Float])
  case class AudioFeature(id: String, duration_ms: Long, rms: Array[Float])
  case class VideoFrames(id: String, frame_phashes: Array[Long], n_frames: Int)

  /** Decode + metadata extraction (real for PNG). */
  def imageMeta(images: DataFrame)(implicit spark: SparkSession): Dataset[ImageMeta] = {
    import spark.implicits._
    images.select("image_id", "bytes", "fmt").as[(String, Array[Byte], String)]
      .mapPartitions(_.map { case (id, bytes, fmt) =>
        val (pixels, w, h) = ImageSynth.decodeRgb(bytes)
        ImageMeta(id, w, h, fmt, bytes.length, ImageSynth.phashOf(pixels))
      })
  }

  /** Nearest-neighbour resize to (tw, th), re-encoded as PNG (real). */
  def resize(images: DataFrame, tw: Int, th: Int)(implicit spark: SparkSession): Dataset[Resized] = {
    import spark.implicits._
    images.select("image_id", "bytes").as[(String, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val (pixels, w, h) = ImageSynth.decodeRgb(bytes)
        val out = new Array[Byte](tw * th * 3)
        var y = 0
        while (y < th) {
          val sy = y * h / th
          var x = 0
          while (x < tw) {
            val sx = x * w / tw
            val sp = (sy * w + sx) * 3
            val dp = (y * tw + x) * 3
            out(dp) = pixels(sp); out(dp + 1) = pixels(sp + 1); out(dp + 2) = pixels(sp + 2)
            x += 1
          }
          y += 1
        }
        Resized(id, ImageSynth.encodePng(out, tw, th), tw, th)
      })
  }

  /** Feature extraction: 48-bin RGB histogram, L1-normalized (real) — the
    * embedding column for similarity search over image payloads. */
  def imageFeatures(images: DataFrame)(implicit spark: SparkSession): Dataset[ImageFeature] = {
    import spark.implicits._
    images.select("image_id", "bytes").as[(String, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val (pixels, _, _) = ImageSynth.decodeRgb(bytes)
        val hist = new Array[Float](48)
        var i = 0
        while (i < pixels.length) {
          hist((pixels(i) & 0xff) >> 4) += 1 // R bins 0-15
          hist(16 + ((pixels(i + 1) & 0xff) >> 4)) += 1 // G bins
          hist(32 + ((pixels(i + 2) & 0xff) >> 4)) += 1 // B bins
          i += 3
        }
        val n = (pixels.length / 3).toFloat
        var k = 0
        while (k < hist.length) { hist(k) /= n; k += 1 }
        ImageFeature(id, hist)
      })
  }

  /** REAL decode for RIFF/WAVE PCM16 (graft.media.WavCodec, from scratch —
    * the uncompressed member of the audio family): per-window RMS energy,
    * normalized to [0,1]. Payloads that are not WAV (e.g. an image corpus
    * piped through the audio branch) fall back to the byte-window fake so
    * the plumbing stays total; compressed codecs (MP3/Opus) are not in this
    * container and would plug into the same per-row seam. */
  def audioFeatures(audio: DataFrame, frameMs: Int = 100)(implicit spark: SparkSession): Dataset[AudioFeature] = {
    import spark.implicits._
    audio.select("image_id", "bytes").as[(String, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        if (bytes.length >= 12 && bytes(0) == 'R' && bytes(1) == 'I' &&
            bytes(2) == 'F' && bytes(3) == 'F') {
          val wav = graft.media.WavCodec.decode(bytes)
          val perWindow =
            math.max(1, wav.sampleRate * frameMs / 1000) * wav.channels
          val rms = wav.samples.grouped(perWindow).map { w =>
            (math.sqrt(w.foldLeft(0.0)((a, s) => a + s.toDouble * s) / w.length)
              / 32768.0).toFloat
          }.toArray
          AudioFeature(id, wav.durationMs, rms)
        } else {
          // === STUBBED DECODE === non-WAV payload: byte-window fake
          val bytesPerFrame = math.max(1, bytes.length / 16)
          val rms = bytes.grouped(bytesPerFrame).map { frame =>
            math.sqrt(frame.foldLeft(0.0)((a, b) => a + (b & 0xff) * (b & 0xff)) /
              math.max(frame.length, 1)).toFloat
          }.toArray
          AudioFeature(id, bytes.length.toLong * frameMs / bytesPerFrame, rms)
        }
      })
  }

  /** REAL decode for YUV4MPEG2 (graft.media.Y4mCodec, from scratch — the
    * raw-interchange member of the video family): sample every k-th frame,
    * perceptual-hash its full-resolution luma plane. Non-Y4M payloads fall
    * back to byte-window sampling; compressed codecs (H.264/VP9) are not in
    * this container and would plug into the same seam. */
  def videoFrameSample(video: DataFrame, everyK: Int = 4)(implicit spark: SparkSession): Dataset[VideoFrames] = {
    import spark.implicits._
    video.select("image_id", "bytes").as[(String, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        if (bytes.length >= 9 &&
            new String(bytes, 0, 9, java.nio.charset.StandardCharsets.US_ASCII) == "YUV4MPEG2") {
          val v = graft.media.Y4mCodec.decode(bytes)
          val frames = v.frames.zipWithIndex.collect {
            case (f, i) if i % everyK == 0 => ImageSynth.phashOf(f.y)
          }.toArray
          VideoFrames(id, frames, frames.length)
        } else {
          // === STUBBED DECODE === non-Y4M payload: byte-window fake
          val frameSize = math.max(64, bytes.length / 32)
          val frames = bytes.grouped(frameSize).zipWithIndex
            .filter(_._2 % everyK == 0)
            .map { case (window, _) => ImageSynth.phashOf(window) }
            .toArray
          VideoFrames(id, frames, frames.length)
        }
      })
  }
}

package graft.media

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deterministic audio/video universe synthesis (the media analogue of
  * ImageSynth): every payload is a pure function of its id, so any test or
  * oracle can regenerate the exact bytes. Audio is a two-tone PCM16 WAV;
  * video is a moving-gradient C420 Y4M clip.
  */
object MediaSynth {

  /** Mono PCM16 WAV keyed by id: two id-derived sine tones at an id-derived
    * amplitude. RMS of a two-equal-amplitude-sine mix is amp/sqrt(2) * ...
    * analytically checkable by tests. */
  def wavOf(id: Long, sampleRate: Int = 8000, ms: Int = 500): Array[Byte] = {
    val n = sampleRate * ms / 1000
    val f1 = (200 + (id % 17) * 40).toDouble
    val f2 = (600 + (id % 11) * 60).toDouble
    val amp = 0.3 + 0.02 * (id % 10)
    val samples = Array.tabulate(n) { i =>
      val t = i.toDouble / sampleRate
      (32767.0 * amp * 0.5 *
        (math.sin(2 * math.Pi * f1 * t) + math.sin(2 * math.Pi * f2 * t))).toShort
    }
    WavCodec.encode(samples, sampleRate)
  }

  /** C420 Y4M clip keyed by id: per-frame moving gradient planes. */
  def y4mOf(id: Long, w: Int = 32, h: Int = 32, nFrames: Int = 12, fps: Int = 12): Array[Byte] = {
    val frames = Vector.tabulate(nFrames) { fi =>
      val y = Array.tabulate(w * h)(p =>
        (((p % w) * 3 + (p / w) * 5 + fi * 7 + id) % 251).toByte)
      val u = Array.tabulate(w * h / 4)(p => ((p + fi * 3 + id) % 251).toByte)
      val v = Array.tabulate(w * h / 4)(p => ((p * 2 + fi + id) % 251).toByte)
      Y4mCodec.Frame(y, u, v)
    }
    Y4mCodec.encode(Y4mCodec.Video(w, h, fps, 1, frames))
  }

  /** (image_id, bytes, fmt) tables matching the multimodal binary-column
    * contract. */
  def audioDf(spark: SparkSession, n: Int, partitions: Int = 2): DataFrame = {
    import spark.implicits._
    spark.range(n).repartition(partitions)
      .map(id => (s"aud-$id", wavOf(id), "wav"))
      .toDF("image_id", "bytes", "fmt")
  }

  def videoDf(spark: SparkSession, n: Int, partitions: Int = 2): DataFrame = {
    import spark.implicits._
    spark.range(n).repartition(partitions)
      .map(id => (s"vid-$id", y4mOf(id), "y4m"))
      .toDF("image_id", "bytes", "fmt")
  }
}

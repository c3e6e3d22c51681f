package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.media.{MediaSynth, WavCodec, Y4mCodec}
import graft.ops.Multimodal

class MediaSpec extends AnyFunSuite {
  private implicit lazy val spark: org.apache.spark.sql.SparkSession = SparkTestBase.spark

  test("wav codec: PCM16 roundtrip, stereo frames, chunk skipping") {
    val rnd = new scala.util.Random(1)
    for (n <- Seq(1, 7, 4096); ch <- Seq(1, 2)) {
      val samples = Array.fill(n * ch)(rnd.nextInt(65536).toShort)
      val wav = WavCodec.decode(WavCodec.encode(samples, 8000, ch))
      assert(wav.sampleRate == 8000 && wav.channels == ch)
      assert(wav.samples.sameElements(samples))
      assert(wav.nFrames == n)
    }
    // conforming readers skip unknown chunks: splice a LIST chunk between
    // fmt and data
    val bytes = WavCodec.encode(Array[Short](1, -2, 3), 44100)
    val (head, tail) = bytes.splitAt(36) // end of fmt chunk
    val list = "LIST".getBytes ++ Array[Byte](4, 0, 0, 0) ++ "INFO".getBytes
    val spliced = head ++ list ++ tail
    // fix the RIFF size field (not load-bearing for our reader, but honest)
    val w = WavCodec.decode(spliced)
    assert(w.samples.toSeq == Seq[Short](1, -2, 3) && w.sampleRate == 44100)
  }

  test("y4m codec: header parse + planar roundtrip") {
    val clip = MediaSynth.y4mOf(5L, w = 16, h = 8, nFrames = 3, fps = 10)
    val v = Y4mCodec.decode(clip)
    assert(v.w == 16 && v.h == 8 && v.fpsNum == 10 && v.fpsDen == 1)
    assert(v.frames.size == 3)
    assert(v.frames.forall(f => f.y.length == 128 && f.u.length == 32 && f.v.length == 32))
    assert(v.durationMs == 300)
    // byte-exact roundtrip
    assert(Y4mCodec.encode(v).sameElements(clip))
    // frames differ (moving gradient)
    assert(v.frames.map(_.y.toSeq).distinct.size == 3)
  }

  test("audioFeatures: real WAV decode — RMS matches the analytic two-tone value") {
    val audio = MediaSynth.audioDf(spark, 6)
    val feats = Multimodal.audioFeatures(audio, frameMs = 100).collect()
    assert(feats.length == 6)
    feats.foreach { f =>
      val id = f.id.stripPrefix("aud-").toLong
      assert(f.duration_ms == 500, s"${f.id}: duration ${f.duration_ms}")
      assert(f.rms.length == 5) // 500ms / 100ms windows
      // two equal sines at amplitude amp/2 each => total RMS = amp/2
      val amp = 0.3 + 0.02 * (id % 10)
      val overall = math.sqrt(f.rms.map(r => r.toDouble * r).sum / f.rms.length)
      assert(math.abs(overall - amp / 2) < 0.02,
        s"${f.id}: rms $overall vs analytic ${amp / 2}")
    }
  }

  test("videoFrameSample: real Y4M decode — sampled luma phashes, deterministic") {
    val video = MediaSynth.videoDf(spark, 4)
    val got = Multimodal.videoFrameSample(video, everyK = 4).collect().sortBy(_.id)
    assert(got.length == 4)
    got.foreach { v =>
      assert(v.n_frames == 3) // frames 0,4,8 of 12
      assert(v.frame_phashes.distinct.length == 3) // moving content
    }
    // determinism: identical run, identical hashes
    val again = Multimodal.videoFrameSample(video, everyK = 4).collect().sortBy(_.id)
    assert(got.zip(again).forall { case (a, b) => a.frame_phashes.sameElements(b.frame_phashes) })
    // and the phash is of the DECODED luma plane, not container bytes:
    // recompute one expected hash directly
    val clip = Y4mCodec.decode(MediaSynth.y4mOf(0L))
    val expected = graft.images.ImageSynth.phashOf(clip.frames(4).y)
    assert(got.find(_.id == "vid-0").get.frame_phashes(1) == expected)
  }
}

package graft.media

import java.nio.{ByteBuffer, ByteOrder}

/** From-scratch RIFF/WAVE PCM16 codec — a REAL decoder for the uncompressed
  * member of the audio family (the container ships no audio libraries;
  * compressed codecs like MP3/Opus would plug into the same seam).
  *
  * Format per the public RIFF spec: "RIFF" <size> "WAVE", then chunks;
  * "fmt " carries (audioFormat=1 PCM, channels, sampleRate, bitsPerSample),
  * "data" carries little-endian interleaved PCM16 samples. Unknown chunks
  * (LIST, cue, fact, ...) are skipped by their declared size, as a
  * conforming reader must.
  */
object WavCodec {

  final case class Wav(sampleRate: Int, channels: Int, samples: Array[Short]) {
    def nFrames: Int = samples.length / channels
    def durationMs: Long = nFrames.toLong * 1000L / sampleRate
  }

  def encode(samples: Array[Short], sampleRate: Int, channels: Int = 1): Array[Byte] = {
    require(channels > 0 && samples.length % channels == 0, "partial frame")
    val dataLen = samples.length * 2
    val buf = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(channels.toShort)
      .putInt(sampleRate)
      .putInt(sampleRate * channels * 2) // byte rate
      .putShort((channels * 2).toShort) // block align
      .putShort(16) // bits per sample
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(buf.putShort)
    buf.array()
  }

  def decode(bytes: Array[Byte]): Wav = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def tag(): String = {
      val t = new Array[Byte](4); buf.get(t); new String(t, "US-ASCII")
    }
    require(tag() == "RIFF", "not a RIFF file")
    buf.getInt // riff size (trust chunk walking, not this)
    require(tag() == "WAVE", "not a WAVE file")
    var sampleRate = 0
    var channels = 0
    var bits = 0
    var samples: Array[Short] = null
    while (buf.remaining() >= 8 && samples == null) {
      val id = tag()
      val size = buf.getInt
      // declared chunk sizes are untrusted input: a size past the end of
      // the payload (or a negative reinterpretation of an unsigned 32-bit
      // value) must be a clean decode error, not a BufferUnderflowException
      require(size >= 0 && size <= buf.remaining(),
        s"corrupt WAV: chunk '$id' declares $size bytes, ${buf.remaining()} remain")
      id match {
        case "fmt " =>
          require(size >= 16, s"corrupt WAV: fmt chunk of $size bytes")
          val start = buf.position()
          val fmt = buf.getShort
          require(fmt == 1, s"only PCM supported, got format $fmt")
          channels = buf.getShort
          sampleRate = buf.getInt
          buf.getInt // byte rate
          buf.getShort // block align
          bits = buf.getShort
          require(bits == 16, s"only PCM16 supported, got $bits-bit")
          buf.position(start + size + (size & 1)) // chunks are word-aligned
        case "data" =>
          require(sampleRate > 0, "data chunk before fmt chunk")
          val n = size / 2
          val out = new Array[Short](n)
          var i = 0
          while (i < n) { out(i) = buf.getShort; i += 1 }
          samples = out
        case _ => // skip unknown chunk (LIST/cue/fact/...), word-aligned
          buf.position(buf.position() + size + (size & 1))
      }
    }
    require(samples != null, "no data chunk")
    Wav(sampleRate, channels, samples)
  }
}

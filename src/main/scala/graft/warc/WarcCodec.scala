package graft.warc

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.{US_ASCII, UTF_8}

/** One WARC record (ISO 28500 / WARC 1.0). `headers` carries every named
  * field verbatim (order-insensitive map; the writer emits the canonical
  * fields first). Payload is opaque bytes — the record block.
  */
final case class WarcRecord(
    warcType: String,
    targetUri: String,
    date: String,
    recordId: String,
    contentType: String,
    payload: Array[Byte],
    headers: Map[String, String] = Map.empty)

/** From-scratch WARC 1.0 reader/writer — the crawl ecosystem's archive
  * interchange format (the shape Common-Crawl-style corpora ship in), so a
  * graft crawl can export its fetched pages to any WARC consumer and
  * ingest third-party WARC dumps. Wire format per the WARC 1.0 spec:
  *
  * {{{
  * WARC/1.0\r\n
  * WARC-Type: response\r\n
  * WARC-Record-ID: <urn:uuid:...>\r\n
  * WARC-Date: 2026-01-01T00:00:00Z\r\n
  * WARC-Target-URI: http://...\r\n
  * Content-Type: application/octet-stream\r\n
  * Content-Length: N\r\n
  * \r\n
  * <N payload bytes>\r\n
  * \r\n
  * }}}
  *
  * The decode loop is strict and bounded (the ADVICE-class guards the WAV/
  * Y4M codecs grew this round): every declared Content-Length is validated
  * against the remaining bytes BEFORE any allocation, header blocks are
  * capped, and a malformed record fails with a descriptive error instead
  * of a BufferUnderflow. Payload bytes are copied straight through —
  * records whose payload contains `\r\n` or the literal text `WARC/1.0`
  * roundtrip exactly because the reader walks lengths, never delimiters.
  */
object WarcCodec {

  private val Crlf = "\r\n".getBytes(US_ASCII)
  private val MaxHeaderBytes = 64 * 1024

  /** Canonical header order for the fields every record carries; extra
    * headers follow sorted by name so encode output is deterministic. */
  def recordBytes(r: WarcRecord): Array[Byte] = {
    val out = new ByteArrayOutputStream(r.payload.length + 256)
    def line(s: String): Unit = { out.write(s.getBytes(UTF_8)); out.write(Crlf) }
    // every canonical field is header-grammar data: a CR/LF in ANY of them
    // desyncs the length-framed format (record smuggling). contentType in
    // particular flows from crawled-server data — WarcIO.toRecords
    // sanitizes it, and the codec still refuses as defense in depth.
    def noCrlf(field: String, v: String): Unit =
      require(!v.exists(c => c == '\r' || c == '\n'), s"newline in $field: $v")
    noCrlf("WARC-Target-URI", r.targetUri)
    noCrlf("WARC-Type", r.warcType)
    noCrlf("WARC-Record-ID", r.recordId)
    noCrlf("WARC-Date", r.date)
    noCrlf("Content-Type", r.contentType)
    line("WARC/1.0")
    line(s"WARC-Type: ${r.warcType}")
    line(s"WARC-Record-ID: <${r.recordId}>")
    line(s"WARC-Date: ${r.date}")
    if (r.targetUri.nonEmpty) line(s"WARC-Target-URI: ${r.targetUri}")
    line(s"Content-Type: ${r.contentType}")
    line(s"Content-Length: ${r.payload.length}")
    r.headers.toSeq.sortBy(_._1).foreach { case (k, v) =>
      // a custom header must not collide with a canonical field (a smuggled
      // "content-length" would desync the length-framed reader) nor carry
      // characters that break the header grammar (CRLF/colon injection)
      require(!Canonical(k.trim.toLowerCase), s"reserved WARC header: $k")
      require(!k.exists(c => c == '\r' || c == '\n' || c == ':'),
        s"illegal character in WARC header name: $k")
      require(!v.exists(c => c == '\r' || c == '\n'),
        s"newline in WARC header value for $k")
      line(s"$k: $v")
    }
    out.write(Crlf)
    out.write(r.payload)
    out.write(Crlf); out.write(Crlf)
    out.toByteArray
  }

  def encode(records: Iterator[WarcRecord]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    records.foreach(r => out.write(recordBytes(r)))
    out.toByteArray
  }

  /** One record as ONE gzip member — the `.warc.gz` convention real-world
    * archive corpora ship in (member-per-record, so members concatenate
    * into a valid multi-member stream and a reader can split the file at
    * member boundaries without inflating everything). Java's gzip header
    * carries no mtime/name here, so output is deterministic. */
  def recordBytesGz(r: WarcRecord): Array[Byte] = {
    val bytes = recordBytes(r)
    val out = new ByteArrayOutputStream(bytes.length / 2 + 64)
    val gz = new java.util.zip.GZIPOutputStream(out)
    gz.write(bytes); gz.finish(); gz.close()
    out.toByteArray
  }

  def encodeGz(records: Iterator[WarcRecord]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    records.foreach(r => out.write(recordBytesGz(r)))
    out.toByteArray
  }

  /** True when the bytes open with the gzip magic (a `.warc.gz` blob). */
  def isGzip(bytes: Array[Byte]): Boolean =
    bytes.length >= 2 && (bytes(0) & 0xff) == 0x1f && (bytes(1) & 0xff) == 0x8b

  /** Sniff-and-decode: transparent member-wise inflate for `.warc.gz`
    * blobs (bounded by `maxInflated`), plain decode otherwise. */
  def decodeAuto(bytes: Array[Byte], maxInflated: Long = DefaultMaxInflated): Seq[WarcRecord] =
    if (isGzip(bytes)) decode(gunzipStrict(bytes, maxInflated)) else decode(bytes)

  /** 1 GiB — a whole-file inflate must fit a JVM array anyway (the
    * large-scale convention is many ~1 GB archive files, one per task). */
  val DefaultMaxInflated: Long = 1L << 30

  /** Strict multi-member gzip inflate with an expansion ceiling (the
    * bounded-decode guard the HTTP path's `unzipBestEffort` is the lenient
    * cousin of — an ARCHIVE decode must fail loudly, not truncate
    * silently). Every byte of input must belong to a well-formed member:
    * headers are parsed field by field, each member's deflate stream is
    * inflated with raw Inflater (so a truncated or corrupt stream raises
    * instead of being swallowed the way GZIPInputStream drops a garbage
    * tail), and each member's CRC32 + ISIZE trailer is verified. */
  def gunzipStrict(bytes: Array[Byte], maxOut: Long): Array[Byte] = {
    val out = new ByteArrayOutputStream(
      math.min(math.min(bytes.length.toLong * 4, maxOut), 1L << 20).toInt)
    var pos = 0
    while (pos < bytes.length) pos = inflateMember(bytes, pos, out, maxOut)
    out.toByteArray
  }

  /** Inflate the gzip member starting at `start`; returns the offset just
    * past its trailer. */
  private def inflateMember(b: Array[Byte], start: Int,
      out: ByteArrayOutputStream, maxOut: Long): Int = {
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"corrupt gzip at offset $start: $msg")
    if (start + 10 > b.length) fail("truncated member header")
    if ((b(start) & 0xff) != 0x1f || (b(start + 1) & 0xff) != 0x8b)
      fail("bad gzip magic")
    if (b(start + 2) != 8) fail(s"unsupported compression method ${b(start + 2)}")
    val flg = b(start + 3) & 0xff
    var p = start + 10
    if ((flg & 4) != 0) { // FEXTRA: 2-byte little-endian length + payload
      if (p + 2 > b.length) fail("truncated FEXTRA")
      p += 2 + ((b(p) & 0xff) | ((b(p + 1) & 0xff) << 8))
    }
    def skipZeroTerminated(): Unit = {
      while (p < b.length && b(p) != 0) p += 1
      p += 1
    }
    if ((flg & 8) != 0) skipZeroTerminated() // FNAME
    if ((flg & 16) != 0) skipZeroTerminated() // FCOMMENT
    if ((flg & 2) != 0) p += 2 // FHCRC
    if (p > b.length) fail("truncated header fields")
    val inf = new java.util.zip.Inflater(true)
    val crc = new java.util.zip.CRC32
    val buf = new Array[Byte](8192)
    var produced = 0L
    try {
      inf.setInput(b, p, b.length - p)
      while (!inf.finished()) {
        val n =
          try inf.inflate(buf)
          catch { case e: java.util.zip.DataFormatException =>
            fail(s"bad deflate stream: ${e.getMessage}") }
        if (n == 0 && inf.needsInput()) fail("truncated deflate stream")
        if (out.size().toLong + n > maxOut)
          fail(s"inflated size exceeds the $maxOut-byte ceiling")
        out.write(buf, 0, n)
        crc.update(buf, 0, n)
        produced += n
      }
      val trailer = p + (b.length - p - inf.getRemaining)
      if (trailer + 8 > b.length) fail("truncated member trailer")
      def le32(o: Int): Long =
        (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
          ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
      if (le32(trailer) != crc.getValue) fail("CRC32 mismatch")
      if (le32(trailer + 4) != (produced & 0xffffffffL)) fail("ISIZE mismatch")
      trailer + 8
    } finally inf.end()
  }

  /** Parse a WARC file's bytes into records. Strict: any structural
    * violation (bad magic, missing Content-Length, a length past the end
    * of the buffer, an unterminated header block) raises with the byte
    * offset in the message. */
  def decode(bytes: Array[Byte]): Seq[WarcRecord] =
    decodeWithExtents(bytes).map(_._1)

  /** decode plus each record's framed byte extent (offset, length) inside
    * the buffer — what a CDX index row points a range request at. */
  def decodeWithExtents(bytes: Array[Byte]): Seq[(WarcRecord, Int, Int)] = {
    val recs = Seq.newBuilder[(WarcRecord, Int, Int)]
    var pos = 0
    while (pos < bytes.length) {
      pos = skipCrlf(bytes, pos)
      val recStart = pos
      if (pos < bytes.length) {
        val (headers, bodyStart) = readHeaderBlock(bytes, pos)
        val rawLen = headers.getOrElse("content-length",
          fail(pos, "missing Content-Length"))
        val len = rawLen.trim.toLongOption.getOrElse(
          fail(pos, s"unparsable Content-Length '$rawLen'"))
        require(len >= 0 && len <= bytes.length - bodyStart,
          s"corrupt WARC at offset $pos: Content-Length $len with only " +
            s"${bytes.length - bodyStart} bytes remaining")
        val payload = java.util.Arrays.copyOfRange(bytes, bodyStart,
          bodyStart + len.toInt)
        pos = bodyStart + len.toInt
        recs += ((WarcRecord(
          warcType = headers.getOrElse("warc-type", ""),
          targetUri = headers.getOrElse("warc-target-uri", ""),
          date = headers.getOrElse("warc-date", ""),
          recordId = headers.getOrElse("warc-record-id", "")
            .stripPrefix("<").stripSuffix(">"),
          contentType = headers.getOrElse("content-type", ""),
          payload = payload,
          headers = headers.filterNot { case (k, _) => Canonical(k) }),
          recStart, pos - recStart))
      }
    }
    recs.result()
  }

  /** Sniffing extent decode: for a plain `.warc` buffer, each record's
    * framed byte extent; for a `.warc.gz` buffer, the COMPRESSED extent of
    * the gzip member holding the record (member-per-record convention) —
    * either way, `bytes.slice(offset, offset+length)` hands back a
    * standalone blob `decodeAuto` re-reads, which is exactly the contract
    * an HTTP range request against the archive file needs. */
  def decodeAutoWithExtents(bytes: Array[Byte],
      maxInflated: Long = DefaultMaxInflated): Seq[(WarcRecord, Long, Long)] =
    if (!isGzip(bytes))
      decodeWithExtents(bytes).map { case (r, off, len) => (r, off.toLong, len.toLong) }
    else {
      val out = Seq.newBuilder[(WarcRecord, Long, Long)]
      var pos = 0
      while (pos < bytes.length) {
        val buf = new ByteArrayOutputStream()
        val next = inflateMember(bytes, pos, buf, maxInflated)
        decode(buf.toByteArray).foreach(r =>
          out += ((r, pos.toLong, (next - pos).toLong)))
        pos = next
      }
      out.result()
    }

  private val Canonical = Set("warc-type", "warc-target-uri", "warc-date",
    "warc-record-id", "content-type", "content-length")

  private def fail(pos: Int, msg: String): Nothing =
    throw new IllegalArgumentException(s"corrupt WARC at offset $pos: $msg")

  private def skipCrlf(bytes: Array[Byte], start: Int): Int = {
    var p = start
    while (p + 1 < bytes.length && bytes(p) == '\r' && bytes(p + 1) == '\n') p += 2
    p
  }

  /** Header block: `WARC/1.0` then `Name: value` lines until a blank line.
    * Returns lowercase-keyed headers and the payload start offset. */
  private def readHeaderBlock(bytes: Array[Byte],
      start: Int): (Map[String, String], Int) = {
    val end = math.min(bytes.length, start.toLong + MaxHeaderBytes).toInt
    var p = start
    def readLine(): String = {
      val lineStart = p
      while (p + 1 < end && !(bytes(p) == '\r' && bytes(p + 1) == '\n')) p += 1
      if (p + 1 >= end) fail(lineStart, "unterminated header line")
      val s = new String(bytes, lineStart, p - lineStart, UTF_8)
      p += 2
      s
    }
    val magic = readLine()
    if (magic != "WARC/1.0" && magic != "WARC/1.1")
      fail(start, s"bad magic '$magic'")
    val hs = Map.newBuilder[String, String]
    var line = readLine()
    while (line.nonEmpty) {
      val i = line.indexOf(':')
      if (i < 0) fail(p, s"header without ':': '$line'")
      hs += line.substring(0, i).trim.toLowerCase -> line.substring(i + 1).trim
      line = readLine()
    }
    (hs.result(), p)
  }
}

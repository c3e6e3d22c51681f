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

  /** Parse a WARC file's bytes into records. Strict: any structural
    * violation (bad magic, missing Content-Length, a length past the end
    * of the buffer, an unterminated header block) raises with the byte
    * offset in the message. */
  def decode(bytes: Array[Byte]): Seq[WarcRecord] = {
    val recs = Seq.newBuilder[WarcRecord]
    var pos = 0
    while (pos < bytes.length) {
      pos = skipCrlf(bytes, pos)
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
        recs += WarcRecord(
          warcType = headers.getOrElse("warc-type", ""),
          targetUri = headers.getOrElse("warc-target-uri", ""),
          date = headers.getOrElse("warc-date", ""),
          recordId = headers.getOrElse("warc-record-id", "")
            .stripPrefix("<").stripSuffix(">"),
          contentType = headers.getOrElse("content-type", ""),
          payload = payload,
          headers = headers.filterNot { case (k, _) => Canonical(k) })
        pos = bodyStart + len.toInt
      }
    }
    recs.result()
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

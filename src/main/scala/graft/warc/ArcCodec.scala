package graft.warc

import java.nio.charset.StandardCharsets.UTF_8

/** From-scratch reader for the legacy Internet Archive ARC format — the
  * pre-WARC container old IA / Common Crawl-era corpora ship in (the
  * reference reads it via a Hadoop record reader:
  * tools/arc/ArcRecordReader.java:38-45 — "Arc files are essentially tars
  * of gzips. Each record in an arc file is a compressed gzip").
  *
  * Wire format (ARC 1.x):
  *
  * {{{
  * filedesc://path 0.0.0.0 20230101000000 text/plain N   <- version block
  * <N bytes of version metadata>
  * http://example.com/ 1.2.3.4 20230101120000 text/html N
  * <N content bytes (HTTP response or raw document)>
  * }}}
  *
  * Each record is one space-separated header line — v1 carries 5 fields
  * `URL IP-address archive-date content-type length`, v2 carries 10
  * (result-code, checksum, location, offset, filename inserted before the
  * length) — then a newline, `length` content bytes, and a blank
  * separator line. Archives ship plain or as concatenated per-record gzip
  * members (the common IA form); both decode here, the gz path through
  * the same strict bounded member-wise inflate the `.warc.gz` reader uses.
  *
  * Records map onto [[WarcRecord]] (warcType = "response", ARC dates
  * converted to ISO-8601, record ids derived like the WARC exporter's) so
  * the entire WARC ingest surface — `WarcIO.toPages`, the latest-capture
  * dedup, streaming composition — consumes ARC archives unchanged. The
  * version block is consumed and skipped, matching the reference reader.
  *
  * The decode loop is strict and bounded like [[WarcCodec.decode]]: the
  * declared length is validated against the remaining bytes before any
  * allocation and malformed headers fail with the byte offset.
  */
object ArcCodec {

  /** Sniff-and-decode: member-wise inflate for `.arc.gz`, plain otherwise. */
  def decodeAuto(bytes: Array[Byte],
      maxInflated: Long = WarcCodec.DefaultMaxInflated): Seq[WarcRecord] =
    if (WarcCodec.isGzip(bytes))
      decode(WarcCodec.gunzipStrict(bytes, maxInflated))
    else decode(bytes)

  /** `yyyyMMddHHmmss` (the ARC archive-date) -> ISO-8601 `...Z`. A date
    * that does not parse maps to the epoch string rather than failing the
    * whole archive — old ARC corpora carry occasional mangled dates and
    * the reference reader never validated them. */
  def arcDateToIso(d: String): String =
    try {
      val t = java.time.LocalDateTime.parse(d,
        java.time.format.DateTimeFormatter.ofPattern("yyyyMMddHHmmss"))
      t.atOffset(java.time.ZoneOffset.UTC).toInstant.toString
    } catch { case _: Exception => "1970-01-01T00:00:00Z" }

  private def fail(pos: Int, msg: String): Nothing =
    throw new IllegalArgumentException(s"corrupt ARC at offset $pos: $msg")

  def decode(bytes: Array[Byte]): Seq[WarcRecord] = {
    val recs = Seq.newBuilder[WarcRecord]
    var pos = 0
    while (pos < bytes.length) {
      // skip separator newlines between records (LF or CRLF)
      while (pos < bytes.length &&
        (bytes(pos) == '\n' || bytes(pos) == '\r')) pos += 1
      if (pos < bytes.length) {
        val headerStart = pos
        while (pos < bytes.length && bytes(pos) != '\n') pos += 1
        if (pos >= bytes.length) fail(headerStart, "unterminated header line")
        val header = new String(bytes, headerStart, pos - headerStart, UTF_8)
          .stripSuffix("\r")
        pos += 1 // the newline
        val fields = header.split(" ")
        if (fields.length != 5 && fields.length != 10)
          fail(headerStart,
            s"header has ${fields.length} fields (want 5 [v1] or 10 [v2]): '$header'")
        val len = fields.last.toLongOption.getOrElse(
          fail(headerStart, s"unparsable length '${fields.last}'"))
        if (len < 0 || len > bytes.length - pos)
          fail(headerStart,
            s"length $len with only ${bytes.length - pos} bytes remaining")
        val url = fields(0)
        val date = arcDateToIso(fields(2))
        val payload = java.util.Arrays.copyOfRange(bytes, pos, pos + len.toInt)
        pos += len.toInt
        // the version block describes the archive, not a capture
        if (!url.startsWith("filedesc://"))
          recs += WarcRecord(
            warcType = "response",
            targetUri = url,
            date = date,
            // the byte offset joins the id input: ARC dates are
            // second-granular, so two captures of one url inside the same
            // second would otherwise collide — violating the uniqueness
            // contract WarcIO.toRecords keeps via millisecond fetchTime.
            // decodeAuto inflates the whole archive before decoding, so
            // headerStart is unique per record in plain AND .arc.gz form.
            recordId = "urn:uuid:" + graft.url.UrlUtil.uuid3(
              url + "\n" + fields(2) + "\n" + headerStart),
            contentType = fields(3),
            payload = payload)
      }
    }
    recs.result()
  }
}

package graft.warc

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One archive-index row (the CDX shape the web-archive ecosystem keys
  * lookups on): a sortable url key, the capture timestamp, and the byte
  * extent of the record inside its archive file — everything a
  * wayback-style reader needs to range-request one capture out of a
  * petabyte of `.warc.gz` without touching the rest. */
final case class CdxRow(
    urlkey: String,
    timestamp: String, // yyyyMMddHHmmss, the CDX convention
    url: String,
    mime: String,
    digest: String, // md5 hex of the payload (engine-consistent, not SHA1-b32)
    offset: Long, // byte offset of the record (gz: its member) in the file
    length: Long, // byte length of that extent
    filename: String)

/** CDX index generation over WARC/ARC-free archive directories — the
  * lookup-index sidecar every real archive deployment writes next to its
  * `.warc.gz` files. The url key is the engine's canonical reversed-url
  * key (`UrlUtil.reverseUrl`: host reversed, scheme/port folded — same
  * sort-locality property as wayback SURT: one host's captures cluster);
  * extents come from the framing walk (plain) or the gzip member
  * boundaries (member-per-record convention), so
  * `file.slice(offset, offset+length)` is a standalone decodable blob —
  * the range-request contract CdxSpec proves record by record.
  *
  * Spark shape: one task per archive file (binaryFile, like every other
  * archive reader here), a narrow flatMap to index rows — at corpus scale
  * the index is a tiny fraction of the archive and writes as ordinary
  * columnar output; `writeCdxText` emits the classic space-separated CDX
  * lines for interop with line-oriented tooling. */
object CdxIO {

  /** `2026-01-01T00:00:00Z` -> `20260101000000` (unparsable -> zeros). */
  def cdxTimestamp(warcDate: String): String =
    try {
      val t = java.time.Instant.parse(warcDate).atOffset(java.time.ZoneOffset.UTC)
      f"${t.getYear}%04d${t.getMonthValue}%02d${t.getDayOfMonth}%02d" +
        f"${t.getHour}%02d${t.getMinute}%02d${t.getSecond}%02d"
    } catch { case _: java.time.format.DateTimeParseException => "0" * 14 }

  private def md5hex(b: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5").digest(b)
      .map("%02x".format(_)).mkString

  /** Index every `.warc` / `.warc.gz` under `dir`: one CdxRow per record. */
  def index(spark: SparkSession, dir: String,
      maxInflated: Long = WarcCodec.DefaultMaxInflated): Dataset[CdxRow] = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.{warc,warc.gz}")
      .load(dir)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        val fname = path.substring(path.lastIndexOf('/') + 1)
        WarcCodec.decodeAutoWithExtents(bytes, maxInflated).map {
          case (r, off, len) =>
            CdxRow(
              urlkey = graft.url.UrlUtil.reverseUrl(r.targetUri),
              timestamp = cdxTimestamp(r.date),
              url = r.targetUri,
              mime = r.contentType,
              digest = md5hex(r.payload),
              offset = off,
              length = len,
              filename = fname)
        }
      }
  }

  /** Classic space-separated CDX lines (sorted by (urlkey, timestamp) —
    * the property CDX consumers binary-search on), written as text.
    *
    * ENGINE-LOCAL dialect, not pywb/OpenWayback-consumable (r6 ADVICE
    * note): `urlkey` is the engine's reversed-url key (not SURT — same
    * sort-locality, different spelling) and `digest` is MD5 hex (not the
    * CDX ecosystem's SHA1-base32). The offsets/lengths/timestamps ARE the
    * standard semantics, so a consumer needs only those two field
    * spellings adapted; within this engine the lines round-trip exactly. */
  def writeCdxText(rows: Dataset[CdxRow], out: String): Unit = {
    import rows.sparkSession.implicits._
    rows.orderBy(col("urlkey"), col("timestamp"))
      .map(r => s"${r.urlkey} ${r.timestamp} ${r.url} ${r.mime} " +
        s"${r.digest} ${r.offset} ${r.length} ${r.filename}")
      .write.mode("overwrite").text(out)
  }
}

package graft.model

/** Nested fetch-outcome record.
  * Mirrors the reference's ProtocolStatus Avro record
  * (reference: src/main/gora/webpage.avsc:17-27).
  */
case class ProtocolStatus(
    code: Int = 0,
    args: Seq[String] = Seq.empty,
    lastModified: Long = 0L)

/** Nested parse-outcome record (reference: src/main/gora/webpage.avsc:34-42). */
case class ParseStatus(
    majorCode: Int = 0,
    minorCode: Int = 0,
    args: Seq[String] = Seq.empty)

/** The single mutable frontier/page record of the engine.
  *
  * One logical URL can map to several physical rows (versions): once a row is
  * fetched, the next generate mints a new key (reference:
  * src/main/java/org/apache/nutch/crawl/GeneratorReducer.java:99-102), so the
  * table accumulates one row per crawl round for re-fetched pages; "latest
  * version" = max fetchTime (DbUpdateReducer.java:81).
  *
  * Deviations from the reference Avro record (src/main/gora/webpage.avsc):
  *  - `metadata` is map<string,string> (reference: map<string,bytes>); the
  *    only binary metadata value in the reference is the OPIC cash float,
  *    which we model as the typed column `cash` instead (columnar-friendly,
  *    avoids per-row binary decode in the hot update path).
  *  - lineage columns `round`, `srcPartition` are appended per north_rule.
  */
case class WebPage(
    key: String = null,
    url: String = null,
    baseUrl: String = null,
    reprUrl: String = null,
    status: Int = 0,
    fetchTime: Long = 0L,
    prevFetchTime: Long = 0L,
    fetchInterval: Int = 0,
    retriesSinceFetch: Int = 0,
    modifiedTime: Long = 0L,
    prevModifiedTime: Long = 0L,
    protocolStatus: ProtocolStatus = null,
    content: Array[Byte] = null,
    contentType: String = null,
    title: String = null,
    text: String = null,
    signature: Array[Byte] = null,
    prevSignature: Array[Byte] = null,
    parseStatus: ParseStatus = null,
    score: Float = 0.0f,
    cash: Float = 0.0f,
    headers: Map[String, String] = Map.empty,
    outlinks: Map[String, String] = Map.empty,
    inlinks: Map[String, String] = Map.empty,
    markers: Map[String, String] = Map.empty,
    metadata: Map[String, String] = Map.empty,
    batchId: String = null,
    round: Int = 0,
    srcPartition: Int = -1)

object WebPage {
  def forUrl(url: String): WebPage = WebPage(url = url)
}

/** Crawl status codes. Numeric values reproduced exactly — ordering and
  * seen-set comparisons depend on the status transitions
  * (reference: src/main/java/org/apache/nutch/crawl/CrawlStatus.java:23-36).
  */
object CrawlStatus {
  val UNFETCHED: Int = 0x01
  val FETCHED: Int = 0x02
  val GONE: Int = 0x03
  val REDIR_TEMP: Int = 0x04
  val REDIR_PERM: Int = 0x05
  val RETRY: Int = 0x22
  val NOTMODIFIED: Int = 0x26

  val names: Map[Int, String] = Map(
    UNFETCHED -> "status_unfetched",
    FETCHED -> "status_fetched",
    GONE -> "status_gone",
    REDIR_TEMP -> "status_redir_temp",
    REDIR_PERM -> "status_redir_perm",
    RETRY -> "status_retry",
    NOTMODIFIED -> "status_notmodified")

  def name(s: Int): String = names.getOrElse(s, s"status_$s")
}

/** Pipeline state-machine marks stored in the `markers` map
  * (reference: src/main/java/org/apache/nutch/storage/Mark.java:19-21).
  */
object Marks {
  val INJECT = "_injmrk_"
  val GENERATE = "_gnmrk_"
  val FETCH = "_ftcmrk_"
  val PARSE = "__prsmrk__"
  val UPDATEDB = "_updmrk_"
  val INDEX = "_idxmrk_"
  /** Link distance from a seed, stored as a marker like the reference
    * (DbUpdaterJob.DISTANCE = "dist"). */
  val DISTANCE = "dist"

  def put(p: WebPage, mark: String, value: String): WebPage =
    p.copy(markers = p.markers + (mark -> value))
  def check(p: WebPage, mark: String): Option[String] = p.markers.get(mark)
  def remove(p: WebPage, mark: String): WebPage =
    p.copy(markers = p.markers - mark)
}

/** Fetch-schedule modified-state codes
  * (reference: src/main/java/org/apache/nutch/crawl/FetchSchedule.java).
  */
object ModifiedState {
  val UNKNOWN = 0
  val MODIFIED = 1
  val NOTMODIFIED = 2
}

/** Protocol status codes (subset used by the synthetic protocol; values match
  * reference src/main/java/org/apache/nutch/protocol/ProtocolStatusCodes.java).
  */
object ProtocolStatusCodes {
  val SUCCESS = 1
  val FAILED = 2
  val GONE = 11
  val MOVED = 12
  val TEMP_MOVED = 13
  val NOTFOUND = 14
  val RETRY = 15
  val EXCEPTION = 16
  val ACCESS_DENIED = 17
  val ROBOTS_DENIED = 18
  val NOTMODIFIED = 21
  val WOULDBLOCK = 22
  val BLOCKED = 23
}

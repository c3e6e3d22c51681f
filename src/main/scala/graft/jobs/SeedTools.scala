package graft.jobs

import org.apache.spark.sql.{Dataset, SparkSession}

/** One directory-dump entry: the seed url plus the topic path and the
  * optional title/description snippet the reference lifts into metadata
  * (DmozParser snippet mode stores `_dmoz_title_`/`_dmoz_desc_`). */
final case class DmozSeed(url: String, topic: String, title: String,
    description: String)

/** Bulk-seed tooling (reference tools/DmozParser.java): convert an
  * open-directory RDF dump (`<Topic r:id=...>` sections containing
  * `<ExternalPage about=url>` entries with `<d:Title>`/`<d:Description>`
  * children) into seed urls, with the reference's three admission rules —
  * the Top/Adult section filter, an optional topic regex, and the
  * md5-subset sampler (`abs(hash ^ skew) % subsetDenom == 0`, the
  * deterministic "take 1/N of the directory" switch for bootstrap crawls).
  *
  * Spark shape: RDF is not line-splittable (topic state spans lines), so
  * each dump FILE parses whole inside one task via the binaryFile source —
  * parallelism = file count, the same contract as WARC ingest; a dump too
  * big for one task splits into several files at Topic boundaries. The
  * per-file parse is a single sequential regex scan, not a DOM load, so
  * task memory is O(file), never O(tree).
  */
object SeedTools {

  /** Topic sections + page entries in document order; one regex pass. */
  private val EventRe =
    ("""(?s)<Topic\s+r:id="([^"]*)"|""" +
      """<ExternalPage\s+about="([^"]*)"[^>]*>(.*?)</ExternalPage>""").r
  private val TitleRe = """(?s)<d:Title>(.*?)</d:Title>""".r
  private val DescRe = """(?s)<d:Description>(.*?)</d:Description>""".r

  /** The five predefined XML entities (directory dumps use no others). */
  private def unescape(s: String): String = s
    .replace("&lt;", "<").replace("&gt;", ">")
    .replace("&quot;", "\"").replace("&apos;", "'")
    .replace("&amp;", "&") // last, so &amp;lt; decodes to &lt; not <

  /** Reference subset sampler shape (DmozParser.java:152-157): an
    * md5-derived int hash of the url, xor'd with a caller skew, |.| mod
    * the denominator — deterministic, uniform, engine-independent. */
  def subsetHash(url: String, skew: Int): Int = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(url.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val h = ((d(0) & 0xff) << 24) | ((d(1) & 0xff) << 16) |
      ((d(2) & 0xff) << 8) | (d(3) & 0xff)
    math.abs(h ^ skew)
  }

  /** Pure per-file parse — also the test surface. */
  def parseContent(xml: String, subsetDenom: Int = 1,
      includeAdult: Boolean = false, skew: Int = 0,
      topicPattern: Option[String] = None): Iterator[DmozSeed] = {
    require(subsetDenom >= 1, s"subsetDenom must be positive: $subsetDenom")
    val topicRe = topicPattern.map(_.r)
    var topic = ""
    EventRe.findAllMatchIn(xml).flatMap { m =>
      if (m.group(1) != null) {
        topic = unescape(m.group(1))
        None
      } else {
        val url = unescape(m.group(2))
        val keep =
          (includeAdult || !topic.startsWith("Top/Adult")) &&
            topicRe.forall(_.matches(topic)) &&
            subsetHash(url, skew) % subsetDenom == 0
        if (!keep) None
        else {
          val body = m.group(3)
          Some(DmozSeed(url, topic,
            TitleRe.findFirstMatchIn(body).map(t => unescape(t.group(1)).trim)
              .getOrElse(""),
            DescRe.findFirstMatchIn(body).map(d => unescape(d.group(1)).trim)
              .getOrElse("")))
        }
      }
    }
  }

  /** Distributed parse of a dump file / directory of dump files. */
  def parseDmozRdf(spark: SparkSession, path: String, subsetDenom: Int = 1,
      includeAdult: Boolean = false, skew: Int = 0,
      topicPattern: Option[String] = None): Dataset[DmozSeed] = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .select("content").as[Array[Byte]]
      .flatMap(bytes => parseContent(
        new String(bytes, java.nio.charset.StandardCharsets.UTF_8),
        subsetDenom, includeAdult, skew, topicPattern))
  }
}

/** One sitemap entry: a seed url with the optional crawl hints the
  * protocol defines (lastmod as epoch ms when parsable, priority
  * defaulting to the spec's 0.5), or a nested sub-sitemap reference
  * (`isIndex = true`) from a sitemapindex file. */
final case class SitemapEntry(url: String, lastmod: Long, priority: Double,
    isIndex: Boolean)

/** Sitemap processing (sitemaps.org protocol; the Nutch 1.x
  * SitemapProcessor role — the 2.x reference collects `Sitemap:` lines
  * from robots.txt (RobotsTxtParser/RobotsRule.sitemaps) but never ships
  * a consumer; this closes that loop: robots → sitemap payloads → seed
  * rows → inject). Handles the three wire forms:
  *
  *  - XML urlset: `<url><loc>…</loc> [<lastmod>] [<priority>]</url>`
  *  - XML sitemapindex: `<sitemap><loc>…</loc></sitemap>` (emitted with
  *    `isIndex = true` so the caller fetches and parses another level)
  *  - plain text: one url per line
  *
  * plus gzipped payloads of any of them (`.xml.gz` — the strict bounded
  * member-wise inflate the archive readers share). The XML scan is the
  * DMOZ discipline: one sequential regex pass, O(payload) memory, never
  * a DOM; entities unescape; urls longer than 2048 chars or outside
  * http(s) are dropped per the protocol's own limits.
  */
object Sitemaps {

  private val UrlBlockRe = """(?s)<url\s*>(.*?)</url\s*>""".r
  private val IndexBlockRe = """(?s)<sitemap\s*>(.*?)</sitemap\s*>""".r
  private val LocRe = """(?s)<loc\s*>(.*?)</loc\s*>""".r
  private val LastmodRe = """(?s)<lastmod\s*>(.*?)</lastmod\s*>""".r
  private val PriorityRe = """(?s)<priority\s*>(.*?)</priority\s*>""".r

  private def unescape(s: String): String = s
    .replace("&lt;", "<").replace("&gt;", ">")
    .replace("&quot;", "\"").replace("&apos;", "'")
    .replace("&amp;", "&")

  /** W3C datetime (the protocol's lastmod format): date-only or full
    * timestamp with offset -> epoch ms; unparsable -> 0. */
  def parseLastmod(s: String): Long = {
    val t = s.trim
    if (t.isEmpty) 0L
    else try {
      if (t.length <= 10) // YYYY-MM-DD
        java.time.LocalDate.parse(t).atStartOfDay(java.time.ZoneOffset.UTC)
          .toInstant.toEpochMilli
      else java.time.OffsetDateTime.parse(t).toInstant.toEpochMilli
    } catch { case _: java.time.format.DateTimeParseException => 0L }
  }

  private def validUrl(u: String): Boolean =
    u.length <= 2048 && (u.startsWith("http://") || u.startsWith("https://"))

  /** Pure per-payload parse — also the test surface. Sniffs gzip, then
    * XML-vs-text by the presence of a `<loc>` tag. */
  def parseContent(bytes: Array[Byte],
      maxInflated: Long = graft.warc.WarcCodec.DefaultMaxInflated): Seq[SitemapEntry] = {
    val raw =
      if (graft.warc.WarcCodec.isGzip(bytes))
        graft.warc.WarcCodec.gunzipStrict(bytes, maxInflated)
      else bytes
    val text = new String(raw, java.nio.charset.StandardCharsets.UTF_8)
    if (LocRe.findFirstIn(text).isDefined) {
      val urls = UrlBlockRe.findAllMatchIn(text).flatMap { m =>
        val body = m.group(1)
        LocRe.findFirstMatchIn(body).map(l => (unescape(l.group(1)).trim, body))
      }.collect { case (u, body) if validUrl(u) =>
        SitemapEntry(u,
          LastmodRe.findFirstMatchIn(body)
            .map(x => parseLastmod(unescape(x.group(1)))).getOrElse(0L),
          PriorityRe.findFirstMatchIn(body)
            .flatMap(x => x.group(1).trim.toDoubleOption).getOrElse(0.5),
          isIndex = false)
      }
      val subs = IndexBlockRe.findAllMatchIn(text).flatMap(m =>
        LocRe.findFirstMatchIn(m.group(1)).map(l => unescape(l.group(1)).trim))
        .collect { case u if validUrl(u) =>
          SitemapEntry(u, 0L, 0.5, isIndex = true)
        }
      (urls ++ subs).toSeq
    } else
      // plain-text sitemap: one url per line
      text.linesIterator.map(_.trim).filter(validUrl)
        .map(SitemapEntry(_, 0L, 0.5, isIndex = false)).toSeq
  }

  /** Distributed parse of a directory of fetched sitemap payloads
    * (binaryFile source — parallelism = file count, the WARC/DMOZ
    * contract). Entry point for the robots→sitemap loop: fetch each
    * `RobotsRule.sitemaps` url, drop the payloads in a dir (or pass any
    * (bytes) frame), parse here, inject the non-index urls, recurse on
    * the index rows. */
  def parseSitemaps(spark: SparkSession, path: String): Dataset[SitemapEntry] = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .select("content").as[Array[Byte]]
      .flatMap(bytes => parseContent(bytes))
  }
}

package graft.jobs

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.crawl.CrawlConfig
import graft.images.ImageSynth
import graft.model._
import graft.site.OutlinkSource
import graft.url.{RegexUrlFilter, Signatures, UrlFilter, UrlNormalizers, UrlUtil}

/** The parse stage: payload decode + text + outlinks + signature.
  *
  * Reference shape (SURVEY.md B17-B21, ParseUtil.process:162-292): only
  * STATUS_FETCHED rows parse; text/title/signature are set, prevSignature
  * preserved, outlinks are normalized (outlink scope), filtered, deduped and
  * capped at db.max.outlinks.per.page, with optional same-host-only; the
  * PARSE_MARK copies the FETCH_MARK batch.
  *
  * For the image payload, "parse" = decode the PNG, verify it, take the
  * caption as the page text, recompute the perceptual hash from the decoded
  * pixels, and derive outlinks from it (SURVEY.md §7.3) — links genuinely
  * come from content, as in the reference's DOM extraction. A map-only
  * stage: one narrow `map`, no shuffle.
  */
object ParserJob {

  /** Metadata key under which parse stores the decoded payload's
    * perceptual hash. */
  val PhashMeta = "phash"

  /** Pure single-page parse, shared with refsim. `parseFilter` is the
    * parse-result hook chain (reference ParseFilters run inside
    * ParseUtil.process) — it sees the finished parse and may mutate it. */
  def parsePage(page: WebPage, conf: CrawlConfig, source: OutlinkSource,
      filter: UrlFilter, batchId: String,
      parseFilter: ParseFilter = ParseFilters.Identity): WebPage = {
    if (page.status != CrawlStatus.FETCHED) return page
    if (!page.markers.get(Marks.FETCH).contains(batchId)) return page
    if (page.content == null || page.content.isEmpty) return page
    // truncation check (ParserJob.isTruncated:155-185)
    val declaredLen = page.headers.get("Content-Length").flatMap(_.toLongOption)
    if (declaredLen.exists(_ > page.content.length)) return page

    val (pixels, _, _) =
      try ImageSynth.decodeRgb(page.content)
      catch {
        case _: Exception =>
          return page.copy(parseStatus = ParseStatus(ParseStatusCodes.Failed,
            ParseStatusCodes.FailedException, Seq.empty))
      }
    val phash = ImageSynth.phashOf(pixels)
    val text = page.metadata.getOrElse("caption", "")
    val title = page.url

    val raw = source.outlinksFromText(page.url, phash, text)
    val fromHost =
      if (conf.ignoreExternalLinks) UrlUtil.getHost(page.url).toLowerCase else null
    var outlinks = Map.empty[String, String]
    var valid = 0
    val limit = conf.maxOutlinksPerPage
    val it = raw.iterator
    while (it.hasNext && valid < limit) {
      val (toUrl0, anchor) = it.next()
      var toUrl = UrlNormalizers.normalize(toUrl0, UrlNormalizers.ScopeOutlink)
      if (toUrl != null) toUrl = filter.filter(toUrl)
      if (toUrl != null && !outlinks.contains(toUrl)) {
        val sameHostOk = fromHost == null || UrlUtil.getHost(toUrl).toLowerCase == fromHost
        if (sameHostOk) {
          outlinks += (toUrl -> anchor)
          valid += 1
        }
      }
    }

    val sig = Signatures.md5Signature(page)
    val withParse = page.copy(
      text = text,
      title = title,
      // persist the content-derived perceptual hash in the metadata escape
      // hatch (reference: metadata map, webpage.avsc) — downstream image
      // dedup (IndexerJob.dropNearDupImages) reads it without re-decoding
      metadata = page.metadata + (ParserJob.PhashMeta -> phash.toString),
      prevSignature = if (page.signature != null) page.signature else page.prevSignature,
      signature = sig,
      outlinks = outlinks,
      parseStatus = ParseStatus(ParseStatusCodes.Success, 0, Seq.empty))
    Marks.put(parseFilter.filter(page, withParse), Marks.PARSE, batchId)
  }

  def parse(spark: SparkSession, fetched: Dataset[WebPage], conf: CrawlConfig,
      source: OutlinkSource, batchId: String): Dataset[WebPage] = {
    import spark.implicits._
    val filter = if (conf.useDefaultUrlFilter) RegexUrlFilter.default else RegexUrlFilter.acceptAll
    val c = conf
    val s = source
    val b = batchId
    // resolve the chain once on the driver; the instances serialize into
    // the executor closure (they are pure row transforms)
    val pf = ParseFilters(conf)
    fetched.map { p =>
      val parsed = parsePage(p, c, s, filter, b, pf)
      // fetcher.store.content=false: the payload served the inline parse;
      // drop it before the table write so content bytes never enter the
      // frontier-state shuffles (reference: FetcherReducer.output:640-652)
      if (!c.storingContent && parsed.content != null) parsed.copy(content = null)
      else parsed
    }
  }
}

object ParseStatusCodes {
  val NotParsed = 0
  val Success = 1
  val Failed = 2
  val FailedException = 1
}

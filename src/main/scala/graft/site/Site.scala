package graft.site

import graft.images.ImageSynth

/** Robots rules for one host — the engine's stand-in for a parsed
  * robots.txt (reference: protocol/RobotRulesParser + lib-http
  * HttpRobotRulesParser; cases per FIXTURES.md §6). Empty disallow = allow
  * all (an empty robots.txt allows everything). `crawlDelayMs` <= 0 means
  * no Crawl-Delay directive.
  */
case class RobotsRule(host: String, disallow: Seq[String] = Seq.empty,
    crawlDelayMs: Long = 0L) {
  def isAllowed(url: String): Boolean = {
    val path = graft.url.UrlUtil.tryParse(url).map(_.file).getOrElse(url)
    !disallow.exists(d => d.nonEmpty && path.startsWith(d))
  }
}

/** Where outlinks come from at parse time.
  *
  * For the synthetic image universe, a page's outlinks are a pure function
  * of its decoded content (phash of the pixels) — "parse" genuinely derives
  * links from payload, like the reference's DOM outlink extraction
  * (SURVEY.md B17, §7.3). For golden-graph tests an explicit edge map plays
  * the role of the static fetch-test-site.
  */
trait OutlinkSource extends Serializable {
  /** (targetUrl, anchorText) pairs for a parsed page. */
  def outlinks(url: String, phash: Long): Seq[(String, String)]

  /** Text-aware hook (SURVEY.md B18): sources that mine links out of the
    * page text (captions can contain URLs) override this; the default
    * delegates to the content-derived path. */
  def outlinksFromText(url: String, phash: Long, text: String): Seq[(String, String)] =
    outlinks(url, phash)
}

/** B18: regex URL extraction over the page text (the caption for the image
  * payload) — the reference's plain-text fallback extractor
  * (parse/OutlinkExtractor.java), optionally composed with another source
  * (DOM-equivalent links plus text-mined links).
  */
case class RegexOutlinks(base: OutlinkSource = null) extends OutlinkSource {
  override def outlinks(url: String, phash: Long): Seq[(String, String)] =
    if (base == null) Seq.empty else base.outlinks(url, phash)
  override def outlinksFromText(url: String, phash: Long, text: String): Seq[(String, String)] =
    outlinks(url, phash) ++ graft.url.OutlinkExtractor.getOutlinks(text)
}

/** Deterministic synthetic outlinks: `degree` targets whose page indices
  * are derived from successive LCG steps over the page's phash — stable,
  * reproducible, and independent of partitioning (FIXTURES.md §4).
  */
case class PhashOutlinks(nPages: Long, nHosts: Int, degree: Int) extends OutlinkSource {
  override def outlinks(url: String, phash: Long): Seq[(String, String)] = {
    if (degree <= 0 || nPages <= 0) return Seq.empty
    var v = phash
    (0 until degree).map { k =>
      v = v * 6364136223846793005L + 1442695040888963407L
      val idx = math.floorMod(v >>> 17, nPages)
      val target = ImageSynth.urlOf(idx, nHosts)
      target -> s"anchor-$k"
    }
  }
}

/** Explicit edge map, for golden fixtures (OPIC 4-node graph, shortCrawl
  * 6-page site). */
case class MapOutlinks(edges: Map[String, Seq[(String, String)]]) extends OutlinkSource {
  override def outlinks(url: String, phash: Long): Seq[(String, String)] =
    edges.getOrElse(url, Seq.empty)
}

/** Fetch-time environment: robots per host plus an optional redirect map
  * (url -> (location, isTemporary)) simulating 3xx responses, and a set of
  * urls that fail transiently (RETRY path). All broadcast-sized dimension
  * state, like the reference's in-JVM robots cache (SURVEY.md D1).
  */
case class FetchEnv(
    robots: Map[String, RobotsRule] = Map.empty,
    redirects: Map[String, (String, Boolean)] = Map.empty,
    transientErrors: Set[String] = Set.empty) extends Serializable {
  def robotsFor(host: String): RobotsRule =
    robots.getOrElse(host, RobotsRule(host))
}

package graft.site

import graft.images.ImageSynth

/** Robots rules for one host — the engine's stand-in for a parsed
  * robots.txt (reference: protocol/RobotRulesParser + lib-http
  * HttpRobotRulesParser; cases per FIXTURES.md §6). Empty disallow = allow
  * all (an empty robots.txt allows everything). `crawlDelayMs` <= 0 means
  * no Crawl-Delay directive.
  */
case class RobotsRule(host: String, disallow: Seq[String] = Seq.empty,
    crawlDelayMs: Long = 0L, allow: Seq[String] = Seq.empty,
    sitemaps: Seq[String] = Seq.empty) {

  /** RFC 9309 decision: the most specific (longest) matching pattern wins,
    * Allow wins length ties, no matching pattern = allowed. Patterns may
    * use `*` wildcards and a `$` end anchor (crawler-commons' Google
    * extension); plain prefixes — the overwhelmingly common case — behave
    * exactly like the pre-Allow implementation. */
  def isAllowed(url: String): Boolean = {
    val path = graft.url.UrlUtil.tryParse(url).map(_.file).getOrElse(url)
    val bestDis = disallow.iterator.map(RobotsRule.matchLen(_, path)).foldLeft(-1)(_ max _)
    if (bestDis < 0) true
    else {
      val bestAlw = allow.iterator.map(RobotsRule.matchLen(_, path)).foldLeft(-1)(_ max _)
      bestAlw >= bestDis
    }
  }
}

object RobotsRule {
  /** Pattern specificity (= pattern length) if `pattern` matches `path`
    * from its start, else -1. `*` matches any run, trailing `$` anchors
    * the end. */
  private[site] def matchLen(pattern: String, path: String): Int = {
    if (pattern.isEmpty) return -1
    val anchored = pattern.endsWith("$")
    val p = if (anchored) pattern.dropRight(1) else pattern
    // greedy segment match: path must contain the '*'-separated segments in
    // order, the first segment at position 0, the last at the end if anchored
    val segs = p.split("\\*", -1)
    var pos = 0
    var ok = true
    for ((seg, i) <- segs.zipWithIndex if ok) {
      if (i == 0) {
        if (path.startsWith(seg)) pos = seg.length else ok = false
      } else if (i == segs.length - 1 && anchored) {
        if (path.length >= pos + seg.length && path.endsWith(seg)) pos = path.length
        else ok = false
      } else {
        val at = path.indexOf(seg, pos)
        if (at >= 0) pos = at + seg.length else ok = false
      }
    }
    if (ok && anchored && pos != path.length) ok = false
    if (ok) pattern.length else -1
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

object FetchEnv {
  /** Build the robots dimension from raw robots.txt payloads (what a live
    * `Protocol` fetch of `http://host/robots.txt` returns), parsed with the
    * reference's crawler-commons semantics (RobotsTxtParser). */
  def fromRobotsTxt(robotsTxt: Map[String, String], agentName: String,
      redirects: Map[String, (String, Boolean)] = Map.empty,
      transientErrors: Set[String] = Set.empty): FetchEnv =
    FetchEnv(
      robots = robotsTxt.map { case (host, content) =>
        host -> RobotsTxtParser.parse(host, content, agentName)
      },
      redirects = redirects,
      transientErrors = transientErrors)
}

package graft.site

/** From-scratch robots.txt parser with the reference's observable semantics
  * (reference: protocol/RobotRulesParser.java delegating to crawler-commons
  * SimpleRobotRulesParser; golden cases ported from
  * plugin/lib-http/src/test/.../TestRobotRulesParser.java):
  *
  *  - `#` comments stripped (including inline, "User-Agent: Agent1 #foo"),
  *    lines split on CR/LF, directives case-insensitive
  *  - consecutive `User-agent:` lines accumulate one group; a group ends
  *    when another `User-agent:` follows rule lines
  *  - the crawler's name list ("Agent2,Agent1") matches a group if any
  *    group agent token equals any name (case-insensitive); the FIRST
  *    matching named group in file order wins; the `*` group is the
  *    fallback — exactly why the reference test expects Agent1's rules
  *    (not a merge with Agent2's) for "Agent2, Agent1"
  *  - `Allow:`/`Disallow:` decided by longest-match (RFC 9309): the most
  *    specific matching pattern wins, Allow wins length ties; no match =
  *    allowed; empty Disallow value allows everything
  *  - patterns support the `*` wildcard and `$` end anchor (the Google
  *    extension crawler-commons implements); specificity = pattern length
  *  - `Crawl-delay:` seconds → ms for the matched group only; absent for
  *    the matched group → 0 (the engine's "no directive" value, the
  *    reference's Long.MIN_VALUE)
  */
object RobotsTxtParser {

  private final case class Group(agents: Seq[String], disallow: Seq[String],
      allow: Seq[String], crawlDelayMs: Long)

  def parse(host: String, content: String, robotNames: String): RobotsRule = {
    val names = robotNames.toLowerCase.split("[,\\s]+").filter(_.nonEmpty).toSeq

    // ---- tokenize into groups ------------------------------------------
    var groups = Vector.empty[Group]
    var sitemaps = Vector.empty[String]
    var agents = Vector.empty[String]
    var dis = Vector.empty[String]
    var alw = Vector.empty[String]
    var delay = 0L
    var inRules = false
    def closeGroup(): Unit = {
      if (agents.nonEmpty) groups :+= Group(agents, dis, alw, delay)
      agents = Vector.empty; dis = Vector.empty; alw = Vector.empty
      delay = 0L; inRules = false
    }
    for (raw <- content.split("[\r\n]+")) {
      val line = raw.indexOf('#') match {
        case -1 => raw.trim
        case i => raw.substring(0, i).trim
      }
      val colon = line.indexOf(':')
      if (colon > 0) {
        val key = line.substring(0, colon).trim.toLowerCase
        val value = line.substring(colon + 1).trim
        key match {
          case "user-agent" =>
            if (inRules) closeGroup()
            agents :+= value.toLowerCase
          case "disallow" => inRules = true; dis :+= value
          case "allow" => inRules = true; alw :+= value
          case "crawl-delay" =>
            inRules = true
            delay = try { (value.toDouble * 1000).toLong } catch { case _: Exception => delay }
          // sitemaps are file-global (RFC 9309 §2.3: independent of any
          // group), collected for every crawler regardless of matching
          case "sitemap" => if (value.nonEmpty) sitemaps :+= value
          // only Allow/Disallow/Crawl-delay occupy rule positions: a
          // Sitemap: (or unknown) line between consecutive User-agent lines
          // must NOT split what RFC 9309 treats as one multi-agent group
          case _ => ()
        }
      }
    }
    closeGroup()

    // ---- select the group for this crawler -----------------------------
    val named = groups.find(_.agents.exists(a => names.contains(a)))
    val chosen = named.orElse(groups.find(_.agents.contains("*")))
    chosen match {
      case Some(g) => RobotsRule(host,
        disallow = g.disallow.filter(_.nonEmpty),
        crawlDelayMs = g.crawlDelayMs,
        allow = g.allow.filter(_.nonEmpty),
        sitemaps = sitemaps)
      case None => RobotsRule(host, sitemaps = sitemaps) // no group: allow all
    }
  }
}

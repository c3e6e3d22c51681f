package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.site.{RobotsRule, RobotsTxtParser}

/** Golden cases ported from the reference's
  * plugin/lib-http/src/test/.../TestRobotRulesParser.java (agent-group
  * selection, disallow evaluation, crawl-delay extraction), plus RFC 9309
  * Allow/wildcard decisions the reference gets from crawler-commons. */
class RobotsSpec extends AnyFunSuite {

  private val CR = "\r"
  private val robots =
    "User-Agent: Agent1 #foo" + CR +
      "Disallow: /a" + CR +
      "Disallow: /b/a" + CR +
      "#Disallow: /c" + CR +
      "Crawl-delay: 10" + CR +
      "" + CR +
      "" + CR +
      "User-Agent: Agent2" + CR +
      "Disallow: /a/bloh" + CR +
      "Disallow: /c" + CR +
      "Disallow: /foo" + CR +
      "Crawl-delay: 20" + CR +
      "" + CR +
      "User-Agent: *" + CR +
      "Disallow: /foo/bar/" + CR

  private val paths = Seq(
    "http://example.com/a" -> false,
    "http://example.com/a/bloh/foo.html" -> false,
    "http://example.com/b" -> true,
    "http://example.com/c" -> true,
    "http://example.com/b/a/index.html" -> false,
    "http://example.com/foo/bar/baz.html" -> true)

  test("agent group selection + disallow (reference TestRobotRulesParser.testRobotsAgent)") {
    for (agents <- Seq("Agent1", "Agent2, Agent1")) {
      val r = RobotsTxtParser.parse("example.com", robots, agents)
      for ((url, want) <- paths)
        assert(r.isAllowed(url) == want, s"agents=$agents url=$url")
    }
    // Agent2 alone gets ITS group (file-order first match among its names)
    val r2 = RobotsTxtParser.parse("example.com", robots, "Agent2")
    assert(!r2.isAllowed("http://example.com/c"))
    assert(r2.isAllowed("http://example.com/a")) // /a only blocked for Agent1
    assert(!r2.isAllowed("http://example.com/foo/x"))
  }

  test("crawl delay per agent; unknown agent falls to the * group (testCrawlDelay)") {
    assert(RobotsTxtParser.parse("h", robots, "Agent1").crawlDelayMs == 10000)
    assert(RobotsTxtParser.parse("h", robots, "Agent2").crawlDelayMs == 20000)
    val unknown = RobotsTxtParser.parse("h", robots, "AgentABC")
    assert(unknown.crawlDelayMs == 0) // * group has no Crawl-delay
    assert(!unknown.isAllowed("http://example.com/foo/bar/baz.html")) // * rules apply
    assert(unknown.isAllowed("http://example.com/a"))
  }

  test("multiple consecutive User-agent lines share one group") {
    val txt = "User-agent: botA\nUser-agent: botB\nDisallow: /x\n\nUser-agent: *\nDisallow:"
    assert(!RobotsTxtParser.parse("h", txt, "botB").isAllowed("http://h/x/1"))
    assert(!RobotsTxtParser.parse("h", txt, "botA").isAllowed("http://h/x/1"))
    assert(RobotsTxtParser.parse("h", txt, "other").isAllowed("http://h/x/1"))
  }

  test("RFC 9309 longest-match with Allow and wildcards") {
    val txt =
      """User-agent: *
        |Disallow: /private/
        |Allow: /private/public/
        |Disallow: /*.gif$
        |Disallow: /tmp*
        |Allow: /tmp/keep
        |""".stripMargin
    val r = RobotsTxtParser.parse("h", txt, "anybot")
    assert(!r.isAllowed("http://h/private/secret.html"))
    assert(r.isAllowed("http://h/private/public/ok.html")) // longer Allow wins
    assert(!r.isAllowed("http://h/images/cat.gif")) // wildcard + anchor
    assert(r.isAllowed("http://h/images/cat.gift")) // $ anchor respected
    assert(!r.isAllowed("http://h/tmpfile"))
    assert(r.isAllowed("http://h/tmp/keep/x")) // longer Allow beats /tmp*
    assert(r.isAllowed("http://h/other"))
  }

  test("FetchEnv.fromRobotsTxt parses per-host payloads into the robots dimension") {
    val env = graft.site.FetchEnv.fromRobotsTxt(Map(
      "h1" -> "User-agent: graft\nDisallow: /x\nCrawl-delay: 2",
      "h2" -> ""), "graft")
    assert(!env.robotsFor("h1").isAllowed("http://h1/x/1"))
    assert(env.robotsFor("h1").crawlDelayMs == 2000)
    assert(env.robotsFor("h2").isAllowed("http://h2/q"))
    assert(env.robotsFor("h3").isAllowed("http://h3/q")) // absent host: allow
  }

  test("Sitemap/unknown lines do not split a multi-agent group (RFC 9309 group boundaries)") {
    // a Sitemap: line BETWEEN consecutive User-agent lines must not close
    // the group: Agent2 still shares Agent1's rules
    val txt =
      """User-agent: Agent1
        |Sitemap: http://h/sitemap.xml
        |User-agent: Agent2
        |Disallow: /private
        |""".stripMargin
    val r1 = RobotsTxtParser.parse("h", txt, "agent1")
    val r2 = RobotsTxtParser.parse("h", txt, "agent2")
    assert(!r1.isAllowed("http://h/private/x"), "Agent1 must own the group's rules")
    assert(!r2.isAllowed("http://h/private/x"), "Agent2 must share the same group")
    // but a User-agent AFTER rule lines still starts a fresh group
    val split =
      """User-agent: Agent1
        |Disallow: /a
        |User-agent: Agent2
        |Disallow: /b
        |""".stripMargin
    val s1 = RobotsTxtParser.parse("h", split, "agent1")
    val s2 = RobotsTxtParser.parse("h", split, "agent2")
    assert(!s1.isAllowed("http://h/a/x") && s1.isAllowed("http://h/b/x"))
    assert(!s2.isAllowed("http://h/b/x") && s2.isAllowed("http://h/a/x"))
  }

  test("Sitemap lines are file-global (RFC 9309 §2.3): collected for every crawler") {
    val txt =
      """Sitemap: http://h/sitemap-index.xml
        |User-agent: Agent1
        |Disallow: /private
        |Sitemap: http://h/sitemap-2.xml
        |User-agent: *
        |Disallow: /tmp
        |Sitemap:
        |""".stripMargin
    val r1 = RobotsTxtParser.parse("h", txt, "agent1")
    val r2 = RobotsTxtParser.parse("h", txt, "otherbot")
    val want = Seq("http://h/sitemap-index.xml", "http://h/sitemap-2.xml")
    assert(r1.sitemaps == want, "named group sees all sitemaps")
    assert(r2.sitemaps == want, "fallback group sees all sitemaps")
    // empty Sitemap value is dropped; a file with no groups still surfaces them
    val r3 = RobotsTxtParser.parse("h", "Sitemap: http://h/s.xml\n", "any")
    assert(r3.sitemaps == Seq("http://h/s.xml") && r3.isAllowed("http://h/x"))
  }

  test("empty/absent robots allow everything; empty Disallow value is a no-op") {
    assert(RobotsTxtParser.parse("h", "", "bot").isAllowed("http://h/anything"))
    val txt = "User-agent: *\nDisallow:\n"
    assert(RobotsTxtParser.parse("h", txt, "bot").isAllowed("http://h/anything"))
    // pre-Allow behavior preserved for structured rules
    assert(!RobotsRule("h", disallow = Seq("/a")).isAllowed("http://h/a/b"))
    assert(RobotsRule("h").isAllowed("http://h/a/b"))
  }
}

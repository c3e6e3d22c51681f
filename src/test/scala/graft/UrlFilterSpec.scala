package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.url._

/** B6 completion: automaton (DFA) filter, trie prefix/suffix matchers, RFC
  * validator — golden cases ported from the reference plugin sample files
  * (plugin/urlfilter-automaton sample rules + urls,
  * plugin/urlfilter-validator TestUrlValidator.java).
  */
class UrlFilterSpec extends AnyFunSuite {

  // ---- reference sample: WholeWebCrawling (automaton plugin)
  private val wholeWebRules = Seq(
    "-(file|ftp|mailto):.*",
    "-.*\\.(gif|GIF|jpg|JPG|ico|ICO|css|sit|eps|wmf|zip|ppt|mpg|xls|gz|rpm|tgz|mov|MOV|exe)",
    "-.*[?*!@=].*",
    "+.*")

  test("automaton filter: WholeWebCrawling sample cases") {
    val f = AutomatonUrlFilter.parse(wholeWebRules)
    val expect = Seq(
      false -> "file://home/jc/nutch/index.html",
      false -> "ftp://ftp.apache.org/nutch.html",
      false -> "mailto:someone@example.com",
      true -> "news://any.news.server/comp.lang.java",
      true -> "whois:/nutch.org",
      false -> "http://www.nutch.org/nutch.gif",
      false -> "http://www.nutch.org/nutch.eps",
      false -> "http://www.nutch.org/nutch?q=nutch",
      true -> "http://www.nutch.org/",
      true -> "http://www.nutch.org/abcd/foo/bar/foo/bar/foo/",
      true -> "http://www.nutch.org/abcd/foo/bar/xyz/foo/bar/foo/")
    expect.foreach { case (sign, url) =>
      assert(f.accepts(url) == sign, s"$url expected ${if (sign) "+" else "-"}")
    }
  }

  test("automaton filter: IntranetCrawling sample cases") {
    val f = AutomatonUrlFilter.parse(Seq(
      "-(file|ftp|mailto):.*",
      "-.*\\.(gif|GIF|jpg|JPG|ico|ICO|css|sit|eps|wmf|zip|ppt|mpg|xls|gz|rpm|tgz|mov|MOV|exe|png)",
      "-.*[?*!@=].*",
      "+http://([a-z0-9]*\\.)*MY.DOMAIN.NAME/.*",
      "-.*"))
    val expect = Seq(
      false -> "file://home/jc/nutch/index.html",
      false -> "ftp://ftp.apache.org/nutch.html",
      false -> "mailto:someone@example.com",
      false -> "news://any.news.server/comp.lang.java",
      false -> "whois:/nutch.org",
      true -> "http://MY.DOMAIN.NAME/",
      true -> "http://MY.DOMAIN.NAME/nutch",
      true -> "http://www.MY.DOMAIN.NAME/")
    expect.foreach { case (sign, url) =>
      assert(f.accepts(url) == sign, s"$url expected ${if (sign) "+" else "-"}")
    }
  }

  test("DFA matches java.util.regex full-match on the rule set (cross-check)") {
    val urls = Seq(
      "http://a.com/x.gif", "http://a.com/x.gift", "ftp://x/y", "mailto:a@b",
      "http://a.com/q?x=1", "http://a.com/!", "https://ok.example/path/p.html",
      "file://etc/passwd", "news://server/group", "http://a.com/x.MOV",
      "http://a.com/x.mov.html", "", "x", "http://a.com/épage")
    wholeWebRules.map(_.substring(1)).foreach { re =>
      val dfa = RegexDfa.compile(re)
      val jre = java.util.regex.Pattern.compile(re)
      urls.foreach { u =>
        assert(dfa.matches(u) == jre.matcher(u).matches(),
          s"DFA disagrees with java.util.regex on '$u' for '$re'")
      }
    }
  }

  test("DFA engine: operators, classes, escapes, anchors-free full match") {
    assert(RegexDfa.compile("abc").matches("abc"))
    assert(!RegexDfa.compile("abc").matches("xabc")) // full match, not find
    assert(!RegexDfa.compile("abc").matches("abcd"))
    assert(RegexDfa.compile("a+b?c*").matches("aab"))
    assert(RegexDfa.compile("a+b?c*").matches("accc"))
    assert(!RegexDfa.compile("a+b?c*").matches("bc"))
    assert(RegexDfa.compile("(ab|cd)+").matches("abcdab"))
    assert(RegexDfa.compile("[a-c0-2]+").matches("ab012c"))
    assert(!RegexDfa.compile("[a-c0-2]+").matches("ab3"))
    assert(RegexDfa.compile("[^/]+/[^/]+").matches("foo/bar"))
    assert(!RegexDfa.compile("[^/]+/[^/]+").matches("foo/bar/baz"))
    assert(RegexDfa.compile("a\\.b").matches("a.b"))
    assert(!RegexDfa.compile("a\\.b").matches("axb"))
    assert(RegexDfa.compile(".").matches("é")) // non-ASCII matches '.'
    assert(!RegexDfa.compile("[a-z]").matches("é"))
  }

  test("trie prefix/suffix matchers: O(len) equivalents of startsWith/endsWith scans") {
    val prefixes = Seq("http://a.example/", "http://b.example/docs/", "https://")
    val pm = TrieMatcher.forPrefixes(prefixes)
    assert(pm.matches("http://a.example/page.html"))
    assert(pm.matches("https://anything.example/"))
    assert(!pm.matches("http://c.example/"))
    assert(pm.shortestMatch("https://x") == "https://")
    val sm = TrieMatcher.forSuffixes(Seq(".gif", ".exe", ".tar.gz"))
    assert(sm.matches("http://x/y.gif"))
    assert(sm.matches("http://x/y.tar.gz"))
    assert(!sm.matches("http://x/y.gz2"))
    // filters built on them keep the reference contract
    assert(new PrefixUrlFilter(prefixes).filter("http://a.example/p") != null)
    assert(new PrefixUrlFilter(prefixes).filter("http://z.example/p") == null)
    assert(new SuffixUrlFilter(Seq(".gif")).filter("http://x/a.gif") == null)
    assert(new SuffixUrlFilter(Seq(".gif")).filter("http://x/a.html") != null)
  }

  test("trie matcher: equivalence with exists(startsWith) on random inputs") {
    val rnd = new scala.util.Random(3)
    val pats = (0 until 200).map(_ => "p" + rnd.alphanumeric.take(rnd.nextInt(6) + 1).mkString)
    val trie = TrieMatcher.forPrefixes(pats)
    (0 until 2000).foreach { _ =>
      val s = "p" + rnd.alphanumeric.take(rnd.nextInt(10)).mkString
      assert(trie.matches(s) == pats.exists(s.startsWith), s"mismatch on $s")
    }
  }

  // ---- reference TestUrlValidator.java golden cases
  test("url validator: invalid urls rejected") {
    val v = new UrlValidator
    assert(v.filter(null) == null)
    assert(v.filter("example.com/file[/].html") == null)
    assert(v.filter("http://www.example.com/space here.html") == null)
    assert(v.filter("/main.html") == null)
    assert(v.filter("www.example.com/main.html") == null)
    assert(v.filter("ftp:www.example.com/main.html") == null)
    assert(v.filter("http://999.000.456.32/nutch/trunk/README.txt") == null)
    assert(v.filter(" http://www.example.com/ma|in\\toc.html") == null)
    assert(v.filter("http://example.toolongtld/x") == null) // tld > 8
  }

  test("url validator: valid urls pass") {
    val v = new UrlValidator
    assert(v.filter("https://issues.apache.org/jira/NUTCH-1127") != null)
    assert(v.filter(
      "http://domain.tld/function.cgi?url=http://fonzi.com/&name=Fonzi&mood=happy") != null)
    assert(v.filter("http://www.example.com/main.html") != null)
    assert(v.filter("http://10.0.0.2/x/y.html") != null)
    assert(v.filter("http://example.museum/x") != null) // tld length 6 <= 8
  }

  test("filter chain: every filter must accept (URLFilters semantics)") {
    val chain = UrlFilterChain(Seq(
      new UrlValidator,
      AutomatonUrlFilter.parse(wholeWebRules),
      new SuffixUrlFilter(Seq(".css"))))
    assert(chain.filter("http://ok.example.org/page.html") != null)
    assert(chain.filter("http://ok.example.org/style.css") == null) // suffix deny
    assert(chain.filter("http://ok.example.org/x.gif") == null) // automaton deny
    assert(chain.filter("http://bad host/x") == null) // validator deny
  }
}

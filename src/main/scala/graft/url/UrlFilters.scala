package graft.url

import java.util.regex.Pattern

/** The URLFilter extension point (reference: api URLFilter.java + the
  * URLFilters chain): url back if accepted, null if rejected. All five
  * filter plugins (regex/prefix/suffix/domain/automaton) plus the validator
  * implement it and compose via [[UrlFilterChain]]. */
trait UrlFilter extends Serializable {
  def filter(url: String): String
}

/** Every filter must accept; the first null rejects (URLFilters.filter). */
final case class UrlFilterChain(filters: Seq[UrlFilter]) extends UrlFilter {
  def filter(url: String): String = {
    var u = url
    var i = 0
    while (i < filters.length && u != null) { u = filters(i).filter(u); i += 1 }
    u
  }
}

/** First-match-decides +/- regex URL filter (reference: plugin/urlfilter-regex
  * with the default whole-internet rules from
  * src/main/resources/regex-urlfilter.txt.template:26-40).
  *
  * Returns the url if accepted, null if rejected (same contract as the
  * reference's URLFilter.filter). A URL matching no rule is rejected.
  */
final class RegexUrlFilter(rules: Seq[(Boolean, Pattern)]) extends UrlFilter {
  def filter(url: String): String = {
    var i = 0
    while (i < rules.length) {
      val (accept, p) = rules(i)
      if (p.matcher(url).find()) return if (accept) url else null
      i += 1
    }
    null
  }
  def accepts(url: String): Boolean = filter(url) != null
}

object RegexUrlFilter {

  /** Parse "+regex" / "-regex" lines ('#' comments and blanks skipped). */
  def parse(lines: Seq[String]): RegexUrlFilter = {
    val rules = lines.iterator
      .map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .map { l =>
        val accept = l.charAt(0) match {
          case '+' => true
          case '-' => false
          case c => throw new IllegalArgumentException(s"Invalid first character '$c' in rule: $l")
        }
        accept -> Pattern.compile(l.substring(1))
      }
      .toSeq
    new RegexUrlFilter(rules)
  }

  /** The reference's default whole-internet rules
    * (regex-urlfilter.txt.template:26-40): skip file:/ftp:/mailto:, binary
    * suffixes, probable-query characters, 3x-repeated path segments; accept
    * the rest.
    */
  lazy val default: RegexUrlFilter = parse(Seq(
    "-^(file|ftp|mailto):",
    "-\\.(gif|GIF|jpg|JPG|png|PNG|ico|ICO|css|CSS|sit|SIT|eps|EPS|wmf|WMF|zip|ZIP|ppt|PPT|mpg|MPG|xls|XLS|gz|GZ|rpm|RPM|tgz|TGZ|mov|MOV|exe|EXE|jpeg|JPEG|bmp|BMP|js|JS)$",
    "-[?*!@=]",
    "-.*(/[^/]+)/[^/]+\\1/[^/]+\\1/",
    "+."))

  /** Accept-everything filter, for synthetic-site tests where the image
    * "pages" intentionally have no binary-suffix semantics. */
  lazy val acceptAll: RegexUrlFilter = parse(Seq("+."))
}

/** Prefix-based allow filter (reference: plugin/urlfilter-prefix, backed by
  * util/PrefixStringMatcher's trie): O(|url|) regardless of rule count. */
final class PrefixUrlFilter(prefixes: Seq[String]) extends UrlFilter {
  private val trie = TrieMatcher.forPrefixes(prefixes)
  def filter(url: String): String =
    if (trie.matches(url)) url else null
}

/** Suffix-based deny filter (reference: plugin/urlfilter-suffix deny-mode,
  * backed by util/SuffixStringMatcher's reversed trie): O(|url|). */
final class SuffixUrlFilter(suffixes: Seq[String]) extends UrlFilter {
  private val trie = TrieMatcher.forSuffixes(suffixes)
  def filter(url: String): String =
    if (trie.matches(url)) null else url
}

/** Domain allow-list filter (reference: plugin/urlfilter-domain): accepts a
  * url if its host, domain or suffix appears in the list. */
final class DomainUrlFilter(domains: Set[String]) extends UrlFilter {
  def filter(url: String): String = {
    val host = UrlUtil.getHost(url).toLowerCase
    val domain = UrlUtil.getDomainName(url).toLowerCase
    if (domains.contains(host) || domains.contains(domain)) url else null
  }
}

package graft.url

import java.util.regex.Pattern

/** First-match-decides +/- regex URL filter (reference: plugin/urlfilter-regex
  * with the default whole-internet rules from
  * src/main/resources/regex-urlfilter.txt.template:26-40).
  *
  * Returns the url if accepted, null if rejected (same contract as the
  * reference's URLFilter.filter). A URL matching no rule is rejected.
  */
final class RegexUrlFilter(rules: Seq[(Boolean, Pattern)]) extends Serializable {
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

/** Prefix-based allow filter (reference: plugin/urlfilter-prefix). */
final class PrefixUrlFilter(prefixes: Seq[String]) extends Serializable {
  def filter(url: String): String =
    if (prefixes.exists(url.startsWith)) url else null
}

/** Suffix-based deny filter (reference: plugin/urlfilter-suffix, deny-mode). */
final class SuffixUrlFilter(suffixes: Seq[String]) extends Serializable {
  def filter(url: String): String =
    if (suffixes.exists(url.endsWith)) null else url
}

/** Domain allow-list filter (reference: plugin/urlfilter-domain): accepts a
  * url if its host, domain or suffix appears in the list. */
final class DomainUrlFilter(domains: Set[String]) extends Serializable {
  def filter(url: String): String = {
    val host = UrlUtil.getHost(url).toLowerCase
    val domain = UrlUtil.getDomainName(url).toLowerCase
    if (domains.contains(host) || domains.contains(domain)) url else null
  }
}

package graft.url

import java.util.regex.Pattern

/** RFC2396 structural URL validator (reference:
  * plugin/urlfilter-validator/UrlValidator.java, itself derived from Apache
  * commons-validator): rejects malformed URLs — bad scheme, non-ASCII or
  * control bytes, malformed authority/IPv4, numeric or over-long TLD,
  * illegal path characters — before they enter the frontier.
  *
  * Same filter contract as every other filter: url if valid, null if not.
  *
  * One deliberate deviation: the reference file's path check counts the
  * token "plugin/urlfilter-regex/src" (UrlValidator.java:355), which is a
  * mangled artifact of the original commons-validator logic that counts
  * ".." path segments; the original semantics are implemented here.
  */
final class UrlValidator(maxTldLength: Int = 8) extends UrlFilter {

  import UrlValidator._

  def filter(url: String): String = if (isValid(url)) url else null

  def isValid(value: String): Boolean = {
    if (value == null) return false
    if (!LegalAscii.matcher(value).matches()) return false
    val m = UrlPattern.matcher(value)
    if (!m.matches()) return false
    isValidScheme(m.group(SchemeGroup)) &&
      isValidAuthority(m.group(AuthorityGroup)) &&
      isValidPath(m.group(PathGroup)) &&
      isValidQuery(m.group(QueryGroup))
  }

  private def isValidScheme(scheme: String): Boolean =
    scheme != null && SchemePattern.matcher(scheme).matches()

  private def isValidAuthority(authority: String): Boolean = {
    if (authority == null) return false
    val m = AuthorityPattern.matcher(authority)
    if (!m.matches()) return false

    var hostname = false
    val hostIp = m.group(1)
    val ipv4 = Ipv4Pattern.matcher(hostIp)
    val isIp = ipv4.matches()
    if (isIp) {
      var i = 1
      while (i <= 4) {
        val seg = ipv4.group(i)
        if (seg == null || seg.isEmpty) return false
        if (seg.toInt > 255) return false
        i += 1
      }
    } else {
      hostname = DomainPattern.matcher(hostIp).matches()
    }

    if (hostname) {
      // split host into atoms; TLD must be alphabetic-led, 2..maxTldLength
      val segments = hostIp.split("\\.", -1)
      if (segments.length < 2) return false
      val top = segments.last
      if (top.length < 2 || top.length > maxTldLength) return false
      if (!AlphaPattern.matcher(top.substring(0, 1)).matches()) return false
    }

    if (!hostname && !isIp) return false

    val port = m.group(2)
    if (port != null && !PortPattern.matcher(port).matches()) return false

    val extra = m.group(3)
    extra == null || extra.trim.isEmpty
  }

  private def isValidPath(path: String): Boolean = {
    if (path == null) return false
    if (!PathPattern.matcher(path).matches()) return false
    val slash2Count = countToken("//", path)
    val slashCount = countToken("/", path)
    val dot2Count = countToken("..", path) // original commons-validator rule
    dot2Count <= 0 || (slashCount - slash2Count - 1) > dot2Count
  }

  private def isValidQuery(query: String): Boolean =
    query == null || QueryPattern.matcher(query).matches()

  private def countToken(token: String, target: String): Int = {
    var idx = 0
    var count = 0
    while (idx != -1) {
      idx = target.indexOf(token, idx)
      if (idx > -1) { idx += token.length; count += 1 }
    }
    count
  }
}

object UrlValidator {
  private val AlphaChars = "a-zA-Z"
  private val SpecialChars = ";/@&=,.?:+$"
  private val ValidChars = "[^\\s" + SpecialChars + "]"
  private val Atom = ValidChars + "+"

  // groups: 2=scheme, 4=authority, 5=path, 7=query (RFC2396 BNF regex)
  private val UrlPattern =
    Pattern.compile("^(([^:/?#]+):)?(//([^/?#]*))?([^?#]*)(\\?([^#]*))?(#(.*))?")
  private val SchemeGroup = 2
  private val AuthorityGroup = 4
  private val PathGroup = 5
  private val QueryGroup = 7

  private val SchemePattern = Pattern.compile("^[" + AlphaChars + "]+")
  private val AuthorityPattern =
    Pattern.compile("^([" + AlphaChars + "\\d\\-\\.]*)(:\\d*)?(.*)?")
  private val Ipv4Pattern =
    Pattern.compile("^(\\d{1,3})[.](\\d{1,3})[.](\\d{1,3})[.](\\d{1,3})$")
  private val DomainPattern = Pattern.compile("^" + Atom + "(\\." + Atom + ")*$")
  private val PortPattern = Pattern.compile("^:(\\d{1,5})$")
  private val AlphaPattern = Pattern.compile("^[" + AlphaChars + "]")
  private val PathPattern = Pattern.compile("^(/[-\\w:@&?=+,.!/~*'%$_;\\(\\)]*)?$")
  private val QueryPattern = Pattern.compile("^(.*)$")
  private val LegalAscii = Pattern.compile("^[\\x21-\\x7E]+$")
}

package graft.url

import java.net.MalformedURLException
import java.util.regex.Pattern

/** Rule-for-rule re-expression of the reference's urlnormalizer-basic
  * (plugin/urlnormalizer-basic/src/java/.../BasicURLNormalizer.java:94-203):
  * lowercase protocol+host, strip default ports, drop the #ref, empty path ->
  * "/", then iteratively collapse "/xx/../", leading "/../", "/./" and "//"
  * in the file part — one first-occurrence substitution per pattern per
  * iteration, until the string stops shrinking, exactly like the reference's
  * Perl5 Util.substitute(..., 1) loop. Parses with the lock-free [[PUrl]]
  * (java.net.URL's handler table serializes under concurrency).
  */
object BasicUrlNormalizer {

  // "/xx/../" where xx has at least one char that is not '.' and no '/'
  private val relativePath = Pattern.compile("(/[^/]*[^/.]{1}[^/]*/\\.\\./)")
  private val leadingRelativePath = Pattern.compile("^(/\\.\\./)+")
  private val currentPath = Pattern.compile("(/\\./)")
  private val adjacentSlash = Pattern.compile("/{2,}")

  @throws[MalformedURLException]
  def normalize(urlString0: String): String = {
    if (urlString0 == "") return urlString0
    var urlString = urlString0.trim
    val url = PUrl.parse(urlString).getOrElse(throw new MalformedURLException(urlString0))
    val protocol = url.protocol
    var host = url.host
    var port = url.port
    var file = url.file

    var changed = false
    if (!urlString.startsWith(protocol)) changed = true // protocol was lowercased

    if (protocol == "http" || protocol == "https" || protocol == "ftp") {
      if (host != null) {
        val newHost = host.toLowerCase
        if (host != newHost) { host = newHost; changed = true }
      }
      if (port == url.defaultPort) { port = -1; changed = true }
      if (file == null || file == "") { file = "/"; changed = true }
      if (url.ref != null) changed = true
      val file2 = substituteUnnecessaryRelativePaths(file)
      if (file != file2) { changed = true; file = file2 }
    }

    if (changed) urlString = PUrl(protocol, host, port, file, null, null).reconstruct(file)
    urlString
  }

  def normalizeOrNull(url: String): String =
    try normalize(url) catch { case _: MalformedURLException => null }

  private def substituteUnnecessaryRelativePaths(file: String): String = {
    var work = file
    var oldLen = file.length
    var newLen = oldLen - 1
    while (oldLen != newLen) {
      oldLen = work.length
      work = relativePath.matcher(work).replaceFirst("/")
      work = leadingRelativePath.matcher(work).replaceFirst("/")
      work = currentPath.matcher(work).replaceFirst("/")
      work = adjacentSlash.matcher(work).replaceFirst("/")
      newLen = work.length
    }
    work
  }
}

/** Ordered regex substitutions over the whole URL string, mirroring the
  * reference's default regex-normalize rules
  * (src/main/resources/regex-normalize.xml.template:25-60). Applied in order,
  * each replacing ALL occurrences.
  */
object RegexUrlNormalizer {
  private val rules: Seq[(Pattern, String)] = Seq(
    // strip session ids (jsessionid, PHPSESSID, sid, ...)
    Pattern.compile("(?i)(;?\\b_?(l|j|bv_)?(sid|phpsessid|sessionid)=.*?)(\\?|&|#|$)") -> "$4",
    // remove interpage href anchors such as site.com#location
    Pattern.compile("#.*?(\\?|&|$)") -> "$1",
    // clean ?&var=value into ?var=value
    Pattern.compile("\\?&") -> "?",
    // multiple sequential ampersands into one
    Pattern.compile("&{2,}") -> "&",
    // trailing ?, & or .
    Pattern.compile("[?&.]$") -> "",
    // duplicate slashes, except after a colon (protocol)
    Pattern.compile("(?<!:)/{2,}") -> "/")

  def normalize(url: String): String =
    rules.foldLeft(url) { case (s, (p, sub)) => p.matcher(s).replaceAll(sub) }
}

/** Scoped normalizer chains (reference: net/URLNormalizers.java:81-97).
  * Every scope uses basic + regex by default, like the reference's
  * `urlnormalizer.order` = basic,regex.
  */
object UrlNormalizers {
  val ScopeDefault = "default"
  val ScopeInject = "inject"
  val ScopeGenerateHostCount = "generate_host_count"
  val ScopePartition = "partition"
  val ScopeFetcher = "fetcher"
  val ScopeOutlink = "outlink"
  val ScopeCrawldb = "crawldb"

  /** Normalize in scope; returns null if the url is malformed. */
  def normalize(url: String, scope: String = ScopeDefault): String = {
    val basic = BasicUrlNormalizer.normalizeOrNull(url)
    if (basic == null) null else RegexUrlNormalizer.normalize(basic)
  }
}

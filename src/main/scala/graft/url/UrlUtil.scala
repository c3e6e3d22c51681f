package graft.url

import java.net.{MalformedURLException, URL}
import java.nio.charset.StandardCharsets
import java.util.UUID

/** URL analysis utilities.
  *
  * Re-expresses the reference's util/TableUtil.java (reverseUrl:43-87,
  * unreverseUrl:89-117, computeKey:146-153) and util/URLUtil.java
  * (getDomainName:86-118, chooseRepr:246-300) as pure Scala functions.
  */
object UrlUtil {

  private val IpPattern = """(\d{1,3}\.){3}(\d{1,3})""".r.pattern

  /** Compact public-suffix set. The reference ships a full
    * domain-suffixes.xml; we embed the common subset (generic TLDs, ccTLDs
    * and frequent second-level registries) which is sufficient for the
    * engine's byDomain grouping; unknown suffixes degrade to the last label,
    * same as the reference's fallback loop.
    */
  private val domainSuffixes: Set[String] = {
    val generic = Set(
      "com", "org", "net", "edu", "gov", "mil", "int", "info", "biz", "name",
      "pro", "aero", "coop", "museum", "jobs", "mobi", "travel", "arpa",
      "example", "test", "invalid", "localhost", "local",
      "io", "dev", "app", "ai", "me", "tv", "cc", "ws", "xyz", "site",
      "online", "tech", "store", "blog", "cloud")
    val cc = Set(
      "us", "uk", "de", "fr", "it", "nl", "es", "jp", "cn", "au", "ca", "ch",
      "se", "no", "fi", "dk", "be", "at", "pl", "ru", "br", "in", "kr", "mx",
      "ar", "cl", "co", "cz", "gr", "hu", "ie", "il", "nz", "pt", "ro", "sg",
      "sk", "tr", "tw", "ua", "za", "hk", "id", "my", "ph", "th", "vn", "eu")
    val secondLevel = Set(
      "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk", "ltd.uk",
      "plc.uk", "sch.uk", "com.au", "net.au", "org.au", "edu.au", "gov.au",
      "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp", "com.cn", "net.cn",
      "org.cn", "gov.cn", "edu.cn", "com.br", "net.br", "org.br", "com.mx",
      "co.kr", "or.kr", "co.in", "net.in", "org.in", "co.nz", "net.nz",
      "org.nz", "com.sg", "com.tr", "com.tw", "com.hk", "co.za", "com.ar",
      "com.co", "com.my", "com.ph", "co.th", "com.vn", "co.il", "com.ua")
    generic ++ cc ++ secondLevel
  }

  def isDomainSuffix(s: String): Boolean = domainSuffixes.contains(s)

  def tryParse(url: String): Option[URL] =
    try Some(new URL(url))
    catch { case _: MalformedURLException => None }

  def getHost(url: String): String =
    tryParse(url).map(_.getHost).filter(_ != null).getOrElse(url)

  /** Domain name = hostname without subdomains; public-suffix aware
    * (reference: util/URLUtil.java:86-118).
    */
  def getDomainName(url: URL): String = {
    var host = url.getHost
    if (host.endsWith(".")) host = host.substring(0, host.length - 1)
    if (IpPattern.matcher(host).matches()) return host
    var candidate = host
    var index = 0
    while (index >= 0) {
      index = candidate.indexOf('.')
      val sub = candidate.substring(index + 1)
      if (isDomainSuffix(sub)) return candidate
      candidate = sub
    }
    candidate
  }

  def getDomainName(url: String): String =
    tryParse(url).map(getDomainName).getOrElse(url)

  /** Host-reversed storage key, e.g.
    * "http://bar.foo.com:8983/to/index.html?a=b" -> "com.foo.bar:http:8983/to/index.html?a=b"
    * (reference: util/TableUtil.java:43-87).
    */
  def reverseUrl(urlString: String): String = reverseUrl(new URL(urlString))

  def reverseUrl(url: URL): String = {
    val host = url.getHost
    val file = url.getFile
    val protocol = url.getProtocol
    val port = url.getPort
    val buf = new StringBuilder
    reverseAppendSplits(host, buf)
    buf.append(':').append(protocol)
    if (port != -1) buf.append(':').append(port)
    if (file.nonEmpty && file.charAt(0) != '/') buf.append('/')
    buf.append(file)
    buf.toString
  }

  def unreverseUrl(reversedUrl: String): String = {
    val buf = new StringBuilder(reversedUrl.length + 2)
    var pathBegin = reversedUrl.indexOf('/')
    if (pathBegin == -1) pathBegin = reversedUrl.length
    val sub = reversedUrl.substring(0, pathBegin)
    // {<reversed host>, <protocol>, <port>} — split preserving empty tokens
    val splits = sub.split(":", -1)
    buf.append(splits(1)) // protocol
    buf.append("://")
    reverseAppendSplits(splits(0), buf)
    if (splits.length == 3) buf.append(':').append(splits(2))
    buf.append(reversedUrl.substring(pathBegin))
    buf.toString
  }

  def reverseHost(hostName: String): String = {
    val buf = new StringBuilder
    reverseAppendSplits(hostName, buf)
    buf.toString
  }

  def unreverseHost(reversedHostName: String): String = reverseHost(reversedHostName)

  private def reverseAppendSplits(string: String, buf: StringBuilder): Unit = {
    // split dropping empty tokens, like commons-lang StringUtils.split
    val splits = string.split("\\.").filter(_.nonEmpty)
    if (splits.nonEmpty) {
      var i = splits.length - 1
      while (i > 0) { buf.append(splits(i)).append('.'); i -= 1 }
      buf.append(splits(0))
    } else buf.append(string)
  }

  /** Deterministic storage key = name-UUID (v3, md5) of the URL (reference:
    * util/TableUtil.java:146-153). Where the reference mints a *random* UUID
    * to version already-fetched rows, we derive a deterministic version key
    * instead (see [[versionKey]]) — randomness would break reproducibility
    * and the reference only needs uniqueness.
    */
  def uuid3(url: String): String =
    UUID.nameUUIDFromBytes(url.getBytes(StandardCharsets.UTF_8)).toString

  /** Deterministic replacement for the reference's random re-key of fetched
    * rows (GeneratorReducer.java:99-102): version rows are keyed by
    * uuid3(url + "#" + round), unique per (url, round).
    */
  def versionKey(url: String, round: Int): String = uuid3(url + "#v" + round)

  /** Representative-URL choice for redirects — the Yahoo! Slurp algorithm
    * (reference: util/URLUtil.java:246-300).
    */
  def chooseRepr(src: String, dst: String, temp: Boolean): String = {
    val (srcUrl, dstUrl) =
      try (new URL(src), new URL(dst))
      catch { case _: MalformedURLException => return dst }
    val srcDomain = getDomainName(srcUrl)
    val dstDomain = getDomainName(dstUrl)
    val srcHost = srcUrl.getHost
    val dstHost = dstUrl.getHost
    val srcFile = srcUrl.getFile
    val dstFile = dstUrl.getFile
    val srcRoot = srcFile == "/" || srcFile.isEmpty
    val dstRoot = dstFile == "/" || dstFile.isEmpty

    if (srcDomain != dstDomain) return dst
    if (!temp) {
      if (srcRoot) src else dst
    } else {
      if (srcRoot && !dstRoot) src
      else if (!srcRoot && dstRoot) dst
      else if (!srcRoot && !dstRoot && srcHost == dstHost) {
        val numSrcSegs = srcFile.split('/').length
        val numDstSegs = dstFile.split('/').length
        val srcBetter =
          srcFile.length < dstFile.length ||
            (srcFile.length == dstFile.length && numSrcSegs < numDstSegs)
        if (srcBetter) src else dst
      } else {
        if (srcHost.length <= dstHost.length) src else dst
      }
    }
  }
}

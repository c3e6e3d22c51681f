package graft.url

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

/** URL analysis utilities.
  *
  * Re-expresses the reference's util/TableUtil.java (reverseUrl:43-87,
  * unreverseUrl:89-117, computeKey:146-153) and util/URLUtil.java
  * (getDomainName:86-118, chooseRepr:246-300) as pure Scala functions over
  * the lock-free [[PUrl]] parser (no shared-state java.net.URL in the hot
  * path) with thread-local digests.
  */
object UrlUtil {

  private val IpPattern = """(\d{1,3}\.){3}(\d{1,3})""".r.pattern

  private val md5Local = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  def md5(bytes: Array[Byte]): Array[Byte] = {
    val md = md5Local.get()
    md.reset()
    md.digest(bytes)
  }

  /** Full public-suffix set: the reference's complete domain-suffixes.xml
    * (2,678 suffixes — IANA TLDs plus registered second/third-level
    * registries like `city.nagoya.jp`), shipped as a classpath resource,
    * UNIONED with the engine's compact built-in set (so synthetic test
    * TLDs like `.test` keep resolving even though IANA reserves them).
    * Unknown suffixes still degrade to the last label, same as the
    * reference's fallback loop (util/domain/DomainSuffixes.java:41-42).
    */
  private val fullSuffixList: Set[String] = {
    val in = getClass.getClassLoader.getResourceAsStream("graft/domain-suffixes.txt")
    if (in == null) Set.empty
    else try {
      scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#")).toSet
    } finally in.close()
  }

  private val compactSuffixes: Set[String] = {
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

  private val domainSuffixes: Set[String] = compactSuffixes ++ fullSuffixList

  def isDomainSuffix(s: String): Boolean = domainSuffixes.contains(s)

  /** The full embedded suffix set (read-only; the driver oracle intersects
    * it with a query's reachable tails to mirror the walk in SQL). */
  def domainSuffixSet: Set[String] = domainSuffixes

  def tryParse(url: String): Option[PUrl] = PUrl.parse(url)

  def getHost(url: String): String =
    PUrl.parse(url).map(_.host).filter(_ != null).getOrElse(url)

  /** Domain name = hostname without subdomains; public-suffix aware
    * (reference: util/URLUtil.java:86-118).
    */
  def getDomainName(url: PUrl): String = {
    var host = url.host
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
    PUrl.parse(url).map(getDomainName).getOrElse(url)

  /** The host's public suffix ("com", "co.uk", ...) by the reference's
    * suffix walk (util/URLUtil.java:148-166): check the whole host only
    * when it has no dots, otherwise start after the first label; null for
    * IP hosts and hosts with no known suffix. */
  def getDomainSuffix(url: PUrl): String = {
    val host = url.host
    if (host == null || IpPattern.matcher(host).matches()) return null
    var candidate = host
    var index = 0
    while (index >= 0) {
      index = candidate.indexOf('.')
      val sub = candidate.substring(index + 1)
      if (isDomainSuffix(sub)) return sub
      candidate = sub
    }
    null
  }

  def getDomainSuffix(url: String): String =
    PUrl.parse(url).map(getDomainSuffix).orNull

  /** Host-reversed storage key, e.g.
    * "http://bar.foo.com:8983/to/index.html?a=b" -> "com.foo.bar:http:8983/to/index.html?a=b"
    * (reference: util/TableUtil.java:43-87).
    */
  def reverseUrl(urlString: String): String =
    reverseUrl(PUrl.parse(urlString)
      .getOrElse(throw new java.net.MalformedURLException(urlString)))

  def reverseUrl(url: PUrl): String = {
    val host = url.host
    val file = url.file
    val protocol = url.protocol
    val port = url.port
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
    * util/TableUtil.java:146-153) — bit-identical to
    * java.util.UUID.nameUUIDFromBytes but via a thread-local digest. Where
    * the reference mints a *random* UUID to version already-fetched rows,
    * we derive a deterministic version key instead (see [[versionKey]]) —
    * randomness would break reproducibility and the reference only needs
    * uniqueness.
    */
  def uuid3(url: String): String = {
    val b = md5(url.getBytes(StandardCharsets.UTF_8))
    b(6) = ((b(6) & 0x0f) | 0x30).toByte // version 3
    b(8) = ((b(8) & 0x3f) | 0x80).toByte // IETF variant
    val sb = new java.lang.StringBuilder(36)
    var i = 0
    while (i < 16) {
      if (i == 4 || i == 6 || i == 8 || i == 10) sb.append('-')
      val v = b(i) & 0xff
      sb.append(Character.forDigit(v >>> 4, 16)).append(Character.forDigit(v & 0xf, 16))
      i += 1
    }
    sb.toString
  }

  /** Deterministic replacement for the reference's random re-key of fetched
    * rows (GeneratorReducer.java:99-102): version rows are keyed by
    * uuid3(url + "#v" + round), unique per (url, round).
    */
  def versionKey(url: String, round: Int): String = uuid3(url + "#v" + round)

  /** Representative-URL choice for redirects — the Yahoo! Slurp algorithm
    * (reference: util/URLUtil.java:246-300).
    */
  def chooseRepr(src: String, dst: String, temp: Boolean): String = {
    val srcUrl = PUrl.parse(src).getOrElse(return dst)
    val dstUrl = PUrl.parse(dst).getOrElse(return dst)
    val srcDomain = getDomainName(srcUrl)
    val dstDomain = getDomainName(dstUrl)
    val srcHost = srcUrl.host
    val dstHost = dstUrl.host
    val srcFile = srcUrl.file
    val dstFile = dstUrl.file
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

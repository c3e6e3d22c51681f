package graft.url

/** Lock-free URL parser for the crawl hot path.
  *
  * `java.net.URL`'s constructor consults a synchronized static Hashtable of
  * protocol handlers on every instantiation; with URL parsing happening
  * several times per row, that lock collapses scaling past ~8 threads
  * (observed: local[32] 2x slower than local[8]). This parser reproduces the
  * java.net.URL accessor semantics the engine relies on (getProtocol
  * lowercased, getHost, getPort=-1 when absent, getFile=path+?query,
  * getRef, default ports) with zero shared state.
  */
final case class PUrl(protocol: String, host: String, port: Int,
    path: String, query: String, ref: String) {

  /** path + query, like java.net.URL.getFile. */
  def file: String = if (query != null) path + "?" + query else path

  def defaultPort: Int = protocol match {
    case "http" => 80
    case "https" => 443
    case "ftp" => 21
    case _ => -1
  }

  /** protocol://host[:port]file — the reconstruction BasicUrlNormalizer
    * needs (java.net.URL(protocol, host, port, file).toString shape). */
  def reconstruct(file0: String): String = {
    val sb = new java.lang.StringBuilder(protocol.length + host.length + file0.length + 10)
    sb.append(protocol).append("://").append(host)
    if (port != -1) sb.append(':').append(port)
    sb.append(file0)
    sb.toString
  }

  override def toString: String = {
    val base = reconstruct(file)
    if (ref != null) base + "#" + ref else base
  }
}

object PUrl {

  /** Parse; None when there is no valid scheme (java.net.URL's
    * MalformedURLException cases for our purposes). */
  def parse(s0: String): Option[PUrl] = {
    val s = s0
    val colon = s.indexOf(':')
    if (colon <= 0) return None
    var i = 0
    while (i < colon) {
      val c = s.charAt(i)
      val okFirst = (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')
      val ok = okFirst || (i > 0 && ((c >= '0' && c <= '9') || c == '+' || c == '-' || c == '.'))
      if (!ok) return None
      i += 1
    }
    val protocol = s.substring(0, colon).toLowerCase
    var rest = s.substring(colon + 1)

    var ref: String = null
    val hashIdx = rest.indexOf('#')
    if (hashIdx >= 0) { ref = rest.substring(hashIdx + 1); rest = rest.substring(0, hashIdx) }

    var host = ""
    var port = -1
    var pathAndQuery = rest
    if (rest.startsWith("//")) {
      val afterSlashes = rest.substring(2)
      var end = afterSlashes.length
      var j = 0
      var found = false
      while (j < afterSlashes.length && !found) {
        val c = afterSlashes.charAt(j)
        if (c == '/' || c == '?') { end = j; found = true }
        j += 1
      }
      var authority = afterSlashes.substring(0, end)
      pathAndQuery = afterSlashes.substring(end)
      val at = authority.lastIndexOf('@')
      if (at >= 0) authority = authority.substring(at + 1) // drop userinfo
      val pc = authority.lastIndexOf(':')
      if (pc >= 0) {
        host = authority.substring(0, pc)
        val ps = authority.substring(pc + 1)
        if (ps.nonEmpty) {
          port = try ps.toInt catch { case _: NumberFormatException => return None }
          if (port < 0) return None
        }
      } else host = authority
    }
    var path = pathAndQuery
    var query: String = null
    val q = pathAndQuery.indexOf('?')
    if (q >= 0) { path = pathAndQuery.substring(0, q); query = pathAndQuery.substring(q + 1) }
    Some(PUrl(protocol, host, port, path, query, ref))
  }
}

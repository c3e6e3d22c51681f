package graft.site

import java.net.URL
import java.util.concurrent.{Callable, Executors, TimeUnit, TimeoutException}

import graft.model.ProtocolStatusCodes

/** Raw wire response from a transport (code, headers, body bytes). */
case class RawResponse(
    code: Int,
    headers: Map[String, String],
    body: Array[Byte]) {
  def header(name: String): Option[String] =
    headers.get(name).orElse(headers.get(name.toLowerCase))
}

/** The socket layer abstracted: a blocking GET. The sandbox has no egress,
  * so production would plug a real client here; tests plug in-process maps
  * and slow/broken servers. HttpProtocol owns timeout enforcement and all
  * HttpBase semantics either way. */
trait HttpTransport extends Serializable {
  def get(url: String): RawResponse
}

/** http.* knobs (reference lib-http HttpBase.java:121-128). */
case class HttpConfig(
    timeoutMs: Long = 10000, // http.timeout
    contentLimit: Int = 64 * 1024) // http.content.limit; <0 = unlimited

/** Outcome of one fetch: protocol status code, (possibly truncated)
  * content, response headers, resolved redirect target if any. */
case class HttpResult(
    code: Int,
    content: Array[Byte],
    headers: Map[String, String],
    location: String)

/** The reference's HTTP protocol semantics (lib-http
  * HttpBase.getProtocolOutput:167-243) over any transport:
  *
  *  - status mapping: 200 SUCCESS; 300/301/305 MOVED; 302/303/307
  *    TEMP_MOVED; 304 NOTMODIFIED; 400/410 GONE; 401 ACCESS_DENIED;
  *    404 NOTFOUND; anything else (and any thrown error) EXCEPTION
  *  - redirect Location resolved against the request URL (new URL(u, loc))
  *  - http.timeout: a transport stuck past the budget maps to EXCEPTION
  *    (the retry path, like a socket timeout)
  *  - http.content.limit: body truncated to the limit; the original
  *    Content-Length header is preserved so the parse stage's truncation
  *    check (SURVEY.md B21) sees declared > actual and skips the page
  *  - Content-Encoding gzip/x-gzip: best-effort decompression up to the
  *    limit (GZIPUtils.unzipBestEffort semantics: a truncated stream
  *    yields the bytes that did decompress, not an error)
  */
final class HttpProtocol(transport: HttpTransport,
    httpConf: HttpConfig = HttpConfig()) extends Serializable {

  def fetch(url: String): HttpResult =
    try {
      val resp = withTimeout(url)
      val code = resp.code
      val raw = if (resp.body == null) Array.emptyByteArray else resp.body
      val unzipped = resp.header("Content-Encoding") match {
        case Some(enc) if enc.equalsIgnoreCase("gzip") || enc.equalsIgnoreCase("x-gzip") =>
          HttpProtocol.unzipBestEffort(raw, httpConf.contentLimit)
        case _ => raw
      }
      val content =
        if (httpConf.contentLimit >= 0 && unzipped.length > httpConf.contentLimit)
          java.util.Arrays.copyOf(unzipped, httpConf.contentLimit)
        else unzipped

      if (code == 200) {
        HttpResult(ProtocolStatusCodes.SUCCESS, content, resp.headers, null)
      } else if (code >= 300 && code < 400) {
        val loc = resp.header("Location").getOrElse("")
        val resolved = new URL(new URL(url), loc).toString
        val status = code match {
          case 300 | 301 | 305 => ProtocolStatusCodes.MOVED
          case 302 | 303 | 307 => ProtocolStatusCodes.TEMP_MOVED
          case 304 => ProtocolStatusCodes.NOTMODIFIED
          case _ => ProtocolStatusCodes.MOVED
        }
        HttpResult(status, content, resp.headers, resolved)
      } else code match {
        case 400 | 410 => HttpResult(ProtocolStatusCodes.GONE, content, resp.headers, null)
        case 401 => HttpResult(ProtocolStatusCodes.ACCESS_DENIED, content, resp.headers, null)
        case 404 => HttpResult(ProtocolStatusCodes.NOTFOUND, content, resp.headers, null)
        case _ => HttpResult(ProtocolStatusCodes.EXCEPTION, content, resp.headers, null)
      }
    } catch {
      case _: Throwable =>
        HttpResult(ProtocolStatusCodes.EXCEPTION, Array.emptyByteArray, Map.empty, null)
    }

  private def withTimeout(url: String): RawResponse = {
    val fut = HttpProtocol.pool.submit(new Callable[RawResponse] {
      override def call(): RawResponse = transport.get(url)
    })
    try fut.get(httpConf.timeoutMs, TimeUnit.MILLISECONDS)
    catch {
      case e: TimeoutException => fut.cancel(true); throw e
    }
  }
}

object HttpProtocol {

  private lazy val pool = Executors.newCachedThreadPool(r => {
    val t = new Thread(r, "graft-http")
    t.setDaemon(true)
    t
  })

  /** Decompress gzip bytes, returning whatever decompressed cleanly (up to
    * `limit` when >= 0) — truncated/corrupt tails yield partial content,
    * not an error (reference util/GZIPUtils.unzipBestEffort). */
  def unzipBestEffort(compressed: Array[Byte], limit: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(math.min(
      if (limit >= 0) limit else 1 << 16, 1 << 20))
    try {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(compressed))
      val buf = new Array[Byte](8192)
      var done = false
      while (!done) {
        val n = in.read(buf)
        if (n < 0) done = true
        else {
          val room = if (limit >= 0) limit - out.size() else n
          out.write(buf, 0, math.min(n, math.max(room, 0)))
          if (limit >= 0 && out.size() >= limit) done = true
        }
      }
    } catch { case _: Exception => /* best effort: keep what we got */ }
    out.toByteArray
  }
}

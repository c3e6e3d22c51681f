package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.model.ProtocolStatusCodes
import graft.site.{HttpConfig, HttpProtocol, HttpTransport, RawResponse}

/** Protocol-contract validation (SURVEY.md A11): the HttpBase semantics —
  * status mapping, http.timeout, http.content.limit truncation feeding the
  * B21 parse-side truncation check, gzip best-effort — exercised against
  * in-process transports (the sandbox has no egress; the transport is the
  * only fake part, the protocol layer is the real implementation).
  */
class HttpProtocolSpec extends AnyFunSuite {

  private def gzip(bytes: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(bos)
    g.write(bytes); g.close()
    bos.toByteArray
  }

  private def transport(f: String => RawResponse): HttpTransport =
    new HttpTransport { override def get(url: String): RawResponse = f(url) }

  test("status mapping matches HttpBase.getProtocolOutput") {
    val cases = Seq(
      200 -> ProtocolStatusCodes.SUCCESS,
      301 -> ProtocolStatusCodes.MOVED,
      305 -> ProtocolStatusCodes.MOVED,
      302 -> ProtocolStatusCodes.TEMP_MOVED,
      303 -> ProtocolStatusCodes.TEMP_MOVED,
      307 -> ProtocolStatusCodes.TEMP_MOVED,
      304 -> ProtocolStatusCodes.NOTMODIFIED,
      400 -> ProtocolStatusCodes.GONE,
      410 -> ProtocolStatusCodes.GONE,
      401 -> ProtocolStatusCodes.ACCESS_DENIED,
      404 -> ProtocolStatusCodes.NOTFOUND,
      500 -> ProtocolStatusCodes.EXCEPTION,
      503 -> ProtocolStatusCodes.EXCEPTION)
    cases.foreach { case (httpCode, expected) =>
      val p = new HttpProtocol(transport(_ =>
        RawResponse(httpCode, Map("Location" -> "/next"), Array[Byte](1))))
      assert(p.fetch("http://h.test/a").code == expected, s"http $httpCode")
    }
  }

  test("redirect Location resolves against the request url") {
    val p = new HttpProtocol(transport(_ =>
      RawResponse(302, Map("location" -> "../other/p.html"), Array.emptyByteArray)))
    val r = p.fetch("http://h.test/a/b/c.html")
    assert(r.code == ProtocolStatusCodes.TEMP_MOVED)
    assert(r.location == "http://h.test/a/other/p.html")
  }

  test("http.content.limit truncates body but keeps Content-Length (B21 path)") {
    val body = Array.fill[Byte](100000)(7)
    val p = new HttpProtocol(
      transport(_ => RawResponse(200, Map("Content-Length" -> "100000"), body)),
      HttpConfig(contentLimit = 1024))
    val r = p.fetch("http://h.test/big")
    assert(r.content.length == 1024)
    assert(r.headers("Content-Length") == "100000")
    // the parse stage's truncation check skips this page
    import graft.model.{CrawlStatus, Marks, WebPage}
    val page = WebPage(url = "http://h.test/big", status = CrawlStatus.FETCHED,
      content = r.content, headers = r.headers,
      markers = Map(Marks.FETCH -> "b-1"))
    val parsed = graft.jobs.ParserJob.parsePage(page,
      graft.crawl.CrawlConfig(), graft.site.MapOutlinks(Map.empty),
      graft.url.RegexUrlFilter.acceptAll, "b-1")
    assert(parsed.parseStatus == null, "truncated content must not parse")
  }

  test("gzip content decompresses; truncated gzip is best-effort") {
    val payload = ("caption " * 100).getBytes("UTF-8")
    val p = new HttpProtocol(transport(_ =>
      RawResponse(200, Map("Content-Encoding" -> "gzip"), gzip(payload))))
    assert(p.fetch("http://h.test/z").content.sameElements(payload))
    // truncated stream: partial content, no exception (incompressible
    // payload so 40 compressed bytes cannot carry the whole body)
    val rnd = new scala.util.Random(1)
    val noise = Array.fill[Byte](800)(rnd.nextInt().toByte)
    val cut = gzip(noise).take(40)
    val p2 = new HttpProtocol(transport(_ =>
      RawResponse(200, Map("Content-Encoding" -> "x-gzip"), cut)))
    val r2 = p2.fetch("http://h.test/z")
    assert(r2.code == ProtocolStatusCodes.SUCCESS)
    assert(r2.content.length < noise.length)
    // limit applies to the EXPANDED size
    val p3 = new HttpProtocol(transport(_ =>
      RawResponse(200, Map("Content-Encoding" -> "gzip"), gzip(payload))),
      HttpConfig(contentLimit = 64))
    assert(p3.fetch("http://h.test/z").content.length == 64)
  }

  test("http.timeout: a stuck transport maps to EXCEPTION (retry path)") {
    val p = new HttpProtocol(transport { _ =>
      Thread.sleep(2000)
      RawResponse(200, Map.empty, Array[Byte](1))
    }, HttpConfig(timeoutMs = 100))
    val t0 = System.nanoTime()
    val r = p.fetch("http://slow.test/x")
    val elapsedMs = (System.nanoTime() - t0) / 1e6
    assert(r.code == ProtocolStatusCodes.EXCEPTION)
    assert(elapsedMs < 1500, s"timeout not enforced: ${elapsedMs}ms")
  }

  test("transport exceptions map to EXCEPTION") {
    val p = new HttpProtocol(transport(_ => throw new java.io.IOException("conn refused")))
    assert(p.fetch("http://down.test/x").code == ProtocolStatusCodes.EXCEPTION)
  }
}

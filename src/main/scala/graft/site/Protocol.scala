package graft.site

import graft.images.ImageSynth
import graft.model.{ProtocolStatusCodes, WebPage}

/** Per-URL protocol plug point (reference: protocol/Protocol.java and the
  * protocol-http plugin, SURVEY.md A11/H). The engine's bulk fetch path is
  * a *join* against the payload table — the scalable form — but the trait
  * preserves the reference's extension surface so a real HTTP
  * implementation can plug into a per-row fetch (e.g. for small frontier
  * tails or recrawl probes) without touching the jobs.
  */
trait Protocol extends Serializable {
  /** (protocolStatusCode, payload) — payload None for non-success. */
  def fetch(url: String, page: WebPage): (Int, Option[ImageSynth.ImageRow])
}

/** The synthetic universe as a Protocol: deterministic payloads, no
  * network (the sandbox has no egress; a production HttpProtocol would
  * implement the same trait with http.timeout / content-limit semantics
  * from lib-http HttpBase.java:121-124).
  */
case class SyntheticProtocol(nPages: Long, nHosts: Int, w: Int = 24, h: Int = 24)
    extends Protocol {
  override def fetch(url: String, page: WebPage): (Int, Option[ImageSynth.ImageRow]) =
    ImageSynth.pageIndexOf(url) match {
      case Some(i) if i >= 0 && i < nPages && url == ImageSynth.urlOf(i, nHosts) =>
        (ProtocolStatusCodes.SUCCESS, Some(ImageSynth.rowForUrl(url, w, h)))
      case _ => (ProtocolStatusCodes.NOTFOUND, None)
    }
}

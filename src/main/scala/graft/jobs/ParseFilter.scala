package graft.jobs

import graft.crawl.CrawlConfig
import graft.model.WebPage

/** The parse-result hook (reference parse/ParseFilter.java, chained by
  * ParseFilters and invoked from ParseUtil.process after the core parse;
  * the parse-metatags / microformats plugins implement it): every
  * configured filter may mutate the parsed page — add metadata, rewrite
  * text/title, veto or add outlinks — with zero ParserJob edits.
  * Implementations must be pure row transforms: they run inside executor
  * closures and inside the refsim oracle.
  */
trait ParseFilter extends Serializable {

  /** `original`: the page as fetched (pre-parse, payload intact when
    * stored); `parsed`: the parse output so far. Returns the (possibly
    * mutated) parse output. */
  def filter(original: WebPage, parsed: WebPage): WebPage
}

object ParseFilters {

  /** Config-driven ordered chain (`parseFilterClass`, comma list — the
    * ScoringFilter/FetchSchedule resolution pattern). Known names bind the
    * in-tree impls; any other entry resolves as a fully-qualified class
    * name with a no-arg constructor — the reference's plugin.includes
    * shape, so user plugins load without any engine edit. */
  def apply(conf: CrawlConfig): ParseFilter = {
    val names = conf.parseFilterClass.split(",").map(_.trim).filter(_.nonEmpty)
    val filters: Seq[ParseFilter] = names.toSeq.map {
      case "metatags" => MetaTagsParseFilter()
      case fqcn => Class.forName(fqcn).getDeclaredConstructor()
        .newInstance().asInstanceOf[ParseFilter]
    }
    if (filters.isEmpty) Identity
    else if (filters.length == 1) filters.head
    else Chain(filters)
  }

  /** No configured filters: parse output passes through untouched. */
  object Identity extends ParseFilter {
    override def filter(original: WebPage, parsed: WebPage): WebPage = parsed
  }

  /** Ordered composition — the reference's ParseFilters loop
    * (parse/ParseFilters.java: every active plugin runs in order, each
    * seeing its predecessor's output). */
  case class Chain(filters: Seq[ParseFilter]) extends ParseFilter {
    override def filter(original: WebPage, parsed: WebPage): WebPage =
      filters.foldLeft(parsed)((p, f) => f.filter(original, p))
  }
}

/** parse-metatags analogue: the reference plugin lifts every HTML meta tag
  * into page metadata under a `metatag.` prefix
  * (plugin/parse-metatags/.../MetaTagsParser.java). The image-payload
  * parse has no DOM; its structured side-channel is the caption text — so
  * every standalone `key=value` token of the parsed text lifts into
  * metadata the same way (lowercased key, first `=` splits). */
case class MetaTagsParseFilter(prefix: String = "metatag.") extends ParseFilter {
  override def filter(original: WebPage, parsed: WebPage): WebPage = {
    val text = if (parsed.text == null) "" else parsed.text
    val kvs = text.split("\\s+").iterator.collect {
      case tok if tok.count(_ == '=') == 1 &&
          !tok.startsWith("=") && !tok.endsWith("=") =>
        val Array(k, v) = tok.split("=", 2)
        (prefix + k.toLowerCase) -> v
    }.toMap
    if (kvs.isEmpty) parsed else parsed.copy(metadata = parsed.metadata ++ kvs)
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.crawl.CrawlConfig
import graft.images.ImageSynth
import graft.jobs.{MetaTagsParseFilter, ParseFilter, ParseFilters, ParserJob}
import graft.model.{CrawlStatus, Marks, WebPage}

/** A user plugin loaded purely by configuration (FQCN with a no-arg
  * constructor) — proves the extension point needs zero engine edits. */
class UpperTitleParseFilter extends ParseFilter {
  override def filter(original: WebPage, parsed: WebPage): WebPage =
    parsed.copy(title = if (parsed.title == null) null else parsed.title.toUpperCase)
}

/** The parse-result hook chain (reference parse/ParseFilter.java run by
  * ParseFilters inside ParseUtil.process). */
class ParseFilterSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def fetchedPage(caption: String = null): WebPage = {
    val url = ImageSynth.urlOf(7, 3)
    val row = ImageSynth.rowForUrl(url, 16, 16)
    WebPage(url = url, status = CrawlStatus.FETCHED, content = row.bytes,
      metadata = Map("caption" -> Option(caption).getOrElse(row.caption)),
      markers = Map(Marks.FETCH -> "b-1"))
  }

  private def parse(p: WebPage, conf: CrawlConfig): WebPage =
    ParserJob.parsePage(p, conf, graft.site.MapOutlinks(Map.empty),
      graft.url.RegexUrlFilter.acceptAll, "b-1", ParseFilters(conf))

  test("metatags filter lifts caption key=value tokens into metadata") {
    val p = fetchedPage("scene=beach mood=calm just a nice day x== =bad trail=")
    val parsed = parse(p, CrawlConfig(parseFilterClass = "metatags"))
    assert(parsed.metadata("metatag.scene") == "beach")
    assert(parsed.metadata("metatag.mood") == "calm")
    // malformed tokens (double =, leading/trailing =) never lift
    assert(!parsed.metadata.keys.exists(k =>
      k.startsWith("metatag.") && !Set("metatag.scene", "metatag.mood")(k)))
    // the core parse output is untouched
    assert(parsed.metadata.contains(ParserJob.PhashMeta))
    assert(parsed.parseStatus.majorCode == graft.jobs.ParseStatusCodes.Success)
  }

  test("a custom filter resolves by FQCN and mutates parse output " +
      "with zero ParserJob edits") {
    val conf = CrawlConfig(parseFilterClass = "graft.UpperTitleParseFilter")
    val parsed = parse(fetchedPage(), conf)
    assert(parsed.title == parsed.url.toUpperCase)
    // unfiltered parse keeps the original title
    assert(parse(fetchedPage(), CrawlConfig()).title ==
      ImageSynth.urlOf(7, 3))
  }

  test("chain runs in order, each filter seeing its predecessor's output") {
    val conf = CrawlConfig(
      parseFilterClass = "metatags, graft.UpperTitleParseFilter")
    val pf = ParseFilters(conf)
    assert(pf.isInstanceOf[ParseFilters.Chain])
    val parsed = parse(fetchedPage("k=v fine day"), conf)
    assert(parsed.metadata("metatag.k") == "v")
    assert(parsed.title == parsed.url.toUpperCase)
  }

  test("no configured filters = identity; unknown class fails loudly") {
    assert(ParseFilters(CrawlConfig()) eq ParseFilters.Identity)
    intercept[ClassNotFoundException](
      ParseFilters(CrawlConfig(parseFilterClass = "no.such.Filter")))
  }

  test("the Dataset-level parse stage applies the configured chain") {
    import spark.implicits._
    val conf = CrawlConfig(parseFilterClass = "metatags", storingContent = true)
    val pages = Seq(fetchedPage("season=winter cold morning")).toDS()
    val out = ParserJob.parse(spark, pages, conf,
      graft.site.MapOutlinks(Map.empty), "b-1").collect()
    assert(out.length == 1)
    assert(out.head.metadata("metatag.season") == "winter")
  }

  test("MetaTagsParseFilter lowercases keys and splits on the first =") {
    val f = MetaTagsParseFilter()
    val in = WebPage(url = "http://a/1", text = "KEY=a=never Mixed=Val")
    val out = f.filter(in, in)
    // tokens with two '=' are skipped; single '=' splits once
    assert(out.metadata.get("metatag.key").isEmpty)
    assert(out.metadata("metatag.mixed") == "Val")
  }
}

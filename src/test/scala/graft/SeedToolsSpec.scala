package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.jobs.SeedTools

/** Bulk-seed conversion (reference tools/DmozParser.java): RDF dump ->
  * seed urls with adult-section / topic / md5-subset admission. */
class SeedToolsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private val rdf =
    """<?xml version="1.0" encoding="UTF-8"?>
      |<RDF xmlns:r="http://www.w3.org/TR/RDF/" xmlns:d="http://purl.org/dc/elements/1.0/">
      |<Topic r:id="Top/Computers/Software">
      |  <link r:resource="http://sw.example.com/"/>
      |</Topic>
      |<ExternalPage about="http://sw.example.com/">
      |  <d:Title>Software &amp; Tools</d:Title>
      |  <d:Description>A fine &lt;catalog&gt; of software.</d:Description>
      |</ExternalPage>
      |<ExternalPage about="http://sw2.example.com/">
      |  <d:Title>Second</d:Title>
      |</ExternalPage>
      |<Topic r:id="Top/Adult/Something">
      |</Topic>
      |<ExternalPage about="http://adult.example.com/">
      |  <d:Title>Filtered by default</d:Title>
      |</ExternalPage>
      |<Topic r:id="Top/Science/Physics">
      |</Topic>
      |<ExternalPage about="http://phys.example.com/">
      |  <d:Description>Physics pages</d:Description>
      |</ExternalPage>
      |</RDF>""".stripMargin

  test("ExternalPage urls parse with topic context, title/desc snippets, " +
      "entity decoding") {
    val seeds = SeedTools.parseContent(rdf).toSeq
    assert(seeds.map(_.url) == Seq("http://sw.example.com/",
      "http://sw2.example.com/", "http://phys.example.com/"))
    val sw = seeds.head
    assert(sw.topic == "Top/Computers/Software")
    assert(sw.title == "Software & Tools")
    assert(sw.description == "A fine <catalog> of software.")
    // missing children yield empty strings, not crashes
    assert(seeds(1).description == "" && seeds(2).title == "")
  }

  test("Top/Adult sections filter unless includeAdult (DmozParser.java:142)") {
    assert(!SeedTools.parseContent(rdf).exists(_.url.contains("adult")))
    assert(SeedTools.parseContent(rdf, includeAdult = true)
      .exists(_.url == "http://adult.example.com/"))
  }

  test("topic regex restricts sections (the -topic flag)") {
    val sci = SeedTools.parseContent(rdf,
      topicPattern = Some("Top/Science.*")).toSeq
    assert(sci.map(_.url) == Seq("http://phys.example.com/"))
  }

  test("md5-subset sampler is deterministic and partitions the url space") {
    val urls = (0 until 500).map(i => s"http://h$i.example.com/")
    val denom = 5
    def sampled(skew: Int) =
      urls.filter(u => SeedTools.subsetHash(u, skew) % denom == 0)
    // deterministic: same skew -> same subset; near-uniform: ~1/denom kept
    assert(sampled(0) == sampled(0))
    assert(math.abs(sampled(0).size - urls.size / denom) < urls.size / 10)
    // a different skew draws a different (but equally deterministic) subset
    assert(sampled(0) != sampled(12345))
    // the RDF path applies it per ExternalPage url
    val all = SeedTools.parseContent(rdf).size
    val some = (0 to 5).map(k =>
      SeedTools.parseContent(rdf, subsetDenom = 2, skew = k).size)
    assert(some.forall(_ <= all) && some.exists(_ < all))
  }

  test("distributed parse over dump files + inject handoff") {
    import org.apache.spark.sql.functions.col
    val dir = SparkTestBase.tmpDir("dmoz")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "content.rdf.u8"), rdf)
    val seeds = SeedTools.parseDmozRdf(spark, dir)
    assert(seeds.count() == 3)
    assert(seeds.filter(col("topic").startsWith("Top/Science")).count() == 1)
    // url-per-line handoff: the shape InjectorJob.injectFromFile consumes
    val out = SparkTestBase.tmpDir("dmoz-seeds")
    seeds.map(_.url)(org.apache.spark.sql.Encoders.STRING)
      .write.mode("overwrite").text(out)
    val injected = graft.jobs.InjectorJob.injectFromFile(spark, out,
      graft.crawl.CrawlConfig(), 0L)
    assert(injected.count() == 3)
  }

  // ------------------------------------------------------------- sitemaps

  private val urlset =
    """<?xml version="1.0" encoding="UTF-8"?>
      |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
      |  <url><loc>http://a.example.com/page?x=1&amp;y=2</loc>
      |       <lastmod>2024-03-05</lastmod><priority>0.8</priority></url>
      |  <url><loc>http://a.example.com/plain</loc></url>
      |  <url><loc>http://a.example.com/stamped</loc>
      |       <lastmod>2024-03-05T12:30:00+02:00</lastmod></url>
      |  <url><loc>ftp://not.http/scheme</loc></url>
      |</urlset>""".stripMargin

  test("sitemap urlset: loc/lastmod/priority, entities, scheme validation") {
    import graft.jobs.Sitemaps
    val es = Sitemaps.parseContent(urlset.getBytes("UTF-8"))
    assert(es.map(_.url) == Seq(
      "http://a.example.com/page?x=1&y=2",
      "http://a.example.com/plain",
      "http://a.example.com/stamped"))
    assert(es(0).priority == 0.8 && es(1).priority == 0.5)
    assert(es(0).lastmod ==
      java.time.LocalDate.parse("2024-03-05").atStartOfDay(java.time.ZoneOffset.UTC)
        .toInstant.toEpochMilli)
    assert(es(2).lastmod ==
      java.time.OffsetDateTime.parse("2024-03-05T12:30:00+02:00").toInstant.toEpochMilli)
    assert(es.forall(!_.isIndex))
  }

  test("sitemapindex + plain-text + gzip forms") {
    import graft.jobs.Sitemaps
    val index =
      """<sitemapindex><sitemap><loc>http://a.example.com/s1.xml.gz</loc></sitemap>
        |<sitemap><loc>http://a.example.com/s2.xml</loc></sitemap></sitemapindex>""".stripMargin
    val idx = Sitemaps.parseContent(index.getBytes("UTF-8"))
    assert(idx.map(_.url) == Seq("http://a.example.com/s1.xml.gz",
      "http://a.example.com/s2.xml"))
    assert(idx.forall(_.isIndex))
    val txt = "http://t.example.com/1\nnot a url\nhttps://t.example.com/2\n"
    assert(Sitemaps.parseContent(txt.getBytes("UTF-8")).map(_.url) ==
      Seq("http://t.example.com/1", "https://t.example.com/2"))
    val out = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(out)
    gz.write(urlset.getBytes("UTF-8")); gz.finish(); gz.close()
    assert(Sitemaps.parseContent(out.toByteArray).map(_.url).head ==
      "http://a.example.com/page?x=1&y=2")
  }

  test("distributed sitemap parse + robots Sitemap: line handoff") {
    import graft.jobs.Sitemaps
    // robots.txt advertises the sitemap (the reference collects these
    // lines; this op is their consumer)
    val rules = graft.site.RobotsTxtParser.parse("bot",
      "User-agent: *\nDisallow:\nSitemap: http://a.example.com/sitemap.xml\n", "bot")
    assert(rules.sitemaps == Seq("http://a.example.com/sitemap.xml"))
    val dir = SparkTestBase.tmpDir("sitemaps")
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "sitemap.xml"),
      urlset.getBytes("UTF-8"))
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "more.txt"),
      "http://t.example.com/1\n".getBytes("UTF-8"))
    val es = Sitemaps.parseSitemaps(spark, dir).collect()
    assert(es.length == 4)
    // inject handoff: non-index entries become frontier seeds — and the
    // inject-scope URL filter chain still applies (the reference's default
    // `-.*[?*!@=].*` rule drops the query-string url)
    import spark.implicits._
    val conf = graft.crawl.CrawlConfig(numPartitions = 2)
    val pages = graft.jobs.InjectorJob.inject(spark,
      es.filter(!_.isIndex).map(_.url).toSeq.toDS(), conf, 1234L).collect()
    assert(pages.map(_.url).sorted.toSeq == Seq("http://a.example.com/plain",
      "http://a.example.com/stamped", "http://t.example.com/1"))
    assert(pages.forall(_.status == graft.model.CrawlStatus.UNFETCHED))
  }
}

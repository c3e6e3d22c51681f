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
}

package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.crawl.{Crawl, CrawlConfig}
import graft.images.ImageSynth
import graft.model.WebPage
import graft.site.MapOutlinks
import graft.url.Signatures

/** Adaptive re-fetch schedule through the full loop: unchanged content
  * (same signature) grows fetchInterval by INC_RATE per refetch
  * (AdaptiveFetchSchedule semantics E7). Also covers TextProfileSignature.
  */
class AdaptiveCrawlSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("adaptive schedule grows the interval for unmodified pages across rounds") {
    val u = "http://adapt.test/p.html"
    val conf = CrawlConfig(fetchIntervalDefault = 1000, useAdaptiveSchedule = true,
      adaptiveSyncDelta = false, numPartitions = 2, fetcherServerDelayMs = 10,
      fetchIntervalMax = 10000000)
    val dir = SparkTestBase.tmpDir("adaptive")
    val images = Seq(ImageSynth.rowForUrl(u, 16, 16)).toDF()
    // roundStepMs large enough that the grown interval stays due
    val crawl = new Crawl(spark, dir, images, conf, MapOutlinks(Map.empty),
      roundStepMs = 10000L * 1000L)
    crawl.inject(Seq(u))

    def latest: WebPage = crawl.table.currentView(spark).drop("snapshot_id")
      .as[WebPage].collect().filter(_.url == u).maxBy(_.fetchTime)

    crawl.generate(1); crawl.fetchAndParse(1); crawl.update(1)
    val r1 = latest
    // first fetch: no prevSignature -> state UNKNOWN -> interval unchanged
    assert(r1.fetchInterval == 1000)
    assert(r1.signature != null)

    crawl.generate(2); crawl.fetchAndParse(2); crawl.update(2)
    val r2 = latest
    // second fetch: same content -> prevSig == sig -> NOTMODIFIED -> *1.2
    assert(r2.fetchInterval == 1200, s"interval should grow 20%, got ${r2.fetchInterval}")
    assert(Signatures.compare(r2.signature, r2.prevSignature) == 0)

    crawl.generate(3); crawl.fetchAndParse(3); crawl.update(3)
    assert(latest.fetchInterval == 1440) // 1200 * 1.2
  }

  test("TextProfileSignature: quantized token profile, deterministic, change-sensitive") {
    def page(text: String) = WebPage(url = "http://t/x", text = text)
    val a = Signatures.textProfileSignature(page("the cat sat on the mat the cat"))
    val a2 = Signatures.textProfileSignature(page("the cat sat on the mat the cat"))
    assert(a.sameElements(a2))
    // token order doesn't matter once profiled (frequencies quantize equal)
    val b = Signatures.textProfileSignature(page("cat the sat on mat the the cat"))
    assert(a.sameElements(b))
    // different content -> different signature
    val c = Signatures.textProfileSignature(page("completely different words entirely"))
    assert(!a.sameElements(c))
    // empty text falls back to md5(content/baseUrl)
    val d = Signatures.textProfileSignature(WebPage(url = "http://t/x", baseUrl = "http://t/x"))
    assert(d.length == 16)
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.crawl.CrawlConfig
import graft.jobs.GeneratorJob
import graft.model.{CrawlStatus, Marks, WebPage}
import graft.score.OpicScoring
import graft.schedule.FetchSchedule
import graft.url.RegexUrlFilter

/** Port of the reference's TestGenerator semantics (FIXTURES.md §8):
  * topN picks the highest scores; per-host and per-domain caps bound the
  * fetchlist; filtering drops non-matching urls; url dedup across versions.
  */
class GeneratorSemanticsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def frontier(pages: Seq[WebPage]) = spark.createDataset(pages)

  private def generated(pages: Seq[WebPage], conf: CrawlConfig): Seq[WebPage] =
    GeneratorJob.generate(spark, frontier(pages), conf, curTime = 10L,
      batchId = "b1", round = 1).collect().toSeq

  test("topN selects the highest-score urls (TestGenerator.testGenerateHighest)") {
    // 100 urls scored 1..100; topN=2 on a single partition -> /100, /99
    val pages = (1 to 100).map(i =>
      WebPage(url = f"http://aaa.com/$i%03d", key = s"k$i", score = i.toFloat,
        status = CrawlStatus.UNFETCHED, fetchTime = 0L))
    val conf = CrawlConfig(topN = 2, numPartitions = 1, fetchIntervalDefault = 0)
    val out = generated(pages, conf)
    assert(out.map(_.url).toSet == Set("http://aaa.com/100", "http://aaa.com/099"))
    assert(out.forall(_.markers.get(Marks.GENERATE).contains("b1")))
    assert(out.forall(_.batchId == "b1"))
  }

  test("per-host cap (generate.max.count, mode host): hosts with 1/2/3 urls, cap 2") {
    val pages = for {
      (host, n) <- Seq("h1.com" -> 1, "h2.com" -> 2, "h3.com" -> 3)
      i <- 1 to n
    } yield WebPage(url = s"http://$host/p$i.html", key = s"$host-$i",
      score = 1f, status = CrawlStatus.UNFETCHED, fetchTime = 0L)
    val conf = CrawlConfig(generateMaxCount = 2, generateCountMode = "host",
      numPartitions = 1, fetchIntervalDefault = 0)
    val out = generated(pages, conf)
    val byHost = out.groupBy(p => graft.url.UrlUtil.getHost(p.url)).view.mapValues(_.size).toMap
    assert(byHost == Map("h1.com" -> 1, "h2.com" -> 2, "h3.com" -> 2))
  }

  test("per-domain cap groups sub-hosts (TestGenerator domain mode)") {
    val pages = Seq("a.dom.com", "b.dom.com", "c.dom.com", "other.net").zipWithIndex.map {
      case (host, i) => WebPage(url = s"http://$host/x.html", key = s"k$i",
        score = 1f, status = CrawlStatus.UNFETCHED, fetchTime = 0L)
    }
    val conf = CrawlConfig(generateMaxCount = 2, generateCountMode = "domain",
      numPartitions = 1, fetchIntervalDefault = 0)
    val out = generated(pages, conf)
    val byDomain = out.groupBy(p => graft.url.UrlUtil.getDomainName(p.url)).view.mapValues(_.size).toMap
    assert(byDomain == Map("dom.com" -> 2, "other.net" -> 1))
  }

  test("url filtering drops non-matching urls (TestGenerator.testFilter)") {
    val pages = Seq(
      WebPage(url = "http://ok.com/a.html", key = "k1", score = 1f, fetchTime = 0L),
      WebPage(url = "http://ok.com/img.PNG", key = "k2", score = 1f, fetchTime = 0L),
      WebPage(url = "http://ok.com/q?x=1", key = "k3", score = 1f, fetchTime = 0L))
    val conf = CrawlConfig(numPartitions = 1, fetchIntervalDefault = 0)
    val out = generated(pages, conf)
    assert(out.map(_.url) == Seq("http://ok.com/a.html"))
  }

  test("multi-version rows dedup to one generated entry per url") {
    // two versions of the same url: the higher-score (latest) wins; one entry
    val pages = Seq(
      WebPage(url = "http://v.com/p.html", key = "k-old", score = 1f, fetchTime = 0L,
        markers = Map(Marks.FETCH -> "batch-0")),
      WebPage(url = "http://v.com/p.html", key = "k-new", score = 5f, fetchTime = 5L,
        markers = Map(Marks.FETCH -> "batch-0")))
    val conf = CrawlConfig(numPartitions = 1, fetchIntervalDefault = 0)
    val out = generated(pages, conf)
    assert(out.size == 1)
    assert(out.head.score == 5f)
    // fetched rows re-key into a fresh version row
    assert(out.head.key == graft.url.UrlUtil.versionKey("http://v.com/p.html", 1))
  }

  test("shouldFetch gates by fetchTime (TestGenerator not-yet-due)") {
    val pages = Seq(
      WebPage(url = "http://d.com/due.html", key = "k1", score = 1f, fetchTime = 5L),
      WebPage(url = "http://d.com/later.html", key = "k2", score = 1f, fetchTime = 100L))
    val conf = CrawlConfig(numPartitions = 1, fetchIntervalDefault = 0)
    val out = generated(pages, conf) // curTime = 10
    assert(out.map(_.url) == Seq("http://d.com/due.html"))
  }
}

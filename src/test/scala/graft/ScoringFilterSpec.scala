package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.crawl.{Crawl, CrawlConfig}
import graft.images.ImageSynth
import graft.jobs.DbUpdateJob
import graft.model.{Marks, WebPage}
import graft.score.{LinkAnalysisScoring, OpicScoring, ScoringFilter, TldScoring}
import graft.site.MapOutlinks

/** The ScoringFilter extension point (reference scoring/ScoringFilter.java
  * with plugins scoring-opic / scoring-link / tld): config selects the
  * implementation; no Injector/Generator/DbUpdate call-site edits. The OPIC
  * golden-score tests (OpicScoringSpec, CrawlE2ESpec) pin the default
  * behavior unchanged.
  */
class ScoringFilterSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("factory resolves by config and rejects unknown names") {
    assert(ScoringFilter(CrawlConfig()).isInstanceOf[OpicScoring])
    assert(ScoringFilter(CrawlConfig(scoringFilterClass = "link"))
      .isInstanceOf[LinkAnalysisScoring])
    assert(ScoringFilter(CrawlConfig(scoringFilterClass = "tld")).isInstanceOf[TldScoring])
    intercept[IllegalArgumentException] {
      ScoringFilter(CrawlConfig(scoringFilterClass = "nope"))
    }
  }

  test("link scoring: new pages start at 0, no cash distribution (LinkAnalysisScoringFilter)") {
    val conf = CrawlConfig(scoringFilterClass = "link")
    // reduce of a bare inlink message creates the page with initialScore 0
    // and updateScore must NOT add the inlinked values
    val msgs = Iterator(DbUpdateJob.UpdateMsg("http://t.test/x", isPage = false,
      score = 5f, srcUrl = "http://t.test/src", anchor = "", fetchTime = 1L, distance = 0))
    val page = DbUpdateJob.reduceUrl("http://t.test/x", msgs, conf, 1000L, 1).get
    assert(page.score == 0.0f, s"link-analysis new page must start at 0, got ${page.score}")

    // distribute is a no-op: outlink data flows through unscored, cash kept
    val link = ScoringFilter(conf)
    val src = WebPage(url = "http://t.test/src", score = 3f, cash = 3f)
    val data = Seq(graft.score.ScoreDatum(0f, "http://t.test/x", "", 1L, 0))
    val (scored, after) = link.distributeScoreToOutlinks(src.url, src, data, 1)
    assert(scored.head.score == 0f && after.cash == 3f)
    // generate priority multiplies the stored score into the init sort
    assert(link.generatorSortValue(src, 2f) == 6f)
    assert(link.indexerScore(src, 1f) == 3f)
  }

  test("config swaps the scoring policy end-to-end without call-site edits") {
    val index = "http://sf.test/index.html"
    val child = "http://sf.test/a.html"
    val edges = Map(index -> Seq(child -> "to a"))
    val images = Seq(index, child).map(u => ImageSynth.rowForUrl(u, 16, 16)).toDF()

    def scoreOfChild(conf: CrawlConfig, tag: String): Float = {
      val dir = SparkTestBase.tmpDir(s"scoring-$tag")
      val crawl = new Crawl(spark, dir, images, conf, MapOutlinks(edges))
      crawl.run(1, Seq(index), collectStats = false)
      crawl.table.currentView(spark).drop("snapshot_id").as[WebPage]
        .collect().find(_.url == child).get.score
    }

    val base = CrawlConfig(fetchIntervalDefault = 0, numPartitions = 2,
      fetcherServerDelayMs = 10)
    // OPIC: discovered child = initialScore 1.0 + inlinked cash 1.0 = 2.0
    assert(scoreOfChild(base, "opic") == 2.0f)
    // link analysis: discovered child stays at its offline score, 0
    assert(scoreOfChild(base.copy(scoringFilterClass = "link"), "link") == 0.0f)
  }

  test("comma-list config builds an ordered chain (ScoringFilters loop)") {
    import graft.score.ScoringFilterChain
    val chain = ScoringFilter(CrawlConfig(scoringFilterClass = "opic,tld"))
    assert(chain.isInstanceOf[ScoringFilterChain])
    val p = WebPage(url = "http://example.org/x.html", score = 4f, cash = 4f)
    // opic ignores initSort and returns page.score; tld passes it through
    assert(chain.generatorSortValue(p, 99f) == 4f)
    // indexer: opic dampens (sqrt(4)*1 = 2), then a boosting tld member
    // multiplies — with default (empty) boosts the chain equals opic alone
    assert(chain.indexerScore(p, 1f) == 2.0f)
    // distribute folds through every member: opic zeroes the cash, tld no-op
    val data = Seq(graft.score.ScoreDatum(0f, "http://example.org/y.html", "", 1L, 0))
    val (scored, after) = chain.distributeScoreToOutlinks(p.url, p, data, 1)
    assert(after.cash == 0f && scored.head.score == 4f)
  }

  test("indexerBoostCol is the columnar twin of indexerScore (opic/link/tld/chain)") {
    import org.apache.spark.sql.functions.{col, lit}
    val pages = Seq(
      WebPage(url = "http://example.org/a.html", score = 4f),
      WebPage(url = "http://news.co.uk/b", score = 0.25f),
      WebPage(url = "http://example.com/c", score = 9f))
    val df = pages.map(p => (p.url, p.score)).toDF("url", "score")
    val conf = CrawlConfig(linkAnalysisNormalizedScore = 0.5f,
      tldBoosts = Map("org" -> 2.0f, "co.uk" -> 3.0f))
    for (name <- Seq("opic", "link", "tld", "opic,tld")) {
      val f = ScoringFilter(conf.copy(scoringFilterClass = name))
      val got = df.select(col("url"),
          f.indexerBoostCol(spark, col("url"), col("score"), lit(1.0))
            .cast("double").as("b"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      pages.foreach { p =>
        val want = f.indexerScore(p, 1.0f).toDouble
        assert(math.abs(got(p.url) - want) < 1e-6,
          s"$name ${p.url}: columnar ${got(p.url)} vs row $want")
      }
    }
  }

  test("ConfManager maps the scoring/indexer props") {
    val conf = graft.api.ConfManager.fromProps(Map(
      "scoring.filter.class" -> "link",
      "link.analyze.normalize.score" -> "0.25",
      "indexer.score.power" -> "1.0",
      "indexer.tld.boost.org" -> "2.5",
      "indexer.tld.boost.co.uk" -> "0.5"))
    assert(conf.scoringFilterClass == "link")
    assert(conf.linkAnalysisNormalizedScore == 0.25f)
    assert(conf.indexerScorePower == 1.0f)
    assert(conf.tldBoosts == Map("org" -> 2.5f, "co.uk" -> 0.5f))
  }

  test("tld scoring boosts the indexer score by the page's TLD (TLDScoringFilter)") {
    val tld = TldScoring(CrawlConfig(), boosts = Map("org" -> 2.0f))
    val pOrg = WebPage(url = "http://example.org/a.html", score = 4f)
    val pCom = WebPage(url = "http://example.com/a.html", score = 4f)
    assert(tld.indexerScore(pOrg, 1.5f) == 3.0f)
    assert(tld.indexerScore(pCom, 1.5f) == 1.5f) // unlisted tld: boost 1.0
    // crawl-neutral: sort value is the init sort untouched
    assert(tld.generatorSortValue(pOrg, 7f) == 7f)
  }
}

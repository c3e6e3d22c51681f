package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.crawl.{Crawl, CrawlConfig}
import graft.images.ImageSynth
import graft.jobs.FetcherJobKeys
import graft.model.{Marks, WebPage}
import graft.refsim.{RefSim, SynthUniverse}
import graft.site._

/** The strongest guarantee, under fire: Spark and the refsim oracle must
  * agree bit-for-bit on seen-set, crawl order and frontier state when the
  * environment throws everything at once — robots disallow rules, a
  * Crawl-Delay override, redirects, transient errors, per-host caps and
  * a topN limit.
  */
class HostileParitySpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("parity holds with robots + redirects + errors + caps combined") {
    val nPages = 240L
    val nHosts = 6
    val conf = CrawlConfig(
      fetchIntervalDefault = 0,
      numPartitions = 4,
      fetcherServerDelayMs = 50,
      topN = 15,
      generateMaxCount = 8,
      generateCountMode = "host")
    val source = PhashOutlinks(nPages, nHosts, degree = 3)
    val env = FetchEnv(
      robots = Map(
        "host-1.example" -> RobotsRule("host-1.example", disallow = Seq("/page-1")),
        "host-2.example" -> RobotsRule("host-2.example", crawlDelayMs = 400),
        "host-3.example" -> RobotsRule("host-3.example", crawlDelayMs = 60000)),
      redirects = Map(
        ImageSynth.urlOf(4, nHosts) -> (ImageSynth.urlOf(10, nHosts), false),
        ImageSynth.urlOf(5, nHosts) -> (ImageSynth.urlOf(11, nHosts), true)),
      transientErrors = Set(ImageSynth.urlOf(2, nHosts)))
    val seeds = (0 until 6).map(i => ImageSynth.urlOf(i, nHosts))
    val depth = 3

    val sim = new RefSim(conf, SynthUniverse(nPages, nHosts), source, env)
    sim.run(depth, seeds)

    val dir = SparkTestBase.tmpDir("hostile-parity")
    val images = ImageSynth.imagesDf(spark, nPages, nHosts, partitions = 4)
    val crawl = new Crawl(spark, dir, images, conf, source, env)
    crawl.run(depth, seeds, collectStats = false)

    val sparkRows = crawl.table.currentView(spark).drop("snapshot_id").as[WebPage]
      .collect().toSeq

    assert(sparkRows.map(_.url).toSet == sim.seenUrls, "URL-seen sets diverged")

    (1 to depth).foreach { r =>
      val sid = crawl.table.snapshotFor(r, "fetch").get
      val fetchRows = crawl.table.readSnapshot(spark, sid).drop("snapshot_id").as[WebPage]
        .collect().toSeq
      val sparkOrder = fetchRows
        .sortBy(p => (p.srcPartition, p.metadata(FetcherJobKeys.FetchSeq).toInt))
        .map(_.url)
      assert(sparkOrder == sim.orderOf(r), s"crawl order diverged in round $r")
    }

    def norm(p: WebPage) = (p.url, p.status, math.round(p.score * 10000f), p.fetchTime,
      p.retriesSinceFetch, p.reprUrl, p.markers.get(Marks.DISTANCE), p.outlinks.keySet,
      p.inlinks.keySet)
    val simState = sim.state.values.map(p => p.key -> norm(p)).toMap
    val sparkState = sparkRows.map(p => p.key -> norm(p)).toMap
    assert(sparkState.keySet == simState.keySet)
    val diffs = sparkState.collect { case (k, v) if simState(k) != v => (k, v, simState(k)) }
    assert(diffs.isEmpty, s"state diverged: ${diffs.take(3)}")

    // and the hostile bits actually fired
    import graft.model.CrawlStatus
    val byUrl = sparkRows.groupBy(_.url).map { case (u, vs) => u -> vs.maxBy(_.fetchTime) }
    assert(byUrl.exists { case (u, p) => u.contains("host-3") && p.status == CrawlStatus.GONE },
      "over-max Crawl-Delay host should be GONE")
    assert(byUrl(ImageSynth.urlOf(4, nHosts)).status == CrawlStatus.REDIR_PERM)
    assert(byUrl(ImageSynth.urlOf(2, nHosts)).retriesSinceFetch >= 1)
  }

  test("parity holds with fetcher.threads.per.queue > 1 (min-delay gate)") {
    val nPages = 120L
    val nHosts = 4
    val conf = CrawlConfig(
      fetchIntervalDefault = 0,
      numPartitions = 4,
      fetcherServerDelayMs = 500,
      fetcherServerMinDelayMs = 20,
      fetcherThreadsPerQueue = 2,
      topN = 12)
    val source = PhashOutlinks(nPages, nHosts, degree = 3)
    val env = FetchEnv(robots = Map(
      "host-1.example" -> RobotsRule("host-1.example", crawlDelayMs = 700)))
    val seeds = (0 until 4).map(i => ImageSynth.urlOf(i, nHosts))
    val depth = 2

    val sim = new RefSim(conf, SynthUniverse(nPages, nHosts), source, env)
    sim.run(depth, seeds)

    val dir = SparkTestBase.tmpDir("tpq-parity")
    val images = ImageSynth.imagesDf(spark, nPages, nHosts, partitions = 4)
    val crawl = new Crawl(spark, dir, images, conf, source, env)
    crawl.run(depth, seeds, collectStats = false)

    val sparkRows = crawl.table.currentView(spark).drop("snapshot_id").as[WebPage]
      .collect().toSeq
    assert(sparkRows.map(_.url).toSet == sim.seenUrls, "URL-seen sets diverged")
    (1 to depth).foreach { r =>
      val sid = crawl.table.snapshotFor(r, "fetch").get
      val order = crawl.table.readSnapshot(spark, sid).drop("snapshot_id").as[WebPage]
        .collect().toSeq
        .sortBy(p => (p.srcPartition, p.metadata(FetcherJobKeys.FetchSeq).toInt))
        .map(_.url)
      assert(order == sim.orderOf(r), s"crawl order diverged in round $r")
    }
    // multi-slot gate actually applied: per-host gaps honor min.delay (20ms)
    // rather than the 500ms server delay or the 700ms robots delay (round 2
    // — round 1 fetches only the 4 seeds, one per host)
    val sid = crawl.table.snapshotFor(2, "fetch").get
    val round1 = crawl.table.readSnapshot(spark, sid).drop("snapshot_id").as[WebPage]
      .collect().toSeq.filter(_.markers.contains(Marks.FETCH))
    val gaps = round1.groupBy(p => (p.srcPartition, graft.url.UrlUtil.getHost(p.url)))
      .values.filter(_.size >= 2)
      .flatMap { vs =>
        val ts = vs.map(_.fetchTime).sorted
        ts.zip(ts.drop(1)).map { case (a, b) => b - a }
      }
    assert(gaps.nonEmpty && gaps.forall(_ >= 20), "min-delay gate violated")
    assert(gaps.exists(_ < 500), "threads-per-queue should beat the single-slot delay")
  }
}

package graft.refsim

import scala.collection.mutable

import graft.crawl.CrawlConfig
import graft.images.ImageSynth
import graft.jobs._
import graft.model._
import graft.score.ScoringFilter
import graft.schedule.FetchSchedule
import graft.site.{FetchEnv, OutlinkSource}
import graft.url.{RegexUrlFilter, UrlNormalizers, UrlPartitioner, UrlUtil}

/** Which URLs exist in the fetch universe. */
trait Universe extends Serializable {
  def contains(url: String): Boolean
  def imageFor(url: String): Option[ImageSynth.ImageRow] =
    if (contains(url)) Some(ImageSynth.rowForUrl(url, 24, 24)) else None
}

/** The synthetic striped-host site of nPages pages. */
case class SynthUniverse(nPages: Long, nHosts: Int) extends Universe {
  override def contains(url: String): Boolean =
    ImageSynth.pageIndexOf(url).exists(i => i >= 0 && i < nPages &&
      url == ImageSynth.urlOf(i, nHosts))
}

/** An explicit page set (golden fixtures). */
case class SetUniverse(urls: Set[String]) extends Universe {
  override def contains(url: String): Boolean = urls.contains(url)
}

/** Single-threaded oracle of the crawl semantics.
  *
  * Executes the same pure per-row functions as the Spark jobs
  * (InjectorJob.buildRow, GeneratorJob.candidate/reducePartition,
  * FetcherJob.decide, PolitenessScheduler.schedule, ParserJob.parsePage,
  * DbUpdateJob.mapPage/reduceUrl) but with plain in-memory loops in place
  * of shuffles, joins and groupBys. Agreement between the two on frontier
  * state, crawl ordering and the URL-seen set validates the distributed
  * control flow (SURVEY.md §5 test plan; the role the reference's
  * fetch-test-site + golden tests play).
  */
final class RefSim(
    conf: CrawlConfig,
    universe: Universe,
    source: OutlinkSource,
    env: FetchEnv = FetchEnv(),
    baseTime: Long = 1700000000000L,
    roundStepMs: Long = 86400L * 1000L) {

  /** key -> page; insertion-ordered for determinism. */
  val state = mutable.LinkedHashMap.empty[String, WebPage]

  /** (round, partition, seq, virtualTimeMs, url) fetch trace. */
  val trace = mutable.ArrayBuffer.empty[(Int, Int, Int, Long, String)]

  private val filter =
    if (conf.useDefaultUrlFilter) RegexUrlFilter.default else RegexUrlFilter.acceptAll
  private val schedule = FetchSchedule(conf)
  private val opic = ScoringFilter(conf)

  def batchIdOf(round: Int): String = s"batch-$round"
  def curTimeOf(round: Int): Long = baseTime + round.toLong * roundStepMs

  private def upsert(p: WebPage): Unit = state.update(p.key, p)

  def inject(seeds: Seq[String]): Unit =
    seeds.foreach { line =>
      InjectorJob.buildRow(line, conf, baseTime, filter).foreach(upsert)
    }

  def generate(round: Int): Seq[WebPage] = {
    val curTime = curTimeOf(round)
    val candidates = state.values.toSeq.flatMap { p =>
      GeneratorJob.candidate(p, conf, curTime, filter, schedule, opic)
    }
    val byPid = candidates.groupBy { case (selUrl, _) =>
      UrlPartitioner.getPartition(selUrl, conf.numPartitions, seed = round,
        mode = conf.partitionMode, normalizer = u => {
          val v = UrlNormalizers.normalize(u, UrlNormalizers.ScopePartition)
          if (v == null) u else v
        })
    }
    val out = byPid.toSeq.sortBy(_._1).flatMap { case (pid, rows) =>
      val sorted = rows.sortBy { case (selUrl, page) => (-page.score, selUrl, -page.fetchTime) }
      GeneratorJob.reducePartition(pid, sorted.iterator, conf, batchIdOf(round), round).toSeq
    }
    out.foreach(upsert)
    out
  }

  def fetchAndParse(round: Int): Seq[WebPage] = {
    val batchId = batchIdOf(round)
    val curTime = curTimeOf(round)
    val batch = state.values.toSeq.filter(_.markers.get(Marks.GENERATE).contains(batchId))
    val byPid = batch.groupBy(p => UrlPartitioner.getPartition(p.url, conf.numPartitions,
      seed = round, mode = conf.partitionMode))
    val out = byPid.toSeq.sortBy(_._1).flatMap { case (pid, rows) =>
      val arrived = rows.sortBy(p => (FetcherJob.arrivalKey(p.url, round), p.url))
      val items = arrived.iterator.map { p =>
        val decision = FetcherJob.decide(p, env, conf)
        (PolitenessScheduler.queueIdOf(p.url), (p, decision))
      }
      // the exact policy the Spark fetcher uses (incl. threads.per.queue)
      val delayFor: String => Long = qid => FetcherJob.queueDelayMs(qid, env, conf)
      FetcherJob.throughputKill(
        PolitenessScheduler.schedule[(WebPage, (Int, Int, WebPage))](items, delayFor,
          item => item._2._2 != ProtocolStatusCodes.ROBOTS_DENIED),
        conf.fetcherThroughputThresholdPages, conf.fetcherThroughputThresholdSeq)
        .filter(sch => conf.fetcherTimelimitMs < 0 || sch.virtualTimeMs < conf.fetcherTimelimitMs)
        .map { sch =>
        val (orig, (status, pcode, effected)) = sch.payload
        trace += ((round, pid, sch.seq, sch.virtualTimeMs, orig.url))
        val genMark = orig.markers.getOrElse(Marks.GENERATE, batchId)
        var page = Marks.put(effected, Marks.FETCH, genMark).copy(
          status = status,
          prevFetchTime = orig.fetchTime,
          fetchTime = curTime + sch.virtualTimeMs,
          protocolStatus = ProtocolStatus(pcode, Seq.empty, 0L),
          srcPartition = pid,
          round = round,
          metadata = effected.metadata + (FetcherJobKeys.FetchSeq -> sch.seq.toString))
        if (page.status == CrawlStatus.FETCHED) {
          universe.imageFor(page.url) match {
            case Some(img) =>
              page = page.copy(content = img.bytes, contentType = s"image/${img.fmt}",
                baseUrl = page.url,
                metadata = page.metadata + ("caption" -> img.caption))
            case None =>
              page = page.copy(status = CrawlStatus.GONE,
                protocolStatus = ProtocolStatus(ProtocolStatusCodes.NOTFOUND, Seq.empty, 0L))
          }
        }
        // same ParseFilter chain as the engine (ParserJob.parse resolves
        // ParseFilters(conf)) — the oracle must see identical parse output
        // when parseFilterClass is configured
        ParserJob.parsePage(page, conf, source, filter, batchId, ParseFilters(conf))
      }.toSeq
    }
    out.foreach(upsert)
    out
  }

  def update(round: Int): Seq[WebPage] = {
    val batchId = batchIdOf(round)
    val curTime = curTimeOf(round)
    val batch = state.values.toSeq.filter(_.markers.get(Marks.GENERATE).contains(batchId))
    val msgs = batch.flatMap(p => DbUpdateJob.mapPage(p, opic))
    val byUrl = msgs.groupBy(_.url)
    // one simulated reducer => one shared new-page budget
    val newPages = new DbUpdateJob.NewPageBudget(conf.maxNewPages)
    val out = byUrl.toSeq.sortBy(_._1).flatMap { case (url, ms) =>
      // same secondary sort as the Spark shuffle: page first, score desc
      val sorted = ms.sortBy(m =>
        (-(if (m.isPage) Float.MaxValue else m.score),
          if (m.srcUrl == null) "" else m.srcUrl))
      DbUpdateJob.reduceUrl(url, sorted.iterator, conf, curTime, round, newPages)
    }
    out.foreach(upsert)
    out
  }

  def round(r: Int): Unit = { generate(r); fetchAndParse(r); update(r) }

  def run(depth: Int, seeds: Seq[String]): Unit = {
    inject(seeds)
    (1 to depth).foreach(round)
  }

  /** The URL-seen set: distinct urls present in the table. */
  def seenUrls: Set[String] = state.values.map(_.url).toSet

  /** Normalized crawl order per round: (partition, seq) within rounds. */
  def orderOf(r: Int): Seq[String] =
    trace.filter(_._1 == r).sortBy(t => (t._2, t._3)).map(_._5).toSeq
}

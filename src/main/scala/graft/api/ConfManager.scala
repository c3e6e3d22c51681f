package graft.api

import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

import graft.crawl.CrawlConfig

/** Named-configuration registry (reference: api/impl/RAMConfManager.java,
  * api/resources/ConfigResource.java:38-80). Configurations are flat
  * string→string property maps using the reference's nutch-default.xml
  * property names; `crawlConfig` materializes one into the engine's typed
  * [[CrawlConfig]]. Unknown properties are retained verbatim (Hadoop
  * Configuration semantics) so clients can round-trip their own keys.
  */
final class ConfManager {
  import ConfManager._

  private val configs = new ConcurrentHashMap[String, Map[String, String]]()
  configs.put(Default, Map.empty)

  def list: Seq[String] = configs.keySet.asScala.toSeq.sorted
  def get(id: String): Option[Map[String, String]] = Option(configs.get(id))
  def getProperty(id: String, prop: String): Option[String] = get(id).flatMap(_.get(prop))

  /** Create or replace; returns the id (ConfigResource.createConfig). */
  def create(id: String, props: Map[String, String]): String = {
    require(id != null && id.nonEmpty, "Config id required!")
    configs.put(id, props); id
  }

  def setProperty(id: String, prop: String, value: String): Unit = {
    val cur = Option(configs.get(id))
      .getOrElse(throw new IllegalArgumentException(s"Unknown confId $id"))
    configs.put(id, cur + (prop -> value))
  }

  def delete(id: String): Boolean =
    if (id == Default) false else configs.remove(id) != null

  /** Typed view: reference property names → CrawlConfig fields. */
  def crawlConfig(id: String): Option[CrawlConfig] = get(id).map(fromProps)
}

object ConfManager {
  val Default = "default" // ConfigResource.java:39

  /** The reference's nutch-default.xml names for every knob CrawlConfig
    * exposes; seconds-valued reference properties stay seconds here and are
    * converted to the engine's ms fields.
    */
  def fromProps(p: Map[String, String]): CrawlConfig = {
    val base = CrawlConfig()
    def i(k: String, d: Int) = p.get(k).map(_.trim.toInt).getOrElse(d)
    def l(k: String, d: Long) = p.get(k).map(_.trim.toLong).getOrElse(d)
    def f(k: String, d: Float) = p.get(k).map(_.trim.toFloat).getOrElse(d)
    def b(k: String, d: Boolean) = p.get(k).map(_.trim.toBoolean).getOrElse(d)
    def s(k: String, d: String) = p.getOrElse(k, d)
    base.copy(
      fetchIntervalDefault = i("db.fetch.interval.default", base.fetchIntervalDefault),
      fetchIntervalMax = i("db.fetch.interval.max", base.fetchIntervalMax),
      retryMax = i("db.fetch.retry.max", base.retryMax),
      useAdaptiveSchedule = p.get("db.fetch.schedule.class").exists(_.contains("Adaptive")),
      adaptiveIncRate = f("db.fetch.schedule.adaptive.inc_rate", base.adaptiveIncRate),
      adaptiveDecRate = f("db.fetch.schedule.adaptive.dec_rate", base.adaptiveDecRate),
      adaptiveMinInterval = i("db.fetch.schedule.adaptive.min_interval", base.adaptiveMinInterval),
      adaptiveMaxInterval = i("db.fetch.schedule.adaptive.max_interval", base.adaptiveMaxInterval),
      adaptiveSyncDelta = b("db.fetch.schedule.adaptive.sync_delta", base.adaptiveSyncDelta),
      adaptiveSyncDeltaRate =
        p.get("db.fetch.schedule.adaptive.sync_delta_rate").map(_.trim.toDouble)
          .getOrElse(base.adaptiveSyncDeltaRate),
      scoringFilterClass = s("scoring.filter.class", base.scoringFilterClass),
      scoreInjected = f("db.score.injected", base.scoreInjected),
      internalScoreFactor = f("db.score.link.internal", base.internalScoreFactor),
      externalScoreFactor = f("db.score.link.external", base.externalScoreFactor),
      linkAnalysisNormalizedScore =
        f("link.analyze.normalize.score", base.linkAnalysisNormalizedScore),
      indexerScorePower = f("indexer.score.power", base.indexerScorePower),
      // per-suffix index boosts: indexer.tld.boost.<suffix>=<float>
      tldBoosts = p.collect {
        case (k, v) if k.startsWith("indexer.tld.boost.") =>
          k.stripPrefix("indexer.tld.boost.") -> v.trim.toFloat
      },
      topN = l("generate.topn", base.topN),
      generateMaxCount = l("generate.max.count", base.generateMaxCount),
      generateCountMode = s("generate.count.mode", base.generateCountMode),
      generateMaxDistance = i("generate.max.distance", base.generateMaxDistance),
      generateFilter = b("generate.filter", base.generateFilter),
      generateNormalise = b("generate.normalise", base.generateNormalise),
      partitionMode = s("partition.url.mode", base.partitionMode),
      numPartitions = i("graft.num.partitions", base.numPartitions),
      fetcherServerDelayMs = (f("fetcher.server.delay",
        base.fetcherServerDelayMs / 1000.0f) * 1000).toLong,
      fetcherServerMinDelayMs = (f("fetcher.server.min.delay",
        base.fetcherServerMinDelayMs / 1000.0f) * 1000).toLong,
      fetcherThreadsPerQueue = i("fetcher.threads.per.queue", base.fetcherThreadsPerQueue),
      fetcherMaxCrawlDelayMs = l("fetcher.max.crawl.delay",
        base.fetcherMaxCrawlDelayMs / 1000) * 1000,
      fetcherTimelimitMs = l("fetcher.timelimit.mins", -1) match {
        case -1 => base.fetcherTimelimitMs
        case mins => mins * 60000
      },
      fetcherThroughputThresholdPages =
        i("fetcher.throughput.threshold.pages", base.fetcherThroughputThresholdPages),
      fetcherThroughputThresholdSeq =
        i("fetcher.throughput.threshold.sequence", base.fetcherThroughputThresholdSeq),
      storingContent = b("fetcher.store.content", base.storingContent),
      maxOutlinksPerPage = i("db.max.outlinks.per.page", base.maxOutlinksPerPage),
      ignoreExternalLinks = b("db.ignore.external.links", base.ignoreExternalLinks),
      additionsAllowed = b("db.update.additions.allowed", base.additionsAllowed),
      maxInlinks = i("db.update.max.inlinks", base.maxInlinks),
      maxNewPages = l("db.update.max.newpages", base.maxNewPages),
      filterSeenNewPages = b("graft.filter.seen.newpages", base.filterSeenNewPages),
      seenBloomPartitions = i("graft.seen.bloom.partitions", base.seenBloomPartitions),
      seenBloomFpp = p.get("graft.seen.bloom.fpp").map(_.trim.toDouble)
        .getOrElse(base.seenBloomFpp),
      useDefaultUrlFilter = b("graft.urlfilter.default", base.useDefaultUrlFilter))
  }
}

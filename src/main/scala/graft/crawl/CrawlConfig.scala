package graft.crawl

/** Engine configuration. Defaults mirror the reference's nutch-default.xml
  * (fetch interval 2592000 s :347-349, injected score 1.0 :453-455, inlink
  * cap 10000 :426-428, outlink cap 100 :488-490, retry max 3 :513-515,
  * generate.max.count :547-556, fetcher.server.delay 5 s :607-609,
  * fetcher.max.crawl.delay 30 s, threads.per.queue 1 :649-651).
  */
case class CrawlConfig(
    // schedule
    fetchIntervalDefault: Int = 2592000, // db.fetch.interval.default (s)
    fetchIntervalMax: Int = 7776000, // db.fetch.interval.max (s, 90 days)
    retryMax: Int = 3, // db.fetch.retry.max
    adaptiveIncRate: Float = 0.2f,
    adaptiveDecRate: Float = 0.2f,
    adaptiveMinInterval: Int = 60,
    adaptiveMaxInterval: Int = 86400 * 365,
    adaptiveSyncDelta: Boolean = true,
    adaptiveSyncDeltaRate: Double = 0.2,
    useAdaptiveSchedule: Boolean = false, // db.fetch.schedule.class
    // scoring
    scoringFilterClass: String = "opic", // scoring.filter.class: opic | link | tld
    scoreInjected: Float = 1.0f, // db.score.injected
    internalScoreFactor: Float = 1.0f, // db.score.link.internal
    externalScoreFactor: Float = 1.0f, // db.score.link.external
    linkAnalysisNormalizedScore: Float = 1.0f, // link.analyze.normalize.score
    indexerScorePower: Float = 0.5f, // indexer.score.power
    tldBoosts: Map[String, Float] = Map.empty, // indexer.tld.boost.<suffix>
    // generate
    topN: Long = 0, // 0 = unlimited; per-partition limit like the reference
    generateMaxCount: Long = 0, // generate.max.count, 0 = unlimited
    generateCountMode: String = "host", // host | domain
    generateMaxDistance: Int = -1, // generate.max.distance
    generateFilter: Boolean = true,
    generateNormalise: Boolean = true,
    partitionMode: String = "byHost", // partition.url.mode
    numPartitions: Int = 32,
    // fetch
    fetcherServerDelayMs: Long = 5000, // fetcher.server.delay * 1000
    fetcherServerMinDelayMs: Long = 0,
    fetcherThreadsPerQueue: Int = 1,
    fetcherMaxCrawlDelayMs: Long = 30000, // fetcher.max.crawl.delay * 1000
    // fetcher.timelimit.mins analogue on the virtual clock: items whose
    // scheduled virtual time exceeds this are dropped from the round's
    // queues (they stay generated and re-enter a later fetchlist); -1 = off
    fetcherTimelimitMs: Long = -1,
    // fetcher.throughput.threshold.pages / .sequence analogue: if the
    // scheduled fetch rate stays below thresholdPages/sec for MORE than
    // `seq` consecutive 5s windows of the virtual clock, the rest of the
    // round's queues are emptied (items stay due); -1 = off
    fetcherThroughputThresholdPages: Int = -1,
    fetcherThroughputThresholdSeq: Int = 5,
    storingContent: Boolean = true, // fetcher.store.content
    // parse
    maxOutlinksPerPage: Int = 100, // db.max.outlinks.per.page
    ignoreExternalLinks: Boolean = false, // db.ignore.external.links
    // parse-result filter chain (reference ParseFilters / plugin.includes):
    // comma list of "metatags" or fully-qualified ParseFilter class names
    parseFilterClass: String = "",
    // update
    additionsAllowed: Boolean = true, // db.update.additions.allowed
    maxInlinks: Int = 10000, // db.update.max.inlinks
    maxNewPages: Long = 0, // db.update.max.newpages, 0 = unlimited
    // URL-seen set (ours; north_rule): suppress re-creation of already-seen
    // pages via partitioned bloom + exact anti-join instead of relying on
    // same-key overwrite. Off = byte-faithful reference semantics.
    filterSeenNewPages: Boolean = false,
    seenBloomPartitions: Int = 32,
    seenBloomFpp: Double = 0.01,
    // expected TOTAL key count the seen bank is sized for at its one-time
    // build (a 10^10-frontier deployment sets this explicitly); 0 = auto
    // (8x the key count at first build). Exceeding capacity only raises the
    // false-positive rate — the exact store join keeps results correct.
    seenBloomCapacity: Long = 0,
    // filters
    useDefaultUrlFilter: Boolean = true)

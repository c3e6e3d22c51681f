package graft.schedule

import graft.crawl.CrawlConfig
import graft.model.{CrawlStatus, ModifiedState, WebPage}

/** Re-fetch scheduling as pure functions WebPage => WebPage.
  *
  * Re-expresses the reference's AbstractFetchSchedule
  * (src/main/java/org/apache/nutch/crawl/AbstractFetchSchedule.java:84-210),
  * DefaultFetchSchedule and AdaptiveFetchSchedule(:66-110). Times are epoch
  * millis; intervals are seconds, compared numerically like the reference.
  */
trait FetchSchedule extends Serializable {
  def conf: CrawlConfig
  protected def defaultInterval: Int = conf.fetchIntervalDefault
  protected def maxInterval: Int = conf.fetchIntervalMax

  /** Sets fetchTime=now, default interval, zero retries. */
  def initializeSchedule(page: WebPage, curTime: Long): WebPage =
    page.copy(fetchTime = curTime, fetchInterval = defaultInterval, retriesSinceFetch = 0)

  /** Schedule after a successful fetch. Resets the retry counter. */
  def setFetchSchedule(page: WebPage, prevFetchTime: Long, prevModifiedTime: Long,
      fetchTime: Long, modifiedTime: Long, state: Int): WebPage

  /** GONE: interval *= 1.5 capped at 0.9*maxInterval; fetchTime pushed out. */
  def setPageGoneSchedule(page: WebPage, prevFetchTime: Long, prevModifiedTime: Long,
      fetchTime: Long): WebPage = {
    val newInterval =
      if (page.fetchInterval * 1.5f < maxInterval) (page.fetchInterval * 1.5f).toInt
      else (maxInterval * 0.9f).toInt
    page.copy(
      fetchInterval = newInterval,
      fetchTime = fetchTime + newInterval * 1000L)
  }

  /** Transient error: retry in 1 day, bump the retry counter. */
  def setPageRetrySchedule(page: WebPage, prevFetchTime: Long, prevModifiedTime: Long,
      fetchTime: Long): WebPage =
    page.copy(
      fetchTime = fetchTime + FetchSchedule.SecondsPerDay * 1000L,
      retriesSinceFetch = page.retriesSinceFetch + 1)

  def calculateLastFetchTime(page: WebPage): Long =
    page.fetchTime - page.fetchInterval * 1000L

  /** Eligibility for the current fetchlist; clamps far-future fetchTimes
    * (reference: AbstractFetchSchedule.shouldFetch:171-183). Returns the
    * possibly-adjusted page plus the verdict.
    */
  def shouldFetch(page: WebPage, curTime: Long): (Boolean, WebPage) = {
    var p = page
    if (p.fetchTime - curTime > maxInterval * 1000L) {
      if (p.fetchInterval > maxInterval)
        p = p.copy(fetchInterval = math.round(maxInterval * 0.9f))
      p = p.copy(fetchTime = curTime)
    }
    (p.fetchTime <= curTime, p)
  }

  def forceRefetch(page: WebPage, curTime: Long, asap: Boolean): WebPage = {
    var p = page
    if (p.fetchInterval > maxInterval)
      p = p.copy(fetchInterval = math.round(maxInterval * 0.9f))
    p = p.copy(status = CrawlStatus.UNFETCHED, retriesSinceFetch = 0, modifiedTime = 0L)
    if (asap) p = p.copy(fetchTime = curTime)
    p
  }
}

object FetchSchedule {
  val SecondsPerDay = 86400
  def apply(conf: CrawlConfig): FetchSchedule =
    if (conf.useAdaptiveSchedule) AdaptiveFetchSchedule(conf)
    else DefaultFetchSchedule(conf)
}

/** fetchTime = fetchTime + interval, interval unchanged
  * (reference: DefaultFetchSchedule.java).
  */
case class DefaultFetchSchedule(conf: CrawlConfig) extends FetchSchedule {
  override def setFetchSchedule(page: WebPage, prevFetchTime: Long,
      prevModifiedTime: Long, fetchTime: Long, modifiedTime: Long, state: Int): WebPage =
    page.copy(
      retriesSinceFetch = 0,
      fetchTime = fetchTime + page.fetchInterval * 1000L,
      modifiedTime = modifiedTime,
      prevModifiedTime = prevModifiedTime)
}

/** Adaptive schedule: interval shrinks by DEC_RATE on change, grows by
  * INC_RATE otherwise, sync-delta shifting toward the modification time
  * (reference: AdaptiveFetchSchedule.java:66-110).
  */
case class AdaptiveFetchSchedule(conf: CrawlConfig) extends FetchSchedule {
  override def setFetchSchedule(page: WebPage, prevFetchTime: Long,
      prevModifiedTime: Long, fetchTime: Long, modifiedTime0: Long, state: Int): WebPage = {
    var refTime = fetchTime
    val modifiedTime = if (modifiedTime0 <= 0) fetchTime else modifiedTime0
    var interval: Float = page.fetchInterval.toFloat
    state match {
      case ModifiedState.MODIFIED => interval *= (1.0f - conf.adaptiveDecRate)
      case ModifiedState.NOTMODIFIED => interval *= (1.0f + conf.adaptiveIncRate)
      case _ =>
    }
    var intInterval = interval.toInt
    if (conf.adaptiveSyncDelta) {
      val delta = ((fetchTime - modifiedTime) / 1000L).toInt
      if (delta > intInterval) intInterval = delta
      refTime = fetchTime - math.round(delta * conf.adaptiveSyncDeltaRate)
    }
    if (intInterval < conf.adaptiveMinInterval) intInterval = conf.adaptiveMinInterval
    if (intInterval > conf.adaptiveMaxInterval) intInterval = conf.adaptiveMaxInterval
    page.copy(
      retriesSinceFetch = 0,
      fetchInterval = intInterval,
      fetchTime = refTime + intInterval * 1000L,
      modifiedTime = modifiedTime,
      prevModifiedTime = prevModifiedTime)
  }
}

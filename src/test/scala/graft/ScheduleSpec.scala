package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.crawl.CrawlConfig
import graft.model.{CrawlStatus, ModifiedState, WebPage}
import graft.schedule.{AdaptiveFetchSchedule, DefaultFetchSchedule, FetchSchedule}

/** Schedule math per the reference's Default/Adaptive/AbstractFetchSchedule
  * (see SURVEY.md E7; shapes from TestAdaptiveFetchSchedule).
  */
class ScheduleSpec extends AnyFunSuite {
  private val conf = CrawlConfig(fetchIntervalDefault = 100, fetchIntervalMax = 1000)

  test("default schedule: fetchTime advances by interval, retries reset") {
    val s = DefaultFetchSchedule(conf)
    val p = WebPage(url = "u", fetchInterval = 100, retriesSinceFetch = 2)
    val after = s.setFetchSchedule(p, 0L, 0L, fetchTime = 10000L, modifiedTime = 5000L, ModifiedState.UNKNOWN)
    assert(after.fetchTime == 10000L + 100 * 1000L)
    assert(after.retriesSinceFetch == 0)
    assert(after.modifiedTime == 5000L)
  }

  test("gone schedule: interval x1.5 capped at 0.9*max") {
    val s = DefaultFetchSchedule(conf)
    val p = WebPage(url = "u", fetchInterval = 100)
    val after = s.setPageGoneSchedule(p, 0L, 0L, fetchTime = 0L)
    assert(after.fetchInterval == 150)
    val big = WebPage(url = "u", fetchInterval = 900)
    val after2 = s.setPageGoneSchedule(big, 0L, 0L, 0L)
    assert(after2.fetchInterval == 900) // 900*1.5=1350 >= 1000 -> 0.9*1000
  }

  test("retry schedule: +1 day, retry counter bumps") {
    val s = DefaultFetchSchedule(conf)
    val p = WebPage(url = "u", retriesSinceFetch = 1)
    val after = s.setPageRetrySchedule(p, 0L, 0L, fetchTime = 1000L)
    assert(after.fetchTime == 1000L + 86400L * 1000L)
    assert(after.retriesSinceFetch == 2)
  }

  test("shouldFetch: due now, not due in future, far-future clamped") {
    val s = DefaultFetchSchedule(conf)
    val due = WebPage(url = "u", fetchTime = 500L)
    assert(s.shouldFetch(due, 1000L)._1)
    val notDue = WebPage(url = "u", fetchTime = 2000L)
    assert(!s.shouldFetch(notDue, 1000L)._1)
    // fetchTime more than maxInterval in the future -> clamp to curTime, fetch
    val far = WebPage(url = "u", fetchTime = 1000L + 1001 * 1000L, fetchInterval = 5000)
    val (ok, adjusted) = s.shouldFetch(far, 1000L)
    assert(ok)
    assert(adjusted.fetchTime == 1000L)
    assert(adjusted.fetchInterval == 900)
  }

  test("adaptive schedule: interval shrinks on modified, grows on notmodified, bounded") {
    val aconf = conf.copy(adaptiveSyncDelta = false, useAdaptiveSchedule = true)
    val s = AdaptiveFetchSchedule(aconf)
    val p = WebPage(url = "u", fetchInterval = 1000)
    val mod = s.setFetchSchedule(p, 0L, 0L, 100000L, 50000L, ModifiedState.MODIFIED)
    assert(mod.fetchInterval == 800) // 1000 * (1-0.2)
    val not = s.setFetchSchedule(p, 0L, 0L, 100000L, 50000L, ModifiedState.NOTMODIFIED)
    assert(not.fetchInterval == 1200) // 1000 * (1+0.2)
    val tiny = WebPage(url = "u", fetchInterval = 60)
    val clamped = s.setFetchSchedule(tiny, 0L, 0L, 100000L, 50000L, ModifiedState.MODIFIED)
    assert(clamped.fetchInterval == 60) // min interval
  }

  test("forceRefetch resets status/retries/modifiedTime") {
    val s = FetchSchedule(conf)
    val p = WebPage(url = "u", status = CrawlStatus.FETCHED, retriesSinceFetch = 3,
      modifiedTime = 42L, fetchInterval = 5000)
    val after = s.forceRefetch(p, 777L, asap = true)
    assert(after.status == CrawlStatus.UNFETCHED)
    assert(after.retriesSinceFetch == 0)
    assert(after.modifiedTime == 0L)
    assert(after.fetchTime == 777L)
    assert(after.fetchInterval == 900)
  }

  test("fetcher.threads.per.queue > 1 switches the host gate to min.delay") {
    import graft.crawl.CrawlConfig
    import graft.jobs.FetcherJob
    import graft.site.{FetchEnv, RobotsRule}
    val env = FetchEnv(robots = Map("slow.test" -> RobotsRule("slow.test", crawlDelayMs = 7000)))
    val qid = "http://slow.test"
    // single slot: robots Crawl-Delay override, else server delay
    val one = CrawlConfig(fetcherServerDelayMs = 5000, fetcherServerMinDelayMs = 100)
    assert(FetcherJob.queueDelayMs(qid, env, one) == 7000)
    assert(FetcherJob.queueDelayMs("http://other.test", env, one) == 5000)
    // multi-slot: min.delay gates regardless (FetchItemQueue.setEndTime)
    val multi = one.copy(fetcherThreadsPerQueue = 2)
    assert(FetcherJob.queueDelayMs(qid, env, multi) == 100)
    assert(FetcherJob.queueDelayMs("http://other.test", env, multi) == 100)
  }

  test("fetcher.throughput.threshold kills the round after a sustained low-rate streak") {
    import graft.jobs.{FetcherJob, PolitenessScheduler}
    def sched(times: Seq[Long]) = times.zipWithIndex.map { case (t, i) =>
      PolitenessScheduler.Scheduled(i, "q", t, i)
    }
    // two fast 5s windows at 20 items/s, then a 1-item-per-window trickle
    val fast = (0 until 200).map(i => i * 50L)
    val slow = (0 until 10).map(i => 10000L + i * 5000L)
    val all = sched(fast ++ slow)
    // threshold 10/s, seq 2: the reference kills when the streak EXCEEDS
    // seq, i.e. when the 3rd consecutive low window closes
    val out = FetcherJob.throughputKill(all.iterator, thresholdPages = 10, seqMax = 2).toSeq
    assert(out.size == 203, s"expected 200 fast + 3 slow before the kill, got ${out.size}")
    // disabled (-1): everything survives
    assert(FetcherJob.throughputKill(all.iterator, -1, 2).size == all.size)
    // never below threshold: everything survives
    assert(FetcherJob.throughputKill(sched(fast).iterator, 10, 2).size == fast.size)
  }

  test("politeness heap handles a 100k-item / 10k-host partition fast") {
    // the old per-item linear scan over all queues was O(items x hosts) —
    // ~10^9 probe steps here; the ready/pending heap pair is O(n log q)
    val rnd = new scala.util.Random(7)
    val items = (0 until 100000).map(i => (s"http://h${rnd.nextInt(10000)}", i))
    val t0 = System.nanoTime()
    val out = graft.jobs.PolitenessScheduler
      .schedule[Int](items.iterator, _ => 50L, _ => true).toSeq
    val secs = (System.nanoTime() - t0) / 1e9
    assert(out.size == 100000)
    // generous absolute bound: heap runs in ~0.1s, the linear scan in minutes
    assert(secs < 10.0, f"politeness scheduling took $secs%.1f s for 100k/10k")
    // per-queue min-gap still holds
    val byQ = out.groupBy(_.queueId)
    assert(byQ.forall { case (_, fs) =>
      val ts = fs.map(_.virtualTimeMs).sorted
      ts.zip(ts.drop(1)).forall { case (a, b) => b - a >= 50L }
    })
  }
}

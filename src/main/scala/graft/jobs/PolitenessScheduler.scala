package graft.jobs

import scala.collection.mutable

/** Per-host politeness scheduling on a virtual clock.
  *
  * Reproduces the *induced ordering* of the reference's FetchItemQueues /
  * FetchItemQueue machinery (FetcherReducer.java:146-408): one FIFO queue
  * per `proto://host`, a queue only releases its next item once
  * `crawlDelay` has elapsed since the previous item finished
  * (nextFetchTime gate, :188-225), queues polled in insertion order, and a
  * robots-denied item finishes "asap" without consuming the delay
  * (finishFetchItem(fit, true), :484). The reference enforces this with
  * real threads and wall-clock sleeps; at Spark scale the normative
  * artifact is the ordering plus the per-host min-gap, which a virtual
  * clock reproduces deterministically (SURVEY.md §7.5 risk 3) — one
  * virtual fetch thread per partition, parallelism across partitions.
  */
object PolitenessScheduler {

  /** Scheduling outcome: when each item was (virtually) fetched. */
  case class Scheduled[T](payload: T, queueId: String, virtualTimeMs: Long, seq: Int)

  /** `items` in arrival order; `delayFor` = per-queue crawl delay ms;
    * `consumesDelay(payload)=false` models the asap-finish paths
    * (robots-denied) that do not hold the host gate.
    */
  def schedule[T](
      items: Iterator[(String, T)],
      delayFor: String => Long,
      consumesDelay: T => Boolean): Iterator[Scheduled[T]] = {

    final class Q(val id: String) {
      val q = mutable.Queue.empty[T]
      var nextTime = 0L
      lazy val delay: Long = math.max(0L, delayFor(id))
    }
    val queues = mutable.LinkedHashMap.empty[String, Q]
    var total = 0
    items.foreach { case (qid, t) =>
      queues.getOrElseUpdate(qid, new Q(qid)).q.enqueue(t)
      total += 1
    }

    val out = new mutable.ArrayBuffer[Scheduled[T]](total)
    var now = 0L
    var seq = 0
    var remaining = total
    while (remaining > 0) {
      val ready = queues.valuesIterator.find(q => q.q.nonEmpty && q.nextTime <= now)
      ready match {
        case Some(q) =>
          val item = q.q.dequeue()
          out += Scheduled(item, q.id, now, seq)
          seq += 1
          remaining -= 1
          q.nextTime = if (consumesDelay(item)) now + q.delay else now
        case None =>
          now = queues.valuesIterator.filter(_.q.nonEmpty).map(_.nextTime).min
      }
    }
    out.iterator
  }

  /** Queue id = lowercase proto://host (FetchItem.create, byHost mode). */
  def queueIdOf(url: String): String =
    graft.url.UrlUtil.tryParse(url) match {
      case Some(u) if u.host != null =>
        s"${u.protocol}://${u.host.toLowerCase}"
      case _ => url
    }
}

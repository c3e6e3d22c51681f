package graft.jobs

/** Streaming reduction over consecutive key runs of a sorted partition.
  *
  * The crawl stages sort each physical partition by a logical reducer id
  * (salted host pid, or url) and treat each RUN of equal ids as one logical
  * reducer. That makes the semantics invariant to physical placement —
  * hash(pid) % shufflePartitions, AQE coalescing, cluster size — which is
  * what lets the stages ride plain Tungsten Dataset shuffles instead of
  * custom RDD partitioners.
  */
object PidRuns {

  /** Apply `reduce` to each maximal run of elements with equal `runKey`,
    * concatenating results lazily (each run's input is fully drained before
    * the next run starts, even if the reducer stops early). */
  def reduceByRun[T, K, R](it: Iterator[T], runKey: T => K,
      reducer: (K, Iterator[T]) => Iterator[R]): Iterator[R] = {
    val b = it.buffered
    new Iterator[Iterator[R]] {
      override def hasNext: Boolean = b.hasNext
      override def next(): Iterator[R] = {
        val key = runKey(b.head)
        val group = new Iterator[T] {
          override def hasNext: Boolean = b.hasNext && runKey(b.head) == key
          override def next(): T = b.next()
        }
        reducer(key, group) ++ locally {
          while (group.hasNext) group.next()
          Iterator.empty[R]
        }
      }
    }.flatten
  }
}

package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming exact dedup: the continuous-ingest counterpart of the batch
  * `graft.ops.Dedup` family. A training-data pipeline that ingests crawl
  * output as it lands cannot re-scan the corpus per batch; instead the
  * dedup key (content hash, fingerprint, simhash bucket — caller's choice)
  * becomes the group key of a stateful streaming operator and the state
  * store remembers which keys have already been emitted.
  *
  * Scale notes (100 TB lens):
  *  - State is ONE boolean per distinct key, partitioned by the shuffle on
  *    the key — at web scale back the query with the RocksDB state store
  *    provider (spark.sql.streaming.stateStore.providerClass) so state
  *    spills off-heap instead of living in executor memory.
  *  - For frontiers past state-store comfort (10^10 keys), compose with the
  *    batch path: prefilter each micro-batch against a broadcast
  *    [[graft.seen.BloomSeen]] of the historical corpus (bloom-negative
  *    rows skip the stateful operator entirely) and keep exact state only
  *    for the bloom-positive tail — the same two-tier shape as
  *    DbUpdateJob's seen merge.
  */
object StreamingDedup {

  /** Keep only the FIRST occurrence of every dedup key across the stream's
    * lifetime (append mode). Within a single micro-batch the survivor is
    * the `order`-minimal row, so output is deterministic under batch
    * regrouping; later batches' rows with a seen key are dropped without
    * emitting. Works on any typed stream — the row rides the one shuffle
    * by key and is emitted as-is.
    */
  def dropSeen[T](docs: Dataset[T])(key: T => String, order: T => String)(
      implicit e: Encoder[T]): Dataset[T] = {
    implicit val boolEnc: Encoder[Boolean] =
      org.apache.spark.sql.Encoders.scalaBoolean
    docs.groupByKey(key)(org.apache.spark.sql.Encoders.STRING)
      .flatMapGroupsWithState[Boolean, T](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (_, rows, state) =>
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            Iterator.single(rows.minBy(order))
          }
      }
  }
}

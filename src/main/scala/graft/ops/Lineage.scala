package graft.ops

import org.apache.spark.sql.Dataset

/** Lineage control for iterative jobs (label propagation, link analysis).
  *
  * persist+count alone is NOT enough for a loop whose next state references
  * the previous state more than once: the cached DATA is reused, but the
  * LOGICAL plan doubles per reference per iteration, so the analyzer/
  * optimizer does O(2^k) work by iteration k (measured: a 10-iteration
  * PageRank on a 9-node graph wedged for >20 minutes before this existed).
  * A true lineage cut replaces the whole history with a constant-size
  * LogicalRDD leaf.
  */
object Lineage {

  /** Eagerly materialize `df` and cut its lineage. Uses a reliable
    * `checkpoint()` when the session has a checkpoint dir configured (the
    * cluster path — survives executor loss, required for long iterative
    * jobs at 10^10 scale), `localCheckpoint()` otherwise (executor-local
    * storage; fine for local mode and short loops).
    *
    * Reclamation differs by path: local-checkpoint block storage is freed
    * by the ContextCleaner once the frame is unreferenced (`unpersist()`
    * is a harmless no-op). Reliable checkpoint FILES, however, are only
    * auto-deleted when `spark.cleaner.referenceTracking.cleanCheckpoints`
    * is set (Spark defaults it to false) — a cluster session running
    * iterative jobs should either set that flag or point the checkpoint
    * dir at a per-job location it removes afterwards, or every superseded
    * iteration's table stays on the cluster filesystem.
    */
  def cut[T](df: Dataset[T]): Dataset[T] =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) df.checkpoint()
    else df.localCheckpoint()
}

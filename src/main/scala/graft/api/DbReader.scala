package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions
import graft.model.Marks
import graft.table.SnapshotTable

/** The /db query resource (reference: api/resources/DbResource.java:32-60,
  * api/impl/db/DbReader.java:48-100): key-range + batch filter + field
  * projection over the frontier table.
  *
  * The reference's Gora store is keyed by reversed URL, so its start/end
  * keys are reversed-url range bounds; we reproduce that contract by
  * filtering on `graft_reverse_url(url)` (a codegen'd native expression) —
  * the filter and the column projection stay inside Catalyst, so on a
  * partitioned 10^10-row table the scan is pruned to the requested columns
  * and the predicates are evaluated in whole-stage codegen, not driver-side.
  */
final class DbReader(spark: SparkSession, tablePath: String) {

  /** Reference DbFilter: batchId, startKey, endKey (inclusive, Gora query
    * contract), fields; plus a sane row cap for the HTTP surface.
    */
  def runQuery(
      batchId: Option[String],
      startKey: Option[String],
      endKey: Option[String],
      fields: Seq[String],
      limit: Int = 100): Seq[Map[String, Any]] = {
    GraftFunctions.register(spark)
    val view = new SnapshotTable(tablePath).currentView(spark).drop("snapshot_id")
    val revKey = call_function("graft_reverse_url", col("url"))
    var df: DataFrame = view
    startKey.foreach(k => df = df.where(revKey >= lit(k)))
    endKey.foreach(k => df = df.where(revKey <= lit(k)))
    batchId.foreach(b => df = df.where(
      element_at(col("markers"), Marks.GENERATE) === lit(b) ||
        col("batchId") === lit(b)))
    val cols =
      if (fields.isEmpty) df.columns.filterNot(_ == "content").toSeq // DbReader.java:79-84
      else ("url" +: fields).distinct.filter(df.columns.contains)
    // the limit is client-controlled and the rows are collect()ed on the
    // driver: clamp to a server-side maximum so a huge request cannot OOM
    // the REST process
    df.select(cols.map(col): _*)
      .orderBy(revKey)
      .limit(math.min(math.max(limit, 0), DbReader.MaxLimit))
      .collect()
      .map(r => r.schema.fieldNames.zip(r.toSeq.map(JobFactory.jsonSafe)).toMap)
      .toSeq
  }
}

object DbReader {
  /** Hard ceiling on rows a single /db request may collect to the driver. */
  val MaxLimit: Int = 10000
}

package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Structured Streaming over the crawl table.
  *
  * The reference is pure batch (SURVEY.md §G) — rounds are driven by shell
  * loops. The snapshot table's append-only layout makes it a natural file
  * stream source, so live monitoring comes for free: each stage commit
  * appends a new `data/sid=N/` directory which `readStream.parquet` picks
  * up as a micro-batch. This powers a readdb-stats-style live dashboard
  * without touching the crawl loop (an optional observer, per SURVEY's
  * "note foreachBatch as the round driver but do not build on it").
  */
object CrawlStream {

  /** Stream of newly committed frontier rows (one micro-batch per snapshot
    * append, roughly). `schemaFrom` supplies the fixed WebPage schema the
    * file source needs. */
  def frontierStream(spark: SparkSession, tablePath: String): DataFrame = {
    val schema = spark.read.parquet(s"$tablePath/data").schema
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", "64")
      .parquet(s"$tablePath/data/sid=*")
  }

  /** Running per-status counts over all rows ever committed — the streaming
    * readdb -stats (complete-mode aggregation). */
  def statusCounts(rows: DataFrame): DataFrame =
    rows.groupBy(col("status")).agg(count(lit(1)).as("cnt"))

  /** Per-round fetch throughput: rows fetched per (round, srcPartition) —
    * the live metrics feed (north_rule: per-partition lineage + metrics). */
  def roundPartitionCounts(rows: DataFrame): DataFrame =
    rows.where(col("status") =!= 0)
      .groupBy(col("round"), col("srcPartition"))
      .agg(count(lit(1)).as("rows"), max(col("fetchTime")).as("max_fetch_time"))

  /** Start a complete-mode in-memory sink for tests/dashboards. */
  def startMemorySink(df: DataFrame, name: String): StreamingQuery =
    df.writeStream
      .format("memory")
      .queryName(name)
      .outputMode("complete")
      .start()
}

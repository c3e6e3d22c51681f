package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.{CrawlStatus, Marks}

/** The index stage: parsed pages -> a flat documents output table
  * (reference: indexer/IndexingJob.java + the solr/elastic sinks,
  * SURVEY.md A9). The reference ships rows to Solr; here the sink is a
  * columnar table — the shape a downstream search indexer or training-data
  * exporter consumes. Boost = score^power * initScore, the OPIC indexer
  * dampening (OPICScoringFilter.indexerScore, power 0.5).
  */
object IndexerJob {

  def buildDocs(pages: DataFrame, batchId: Option[String] = None,
      scorePower: Double = 0.5, deduplicateAnchors: Boolean = false): DataFrame = {
    val parsed = pages.where(
      col("status") === CrawlStatus.FETCHED &&
        element_at(col("markers"), Marks.PARSE).isNotNull &&
        batchId.map(b => element_at(col("markers"), Marks.PARSE) === b)
          .getOrElse(lit(true)))
    // inbound anchor texts (reference: index-anchor AnchorIndexingFilter
    // .filter:75-100 — every non-empty inlink anchor, optionally
    // case-insensitively deduplicated)
    val rawAnchors = filter(map_values(col("inlinks")), a => a =!= "")
    val anchors =
      if (deduplicateAnchors) array_distinct(transform(rawAnchors, a => lower(a)))
      else rawAnchors
    parsed.select(
      col("key").as("doc_key"),
      col("url"),
      col("title"),
      col("text"),
      anchors.as("anchors"),
      col("contentType").as("content_type"),
      col("fetchTime").as("fetch_time"),
      hex(col("signature")).as("signature"),
      pow(col("score").cast("double"), scorePower).as("boost"),
      col("batchId").as("batch_id"),
      col("round"))
  }

  /** Write the index delta for a batch (the IndexingJob map-only write). */
  def index(spark: SparkSession, pages: DataFrame, outDir: String,
      batchId: Option[String] = None): Unit =
    buildDocs(pages, batchId).write.mode("append").parquet(outDir)
}

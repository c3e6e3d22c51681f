package graft.jobs

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.{CrawlStatus, Marks}

/** One link of the document-building chain (reference extension point
  * indexer/IndexingFilter.java, run in order by IndexingFilters.java; the
  * shipped plugins index-basic / index-anchor / index-more / tld each add
  * their fields to the NutchDocument). Spark mapping: each filter is a
  * column transform over the parsed page rows — it appends (or rewrites)
  * doc columns and the chain's fold IS the document. A user adds fields by
  * appending a filter, never by editing IndexerJob.
  */
trait IndexingFilter extends Serializable {
  def name: String
  def apply(docs: DataFrame): DataFrame
}

/** index-basic (BasicIndexingFilter.java): identity, title, text, times,
  * signature and the score boost. The boost column is the configured
  * ScoringFilter's columnar indexerScore (reference IndexingJob runs
  * ScoringFilters.indexerScore to set the doc boost) — OPIC's
  * score^power dampening by default, link/tld shapes under
  * `scoringFilterClass` — expressed as an expression so it stays in
  * whole-stage codegen. */
final case class BasicIndexingFilter(scorePower: Double = 0.5,
    scoring: Option[graft.score.ScoringFilter] = None) extends IndexingFilter {
  val name = "basic"
  def apply(docs: DataFrame): DataFrame = docs
    .withColumn("doc_key", col("key"))
    .withColumn("content_type", col("contentType"))
    .withColumn("fetch_time", col("fetchTime"))
    .withColumn("signature", hex(col("signature")))
    .withColumn("boost", scoring
      .map(_.indexerBoostCol(docs.sparkSession, col("url"), col("score"), lit(1.0)))
      .getOrElse(pow(col("score").cast("double"), scorePower)))
    .withColumn("batch_id", col("batchId"))
}

/** index-anchor (AnchorIndexingFilter.filter:75-100): every non-empty
  * inbound anchor text, optionally case-insensitively deduplicated. */
final case class AnchorIndexingFilter(deduplicate: Boolean = false) extends IndexingFilter {
  val name = "anchor"
  def apply(docs: DataFrame): DataFrame = {
    val raw = filter(map_values(col("inlinks")), a => a =!= "")
    val anchors =
      if (deduplicate) array_distinct(transform(raw, a => lower(a)))
      else raw
    docs.withColumn("anchors", anchors)
  }
}

/** index-more (MoreIndexingFilter.java): content length and last-modified
  * time — not in the default chain (matching the reference's default
  * plugin.includes), append it explicitly. */
final case class MoreIndexingFilter() extends IndexingFilter {
  val name = "more"
  def apply(docs: DataFrame): DataFrame = docs
    .withColumn("content_length",
      coalesce(element_at(col("headers"), "Content-Length").cast("long"),
        when(col("content").isNotNull, length(col("content")).cast("long"))))
    .withColumn("last_modified", col("modifiedTime"))
}

/** language-identifier (LanguageIndexingFilter.filter:58-66): index the
  * page's resolved language, "unknown" when nothing resolves. Resolution
  * runs the reference's `lang.extraction.policy` fold (detect declared
  * metadata/header values, normalized to primary ISO-639 codes; fall back
  * to statistical identification over title+text — see
  * [[graft.lang.PageLanguage]]). */
final case class LanguageIndexingFilter(
    policy: Seq[String] = Seq("detect", "identify"),
    minScore: Int = 0) extends IndexingFilter {
  val name = "language"
  def apply(docs: DataFrame): DataFrame = docs
    .withColumn("lang",
      coalesce(graft.lang.PageLanguage.resolve(col("metadata"), col("headers"),
        col("title"), col("text"), policy, minScore), lit("unknown")))
}

/** index-metadata (MetadataIndexer.filter:45-66): for each configured key,
  * the parse metadata value `meta_<key>` (values tab-separated, as the
  * parse-metatags producer writes them) becomes the multi-valued doc
  * column `meta_<key>`; absent metadata -> null column. */
final case class MetadataIndexingFilter(keys: Seq[String]) extends IndexingFilter {
  val name = "metadata"
  def apply(docs: DataFrame): DataFrame =
    keys.foldLeft(docs)((df, k) =>
      df.withColumn(s"meta_$k",
        split(try_element_at(col("metadata"), lit(s"meta_$k")), "\t")))
}

/** One subcollection: url substring white/blacklist
  * (collection/Subcollection.filter:~150: any blacklist hit rejects, then
  * any whitelist hit accepts, else reject). */
final case class Subcollection(id: String, label: String,
    whitelist: Seq[String], blacklist: Seq[String] = Seq.empty) {
  /** The membership predicate over a url column. */
  def matches(url: Column): Column = {
    val black = blacklist.foldLeft(lit(false))((b, s) => b || url.contains(s))
    val white = whitelist.foldLeft(lit(false))((w, s) => w || url.contains(s))
    !black && white
  }
}

/** subcollection (SubcollectionIndexingFilter.filter:60-66): the names of
  * every collection whose white/blacklist accepts the url, as the
  * multi-valued `subcollection` column. */
final case class SubcollectionIndexingFilter(collections: Seq[Subcollection])
    extends IndexingFilter {
  val name = "subcollection"
  def apply(docs: DataFrame): DataFrame = {
    val hits = collections.map(c => when(c.matches(col("url")), lit(c.label)))
    docs.withColumn("subcollection",
      if (hits.isEmpty) array().cast("array<string>")
      else array_compact(array(hits: _*)))
  }
}

/** tld (TLDIndexingFilter.filter:43-52): the url's public suffix as the
  * `tld` doc column — the reference's URLUtil.getDomainSuffix walk over
  * the full embedded suffix list, run as the native codegen expression
  * graft_tld; null where the reference would skip the field (IP hosts,
  * unknown suffixes, malformed urls). */
final case class TldIndexingFilter() extends IndexingFilter {
  val name = "tld"
  def apply(docs: DataFrame): DataFrame = docs.withColumn("tld",
    graft.functions.GraftFunctions.tldOf(docs.sparkSession, col("url")))
}

/** phash: the payload's perceptual hash (computed at parse from the DECODED
  * pixels, persisted in the metadata escape hatch) as a long doc column —
  * the key for image near-dup dedup over the index output. */
final case class PhashIndexingFilter() extends IndexingFilter {
  val name = "phash"
  def apply(docs: DataFrame): DataFrame = docs.withColumn("phash",
    try_element_at(col("metadata"), lit(ParserJob.PhashMeta)).cast("long"))
}

/** One link of the index-cleaning chain (reference extension point
  * indexer/IndexCleaningFilter.java, run by IndexCleaningFilters; the
  * CleaningJob mapper ORs the chain over every page row). Spark mapping:
  * `remove` is a columnar predicate over page rows — true means the page's
  * documents must be deleted from the index output. */
trait IndexCleaningFilter extends Serializable {
  def name: String
  /** true == remove (reference IndexCleaningFilter.remove(url, page)). */
  def remove: Column
}

/** Remove pages whose url matches any of the given regexes — the typical
  * custom cleaning filter (blocklist sweep over an already-built index). */
final case class UrlRegexCleaningFilter(patterns: Seq[String])
    extends IndexCleaningFilter {
  val name = "url-regex"
  def remove: Column =
    patterns.foldLeft(lit(false))((p, re) => p || col("url").rlike(re))
}

/** The index stage: parsed pages -> a flat documents output table
  * (reference: indexer/IndexingJob.java + the solr/elastic sinks,
  * SURVEY.md A9). The reference ships rows to Solr; here the sink is a
  * columnar table — the shape a downstream search indexer or training-data
  * exporter consumes. Documents are built by the ordered IndexingFilter
  * chain; custom filters' columns survive into the output after the
  * canonical ones.
  */
object IndexerJob {

  /** The canonical doc schema the default chain produces (stable for the
    * driver oracle and downstream readers). */
  private val CanonicalCols = Seq("doc_key", "url", "title", "text", "anchors",
    "content_type", "fetch_time", "signature", "boost", "batch_id", "round")

  def defaultChain(scorePower: Double, deduplicateAnchors: Boolean,
      scoring: Option[graft.score.ScoringFilter] = None): Seq[IndexingFilter] =
    Seq(BasicIndexingFilter(scorePower, scoring),
      AnchorIndexingFilter(deduplicateAnchors))

  def buildDocs(pages: DataFrame, batchId: Option[String] = None,
      scorePower: Double = 0.5, deduplicateAnchors: Boolean = false,
      extraFilters: Seq[IndexingFilter] = Seq.empty,
      scoring: Option[graft.score.ScoringFilter] = None): DataFrame = {
    val parsed = pages.where(
      col("status") === CrawlStatus.FETCHED &&
        element_at(col("markers"), Marks.PARSE).isNotNull &&
        batchId.map(b => element_at(col("markers"), Marks.PARSE) === b)
          .getOrElse(lit(true)))
    val chain = defaultChain(scorePower, deduplicateAnchors, scoring) ++ extraFilters
    val withCols = chain.foldLeft(parsed)((df, f) => f(df))
    // canonical columns first, then anything a custom filter added
    val extras = withCols.columns
      .filterNot(c => CanonicalCols.contains(c) || pages.columns.contains(c))
    withCols.select((CanonicalCols ++ extras).map(col): _*)
  }

  /** Drop near-duplicate-image documents from an index output: pairs by
    * pHash hamming distance (Dedup.phashNearDupPairs — pigeonhole banding,
    * exact within `maxDist`), clusters by connected components, keep ONE
    * canonical doc (min doc_key) per cluster. Docs without a phash column
    * value (non-image payloads, failed decodes) pass through untouched.
    * The docs frame must carry a `phash` column — chain
    * [[PhashIndexingFilter]] (or provide your own) before calling. */
  def dropNearDupImages(docs: DataFrame, maxDist: Int = 3,
      maxBucket: Long = 1000L): DataFrame = {
    val keyed = docs.where(col("phash").isNotNull)
      .select(col("doc_key"), col("phash"))
    val pairs = graft.ops.Dedup.phashNearDupPairs(keyed, "doc_key", "phash",
      maxDist = maxDist, maxBucket = maxBucket)
    graft.ops.Dedup.dropNearDuplicates(docs, pairs, "doc_key")
  }

  /** The keys whose documents must leave the index (reference
    * indexer/CleaningJob.java CleanMapper.map:?: status GONE is the
    * built-in rule; every IndexCleaningFilter in the chain may add more).
    * `pages` should be the resolved latest-version view — the reference
    * scans the store, whose row per key IS the current state. */
  def removeKeys(pages: DataFrame,
      filters: Seq[IndexCleaningFilter] = Seq.empty): DataFrame = {
    val pred = filters.foldLeft(col("status") === CrawlStatus.GONE)(
      (p, f) => p || f.remove)
    pages.where(pred).select(col("key").as("doc_key")).distinct()
  }

  /** idxclean / solrclean (reference indexer/CleaningJob.java): delete from
    * an index output every doc whose page is now GONE or matched by a
    * cleaning filter. The remove-key set is delta-sized (GONE + blocklist
    * hits), so at 100 TB the anti-join broadcasts or shuffles only keys —
    * doc payload columns never move. */
  def clean(docs: DataFrame, pages: DataFrame,
      filters: Seq[IndexCleaningFilter] = Seq.empty): DataFrame =
    docs.join(removeKeys(pages, filters), Seq("doc_key"), "left_anti")

  /** solrdedup (reference indexer/solr/SolrDeleteDuplicates.java:55-82):
    * among docs sharing a signature digest (different URLs, same content),
    * keep the single doc with the highest boost; ties fall to the latest
    * fetch time (the reducer's tstamp rule), then to the smallest doc_key —
    * a determinism upgrade over the reference, which keeps whichever record
    * its reducer iteration happens to see first. Returns the surviving
    * docs; [[duplicateKeys]] is the delete list the reference ships as Solr
    * delete requests. One shuffle on the digest; groups are content-equal
    * docs so they stay small (an all-empty-content corpus would make one
    * hot digest — dedup empty payloads upstream, as the reference's parse
    * stage effectively does by skipping them). */
  def deleteDuplicates(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("signature"))
      .orderBy(col("boost").desc, col("fetch_time").desc, col("doc_key"))
    // null-signature docs (no digest computed) are NOT content-equal to
    // each other — they pass through rather than collapsing into one
    // window group
    val sigged = docs.where(col("signature").isNotNull)
    sigged.withColumn("__dd_rn", row_number().over(w))
      .where(col("__dd_rn") === 1).drop("__dd_rn")
      .unionByName(docs.where(col("signature").isNull))
  }

  /** The doc keys solrdedup would delete (everything but each digest
    * group's survivor). */
  def duplicateKeys(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("signature"))
      .orderBy(col("boost").desc, col("fetch_time").desc, col("doc_key"))
    docs.select(col("signature"), col("boost"), col("fetch_time"), col("doc_key"))
      .where(col("signature").isNotNull) // no digest -> never a duplicate
      .withColumn("__dd_rn", row_number().over(w))
      .where(col("__dd_rn") > 1).select("doc_key")
  }

  /** Write the index delta for a batch (the IndexingJob map-only write). */
  def index(spark: SparkSession, pages: DataFrame, outDir: String,
      batchId: Option[String] = None,
      extraFilters: Seq[IndexingFilter] = Seq.empty,
      scoring: Option[graft.score.ScoringFilter] = None): Unit =
    buildDocs(pages, batchId, extraFilters = extraFilters, scoring = scoring)
      .write.mode("append").parquet(outDir)
}

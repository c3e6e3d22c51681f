package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.url.UrlUtil

/** readdb: table statistics and dumps.
  *
  * Reference shape (SURVEY.md C8, A7-A8; WebTableReader.java:64-205,
  * 303-340): an MR job with an explicit combiner computing row count,
  * per-status counts, a retry histogram, and min/max/avg score; the dump job
  * projects rows to text with an optional regex filter.
  *
  * Spark mapping: plain declarative aggregates — Catalyst's partial+final
  * HashAggregate replaces the hand-written combiner for free; the regex
  * filter is a pushed-down `rlike`.
  */
object ReadDbJob {

  /** Overall stats (one row): count + score min/max/avg. */
  def stats(pages: DataFrame): DataFrame =
    pages.agg(
      count(lit(1)).as("n_rows"),
      min(col("score")).as("min_score"),
      max(col("score")).as("max_score"),
      avg(col("score")).as("avg_score"))

  /** Per-status row counts (WebTableReader "status N" counters). */
  def statusCounts(pages: DataFrame): DataFrame =
    pages.groupBy(col("status")).agg(count(lit(1)).as("cnt")).orderBy(col("status"))

  /** Retry histogram (WebTableReader "retry N" counters). */
  def retryHistogram(pages: DataFrame): DataFrame =
    pages.groupBy(col("retriesSinceFetch").as("retries"))
      .agg(count(lit(1)).as("cnt")).orderBy(col("retries"))

  /** Dump projection with optional regex subset (processDumpJob). */
  def dump(pages: DataFrame, urlRegex: Option[String] = None): DataFrame = {
    val base = urlRegex.fold(pages)(re => pages.where(col("url").rlike(re)))
    base.select(col("key"), col("url"), col("status"), col("fetchTime"),
      col("score"), col("title"))
  }

  /** Point lookup by url (readdb -url; a pushed-down key predicate). */
  def byUrl(pages: DataFrame, url: String): DataFrame =
    pages.where(col("key") === UrlUtil.uuid3(url))
}

/** hostdb: per-host aggregates over the page table
  * (reference: host/HostDbUpdateJob.java:62-116, HostDbUpdateReducer.java:35-90 —
  * group pages by reversed host, count unfetched/fetched/gone/redirect and
  * link degrees). One shuffle, partial aggregation map-side.
  */
object HostDbJob {
  import graft.model.CrawlStatus

  def hostStats(spark: SparkSession, pages: DataFrame): DataFrame = {
    // native codegen'd expression, not a Scala UDF (SURVEY.md §4)
    graft.functions.GraftFunctions.register(spark)
    pages
      .withColumn("host", call_function("graft_reverse_host", col("url")))
      .groupBy(col("host"))
      .agg(
        count(lit(1)).as("n_pages"),
        sum(when(col("status") === CrawlStatus.UNFETCHED, 1).otherwise(0)).as("n_unfetched"),
        sum(when(col("status") === CrawlStatus.FETCHED, 1).otherwise(0)).as("n_fetched"),
        sum(when(col("status") === CrawlStatus.GONE, 1).otherwise(0)).as("n_gone"),
        sum(when(col("status").isin(CrawlStatus.REDIR_TEMP, CrawlStatus.REDIR_PERM), 1)
          .otherwise(0)).as("n_redirect"),
        sum(size(col("outlinks"))).as("n_outlinks"),
        sum(size(col("inlinks"))).as("n_inlinks"),
        max(col("score")).as("max_score"))
      .orderBy(col("host"))
  }

  /** hostinject (reference host/HostInjectorJob.java UrlMapper:~47-89):
    * seed lines `host[\tk=v]*` become host rows keyed by the REVERSED host
    * name (storage locality — sibling hosts sort together). A line's first
    * field may be a bare host or a full url (the reference prefixes
    * `http://` when no scheme is present); `k=v` pairs land in the
    * metadata map and fields without `=` are skipped (:56-67). Blank lines
    * are dropped. Duplicate hosts collapse to one row; conflicting
    * metadata values resolve to the lexicographic max per key — the
    * reference's upsert order is task-arrival nondeterminism, ours is a
    * stated deterministic rule. */
  def injectHosts(spark: SparkSession,
      lines: org.apache.spark.sql.Dataset[String]): DataFrame = {
    import spark.implicits._
    lines.map(_.trim).filter(_.nonEmpty)
      .flatMap { line =>
        val splits = line.split("\t")
        val raw = splits(0).trim
        // strict parse: a line whose first field yields no real host (the
        // reference's MalformedURLException case) is skipped, not turned
        // into a garbage key
        val host = UrlUtil
          .tryParse(if (raw.contains("://")) raw else s"http://$raw")
          .map(_.host).orNull
        if (host == null || host.isEmpty) None
        else {
          val meta = splits.iterator.drop(1).flatMap { kv =>
            val i = kv.indexOf('=')
            if (i < 0) None
            else Some(kv.substring(0, i).trim -> kv.substring(i + 1).trim)
          }.toMap
          Some(UrlUtil.reverseHost(host) -> meta)
        }
      }
      .toDF("host_key", "metadata")
      .transform(df => mergeHosts(df))
  }

  /** Collapse host rows to one per key, metadata merged with the
    * lexicographic-max-per-key rule (the deterministic replacement for the
    * reference store's arrival-order upsert). Also the `hostinject`
    * incremental path: merge a fresh injection INTO an existing hostdb —
    * the reference HostInjectorJob upserts, it never replaces the table. */
  def mergeHosts(hosts: DataFrame, more: DataFrame*): DataFrame = {
    val spark = hosts.sparkSession
    import spark.implicits._
    more.foldLeft(hosts)(_ unionByName _)
      .as[(String, Map[String, String])]
      .groupByKey(_._1)
      .mapGroups { (k, rows) =>
        val merged = rows.flatMap(_._2).toSeq.groupBy(_._1)
          .map { case (mk, vs) => mk -> vs.map(_._2).max }
        (k, merged)
      }
      .toDF("host_key", "metadata")
  }

  /** readhostdb (reference host/HostDbReader.java:10-35): dump the host
    * table — every row, or one key — with the display name unreversed the
    * way the reference prints it. */
  def readHostDb(hosts: DataFrame, key: Option[String] = None): DataFrame = {
    val base = key.fold(hosts)(k => hosts.where(col("host_key") === k))
    // unreverse == reverse the dot-separated labels again (an involution);
    // declarative array ops, not a UDF, so the projection stays codegen'd
    val unrev = array_join(reverse(split(col("host_key"), "\\.")), ".")
    base.withColumn("host", unrev)
      .select((Seq(col("host")) ++ base.columns.map(col)): _*)
      .orderBy(col("host_key"))
  }
}

package graft.jobs

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.crawl.CrawlConfig
import graft.model.WebPage
import graft.schedule.FetchSchedule
import graft.score.ScoringFilter
import graft.url.UrlUtil

/** One edge of the link graph (reference: src/main/gora/link.avsc — key,
  * score, distance, batchId, in, out; anchor added because the page table
  * stores it per-edge and anchor-text indexing needs it).
  */
case class LinkEdge(
    key: String,
    in: String,
    out: String,
    anchor: String,
    score: Float,
    distance: Int,
    batchId: String)

/** The materialized link/edge table plus the FrontierJob analogue
  * (reference: crawl/FrontierJob.java:43-110 — scan the Link store, create
  * a bare frontier row per `out` URL via putIfAbsent).
  *
  * Spark shape: edge extraction is one explode over the page table's
  * outlinks map (narrow, no shuffle); frontier seeding is the D3 anti-join
  * (new keys only) + per-key dedup — putIfAbsent without a mutable store.
  * At 10^10 scale the anti-join is the same shuffle the updatedb stage
  * already pays, and the edge table gives users a queryable link graph
  * (inlink counts, anchor text, graph analytics) without touching the
  * frontier table.
  */
object LinkDb {

  /** Materialize the edge stream from parsed pages: one row per outlink.
    * `key` is the target's storage key so edge rows co-partition with the
    * frontier table on the same join column. */
  def edges(spark: SparkSession, pages: Dataset[WebPage]): Dataset[LinkEdge] = {
    import spark.implicits._
    pages.flatMap { p =>
      val dist = p.markers.get(graft.model.Marks.DISTANCE).map(_.toInt).getOrElse(0)
      p.outlinks.iterator.map { case (toUrl, anchor) =>
        LinkEdge(
          key = UrlUtil.uuid3(toUrl),
          in = p.url,
          out = toUrl,
          anchor = anchor,
          score = p.score,
          distance = dist,
          batchId = p.batchId)
      }
    }
  }

  /** Per-target inlink aggregates over the edge table (anchor-text /
    * graph-analytics query surface). */
  def inlinkStats(edges: Dataset[LinkEdge]): DataFrame =
    edges.groupBy(col("out"))
      .agg(
        count(lit(1)).as("n_inlinks"),
        countDistinct(col("in")).as("n_sources"),
        round(sum(col("score")), 3).as("inbound_score"),
        min(col("distance")).as("min_distance"))
      .orderBy(col("out"))

  /** FrontierJob: create a bare UNFETCHED frontier row for every edge
    * target not already in the store — putIfAbsent semantics via an
    * anti-join on key (exact; a bloom prefilter can front it at scale, see
    * DbUpdateJob.mergeSeenNewPages). Returns only the NEW rows, ready to
    * append as a snapshot. */
  def frontier(spark: SparkSession, edges: Dataset[LinkEdge],
      existing: Dataset[WebPage], conf: CrawlConfig, curTime: Long,
      round: Int = 0): Dataset[WebPage] = {
    import spark.implicits._
    val schedule = FetchSchedule(conf)
    val opic = ScoringFilter(conf)
    val targets = edges
      .groupByKey(_.key)
      .mapGroups { (key, it) =>
        // one candidate per key: keep the closest-to-seed edge (the
        // reference's putIfAbsent keeps whichever arrives first; closest
        // distance is the deterministic choice)
        val best = it.minBy(e => (e.distance, e.out))
        (key, best.out)
      }
    val existingKeys = existing.select(col("key")).distinct()
    targets.toDF("key", "url")
      .join(existingKeys, Seq("key"), "left_anti")
      .as[(String, String)]
      .map { case (key, url) =>
        var p = WebPage(url = url, key = key,
          status = graft.model.CrawlStatus.UNFETCHED, round = round)
        p = schedule.initializeSchedule(p, curTime)
        opic.initialScore(p)
      }
  }
}

package graft.score

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

import graft.crawl.CrawlConfig
import graft.model.WebPage
import graft.url.UrlUtil

/** The pluggable scoring extension point (reference:
  * scoring/ScoringFilter.java + the ScoringFilters registry) — the H-surface
  * trait that lets a user swap the scoring policy by CONFIG
  * (`scoringFilterClass`) without touching the Injector/Generator/DbUpdate
  * call sites, exactly like the FetchSchedule/Protocol traits.
  *
  * Hook-for-hook with the reference interface: injectedScore, initialScore,
  * generatorSortValue, distributeScoreToOutlinks, updateScore, indexerScore.
  * Implementations must be pure row transforms (they run inside executor
  * closures and inside the refsim oracle).
  */
trait ScoringFilter extends Serializable {

  /** Inject: score/cash seeding of a seed row. */
  def injectedScore(page: WebPage): WebPage

  /** A page discovered by updatedb gets its starting score. */
  def initialScore(page: WebPage): WebPage

  /** Generate priority (the fetchlist sort key). */
  def generatorSortValue(page: WebPage, initSort: Float): Float

  /** Map-side outlink scoring during updatedb; returns the scored outlink
    * data and the (possibly mutated) source page. */
  def distributeScoreToOutlinks(fromUrl: String, page: WebPage,
      scoreData: Seq[ScoreDatum], allCount: Int): (Seq[ScoreDatum], WebPage)

  /** Reduce-side score merge from the inlinked score data. */
  def updateScore(page: WebPage, inlinked: Seq[ScoreDatum]): WebPage

  /** Index-time boost for the docs sink. */
  def indexerScore(page: WebPage, initScore: Float): Float

  /** Columnar twin of [[indexerScore]] for the index doc chain
    * (IndexerJob builds documents as column transforms, so the boost must
    * be an expression to stay inside whole-stage codegen). MUST compute the
    * same value from the doc columns that [[indexerScore]] computes from
    * the row — ScoringFilterSpec pins the parity. */
  def indexerBoostCol(spark: SparkSession, url: Column, score: Column,
      initBoost: Column): Column
}

object ScoringFilter {

  /** Config-driven resolution (the FetchScheduleFactory pattern; reference
    * ScoringFilters resolves plugin.includes the same way). A comma list
    * ("opic,tld") builds an ordered chain, mirroring the reference's
    * ScoringFilters.java running every active plugin in order. */
  def apply(conf: CrawlConfig): ScoringFilter = {
    val names = conf.scoringFilterClass.split(",").map(_.trim).filter(_.nonEmpty)
    require(names.nonEmpty, "scoringFilterClass must name at least one filter")
    val filters = names.map {
      case "opic" => OpicScoring(conf)
      case "link" => LinkAnalysisScoring(conf)
      case "tld" => TldScoring(conf, conf.tldBoosts)
      case other => throw new IllegalArgumentException(
        s"unknown scoring filter '$other' (expected opic | link | tld)")
    }
    if (filters.length == 1) filters.head else ScoringFilterChain(filters.toSeq)
  }
}

/** Ordered composition — each hook folds through every member, exactly the
  * reference's ScoringFilters loop (scoring/ScoringFilters.java). */
case class ScoringFilterChain(filters: Seq[ScoringFilter]) extends ScoringFilter {
  require(filters.nonEmpty)
  override def injectedScore(page: WebPage): WebPage =
    filters.foldLeft(page)((p, f) => f.injectedScore(p))
  override def initialScore(page: WebPage): WebPage =
    filters.foldLeft(page)((p, f) => f.initialScore(p))
  override def generatorSortValue(page: WebPage, initSort: Float): Float =
    filters.foldLeft(initSort)((s, f) => f.generatorSortValue(page, s))
  override def distributeScoreToOutlinks(fromUrl: String, page: WebPage,
      scoreData: Seq[ScoreDatum], allCount: Int): (Seq[ScoreDatum], WebPage) =
    filters.foldLeft((scoreData, page)) { case ((sd, p), f) =>
      f.distributeScoreToOutlinks(fromUrl, p, sd, allCount)
    }
  override def updateScore(page: WebPage, inlinked: Seq[ScoreDatum]): WebPage =
    filters.foldLeft(page)((p, f) => f.updateScore(p, inlinked))
  override def indexerScore(page: WebPage, initScore: Float): Float =
    filters.foldLeft(initScore)((s, f) => f.indexerScore(page, s))
  override def indexerBoostCol(spark: SparkSession, url: Column,
      score: Column, initBoost: Column): Column =
    filters.foldLeft(initBoost)((b, f) => f.indexerBoostCol(spark, url, score, b))
}

/** Link-analysis scoring (reference:
  * plugin/scoring-link/.../LinkAnalysisScoringFilter.java): the page score
  * is produced OFFLINE by a link-analysis job (e.g. the LinkDb surface);
  * the crawl loop itself neither seeds nor propagates cash. New pages start
  * at 0, generate priority multiplies the stored score into the init sort,
  * and the indexer boost is the normalized stored score.
  */
case class LinkAnalysisScoring(conf: CrawlConfig) extends ScoringFilter {
  override def injectedScore(page: WebPage): WebPage = page
  override def initialScore(page: WebPage): WebPage = page.copy(score = 0.0f)
  override def generatorSortValue(page: WebPage, initSort: Float): Float =
    page.score * initSort
  override def distributeScoreToOutlinks(fromUrl: String, page: WebPage,
      scoreData: Seq[ScoreDatum], allCount: Int): (Seq[ScoreDatum], WebPage) =
    (scoreData, page)
  override def updateScore(page: WebPage, inlinked: Seq[ScoreDatum]): WebPage = page
  override def indexerScore(page: WebPage, initScore: Float): Float =
    conf.linkAnalysisNormalizedScore * page.score
  override def indexerBoostCol(spark: SparkSession, url: Column,
      score: Column, initBoost: Column): Column =
    (lit(conf.linkAnalysisNormalizedScore) * score).cast("double")
}

/** TLD boosting (reference: plugin/tld/.../TLDScoringFilter.java): a
  * crawl-neutral filter whose only effect is an index-time boost by the
  * page's public-suffix TLD (the reference multiplies the boost attributes
  * of the doc's tld field; suffix boosts default to 1.0). */
case class TldScoring(conf: CrawlConfig,
    boosts: Map[String, Float] = Map.empty) extends ScoringFilter {
  override def injectedScore(page: WebPage): WebPage = page
  override def initialScore(page: WebPage): WebPage = page
  override def generatorSortValue(page: WebPage, initSort: Float): Float = initSort
  override def distributeScoreToOutlinks(fromUrl: String, page: WebPage,
      scoreData: Seq[ScoreDatum], allCount: Int): (Seq[ScoreDatum], WebPage) =
    (scoreData, page)
  override def updateScore(page: WebPage, inlinked: Seq[ScoreDatum]): WebPage = page
  override def indexerScore(page: WebPage, initScore: Float): Float = {
    // suffix walk, not the last label — "co.uk" boosts as "co.uk" (the
    // reference reads the tld doc field TLDIndexingFilter built from
    // URLUtil.getDomainSuffix); unknown suffix -> boost 1.0
    val tld = UrlUtil.getDomainSuffix(page.url)
    if (tld == null) initScore else initScore * boosts.getOrElse(tld, 1.0f)
  }
  override def indexerBoostCol(spark: SparkSession, url: Column,
      score: Column, initBoost: Column): Column = {
    // graft_tld is the same suffix walk the row path runs (native codegen
    // expression); a null tld falls through every when() to factor 1.0
    val tld = graft.functions.GraftFunctions.tldOf(spark, url)
    val factor = boosts.foldLeft(lit(1.0)) { case (acc, (k, v)) =>
      when(tld === lit(k), lit(v.toDouble)).otherwise(acc)
    }
    initBoost * factor
  }
}

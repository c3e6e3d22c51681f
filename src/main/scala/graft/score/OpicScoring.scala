package graft.score

import graft.crawl.CrawlConfig
import graft.model.WebPage
import graft.url.UrlUtil

/** Edge message carrying cash from a page to one outlink target
  * (reference: src/main/java/org/apache/nutch/scoring/ScoreDatum.java).
  * `url` is the TARGET while shuffling; the mapper swaps it to the SOURCE
  * before emitting (DbUpdateMapper.java:90-95), which is what the reducer
  * stores as the inlink. We model both explicitly.
  */
case class ScoreDatum(
    score: Float,
    url: String, // source url (inlink) once emitted
    anchor: String,
    fetchTime: Long,
    distance: Int)

/** Online Page Importance Computation scoring, per the reference's
  * scoring-opic plugin (plugin/scoring-opic/.../OPICScoringFilter.java).
  * Each page carries a `score` and a `cash` balance; fetching a page
  * distributes its cash equally over its outlinks (internal/external
  * factors), resetting cash to 0; updatedb adds the sum of incoming cash to
  * both score and cash.
  */
case class OpicScoring(conf: CrawlConfig) extends ScoringFilter {

  /** Inject: cash := injected score (OPICScoringFilter.injectedScore:80-85). */
  override def injectedScore(page: WebPage): WebPage = page.copy(cash = page.score)

  /** New page discovered by updatedb: score = cash = 1.0
    * (OPICScoringFilter.initialScore:88-97). */
  override def initialScore(page: WebPage): WebPage = page.copy(score = 1.0f, cash = 1.0f)

  /** Generate priority = the page score (OPICScoringFilter.generatorSortValue). */
  override def generatorSortValue(page: WebPage, initSort: Float): Float = page.score

  /** Per-outlink cash distribution: cash/outdeg scaled by the internal or
    * external link factor; the page's cash resets to zero
    * (OPICScoringFilter.distributeScoreToOutlinks:124-158). Returns the
    * scored outlink data and the updated page.
    */
  override def distributeScoreToOutlinks(fromUrl: String, page: WebPage,
      scoreData: Seq[ScoreDatum], allCount: Int): (Seq[ScoreDatum], WebPage) = {
    val cash = page.cash
    if (cash == 0f) return (scoreData, page)
    val scoreUnit = cash / allCount
    val internalScore = scoreUnit * conf.internalScoreFactor
    val externalScore = scoreUnit * conf.externalScoreFactor
    val fromHost = UrlUtil.tryParse(fromUrl).map(_.host).orNull
    val scored = scoreData.map { sd =>
      val toHost = UrlUtil.tryParse(sd.url).map(_.host).orNull
      val s =
        if (toHost != null && fromHost != null && toHost.equalsIgnoreCase(fromHost)) internalScore
        else externalScore
      sd.copy(score = s)
    }
    (scored, page.copy(cash = 0.0f))
  }

  /** updatedb merge: score += sum of inlinked cash; cash += score
    * (OPICScoringFilter.updateScore:105-122). */
  override def updateScore(page: WebPage, inlinked: Seq[ScoreDatum]): WebPage = {
    var score = page.score
    inlinked.foreach(sd => score += sd.score)
    page.copy(score = score, cash = page.cash + score)
  }

  /** Indexer boost = score^power * initScore — the OPIC dampening
    * (OPICScoringFilter.indexerScore, indexer.score.power, default 0.5). */
  override def indexerScore(page: WebPage, initScore: Float): Float =
    math.pow(page.score.toDouble, conf.indexerScorePower.toDouble).toFloat * initScore

  override def indexerBoostCol(spark: org.apache.spark.sql.SparkSession,
      url: org.apache.spark.sql.Column, score: org.apache.spark.sql.Column,
      initBoost: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.pow
    pow(score.cast("double"), conf.indexerScorePower.toDouble) * initBoost
  }
}

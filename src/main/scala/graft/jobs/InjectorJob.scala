package graft.jobs

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.crawl.CrawlConfig
import graft.model.{CrawlStatus, Marks, WebPage}
import graft.score.ScoringFilter
import graft.url.{RegexUrlFilter, UrlNormalizers, UrlUtil}

/** Seed injection: text lines `url[\t k=v]*` become frontier rows
  * (reference: crawl/InjectorJob.UrlMapper, InjectorJob.java:102-186).
  * Reserved metadata keys `nutch.score` and `nutch.fetchInterval` override
  * the defaults; other k=v pairs land in the metadata map. A map-only job —
  * in Spark a single narrow `flatMap`, no shuffle.
  */
object InjectorJob {

  val NutchScoreKey = "nutch.score"
  val NutchFetchIntervalKey = "nutch.fetchInterval"

  /** Pure per-line row builder, shared with the refsim oracle. Returns None
    * for comments, blanks and filtered urls. */
  def buildRow(line: String, conf: CrawlConfig, curTime: Long,
      filter: RegexUrlFilter): Option[WebPage] = {
    var url = line.trim
    if (url.isEmpty || url.startsWith("#")) return None

    var customScore = -1f
    var customInterval = conf.fetchIntervalDefault
    var metadata = Map.empty[String, String]
    if (url.contains("\t")) {
      val splits = url.split("\t")
      url = splits(0)
      splits.iterator.drop(1).foreach { s =>
        val eq = s.indexOf('=')
        if (eq != -1) {
          val k = s.substring(0, eq)
          val v = s.substring(eq + 1)
          k match {
            case NutchScoreKey =>
              try customScore = v.toFloat catch { case _: NumberFormatException => }
            case NutchFetchIntervalKey =>
              try customInterval = v.toInt catch { case _: NumberFormatException => }
            case _ => metadata += (k -> v)
          }
        }
      }
    }

    url = UrlNormalizers.normalize(url, UrlNormalizers.ScopeInject)
    if (url == null) return None
    url = filter.filter(url)
    if (url == null) return None

    val score = if (customScore != -1f) customScore else conf.scoreInjected
    val opic = ScoringFilter(conf)
    val page = opic.injectedScore(WebPage(
      url = url,
      key = UrlUtil.uuid3(url),
      status = CrawlStatus.UNFETCHED,
      fetchTime = curTime,
      fetchInterval = customInterval,
      score = score,
      metadata = metadata,
      markers = Map(Marks.DISTANCE -> "0", Marks.INJECT -> "y")))
    Some(page)
  }

  def inject(spark: SparkSession, seedLines: Dataset[String], conf: CrawlConfig,
      curTime: Long): Dataset[WebPage] = {
    import spark.implicits._
    val filter = if (conf.useDefaultUrlFilter) RegexUrlFilter.default else RegexUrlFilter.acceptAll
    val c = conf
    val t = curTime
    seedLines.flatMap(line => buildRow(line, c, t, filter))
  }

  /** A1: seed *file* scan — `spark.read.textFile(seedDir)` feeding the same
    * row builder (the reference's FileInputFormat path). */
  def injectFromFile(spark: SparkSession, seedPath: String, conf: CrawlConfig,
      curTime: Long): Dataset[WebPage] =
    inject(spark, spark.read.textFile(seedPath), conf, curTime)
}

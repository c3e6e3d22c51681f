package graft
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship: a full 2-round crawl (inject -> generate -> fetch+parse ->
    * updatedb, OPIC scoring, politeness, snapshot commits) over a freshly
    * synthesized image+caption universe, returning per-host frontier stats
    * (SURVEY.md §7.3 minimum end-to-end slice).
    */
  def entry(spark: SparkSession): DataFrame = {
    import graft.crawl.{Crawl, CrawlConfig}
    import graft.images.ImageSynth
    import graft.site.PhashOutlinks

    val nPages = 200L
    val nHosts = 8
    val conf = CrawlConfig(fetchIntervalDefault = 0, numPartitions = 4,
      fetcherServerDelayMs = 100, topN = 25)
    val dir = java.nio.file.Files.createTempDirectory("graft-entry").toString
    val images = ImageSynth.imagesDf(spark, nPages, nHosts, partitions = 4)
    val crawl = new Crawl(spark, dir, images, conf, PhashOutlinks(nPages, nHosts, 3))
    val seeds = (0 until 4).map(i => ImageSynth.urlOf(i, nHosts))
    crawl.run(2, seeds, collectStats = false)
    graft.jobs.HostDbJob.hostStats(spark,
      crawl.table.currentView(spark).drop("snapshot_id"))
  }

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Queries.oracles
}

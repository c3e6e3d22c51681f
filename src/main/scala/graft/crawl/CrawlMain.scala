package graft.crawl

import org.apache.spark.sql.SparkSession

import graft.images.ImageSynth
import graft.jobs.ReadDbJob
import graft.site.PhashOutlinks

/** spark-submit CLI mirroring the reference's `bin/nutch` tool surface
  * (SURVEY.md §3.2): inject / generate / fetch / updatedb run individual
  * stages against a table path; `crawl` runs the full loop; `readdb`
  * prints stats or a dump. Example:
  *
  * {{{
  * spark-submit --class graft.crawl.CrawlMain <jar> \
  *   crawl --table /data/frontier --images /data/images \
  *         --pages 1000000 --hosts 20000 --depth 3 --topn 50000 --seeds 1000
  * spark-submit --class graft.crawl.CrawlMain <jar> readdb --table /data/frontier --stats
  * }}}
  */
object CrawlMain {

  /** FS-agnostic existence probe (works on local, HDFS, object stores). */
  private def hadoopExists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  private def arg(args: Array[String], name: String): Option[String] =
    args.sliding(2).collectFirst { case Array(k, v) if k == s"--$name" => v }
  private def flag(args: Array[String], name: String): Boolean =
    args.contains(s"--$name")

  def main(args: Array[String]): Unit = {
    if (args.isEmpty) {
      System.err.println("usage: CrawlMain <inject|generate|fetch|updatedb|crawl|readdb|hostdb|hostinject|readhostdb|linkdb|compact|cleandb|index|indexdedup|indexclean|parsecheck|indexcheck|warcexport|warcimport|arcimport|cdxindex|dmozparser|sitemapparse|robots> [--table d] [--images d] ...")
      sys.exit(2)
    }
    val cmd = args.head
    if (cmd == "robots") { robotsCheck(args); return }
    val spark = SparkSession.builder()
      .appName(s"graft-$cmd")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val table = arg(args, "table").getOrElse("/tmp/graft-frontier")
    val imagesDir = arg(args, "images")
    val pages = arg(args, "pages").map(_.toLong).getOrElse(10000L)
    val hosts = arg(args, "hosts").map(_.toInt).getOrElse(math.max(16, (pages / 50).toInt))
    val depth = arg(args, "depth").map(_.toInt).getOrElse(1)
    val round = arg(args, "round").map(_.toInt).getOrElse(1)
    val topN = arg(args, "topn").map(_.toLong).getOrElse(0L)
    val nSeeds = arg(args, "seeds").map(_.toInt).getOrElse(10)
    val conf = CrawlConfig(numPartitions = spark.conf.get("spark.sql.shuffle.partitions").toInt,
      topN = topN, storingContent = !flag(args, "no-content"))

    def crawlOf(): Crawl = {
      val images = imagesDir match {
        case Some(d) => spark.read.parquet(d)
        case None =>
          val d = s"$table-images"
          if (!hadoopExists(spark, s"$d/_SUCCESS"))
            ImageSynth.writeImagesTable(spark, d, pages, hosts, partitions = conf.numPartitions)
          spark.read.parquet(d)
      }
      new Crawl(spark, table, images, conf, PhashOutlinks(pages, hosts, 4))
    }

    cmd match {
      case "inject" =>
        val seedsPath = arg(args, "seedsfile")
        val crawl = crawlOf()
        seedsPath match {
          case Some(p) =>
            import spark.implicits._
            crawl.table.append(graft.jobs.InjectorJob
              .injectFromFile(spark, p, conf, crawl.curTimeOf(0)).toDF(), 0, "inject")
          case None =>
            crawl.inject((0 until nSeeds).map(i => ImageSynth.urlOf(i.toLong, hosts)))
        }
      case "generate" => crawlOf().generate(round)
      case "fetch" => crawlOf().fetchAndParse(round)
      case "updatedb" => crawlOf().update(round)
      case "crawl" =>
        val stats = crawlOf().run(depth,
          (0 until nSeeds).map(i => ImageSynth.urlOf(i.toLong, hosts)))
        stats.foreach(s => println(
          s"round=${s.round} generated=${s.generated} fetched=${s.fetched} gone=${s.gone} " +
            s"redirected=${s.redirected} updated=${s.updated} new=${s.newPages}"))
      case "readdb" =>
        val t = new graft.table.SnapshotTable(table)
        val pagesDf = t.currentView(spark).drop("snapshot_id")
        if (flag(args, "stats")) {
          ReadDbJob.stats(pagesDf).show(false)
          ReadDbJob.statusCounts(pagesDf).show(false)
        } else {
          ReadDbJob.dump(pagesDf, arg(args, "regex")).show(50, truncate = false)
        }
      case "hostdb" =>
        val t = new graft.table.SnapshotTable(table)
        graft.jobs.HostDbJob.hostStats(spark, t.currentView(spark).drop("snapshot_id"))
          .show(100, truncate = false)
      case "hostinject" => // reference `bin/nutch hostinject` (HostInjectorJob)
        arg(args, "hostsfile") match {
          case Some(p) =>
            val fresh = graft.jobs.HostDbJob.injectHosts(spark, spark.read.textFile(p))
            val dbDir = s"$table-hostdb"
            // the reference UPSERTS into the host store — merge with any
            // existing hostdb instead of replacing it; write aside then
            // swap because the merge reads the directory it replaces.
            // Existence goes through the Hadoop FS (a java.io.File probe is
            // always false on HDFS/S3 and would silently degrade the
            // upsert to a replace, destroying existing host metadata)
            val merged =
              if (hadoopExists(spark, s"$dbDir/_SUCCESS"))
                graft.jobs.HostDbJob.mergeHosts(spark.read.parquet(dbDir), fresh)
              else fresh
            merged.write.mode("overwrite").parquet(s"$dbDir.tmp")
            val fs = org.apache.hadoop.fs.FileSystem.get(
              spark.sparkContext.hadoopConfiguration)
            fs.delete(new org.apache.hadoop.fs.Path(dbDir), true)
            fs.rename(new org.apache.hadoop.fs.Path(s"$dbDir.tmp"),
              new org.apache.hadoop.fs.Path(dbDir))
          case None =>
            System.err.println("usage: hostinject --hostsfile <file> [--table d]")
            sys.exit(2)
        }
      case "readhostdb" => // reference `bin/nutch readhostdb` (HostDbReader)
        graft.jobs.HostDbJob.readHostDb(
            spark.read.parquet(s"$table-hostdb"), arg(args, "key"))
          .show(100, truncate = false)
      case "linkdb" =>
        import spark.implicits._
        val t = new graft.table.SnapshotTable(table)
        val pagesDs = t.currentView(spark).drop("snapshot_id").as[graft.model.WebPage]
        val edges = graft.jobs.LinkDb.edges(spark, pagesDs)
        arg(args, "out") match {
          case Some(out) => edges.toDF().write.mode("overwrite").parquet(out)
          case None => graft.jobs.LinkDb.inlinkStats(edges).show(50, truncate = false)
        }
      case "compact" =>
        new graft.table.SnapshotTable(table).compact(spark, round)
      case "warcexport" => // fetched pages -> WARC 1.0 archive files
        arg(args, "out") match {
          case Some(out) =>
            val t = new graft.table.SnapshotTable(table)
            val fetched = t.currentView(spark).drop("snapshot_id")
              .where(org.apache.spark.sql.functions.col("status") ===
                graft.model.CrawlStatus.FETCHED)
            val n = graft.warc.WarcIO.write(fetched, out,
              gzip = flag(args, "gzip"))
            println(s"warcexport: $n records -> $out")
          case None =>
            System.err.println("usage: warcexport --table d --out <dir> [--gzip]")
            sys.exit(2)
        }
      case "cleandb" => // reference `bin/nutch cleandb` (DbCleanerJob deleteSchema)
        new graft.table.SnapshotTable(table).drop()
        println(s"cleandb: dropped $table")
      case "index" => // reference `bin/nutch index` (IndexingJob -> docs table)
        arg(args, "out") match {
          case Some(out) =>
            val t = new graft.table.SnapshotTable(table)
            graft.jobs.IndexerJob.index(spark,
              t.currentView(spark).drop("snapshot_id"), out,
              batchId = arg(args, "batch"))
            println(s"index: docs -> $out")
          case None =>
            System.err.println("usage: index --table d --out <dir> [--batch id]")
            sys.exit(2)
        }
      case "indexdedup" => // reference `bin/nutch solrdedup` (SolrDeleteDuplicates)
        arg(args, "docs") match {
          case Some(d) =>
            val docs = spark.read.parquet(d)
            graft.jobs.IndexerJob.deleteDuplicates(docs)
              .write.mode("overwrite").parquet(d + "-deduped")
            // both counts are parquet-footer metadata reads — the dedup
            // window runs exactly once (in the write above)
            val dups = docs.count() - spark.read.parquet(d + "-deduped").count()
            println(s"indexdedup: $dups duplicates removed -> $d-deduped")
          case None =>
            System.err.println("usage: indexdedup --docs <dir>"); sys.exit(2)
        }
      case "indexclean" => // reference `bin/nutch idxclean` (CleaningJob)
        arg(args, "docs") match {
          case Some(d) =>
            val t = new graft.table.SnapshotTable(table)
            val pages = t.currentView(spark).drop("snapshot_id")
            val filters = arg(args, "blockregex")
              .map(re => Seq(graft.jobs.UrlRegexCleaningFilter(Seq(re))))
              .getOrElse(Seq.empty)
            graft.jobs.IndexerJob.clean(spark.read.parquet(d), pages, filters)
              .write.mode("overwrite").parquet(d + "-cleaned")
            println(s"indexclean: -> $d-cleaned")
          case None =>
            System.err.println("usage: indexclean --docs <dir> [--table d] [--blockregex re]")
            sys.exit(2)
        }
      case "parsecheck" => // reference `bin/nutch parsechecker` (ParserChecker)
        val url = arg(args, "url").getOrElse {
          System.err.println("usage: parsecheck --url <u> [--hosts n]"); sys.exit(2); ""
        }
        val row = ImageSynth.rowForUrl(url, 24, 24)
        val page = graft.model.WebPage(url = url,
          status = graft.model.CrawlStatus.FETCHED, content = row.bytes,
          metadata = Map("caption" -> row.caption),
          markers = Map(graft.model.Marks.FETCH -> "check"))
        val parsed = graft.jobs.ParserJob.parsePage(page, conf,
          PhashOutlinks(pages, hosts, 4), graft.url.RegexUrlFilter.acceptAll, "check")
        println(s"url: ${parsed.url}")
        println(s"title: ${parsed.title}")
        println(s"text: ${parsed.text}")
        println(s"signature: ${Option(parsed.signature).map(_.map("%02x".format(_)).mkString).orNull}")
        println(s"phash: ${parsed.metadata.getOrElse(graft.jobs.ParserJob.PhashMeta, "-")}")
        println(s"outlinks (${parsed.outlinks.size}):")
        parsed.outlinks.toSeq.sortBy(_._1).foreach { case (u, a) => println(s"  $u\t$a") }
      case "indexcheck" => // reference `bin/nutch indexchecker` (IndexingFiltersChecker)
        import spark.implicits._
        val url = arg(args, "url").getOrElse {
          System.err.println("usage: indexcheck --url <u>"); sys.exit(2); ""
        }
        val row = ImageSynth.rowForUrl(url, 24, 24)
        val page = graft.model.WebPage(url = url,
          status = graft.model.CrawlStatus.FETCHED, content = row.bytes,
          metadata = Map("caption" -> row.caption),
          markers = Map(graft.model.Marks.FETCH -> "check"))
        val parsed = graft.jobs.ParserJob.parsePage(page, conf,
          PhashOutlinks(pages, hosts, 4), graft.url.RegexUrlFilter.acceptAll, "check")
        graft.jobs.IndexerJob.buildDocs(Seq(parsed).toDF(),
            extraFilters = Seq(graft.jobs.MoreIndexingFilter(),
              graft.jobs.TldIndexingFilter(), graft.jobs.PhashIndexingFilter()))
          .show(truncate = false)
      case "dmozparser" => // reference `bin/nutch parsedmoz` (tools/DmozParser)
        arg(args, "rdf") match {
          case Some(rdf) =>
            val seeds = graft.jobs.SeedTools.parseDmozRdf(spark, rdf,
              subsetDenom = arg(args, "subset").map(_.toInt).getOrElse(1),
              includeAdult = flag(args, "include-adult"),
              skew = arg(args, "skew").map(_.toInt).getOrElse(0),
              topicPattern = arg(args, "topic"))
            arg(args, "out") match {
              case Some(out) => // url-per-line seed files, ready for inject
                seeds.map(_.url)(org.apache.spark.sql.Encoders.STRING)
                  .write.mode("overwrite").text(out)
                println(s"dmozparser: seeds -> $out")
              case None => // reference default: urls to stdout
                seeds.collect().foreach(s => println(s.url))
            }
          case None =>
            System.err.println("usage: dmozparser --rdf <file-or-dir> " +
              "[--out <dir>] [--subset N] [--skew N] [--topic regex] [--include-adult]")
            sys.exit(2)
        }
      case "cdxindex" => // WARC archive dir -> CDX lookup index
        (arg(args, "in"), arg(args, "out")) match {
          case (Some(in), Some(out)) =>
            graft.warc.CdxIO.writeCdxText(graft.warc.CdxIO.index(spark, in), out)
            println(s"cdxindex: $in -> $out")
          case _ =>
            System.err.println("usage: cdxindex --in <warc dir> --out <dir>")
            sys.exit(2)
        }
      case "sitemapparse" => // sitemap payloads -> seed urls (Nutch 1.x SitemapProcessor role)
        arg(args, "in") match {
          case Some(in) =>
            val es = graft.jobs.Sitemaps.parseSitemaps(spark, in)
            arg(args, "out") match {
              case Some(out) => // url-per-line seed files, ready for inject
                es.filter(!_.isIndex).map(_.url)(org.apache.spark.sql.Encoders.STRING)
                  .write.mode("overwrite").text(out)
                println(s"sitemapparse: seeds -> $out")
              case None =>
                es.collect().foreach(e =>
                  println((if (e.isIndex) "index:\t" else "") + e.url))
            }
          case None =>
            System.err.println("usage: sitemapparse --in <dir> [--out <dir>]")
            sys.exit(2)
        }
      case "warcimport" | "arcimport" => // archive dump -> fetched frontier rows
        // arcimport = the reference's ArcSegmentCreator role (ARC archive ->
        // crawl segment): legacy .arc/.arc.gz files land as fetched pages
        // through the identical WarcRow surface
        arg(args, "in") match {
          case Some(in) =>
            import spark.implicits._
            val crawl = crawlOf()
            val rows =
              if (cmd == "arcimport") graft.warc.WarcIO.readArc(spark, in)
              else graft.warc.WarcIO.read(spark, in)
            val pages = graft.warc.WarcIO.toPages(
              rows, batchId = s"$cmd-$round", round = round)
              .toDF().persist()
            // append returns the new snapshot id, not a row count — count
            // the persisted frame so the decode doesn't run twice
            val n = pages.count()
            crawl.table.append(pages, round, "fetch")
            pages.unpersist()
            println(s"$cmd: $n pages <- $in")
          case None =>
            System.err.println(s"usage: $cmd --table d --in <dir>")
            sys.exit(2)
        }
      case other =>
        System.err.println(s"unknown command: $other"); sys.exit(2)
    }
    spark.stop()
  }

  /** reference: RobotRulesParser.main (RobotRulesParser.java:145-173) —
    * parse a robots.txt file, test URLs (1/line) against it. Driver-only,
    * no Spark session needed. */
  private def robotsCheck(args: Array[String]): Unit =
    (arg(args, "robotsfile"), arg(args, "urlfile"), arg(args, "agents")) match {
      case (Some(rf), Some(uf), Some(agents)) =>
        val content = new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(rf)), java.nio.charset.StandardCharsets.UTF_8)
        val rules = graft.site.RobotsTxtParser.parse("cli", content, agents)
        val src = scala.io.Source.fromFile(uf)
        try src.getLines().map(_.trim).filter(_.nonEmpty).foreach { u =>
          println((if (rules.isAllowed(u)) "allowed" else "not allowed") + ":\t" + u)
        } finally src.close()
        rules.sitemaps.foreach(sm => println(s"sitemap:\t$sm"))
      case _ =>
        System.err.println(
          "usage: robots --robotsfile <robots.txt> --urlfile <urls> --agents <a,b>")
        sys.exit(2)
    }
}

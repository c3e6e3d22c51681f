package graft.api

import org.apache.spark.sql.SparkSession

import graft.crawl.{Crawl, CrawlConfig}
import graft.images.ImageSynth
import graft.jobs.{HostDbJob, IndexerJob, LinkDb, ReadDbJob}
import graft.model.WebPage
import graft.site.PhashOutlinks
import graft.table.SnapshotTable

/** One submitted unit of work (the reference's NutchTool contract,
  * util/NutchTool.java): `run` receives the request's args map and a
  * `stopped` probe it must consult at stage boundaries (the reference's
  * "stop at next checkpoint" semantics, JobWorker.java:72-80).
  */
trait GraftTool {
  def run(args: Map[String, Any], stopped: () => Boolean): Map[String, Any]
}

/** Maps job types to tools over the crawl stage functions — the reference's
  * api/impl/JobFactory.java:38-48 (INJECT/GENERATE/FETCH/PARSE/UPDATEDB/
  * INDEX/READDB) with PARSE inlined into FETCH (as the reference itself does
  * with `fetcher.parse=true`) and the Spark-only CRAWL/COMPACT/HOSTDB/LINKDB
  * tools from the CLI surface added.
  */
final class JobFactory(spark: SparkSession) {

  import JobFactory._

  def createToolByType(jobType: String, conf: CrawlConfig): Option[GraftTool] = {
    val mk: Option[(Map[String, Any], () => Boolean) => Map[String, Any]] =
      jobType.toUpperCase match {
        case "INJECT" => Some((a, _) => inject(a, conf))
        case "GENERATE" => Some((a, _) => stage(a, conf, "generate"))
        case "FETCH" | "PARSE" => Some((a, _) => stage(a, conf, "fetch"))
        case "UPDATEDB" => Some((a, _) => stage(a, conf, "update"))
        case "CRAWL" => Some((a, st) => crawl(a, conf, st))
        case "READDB" => Some((a, _) => readdb(a))
        case "INDEX" => Some((a, _) => index(a, conf))
        case "HOSTDB" => Some((a, _) => hostdb(a))
        case "LINKDB" => Some((a, _) => linkdb(a))
        case "LINKRANK" => Some((a, _) => linkrank(a))
        case "COMPACT" => Some((a, _) => compact(a))
        case _ => None
      }
    mk.map(f => new GraftTool {
      def run(args: Map[String, Any], stopped: () => Boolean): Map[String, Any] =
        f(args, stopped)
    })
  }

  private def crawlOf(args: Map[String, Any], conf: CrawlConfig): Crawl = {
    val table = str(args, "table").getOrElse("/tmp/graft-frontier")
    val pages = long(args, "pages").getOrElse(10000L)
    val hosts = int(args, "hosts").getOrElse(math.max(16, (pages / 50).toInt))
    val images = str(args, "images") match {
      case Some(d) => spark.read.parquet(d)
      case None =>
        val d = s"$table-images"
        // serialize check-then-write per table path: two concurrently
        // submitted jobs targeting the same table must not race the
        // synthesized image-table write
        val lock = JobFactory.imageTableLocks
          .computeIfAbsent(d, _ => new Object)
        lock.synchronized {
          if (!new java.io.File(d, "_SUCCESS").exists())
            ImageSynth.writeImagesTable(spark, d, pages, hosts, partitions = conf.numPartitions)
        }
        spark.read.parquet(d)
    }
    new Crawl(spark, table, images, conf, PhashOutlinks(pages, hosts, 4))
  }

  private def seedsOf(args: Map[String, Any]): Seq[String] = args.get("seeds") match {
    case Some(xs: Seq[_]) => xs.map(_.toString)
    case _ =>
      val hosts = int(args, "hosts").getOrElse(16)
      (0 until int(args, "numSeeds").getOrElse(10)).map(i => ImageSynth.urlOf(i.toLong, hosts))
  }

  private def inject(args: Map[String, Any], conf: CrawlConfig): Map[String, Any] = {
    val crawl = crawlOf(args, conf)
    val n = str(args, "seedsfile") match {
      case Some(p) =>
        import spark.implicits._
        crawl.table.append(graft.jobs.InjectorJob
          .injectFromFile(spark, p, conf, crawl.curTimeOf(0)).toDF(), 0, "inject")
        crawl.table.currentView(spark).count()
      case None => crawl.inject(seedsOf(args)); crawl.table.currentView(spark).count()
    }
    Map("injected" -> n)
  }

  private def stage(args: Map[String, Any], conf: CrawlConfig, name: String): Map[String, Any] = {
    val crawl = crawlOf(args, conf)
    val round = int(args, "round").getOrElse(1)
    val sid = name match {
      case "generate" => crawl.generate(round)
      case "fetch" => crawl.fetchAndParse(round)
      case "update" => crawl.update(round)
    }
    Map("round" -> round, "snapshot" -> sid)
  }

  private def crawl(args: Map[String, Any], conf: CrawlConfig,
      stopped: () => Boolean): Map[String, Any] = {
    val c = crawlOf(args, conf)
    val depth = int(args, "depth").getOrElse(1)
    val seeds = seedsOf(args)
    // the round loop re-checks the stop flag between rounds — Crawl.run's
    // snapshot-resume logic makes each call pick up exactly where the last
    // left off, so a stopped job can be resubmitted and continue
    var rounds = 0
    var r = 1
    while (r <= depth && !stopped()) {
      c.run(r, seeds, collectStats = false)
      rounds = r
      r += 1
    }
    val stats = if (rounds > 0) c.statsOf(rounds) else null
    Map("depth" -> depth, "roundsCompleted" -> rounds,
      "lastRound" -> Option(stats).map(s => Map(
        "generated" -> s.generated, "fetched" -> s.fetched, "gone" -> s.gone,
        "updated" -> s.updated, "newPages" -> s.newPages)).orNull)
  }

  private def view(args: Map[String, Any]) = {
    val table = str(args, "table").getOrElse("/tmp/graft-frontier")
    new SnapshotTable(table).currentView(spark).drop("snapshot_id")
  }

  private def readdb(args: Map[String, Any]): Map[String, Any] = {
    val v = view(args)
    if (args.get("stats").exists(_ == true)) {
      val counts = ReadDbJob.statusCounts(v).collect()
        .map(r => r.get(0).toString -> r.getLong(1)).toMap
      Map("statusCounts" -> counts)
    } else {
      val limit = int(args, "limit").getOrElse(100)
      val rows = ReadDbJob.dump(v, str(args, "regex")).limit(limit).collect()
        .map(r => r.schema.fieldNames.zip(r.toSeq.map(jsonSafe)).toMap)
      Map("rows" -> rows.toSeq)
    }
  }

  private def index(args: Map[String, Any], conf: CrawlConfig): Map[String, Any] = {
    // the configured scoring policy drives the doc boost (reference
    // IndexingJob runs ScoringFilters.indexerScore), so a `link`/`tld`
    // config changes the index output, not just the crawl ordering
    val docs = IndexerJob.buildDocs(view(args), str(args, "batchId"),
      scorePower = conf.indexerScorePower.toDouble,
      scoring = Some(graft.score.ScoringFilter(conf)))
    val out = str(args, "out")
    out.foreach(p => docs.toDF().write.mode("overwrite").parquet(p))
    Map("docs" -> docs.count(), "out" -> out.orNull)
  }

  private def hostdb(args: Map[String, Any]): Map[String, Any] = {
    val rows = HostDbJob.hostStats(spark, view(args)).collect()
      .map(r => r.schema.fieldNames.zip(r.toSeq.map(jsonSafe)).toMap)
    Map("hosts" -> rows.toSeq)
  }

  private def linkdb(args: Map[String, Any]): Map[String, Any] = {
    import spark.implicits._
    val edges = LinkDb.edges(spark, view(args).as[WebPage])
    str(args, "out") match {
      case Some(p) => edges.toDF().write.mode("overwrite").parquet(p)
        Map("edges" -> spark.read.parquet(p).count(), "out" -> p)
      case None => Map("edges" -> edges.count())
    }
  }

  /** Offline link analysis over the frontier's own link graph: edges from
    * page outlinks → damped PageRank → optional `out` parquet dump and
    * optional write-back (`apply=true`) of the ranks into page scores as a
    * "linkrank" snapshot — after which a crawl configured with
    * `scoringFilterClass=link` generates by these ranks. The missing
    * producer half of the reference's scoring-link plugin. */
  private def linkrank(args: Map[String, Any]): Map[String, Any] = {
    import spark.implicits._
    val table = str(args, "table").getOrElse("/tmp/graft-frontier")
    val snap = new SnapshotTable(table)
    val pages = snap.currentView(spark).drop("snapshot_id").as[WebPage]
    val iters = int(args, "iterations").getOrElse(5)
    val ranks = LinkDb.linkRank(spark,
      LinkDb.edges(spark, pages).toDF(), "in", "out", iterations = iters)
    val nodes = ranks.count()
    val out = str(args, "out")
    out.foreach(p => ranks.write.mode("overwrite").parquet(p))
    val applied: Any =
      if (args.get("apply").contains(true)) {
        val round = snap.headSnapshot.map(_.round).getOrElse(0)
        snap.append(LinkDb.applyRanks(spark, pages, ranks).toDF(), round, "linkrank")
      } else null
    ranks.unpersist()
    Map("nodes" -> nodes, "iterations" -> iters,
      "applied" -> applied, "out" -> out.orNull)
  }

  private def compact(args: Map[String, Any]): Map[String, Any] = {
    val table = str(args, "table").getOrElse("/tmp/graft-frontier")
    val round = int(args, "round").getOrElse(0)
    new SnapshotTable(table).compact(spark, round)
    Map("compacted" -> true, "round" -> round)
  }
}

object JobFactory {

  private[api] val imageTableLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  // JSON numbers arrive as BigInt/Double/Long depending on the parser path
  // (scala BigInt extends java Number, so one branch covers them all)
  private[api] def long(args: Map[String, Any], k: String): Option[Long] =
    args.get(k).map {
      case n: Number => n.longValue
      case s: String => s.toLong
      case other => throw new IllegalArgumentException(s"$k: not a number: $other")
    }
  private[api] def int(args: Map[String, Any], k: String): Option[Int] =
    long(args, k).map(_.toInt)
  private[api] def str(args: Map[String, Any], k: String): Option[String] =
    args.get(k).collect { case s: String if s.nonEmpty => s }

  private[api] def jsonSafe(v: Any): Any = v match {
    case null => null
    case b: Array[Byte] => java.util.Base64.getEncoder.encodeToString(b)
    case m: Map[_, _] => m.map { case (k, x) => k.toString -> jsonSafe(x) }
    case s: Seq[_] => s.map(jsonSafe)
    case r: org.apache.spark.sql.Row =>
      r.schema.fieldNames.zip(r.toSeq.map(jsonSafe)).toMap
    case other => other
  }
}

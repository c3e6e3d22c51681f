package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.jobs.{IndexerJob, MetadataIndexingFilter, Subcollection,
  SubcollectionIndexingFilter, TldIndexingFilter}
import graft.model.{CrawlStatus, Marks, WebPage}
import graft.crawl.CrawlConfig
import graft.score.TldScoring
import graft.url.UrlUtil

/** The indexing-filter chain members ported this round: index-metadata,
  * subcollection and tld (reference plugin/index-metadata MetadataIndexer,
  * plugin/subcollection SubcollectionIndexingFilter + TestSubcollection
  * goldens, plugin/tld TLDIndexingFilter), plus the URLUtil.getDomainSuffix
  * walk they ride on. */
class IndexFiltersSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def page(key: String, url: String,
      metadata: Map[String, String] = Map.empty): WebPage =
    WebPage(key = key, url = url, status = CrawlStatus.FETCHED,
      title = "t", text = "x", markers = Map(Marks.PARSE -> "b1"), batchId = "b1")
      .copy(metadata = metadata)

  test("getDomainSuffix walks to the longest known suffix (URLUtil.java:148-166)") {
    assert(UrlUtil.getDomainSuffix("http://www.example.com/a") == "com")
    assert(UrlUtil.getDomainSuffix("http://a.b.news.co.uk/") == "co.uk")
    // the embedded list carries the third-level registry entry itself,
    // and the walk returns the longest (earliest) hit
    assert(UrlUtil.getDomainSuffix("http://shop.city.kawasaki.jp/") == "city.kawasaki.jp")
    assert(UrlUtil.getDomainSuffix("http://deep.sub.domain.com.br/x") == "com.br")
    // dotless host: the whole host is the only candidate
    assert(UrlUtil.getDomainSuffix("http://com/") == "com")
    // IP hosts and unknown suffixes yield null (the reference skips the field)
    assert(UrlUtil.getDomainSuffix("http://192.168.0.1/") == null)
    assert(UrlUtil.getDomainSuffix("http://weird.unknowntld/") == null)
    // IDN registry entries repaired from the reference XML's mojibake
    // ("`øksnes.no", "lea?gaviika.no") resolve as real suffixes
    assert(UrlUtil.getDomainSuffix("http://foo.øksnes.no/") == "øksnes.no")
    assert(UrlUtil.getDomainSuffix("http://bar.leaŋgaviika.no/") == "leaŋgaviika.no")
  }

  test("TldIndexingFilter indexes the public suffix; nulls where the walk fails") {
    val pages = Seq(
      page("k1", "http://a.b.news.co.uk/i"),
      page("k2", "http://weird.unknowntld/i"),
      page("k3", "http://192.168.0.1/i")).toDF()
    val docs = IndexerJob.buildDocs(pages, extraFilters = Seq(TldIndexingFilter()))
      .select("doc_key", "tld").collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(docs("k1").contains("co.uk"))
    assert(docs("k2").isEmpty)
    assert(docs("k3").isEmpty)
  }

  test("doc boost follows the configured scoring policy (IndexingJob runs indexerScore)") {
    val pages = Seq(page("k1", "http://example.org/i").copy(score = 4f)).toDF()
    def boost(scoring: Option[graft.score.ScoringFilter]): Double =
      IndexerJob.buildDocs(pages, scoring = scoring)
        .select("boost").collect().head.getDouble(0)
    // default (no policy): the OPIC score^0.5 dampening
    assert(boost(None) == 2.0)
    // link policy: normalized stored score, NOT the opic shape
    val link = graft.score.ScoringFilter(
      graft.crawl.CrawlConfig(scoringFilterClass = "link",
        linkAnalysisNormalizedScore = 0.25f))
    assert(boost(Some(link)) == 1.0)
    // opic,tld chain: sqrt(4) * org-boost 2.0
    val chain = graft.score.ScoringFilter(
      graft.crawl.CrawlConfig(scoringFilterClass = "opic,tld",
        tldBoosts = Map("org" -> 2.0f)))
    assert(boost(Some(chain)) == 4.0)
  }

  test("MetadataIndexingFilter splits tab-separated meta_<key> values (MetadataIndexer)") {
    val pages = Seq(
      page("k1", "http://a/1", Map("meta_keywords" -> "spark\tcrawl\tgraft",
        "meta_author" -> "ada")),
      page("k2", "http://a/2", Map("meta_author" -> "grace")),
      page("k3", "http://a/3")).toDF()
    val docs = IndexerJob.buildDocs(pages,
        extraFilters = Seq(MetadataIndexingFilter(Seq("keywords", "author"))))
      .select("doc_key", "meta_keywords", "meta_author").collect()
      .map(r => r.getString(0) -> (Option(r.getSeq[String](1)), Option(r.getSeq[String](2))))
      .toMap
    assert(docs("k1") == (Some(Seq("spark", "crawl", "graft")), Some(Seq("ada"))))
    assert(docs("k2") == (None, Some(Seq("grace"))))
    assert(docs("k3") == (None, None))
  }

  test("SubcollectionIndexingFilter matches the reference goldens (TestSubcollection)") {
    val coll = Subcollection("nutch", "nutch collection",
      whitelist = Seq("www.nutch.org", "www.apache.org"),
      blacklist = Seq("jpg", "www.apache.org/zecret/"))
    val other = Subcollection("img", "images", whitelist = Seq("img"))
    val pages = Seq(
      page("k1", "http://www.apache.org/index.html"),    // whitelist hit
      page("k2", "http://www.apache.org/zecret/index.html"), // blacklist rejects
      page("k3", "http://www.apache.org/img/image.jpg"),  // jpg rejects nutch, img accepts
      page("k4", "http://www.google.com/")).toDF()        // no match
    val docs = IndexerJob.buildDocs(pages,
        extraFilters = Seq(SubcollectionIndexingFilter(Seq(coll, other))))
      .select("doc_key", "subcollection").collect()
      .map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(docs("k1") == Seq("nutch collection"))
    assert(docs("k2").isEmpty)
    assert(docs("k3") == Seq("images"))
    assert(docs("k4").isEmpty)
  }

  test("PhashIndexingFilter + dropNearDupImages: one canonical doc per image cluster") {
    import graft.jobs.{ParserJob, PhashIndexingFilter}
    val pages = Seq(
      page("k1", "http://a/1", Map(ParserJob.PhashMeta -> "123456789")),
      page("k2", "http://a/2", Map(ParserJob.PhashMeta -> "123456789")), // exact dup
      page("k3", "http://a/3", // one bit off k1 -> same near-dup cluster
        Map(ParserJob.PhashMeta -> (123456789L ^ 2L).toString)),
      page("k4", "http://a/4", Map(ParserJob.PhashMeta -> "987654321098")),
      page("k5", "http://a/5")).toDF() // no phash (failed decode): passes through
    val docs = IndexerJob.buildDocs(pages, extraFilters = Seq(PhashIndexingFilter()))
    val kept = IndexerJob.dropNearDupImages(docs)
      .select("doc_key").collect().map(_.getString(0)).toSet
    assert(kept == Set("k1", "k4", "k5"))
  }

  test("parse persists the decoded payload's phash for downstream image dedup") {
    import graft.jobs.ParserJob
    import graft.images.ImageSynth
    val url = ImageSynth.urlOf(7, 3)
    val row = ImageSynth.rowForUrl(url, 16, 16)
    val p = WebPage(url = url, status = CrawlStatus.FETCHED, content = row.bytes,
      metadata = Map("caption" -> row.caption), markers = Map(Marks.FETCH -> "b-1"))
    val parsed = ParserJob.parsePage(p, graft.crawl.CrawlConfig(),
      graft.site.MapOutlinks(Map.empty), graft.url.RegexUrlFilter.acceptAll, "b-1")
    // the stored hash is the one recomputed from the DECODED pixels — which
    // for the lossless PNG path equals the table's phash
    assert(parsed.metadata(ParserJob.PhashMeta) == row.phash.toString)
  }

  test("deleteDuplicates keeps max boost, then latest fetch_time, then min key " +
      "(SolrDeleteDuplicates.java:55-82)") {
    import graft.jobs.UrlRegexCleaningFilter
    def doc(key: String, sig: String, boost: Double, t: Long) =
      (key, sig, boost, t)
    val docs = Seq(
      doc("a1", "s1", 2.0, 10L), // s1: a2 wins on boost
      doc("a2", "s1", 3.0, 5L),
      doc("b1", "s2", 1.0, 10L), // s2: boost tie -> b2's later fetch_time wins
      doc("b2", "s2", 1.0, 20L),
      doc("c1", "s3", 1.0, 7L),  // s3: full tie -> min doc_key c1 wins
      doc("c2", "s3", 1.0, 7L),
      doc("d1", "s4", 0.5, 1L))  // singleton survives
      .toDF("doc_key", "signature", "boost", "fetch_time")
    val kept = IndexerJob.deleteDuplicates(docs)
      .select("doc_key").collect().map(_.getString(0)).toSet
    assert(kept == Set("a2", "b2", "c1", "d1"))
    val deleted = IndexerJob.duplicateKeys(docs)
      .collect().map(_.getString(0)).toSet
    assert(deleted == Set("a1", "b1", "c2"))
    assert(kept ++ deleted == docs.collect().map(_.getString(0)).toSet)
  }

  test("deleteDuplicates: null-signature docs pass through, never collapse together") {
    val docs = Seq(
      ("a1", Option("s1"), 1.0, 1L),
      ("n1", None, 1.0, 1L), // no digest: not dedup-eligible
      ("n2", None, 2.0, 2L))
      .map { case (k, s, b, t) => (k, s.orNull, b, t) }
      .toDF("doc_key", "signature", "boost", "fetch_time")
    val kept = IndexerJob.deleteDuplicates(docs)
      .select("doc_key").collect().map(_.getString(0)).toSet
    assert(kept == Set("a1", "n1", "n2"))
    assert(IndexerJob.duplicateKeys(docs).count() == 0)
  }

  test("clean deletes GONE pages plus cleaning-filter hits (CleaningJob.java CleanMapper)") {
    import graft.jobs.UrlRegexCleaningFilter
    val pages = Seq(
      ("k1", "http://a/p/1", CrawlStatus.FETCHED),
      ("k2", "http://a/p/2", CrawlStatus.GONE),       // built-in GONE rule
      ("k3", "http://a/img/3", CrawlStatus.FETCHED),  // blocklist hit
      ("k4", "http://a/p/4", CrawlStatus.FETCHED))
      .toDF("key", "url", "status")
    val docs = pages.select(col("key").as("doc_key"), col("url"))
    val kept = IndexerJob.clean(docs, pages,
      Seq(UrlRegexCleaningFilter(Seq(".*/img/.*"))))
      .select("doc_key").collect().map(_.getString(0)).toSet
    assert(kept == Set("k1", "k4"))
    // no filters: only the built-in GONE rule fires
    val keptDefault = IndexerJob.clean(docs, pages)
      .select("doc_key").collect().map(_.getString(0)).toSet
    assert(keptDefault == Set("k1", "k3", "k4"))
  }

  test("TldScoring boosts by the walked suffix, not the last label (TLDScoringFilter)") {
    val tld = TldScoring(CrawlConfig(), boosts = Map("co.uk" -> 2.0f, "uk" -> 5.0f))
    val p = WebPage(url = "http://news.example.co.uk/")
    // the walk hits co.uk before uk, so the co.uk boost applies
    assert(tld.indexerScore(p, 1.5f) == 3.0f)
    // unknown suffix: boost 1.0
    assert(tld.indexerScore(WebPage(url = "http://weird.unknowntld/"), 1.5f) == 1.5f)
  }
}

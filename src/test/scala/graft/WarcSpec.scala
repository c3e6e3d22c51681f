package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.warc.{WarcCodec, WarcIO, WarcRecord}

/** The from-scratch WARC 1.0 codec and its Spark source/sink plumbing. */
class WarcSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def rec(url: String, payload: Array[Byte],
      ct: String = "application/octet-stream") =
    WarcRecord("response", url, "2026-01-01T00:00:00Z",
      s"urn:uuid:${graft.url.UrlUtil.uuid3(url)}", ct, payload)

  test("roundtrip survives delimiter-looking payloads (length-framed, not delimited)") {
    val nasty = Seq(
      rec("http://a/1", "plain".getBytes("UTF-8")),
      // payload containing CRLFs, a fake record header, and a blank line
      rec("http://a/2", "\r\n\r\nWARC/1.0\r\nContent-Length: 999\r\n\r\nx".getBytes("UTF-8")),
      rec("http://a/3", Array[Byte](0, -1, 13, 10, 13, 10, 127, 0)),
      rec("http://a/4", Array.emptyByteArray),
      // UTF-8 multi-byte in url-adjacent headers and payload
      rec("http://a/%C3%A9", "héllo wörld — ünïcode".getBytes("UTF-8"), "text/plain"))
    val decoded = WarcCodec.decode(WarcCodec.encode(nasty.iterator))
    assert(decoded.size == nasty.size)
    nasty.zip(decoded).foreach { case (in, out) =>
      assert(out.targetUri == in.targetUri)
      assert(out.warcType == "response")
      assert(out.recordId == in.recordId)
      assert(out.contentType == in.contentType)
      assert(out.payload.sameElements(in.payload))
    }
  }

  test("decode is strict and bounded on malformed input") {
    val good = WarcCodec.encode(Iterator(rec("http://a/1", "abcdef".getBytes)))
    // truncated payload: declared length runs past the end
    val truncated = good.dropRight(10)
    val e1 = intercept[IllegalArgumentException](WarcCodec.decode(truncated))
    assert(e1.getMessage.contains("corrupt WARC"))
    // bad magic
    val e2 = intercept[IllegalArgumentException](
      WarcCodec.decode("HTTP/1.1 200 OK\r\n\r\n".getBytes))
    assert(e2.getMessage.contains("bad magic"))
    // unterminated header block (no blank line before EOF)
    val e3 = intercept[IllegalArgumentException](
      WarcCodec.decode("WARC/1.0\r\nContent-Length: 3\r\n".getBytes))
    assert(e3.getMessage.contains("unterminated"))
  }

  test("encode rejects header smuggling (canonical collisions, CRLF/colon injection)") {
    val base = rec("http://a/1", "x".getBytes("UTF-8"))
    // a custom header must not shadow the length framing
    intercept[IllegalArgumentException](WarcCodec.recordBytes(
      base.copy(headers = Map("Content-LENGTH" -> "999"))))
    intercept[IllegalArgumentException](WarcCodec.recordBytes(
      base.copy(headers = Map("X-Bad: sneaky" -> "v"))))
    intercept[IllegalArgumentException](WarcCodec.recordBytes(
      base.copy(headers = Map("X-Bad" -> "v\r\nContent-Length: 0"))))
    intercept[IllegalArgumentException](WarcCodec.recordBytes(
      base.copy(targetUri = "http://a/1\r\nWARC-Type: fake")))
    // canonical fields are header lines too: CR/LF in any of them desyncs
    // the framing (contentType flows from crawled-server data)
    intercept[IllegalArgumentException](WarcCodec.recordBytes(
      base.copy(contentType = "text/plain\r\nContent-Length: 0")))
    intercept[IllegalArgumentException](WarcCodec.recordBytes(
      base.copy(warcType = "response\r\nX-Fake: 1")))
    intercept[IllegalArgumentException](WarcCodec.recordBytes(
      base.copy(recordId = "urn:uuid:x\r\nX-Fake: 1")))
    intercept[IllegalArgumentException](WarcCodec.recordBytes(
      base.copy(date = "2026-01-01T00:00:00Z\r\nX-Fake: 1")))
    // the IO layer sanitizes server-supplied content types before encode
    val sanitized = WarcIO.toRecords(Iterator(
      ("http://a/1", "x".getBytes("UTF-8"), "text/html\r\nEvil: 1", 0L))).next()
    assert(sanitized.contentType == "text/html  Evil: 1")
    WarcCodec.recordBytes(sanitized) // must not throw
    // a benign custom header still roundtrips
    val ok = WarcCodec.decode(WarcCodec.encode(Iterator(
      base.copy(headers = Map("X-Graft-Round" -> "7"))))).head
    assert(ok.headers("x-graft-round") == "7")
  }

  test("random-payload roundtrip (100 seeded cases incl. CRLF-heavy bytes)") {
    val rnd = new scala.util.Random(42)
    val recs = (0 until 100).map { i =>
      val n = rnd.nextInt(200)
      val payload = new Array[Byte](n)
      rnd.nextBytes(payload)
      // salt with CRLF pairs to stress framing
      (0 until n / 10).foreach { _ =>
        val p = rnd.nextInt(math.max(1, n - 1))
        payload(p) = 13; payload(math.min(n - 1, p + 1)) = 10
      }
      rec(s"http://r/$i", payload)
    }
    val decoded = WarcCodec.decode(WarcCodec.encode(recs.iterator))
    assert(decoded.size == 100)
    recs.zip(decoded).foreach { case (in, out) =>
      assert(out.payload.sameElements(in.payload), in.targetUri)
    }
  }

  test("WarcIO writes one file per non-empty partition and reads them back") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft-warc").toString
    val pages = (0 until 57).map(i =>
        (s"http://h${i % 3}.example.com/p/$i", s"body-$i".getBytes("UTF-8"),
          "text/plain", 1700000000000L + i * 1000))
      .toDF("url", "content", "contentType", "fetchTime")
      .repartition(4)
    val n = WarcIO.write(pages, dir)
    assert(n == 57)
    val files = new java.io.File(dir).listFiles().map(_.getName).sorted
    assert(files.forall(_.matches("part-\\d{5}\\.warc")))
    assert(files.length <= 4 && files.nonEmpty)
    val back = WarcIO.read(spark, dir)
    assert(back.count() == 57)
    val row = back.filter(col("url") === "http://h1.example.com/p/7")
      .collect().head
    assert(new String(row.payload, "UTF-8") == "body-7")
    assert(row.warc_type == "response")
    assert(row.warc_date == "2023-11-14T22:13:27Z")
    // record ids are unique per CAPTURE (url, millisecond fetchTime), not
    // per url — an export holds one record per fetched version row and
    // WARC 1.0 requires globally unique ids, even for two captures inside
    // the same second (where the second-truncated date string ties)
    assert(row.record_id == "urn:uuid:" + graft.url.UrlUtil.uuid3(
      "http://h1.example.com/p/7\n" + (1700000000000L + 7 * 1000)))
    // unfetched rows (null content) are skipped, not crashed on
    val withNulls = (Seq(("http://a/1", "x".getBytes("UTF-8"), "text/plain", 0L)) :+
        (("http://a/2", null.asInstanceOf[Array[Byte]], "text/plain", 0L)))
      .toDF("url", "content", "contentType", "fetchTime")
    val dir2 = java.nio.file.Files.createTempDirectory("graft-warc2").toString
    assert(WarcIO.write(withNulls, dir2) == 1)
    // re-export into a NON-empty dir replaces the previous export (r6
    // ADVICE fix): stale parts — including higher part numbers from a
    // previous larger export — are cleared driver-side before any task
    // runs, so the dir holds exactly the new job's output
    val fewer = Seq(("http://re/1", "re-1".getBytes("UTF-8"), "text/plain", 5L),
        ("http://re/2", "re-2".getBytes("UTF-8"), "text/plain", 6L))
      .toDF("url", "content", "contentType", "fetchTime").repartition(1)
    assert(WarcIO.write(fewer, dir) == 2)
    val reread = WarcIO.read(spark, dir)
    assert(reread.count() == 2, "stale parts from the first export must be gone")
    assert(reread.collect().map(_.url).sorted.toSeq == Seq("http://re/1", "http://re/2"))
  }

  test("ArcCodec: legacy ARC archives (plain + per-record gzip) decode to " +
      "the WARC record stream") {
    import java.nio.charset.StandardCharsets.UTF_8
    def rec(url: String, date: String, ct: String, body: String,
        v2: Boolean = false): Array[Byte] = {
      val b = body.getBytes(UTF_8)
      val header =
        if (v2) s"$url 1.2.3.4 $date $ct 200 checksum - 0 f.arc ${b.length}\n"
        else s"$url 1.2.3.4 $date $ct ${b.length}\n"
      header.getBytes(UTF_8) ++ b ++ "\n".getBytes(UTF_8)
    }
    val version = rec("filedesc://archive.arc", "20230101000000", "text/plain",
      "1 0 InternetArchive\nURL IP-address Archive-date Content-type Archive-length\n")
    val r1 = rec("http://a.example.com/x", "20230102030405", "text/html",
      "<html>alpha</html>")
    val r2 = rec("http://b.example.com/y", "20230102030406", "text/plain",
      "bravo body", v2 = true)
    // same url captured twice within ONE second: ARC dates are
    // second-granular, so the record id must mix in the byte offset to
    // keep WARC's global-uniqueness contract (r6 ADVICE fix)
    val r3 = rec("http://a.example.com/x", "20230102030405", "text/html",
      "<html>alpha-recrawl</html>")
    val plain = version ++ r1 ++ r2 ++ r3
    val recs = graft.warc.ArcCodec.decode(plain)
    assert(recs.map(_.targetUri) == Seq("http://a.example.com/x",
      "http://b.example.com/y", "http://a.example.com/x"),
      "version block must be skipped, both header arities parsed")
    assert(recs.head.date == "2023-01-02T03:04:05Z")
    assert(recs.head.warcType == "response")
    assert(recs.head.contentType == "text/html")
    assert(new String(recs.head.payload, UTF_8) == "<html>alpha</html>")
    assert(new String(recs(1).payload, UTF_8) == "bravo body")
    assert(recs.map(_.recordId).distinct.size == 3,
      "two same-second captures of one url must not share a record id")
    // the common IA form: each record its own gzip member, concatenated
    def gz(b: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(out)
      g.write(b); g.finish(); g.close()
      out.toByteArray
    }
    val gzBytes = gz(version) ++ gz(r1) ++ gz(r2) ++ gz(r3)
    val recsGz = graft.warc.ArcCodec.decodeAuto(gzBytes)
    assert(recsGz.map(_.targetUri) == recs.map(_.targetUri))
    // member-wise inflate reproduces the plain byte stream, so the
    // offset-mixed ids are identical across the two container forms
    assert(recsGz.map(_.recordId) == recs.map(_.recordId))
    assert(recsGz.zip(recs).forall { case (a, b) => a.payload.sameElements(b.payload) })
    // strictness: a length past the buffer end fails with the offset
    val corrupt = "http://c/ 1.2.3.4 20230101000000 text/plain 99999\nshort".getBytes(UTF_8)
    val e = intercept[IllegalArgumentException](graft.warc.ArcCodec.decode(corrupt))
    assert(e.getMessage.contains("length 99999"))
    // the Spark ingest path: directory scan -> WarcRow -> frontier pages
    val dir = SparkTestBase.tmpDir("arc-ingest")
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "part-0.arc"), plain)
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "part-1.arc.gz"),
      gz(rec("http://d.example.com/z", "20230103000000", "image/png", "PNGish")))
    val rows = graft.warc.WarcIO.readArc(spark, dir)
    assert(rows.count() == 4)
    val pages = graft.warc.WarcIO.toPages(rows).collect()
    assert(pages.map(_.url).sorted.toSeq == Seq("http://a.example.com/x",
      "http://b.example.com/y", "http://d.example.com/z"))
    assert(pages.forall(_.status == graft.model.CrawlStatus.FETCHED))
    val d = pages.find(_.url == "http://d.example.com/z").get
    assert(d.contentType == "image/png" && new String(d.content, UTF_8) == "PNGish")
    assert(d.fetchTime == java.time.Instant.parse("2023-01-03T00:00:00Z").toEpochMilli)
    // streaming counterpart: the same directory through the file stream
    val q = graft.warc.WarcIO.readArcStream(spark, dir)
      .select(org.apache.spark.sql.functions.col("url"))
      .writeStream.format("memory").queryName("arc_stream")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.sql("select url from arc_stream")
        .collect().map(_.getString(0)).toSet ==
        Set("http://a.example.com/x", "http://b.example.com/y", "http://d.example.com/z"))
    } finally q.stop()
  }

  test("CdxIO: index rows carry range-request extents (plain and gz archives)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val pages = (0 until 23).map(i =>
        (s"http://h${i % 3}.example.com/p/$i", s"payload-$i".getBytes("UTF-8"),
          "text/plain", 1700000000000L + i * 1500))
      .toDF("url", "content", "contentType", "fetchTime")
      .repartition(3)
    for (gz <- Seq(false, true)) {
      val dir = SparkTestBase.tmpDir(s"cdx-${if (gz) "gz" else "plain"}")
      assert(graft.warc.WarcIO.write(pages, dir, gzip = gz) == 23)
      val rows = graft.warc.CdxIO.index(spark, dir).collect()
      assert(rows.length == 23)
      assert(rows.map(_.url).toSet ==
        (0 until 23).map(i => s"http://h${i % 3}.example.com/p/$i").toSet)
      // urlkey is the engine's reversed-url key; timestamp is CDX-shaped
      assert(rows.forall(_.urlkey.startsWith("com.example.h")))
      assert(rows.forall(_.timestamp.matches("\\d{14}")))
      // THE range contract: slicing [offset, offset+length) out of the
      // archive file yields a standalone blob that decodes to exactly
      // this record
      val byFile = rows.groupBy(_.filename)
      byFile.foreach { case (fname, rs) =>
        val bytes = java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(dir, fname))
        rs.foreach { r =>
          val blob = java.util.Arrays.copyOfRange(bytes,
            r.offset.toInt, (r.offset + r.length).toInt)
          val recs = graft.warc.WarcCodec.decodeAuto(blob)
          assert(recs.length == 1 && recs.head.targetUri == r.url, r.url)
          assert(java.security.MessageDigest.getInstance("MD5")
            .digest(recs.head.payload).map("%02x".format(_)).mkString == r.digest)
        }
      }
      // classic text form sorts by (urlkey, timestamp)
      val txtDir = SparkTestBase.tmpDir(s"cdx-txt-$gz")
      graft.warc.CdxIO.writeCdxText(graft.warc.CdxIO.index(spark, dir), txtDir)
      val lines = spark.read.text(txtDir).select(col("value"))
        .collect().map(_.getString(0))
      assert(lines.length == 23 && lines.forall(_.split(" ").length == 8))
    }
  }


  test("crawl -> warcexport -> warcimport roundtrip preserves the fetched corpus") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.crawl.{Crawl, CrawlConfig}
    import graft.images.ImageSynth
    import graft.site.PhashOutlinks
    val nPages = 60L; val nHosts = 4
    val dir = SparkTestBase.tmpDir("warc-crawl")
    val conf = CrawlConfig(fetchIntervalDefault = 0, numPartitions = 4,
      fetcherServerDelayMs = 0, topN = 30)
    val crawl = new Crawl(spark, dir,
      ImageSynth.imagesDf(spark, nPages, nHosts, partitions = 4), conf,
      PhashOutlinks(nPages, nHosts, 3))
    crawl.run(2, (0 until 4).map(i => ImageSynth.urlOf(i.toLong, nHosts)))

    val fetched = crawl.table.currentView(spark).drop("snapshot_id")
      .where(col("status") === graft.model.CrawlStatus.FETCHED)
    // refetched pages carry one FETCHED version row per round (distinct
    // version keys, same url) — the archive gets one record per ROW, but
    // the import dedupes to the latest capture per url (duplicate keys
    // inside one snapshot would resolve nondeterministically); the
    // per-url payload hash is what must survive the roundtrip
    val nRows = fetched.count()
    val want = fetched.select(col("url"), md5(col("content")).as("h"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(want.nonEmpty && nRows >= want.size)

    val warcDir = SparkTestBase.tmpDir("warc-export")
    val n = WarcIO.write(fetched, warcDir)
    assert(n == nRows)

    val imported = WarcIO.toPages(WarcIO.read(spark, warcDir)).toDF()
      .select(col("url"), md5(col("content")).as("h"), col("key"))
      .collect()
    assert(imported.length == want.size)
    assert(imported.map(_.getString(0)).toSet == want.keySet)
    imported.foreach { r =>
      assert(want(r.getString(0)) == r.getString(1), r.getString(0))
      assert(r.getString(2) == graft.url.UrlUtil.uuid3(r.getString(0)))
    }
  }

  test("readStream ingests archives dropped into a watched directory") {
    import org.apache.spark.sql.functions.col
    val dir = SparkTestBase.tmpDir("warc-stream")
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "a.warc"),
      WarcCodec.encode(Iterator(rec("http://s/1", "one".getBytes("UTF-8")))))
    val q = WarcIO.readStream(spark, dir)
      .select(col("url"))
      .writeStream.format("memory").queryName("warc_stream")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      def urls() = spark.sql("select url from warc_stream")
        .collect().map(_.getString(0)).toSet
      assert(urls() == Set("http://s/1"))
      // drop a second archive into the watched dir mid-query
      java.nio.file.Files.write(java.nio.file.Paths.get(dir, "b.warc"),
        WarcCodec.encode(Iterator(
          rec("http://s/2", "two".getBytes("UTF-8")),
          rec("http://s/3", "three".getBytes("UTF-8")))))
      q.processAllAvailable()
      assert(urls() == Set("http://s/1", "http://s/2", "http://s/3"))
    } finally q.stop()
  }

  test("gz roundtrip: per-record gzip members, strict member-wise inflate") {
    val recs = Seq(
      rec("http://g/1", "plain payload".getBytes("UTF-8")),
      rec("http://g/2", "\r\n\r\nWARC/1.0\r\nfake\r\n\r\n".getBytes("UTF-8")),
      rec("http://g/3", Array.fill[Byte](10000)(7)), // compressible run
      rec("http://g/4", Array.emptyByteArray))
    val gz = WarcCodec.encodeGz(recs.iterator)
    assert(WarcCodec.isGzip(gz))
    // member-per-record: 4 gzip magics in the stream
    val magics = gz.sliding(2).count(p =>
      (p(0) & 0xff) == 0x1f && (p(1) & 0xff) == 0x8b)
    assert(magics == 4)
    val back = WarcCodec.decodeAuto(gz)
    assert(back.size == 4)
    recs.zip(back).foreach { case (in, out) =>
      assert(out.targetUri == in.targetUri)
      assert(out.payload.sameElements(in.payload), in.targetUri)
    }
    // concatenating two archives is still a valid multi-member stream
    assert(WarcCodec.decodeAuto(gz ++ gz).size == 8)
    // plain blobs pass through decodeAuto unchanged
    assert(WarcCodec.decodeAuto(WarcCodec.encode(recs.iterator)).size == 4)
  }

  test("gunzipStrict is strict and bounded") {
    val one = WarcCodec.recordBytesGz(rec("http://g/1", "abcdef".getBytes))
    // expansion ceiling: a member inflating past maxOut raises
    val big = WarcCodec.recordBytesGz(rec("http://g/2", new Array[Byte](100000)))
    val e0 = intercept[IllegalArgumentException](WarcCodec.gunzipStrict(big, 1000))
    assert(e0.getMessage.contains("ceiling"))
    // truncated final member raises (GZIPInputStream would swallow this)
    val e1 = intercept[IllegalArgumentException](
      WarcCodec.gunzipStrict(one.dropRight(12), 1 << 20))
    assert(e1.getMessage.contains("corrupt gzip"))
    // corrupt CRC trailer raises
    val crcBad = one.clone(); crcBad(one.length - 8) = (crcBad(one.length - 8) ^ 0xff).toByte
    val e2 = intercept[IllegalArgumentException](WarcCodec.gunzipStrict(crcBad, 1 << 20))
    assert(e2.getMessage.contains("CRC32"))
    // garbage BETWEEN members raises instead of silently dropping the tail
    val garbage = one ++ "not gzip at all".getBytes("UTF-8") ++ one
    val e3 = intercept[IllegalArgumentException](WarcCodec.gunzipStrict(garbage, 1 << 20))
    assert(e3.getMessage.contains("bad gzip magic"))
    // flipped deflate byte raises (CRC or stream error, never silence)
    val mid = one.clone(); mid(15) = (mid(15) ^ 0x5a).toByte
    intercept[IllegalArgumentException](WarcCodec.gunzipStrict(mid, 1 << 20))
  }

  test("gz export -> read -> import roundtrip (warcexport --gzip)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dir = SparkTestBase.tmpDir("warc-gz")
    val pages = (0 until 23).map(i =>
        (s"http://gz${i % 3}.example.com/p/$i", s"payload-$i".getBytes("UTF-8"),
          "text/plain", 1700000000000L + i * 1000))
      .toDF("url", "content", "contentType", "fetchTime")
      .repartition(3)
    assert(WarcIO.write(pages, dir, gzip = true) == 23)
    val files = new java.io.File(dir).listFiles().map(_.getName).sorted
    assert(files.nonEmpty && files.forall(_.matches("part-\\d{5}\\.warc\\.gz")))
    val back = WarcIO.read(spark, dir)
    assert(back.count() == 23)
    val row = back.filter(col("url") === "http://gz1.example.com/p/7").collect().head
    assert(new String(row.payload, "UTF-8") == "payload-7")
    val imported = WarcIO.toPages(back, batchId = "gzb").collect()
    assert(imported.length == 23)
    assert(imported.forall(_.status == graft.model.CrawlStatus.FETCHED))
  }

  test("toPages keeps the latest capture per url (unique keys per snapshot)") {
    import spark.implicits._
    import graft.warc.WarcRow
    val rows = Seq(
      WarcRow("http://d/1", "response", "2026-01-01T00:00:00Z", "urn:uuid:a",
        "text/plain", "old".getBytes("UTF-8")),
      WarcRow("http://d/1", "response", "2026-01-02T00:00:00Z", "urn:uuid:b",
        "text/plain", "new".getBytes("UTF-8")),
      WarcRow("http://d/2", "response", "2026-01-01T00:00:00Z", "urn:uuid:c",
        "text/plain", "only".getBytes("UTF-8")),
      WarcRow("http://d/3", "warcinfo", "2026-01-01T00:00:00Z", "urn:uuid:d",
        "text/plain", "skip".getBytes("UTF-8"))).toDS()
    val pages = WarcIO.toPages(rows).collect().sortBy(_.url)
    assert(pages.map(_.url).toSeq == Seq("http://d/1", "http://d/2"))
    assert(new String(pages(0).content, "UTF-8") == "new")
    assert(pages(0).fetchTime ==
      java.time.Instant.parse("2026-01-02T00:00:00Z").toEpochMilli)
  }

  test("toPages turns WARC responses into fetched frontier rows (warcimport)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-warc3").toString
    val pages = Seq(
      ("http://h0.example.com/p/1", "alpha".getBytes("UTF-8"), "text/plain",
        1700000000000L))
      .toDF("url", "content", "contentType", "fetchTime")
    WarcIO.write(pages, dir)
    val imported = WarcIO.toPages(WarcIO.read(spark, dir), batchId = "b-7").collect()
    assert(imported.length == 1)
    val p = imported.head
    assert(p.url == "http://h0.example.com/p/1")
    assert(p.key == graft.url.UrlUtil.uuid3(p.url))
    assert(p.status == graft.model.CrawlStatus.FETCHED)
    assert(p.fetchTime == 1700000000000L) // second precision survives
    assert(new String(p.content, "UTF-8") == "alpha")
    assert(p.markers(graft.model.Marks.FETCH) == "b-7")
  }
}

package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.images.{ImageSynth, PngCodec}
import graft.seen.{BloomFilter, CuckooFilter}
import graft.url.{BasicUrlNormalizer, RegexUrlNormalizer, UrlNormalizers, UrlUtil}

/** Property tests (SURVEY.md §5 plan: normalizer idempotence, bloom
  * no-false-negatives) plus codec roundtrips and key determinism.
  */
object GraftProperties extends Properties("graft") {

  private def word(min: Int, max: Int): Gen[String] = for {
    n <- Gen.choose(min, max)
    cs <- Gen.listOfN(n, Gen.alphaLowerChar)
  } yield cs.mkString

  private val hostGen: Gen[String] = for {
    sub <- Gen.option(word(1, 7))
    name <- word(1, 9)
    tld <- Gen.oneOf("com", "org", "example", "co.uk", "io")
  } yield sub.map(_ + ".").getOrElse("") + name + "." + tld

  private val pathSegGen: Gen[String] =
    Gen.oneOf(word(1, 7), Gen.const("."), Gen.const(".."), Gen.const(""))

  private val urlGen: Gen[String] = for {
    proto <- Gen.oneOf("http", "https", "HTTP", "Http")
    host <- hostGen
    port <- Gen.oneOf("", ":80", ":8080", ":443")
    segs <- Gen.listOfN(4, pathSegGen)
    ref <- Gen.oneOf("", "#frag", "#a?b")
    q <- Gen.oneOf("", "?a=1", "?a=1&&b=2", "?PHPSESSID=x&k=v")
  } yield s"$proto://$host$port/${segs.mkString("/")}$q$ref"

  property("basic normalizer is idempotent") = forAll(urlGen) { url =>
    val once = BasicUrlNormalizer.normalizeOrNull(url)
    once == null || BasicUrlNormalizer.normalizeOrNull(once) == once
  }

  // the full chain runs basic+regex once per call, like the reference's
  // default urlnormalizer.loop.count=1 — it must converge within a few passes
  property("normalizer chain converges within 3 passes") = forAll(urlGen) { url =>
    val p1 = UrlNormalizers.normalize(url)
    if (p1 == null) true
    else {
      val p2 = UrlNormalizers.normalize(p1)
      val p3 = if (p2 == null) null else UrlNormalizers.normalize(p2)
      p3 != null && UrlNormalizers.normalize(p3) == p3
    }
  }

  property("basic normalizer output has no /../ or /./ or // in the path") = forAll(urlGen) { url =>
    val n = BasicUrlNormalizer.normalizeOrNull(url)
    n == null || {
      val file = graft.url.PUrl.parse(n).map(_.path).getOrElse("")
      !file.contains("/../") && !file.contains("/./") && !file.contains("//")
    }
  }

  property("regex normalizer strips session ids") = forAll(hostGen) { host =>
    val n = RegexUrlNormalizer.normalize(s"http://$host/p?PHPSESSID=deadbeef&x=1")
    !n.toLowerCase.contains("phpsessid")
  }

  property("uuid3 is deterministic and distinct per url") = forAll(urlGen, urlGen) { (a, b) =>
    UrlUtil.uuid3(a) == UrlUtil.uuid3(a) && (a == b || UrlUtil.uuid3(a) != UrlUtil.uuid3(b))
  }

  property("reverseUrl roundtrips through unreverseUrl") = forAll(hostGen) { host =>
    val url = s"http://$host:8983/a/b.html?x=1"
    UrlUtil.unreverseUrl(UrlUtil.reverseUrl(url)) == url
  }

  property("bloom filter has no false negatives") =
    forAll(Gen.listOf(Gen.listOfN(6, Gen.alphaNumChar).map(_.mkString))) { keys =>
      val bf = BloomFilter.sized(math.max(keys.size, 1), 0.01)
      keys.foreach(bf.add)
      keys.forall(bf.mightContain)
    }

  property("cuckoo filter: insert implies contains; remove implies eventual absence") =
    forAll(Gen.listOfN(50, Gen.listOfN(8, Gen.alphaNumChar).map(_.mkString))) { keys0 =>
      val keys = keys0.distinct
      val cf = CuckooFilter.sized(4096)
      keys.foreach(cf.add)
      keys.forall(cf.mightContain)
    }

  property("png codec roundtrips arbitrary pixel buffers") =
    forAll(Gen.choose(1, 40), Gen.choose(1, 40), Gen.long) { (w, h, seed) =>
      val pixels = ImageSynth.pixelsFor(s"http://p/$seed", w, h)
      val (decoded, dw, dh) = PngCodec.decodeRgb(PngCodec.encodeRgb(pixels, w, h))
      dw == w && dh == h && decoded.sameElements(pixels)
    }

  property("wav codec roundtrips arbitrary PCM16 sample buffers") =
    forAll(Gen.choose(1, 2000), Gen.oneOf(1, 2), Gen.oneOf(8000, 16000, 44100),
      Gen.long) { (nFrames, ch, rate, seed) =>
      val rnd = new scala.util.Random(seed)
      val samples = Array.fill(nFrames * ch)(rnd.nextInt(65536).toShort)
      val wav = graft.media.WavCodec.decode(
        graft.media.WavCodec.encode(samples, rate, ch))
      wav.sampleRate == rate && wav.channels == ch &&
        wav.samples.sameElements(samples) && wav.nFrames == nFrames
    }

  property("y4m codec roundtrips arbitrary C420 frame sequences byte-exactly") =
    forAll(Gen.choose(1, 8).map(_ * 2), Gen.choose(1, 8).map(_ * 2),
      Gen.choose(0, 6), Gen.long) { (w, h, nFrames, seed) =>
      val rnd = new scala.util.Random(seed)
      val frames = Vector.fill(nFrames)(graft.media.Y4mCodec.Frame(
        Array.fill(w * h)(rnd.nextInt(256).toByte),
        Array.fill(w * h / 4)(rnd.nextInt(256).toByte),
        Array.fill(w * h / 4)(rnd.nextInt(256).toByte)))
      val bytes = graft.media.Y4mCodec.encode(
        graft.media.Y4mCodec.Video(w, h, 25, 1, frames))
      val v = graft.media.Y4mCodec.decode(bytes)
      v.w == w && v.h == h && v.frames.size == nFrames &&
        graft.media.Y4mCodec.encode(v).sameElements(bytes) &&
        v.frames.zip(frames).forall { case (a, b) =>
          a.y.sameElements(b.y) && a.u.sameElements(b.u) && a.v.sameElements(b.v)
        }
    }

  /** The previous per-item linear scan over all queues, kept as the
    * selection-rule oracle for the heap scheduler (first ready queue in
    * insertion order). */
  private def naiveSchedule[T](items: Iterator[(String, T)], delayFor: String => Long,
      consumesDelay: T => Boolean): Seq[graft.jobs.PolitenessScheduler.Scheduled[T]] = {
    import scala.collection.mutable
    final class Q(val id: String) {
      val q = mutable.Queue.empty[T]; var nextTime = 0L
      lazy val delay: Long = math.max(0L, delayFor(id))
    }
    val queues = mutable.LinkedHashMap.empty[String, Q]
    var total = 0
    items.foreach { case (qid, t) => queues.getOrElseUpdate(qid, new Q(qid)).q.enqueue(t); total += 1 }
    val out = mutable.ArrayBuffer.empty[graft.jobs.PolitenessScheduler.Scheduled[T]]
    var now = 0L; var seq = 0; var remaining = total
    while (remaining > 0) {
      queues.valuesIterator.find(q => q.q.nonEmpty && q.nextTime <= now) match {
        case Some(q) =>
          val item = q.q.dequeue()
          out += graft.jobs.PolitenessScheduler.Scheduled(item, q.id, now, seq)
          seq += 1; remaining -= 1
          q.nextTime = if (consumesDelay(item)) now + q.delay else now
        case None => now = queues.valuesIterator.filter(_.q.nonEmpty).map(_.nextTime).min
      }
    }
    out.toSeq
  }

  private val rxAlphabet = "abc01"

  /** Random regex in the DFA engine's supported subset, rendered as a
    * string both engines parse identically. */
  private def rxGen(depth: Int): Gen[String] =
    if (depth <= 0)
      Gen.oneOf(
        Gen.oneOf(rxAlphabet.toSeq).map(_.toString),
        Gen.const("."),
        Gen.const("\\."),
        Gen.oneOf("[ab]", "[a-c]", "[^ab]", "[0-1a]"))
    else
      Gen.frequency(
        3 -> rxGen(0),
        2 -> (for { a <- rxGen(depth - 1); b <- rxGen(depth - 1) } yield a + b),
        2 -> (for { a <- rxGen(depth - 1); b <- rxGen(depth - 1) } yield s"($a|$b)"),
        1 -> rxGen(depth - 1).map(a => s"($a)*"),
        1 -> rxGen(depth - 1).map(a => s"($a)+"),
        1 -> rxGen(depth - 1).map(a => s"($a)?"))

  property("DFA engine agrees with java.util.regex full match on the supported subset") =
    forAll(rxGen(3), Gen.listOfN(8, Gen.listOfN(6, Gen.oneOf((rxAlphabet + "./").toSeq))
      .map(_.mkString))) { (re, inputs) =>
      val dfa = graft.url.RegexDfa.compile(re)
      val jre = java.util.regex.Pattern.compile(re)
      inputs.forall { in =>
        dfa.matches(in) == jre.matcher(in).matches()
      } && dfa.matches("") == jre.matcher("").matches()
    }

  property("politeness heap emits byte-identical order to the linear-scan rule") =
    forAll(Gen.listOfN(200, Gen.choose(0, 12)), Gen.choose(0L, 40L), Gen.long) {
      (hostIdx, delay, seed) =>
        val rnd = new scala.util.Random(seed)
        val items = hostIdx.zipWithIndex.map { case (hi, i) => (s"http://h$hi", i) }
        val delays = (0 to 12).map(h => s"http://h$h" -> (if (rnd.nextBoolean()) delay else delay * 2)).toMap
        val consume = (i: Int) => i % 7 != 0 // some asap-finish items
        val fast = graft.jobs.PolitenessScheduler
          .schedule[Int](items.iterator, delays.getOrElse(_, 0L), consume).toSeq
        val slow = naiveSchedule[Int](items.iterator, delays.getOrElse(_, 0L), consume)
        fast == slow
    }

  property("warc codec roundtrips arbitrary payload bytes and header values") =
    forAll(Gen.listOf(for {
      n <- Gen.choose(0, 300)
      bytes <- Gen.listOfN(n, Gen.chooseNum(Byte.MinValue, Byte.MaxValue))
      host <- hostGen
      path <- word(1, 10)
      extraV <- word(0, 12)
    } yield graft.warc.WarcRecord("response", s"http://$host/$path",
        "2026-01-01T00:00:00Z", "urn:uuid:" + UrlUtil.uuid3(path),
        "application/octet-stream", bytes.toArray,
        headers = if (extraV.isEmpty) Map.empty else Map("X-Extra" -> extraV)))) { recs =>
      val out = graft.warc.WarcCodec.decode(
        graft.warc.WarcCodec.encode(recs.iterator))
      out.size == recs.size && out.zip(recs).forall { case (o, i) =>
        o.targetUri == i.targetUri && o.payload.sameElements(i.payload) &&
          (i.headers.isEmpty ||
            o.headers.get("x-extra").contains(i.headers("X-Extra")))
      }
    }

  property("lineFilter invariant: every kept line is terminal-punctuated, long enough, unblocked") = {
    import org.apache.spark.sql.functions.col
    val lineGen: Gen[String] = for {
      n <- Gen.choose(1, 6)
      ws <- Gen.listOfN(n, word(1, 8))
      tail <- Gen.oneOf("", ".", "!", "?", ".\"", "x")
      block <- Gen.oneOf("", "", "", " javascript ")
    } yield ws.mkString(" ") + block + tail
    forAll(Gen.listOfN(6, lineGen)) { lines =>
      val spark = SparkTestBase.spark
      import spark.implicits._
      val docs = Seq((1L, lines.mkString("\n"))).toDF("doc_id", "text")
      val out = graft.ops.TextCleaning.lineFilter(docs, "doc_id", "text",
        minWords = 3, minLines = 0)
      out.select(col("clean_text")).collect().headOption.forall { r =>
        val kept = r.getString(0).split("\n").filter(_.nonEmpty)
        kept.forall { l =>
          l.matches(".*[.!?][\"']?") &&
            l.split("\\s+").count(_.nonEmpty) >= 3 &&
            !l.toLowerCase.contains("javascript")
        }
      }
    }
  }

  property("piiStats: redacted text carries exactly the counted placeholders") = {
    val pii: Gen[String] = Gen.oneOf(
      Gen.const("a@b.com"), Gen.const("10.1.2.3"), Gen.const("555-123-4567"),
      word(2, 8))
    forAll(Gen.listOfN(6, pii)) { parts =>
      val spark = SparkTestBase.spark
      import spark.implicits._
      val docs = Seq((1L, parts.mkString(" "))).toDF("doc_id", "text")
      val r = graft.ops.TextCleaning.piiStats(docs, "doc_id", "text").head
      val red = r.getAs[String]("redacted")
      def occ(tok: String) = tok.r.findAllIn(red).length
      occ("<EMAIL>") == r.getAs[Int]("n_emails") &&
        occ("<IP>") == r.getAs[Int]("n_ips") &&
        occ("<PHONE>") == r.getAs[Int]("n_phones")
    }
  }

  property("politeness: per-queue gaps always >= delay") =
    forAll(Gen.listOfN(40, Gen.choose(0, 5)), Gen.choose(1L, 50L)) { (hostIdx, delay) =>
      val items = hostIdx.zipWithIndex.map { case (hi, i) => (s"http://h$hi", i) }
      val out = graft.jobs.PolitenessScheduler
        .schedule[Int](items.iterator, _ => delay, _ => true).toSeq
      out.groupBy(_.queueId).forall { case (_, fetches) =>
        val ts = fetches.map(_.virtualTimeMs).sorted
        ts.zip(ts.drop(1)).forall { case (a, b) => b - a >= delay }
      } && out.size == items.size
    }
}

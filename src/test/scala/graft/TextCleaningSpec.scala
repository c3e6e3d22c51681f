package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.TextCleaning

class TextCleaningSpec extends AnyFunSuite {
  private implicit lazy val spark: org.apache.spark.sql.SparkSession = SparkTestBase.spark

  private def docsOf(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("repetitionStats: hand-computed gopher fractions") {
    // d1 "a a a b": 4 tokens, 7 chars, top 2-gram "a a" x2 (len 3) -> 6/7
    // d2 "x y x y x y": 6 tokens, 11 chars, "x y" x3 (len 3) -> 9/11; no dup 5-gram
    // d3 "p q r s t p q r s t": "p q r s t" 5-gram x2 (len 9) -> 18/19
    val out = TextCleaning.repetitionStats(
        docsOf(1L -> "a a a b", 2L -> "x y x y x y", 3L -> "p q r s t p q r s t"),
        "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out.length == 3)
    val r1 = out(0)
    assert(r1.getAs[Int]("n_tokens") == 4)
    assert(math.abs(r1.getAs[Double]("distinct_frac") - 0.5) < 1e-9)
    assert(math.abs(r1.getAs[Double]("top_gram_frac") - 6.0 / 7) < 1e-9)
    assert(r1.getAs[Double]("dup_gram_frac") == 0.0) // shorter than 5 tokens
    val r2 = out(1)
    assert(math.abs(r2.getAs[Double]("distinct_frac") - 2.0 / 6) < 1e-9)
    assert(math.abs(r2.getAs[Double]("top_gram_frac") - 9.0 / 11) < 1e-9)
    assert(r2.getAs[Double]("dup_gram_frac") == 0.0) // all 5-grams unique
    val r3 = out(2)
    assert(math.abs(r3.getAs[Double]("dup_gram_frac") - 18.0 / 19) < 1e-9)
  }

  test("repetitionStats: fractions are clipped at 1.0 under overlap") {
    // "a a a": 2-gram "a a" x2 (len 3) covers 6 > 5 chars -> clipped
    val r = TextCleaning.repetitionStats(docsOf(1L -> "a a a"), "doc_id", "text")
      .collect().head
    assert(r.getAs[Double]("top_gram_frac") == 1.0)
  }

  test("dedupSpans: first corpus-wide occurrence survives, docs rebuilt in order") {
    val out = TextCleaning.dedupSpans(
        docsOf(1L -> "a b c d e", 2L -> "a b x y", 3L -> "c d c d", 4L -> "  "),
        "doc_id", "text", k = 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("clean_text"),
        r.getAs[Long]("spans_kept"), r.getAs[Long]("spans_dropped")))
    // d1 spans: "a b","c d","e" — all first occurrences
    assert(out(0) == ((1L, "a b c d e", 3L, 0L)))
    // d2: "a b" already owned by (1,0); "x y" fresh
    assert(out(1) == ((2L, "x y", 1L, 1L)))
    // d3: both "c d" spans lose to (1, pos 1)
    assert(out(2) == ((3L, "", 0L, 2L)))
    // d4: whitespace-only doc -> no spans at all
    assert(out(3) == ((4L, "", 0L, 0L)))
  }

  test("dedupSpans: trailing remainder is a dedup-eligible span") {
    // k=3: d1 -> ["p q r", "s"], d2 -> ["s"]; d2's remainder span "s"
    // duplicates d1's and is dropped
    val out = TextCleaning.dedupSpans(docsOf(1L -> "p q r s", 2L -> "s"),
        "doc_id", "text", k = 3)
      .orderBy("doc_id").collect()
    assert(out(0).getAs[String]("clean_text") == "p q r s")
    assert(out(1).getAs[String]("clean_text") == "")
    assert(out(1).getAs[Long]("spans_dropped") == 1L)
  }

  test("dedupSpans: no duplicate content means nothing dropped") {
    val docs = docsOf(1L -> "one two three four five six", 2L -> "seven eight nine")
    val out = TextCleaning.dedupSpans(docs, "doc_id", "text", k = 2)
      .orderBy("doc_id").collect()
    assert(out.forall(_.getAs[Long]("spans_dropped") == 0L))
    assert(out(0).getAs[String]("clean_text") == "one two three four five six")
  }

  test("lineFilter: C4 rules — terminal punctuation, min words, blocklist, doc floor") {
    val docs = docsOf(
      1L -> "This is a fine sentence.\nno period here\nok?\n\nEnable JavaScript now please.\nAnother keeper, yes indeed!",
      2L -> "only\nshort\nlines",
      3L -> "  Trimmed but good enough.  \nBad")
    val out = TextCleaning.lineFilter(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    // doc 2 loses every line -> dropped entirely by the minLines floor
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 3L))
    val r1 = out(0)
    // kept: sentence 1 (terminal + 5 words) and the last line; dropped:
    // "no period here" (no terminal), "ok?" (1 word), blank (pre-filtered,
    // not counted), "Enable JavaScript..." (blocklist, case-insensitive)
    assert(r1.getAs[String]("clean_text") ==
      "This is a fine sentence.\nAnother keeper, yes indeed!")
    assert(r1.getAs[Int]("lines_kept") == 2)
    assert(r1.getAs[Int]("lines_dropped") == 3)
    val r3 = out(1)
    assert(r3.getAs[String]("clean_text") == "Trimmed but good enough.")
    // minLines raises the doc floor
    assert(TextCleaning.lineFilter(docs, "doc_id", "text", minLines = 2)
      .collect().map(_.getLong(0)).toSeq == Seq(1L))
    // CRLF documents: no stray \r survives into clean_text, and the
    // terminal-punctuation test sees the line WITHOUT the \r
    val crlf = TextCleaning.lineFilter(
        docsOf(9L -> "Good sentence number one.\r\nGood sentence number two.\r\n"),
        "doc_id", "text")
      .head
    assert(crlf.getAs[String]("clean_text") ==
      "Good sentence number one.\nGood sentence number two.")
    assert(crlf.getAs[Int]("lines_kept") == 2)
  }

  test("piiStats: typed placeholders, sequential counts, order contract") {
    val docs = docsOf(
      1L -> "mail bob.smith+x@sub.example.co.uk or call 555-867-5309 now",
      2L -> "host 192.168.0.1 and (415) 555-0199 and +1 650.555.0123",
      // an email with an IP-shaped digit run INSIDE its host: the email
      // rule must claim the whole address before the IP rule can carve it
      // up (an all-numeric host is not an email — no alphabetic TLD — so
      // root@192.168.10.20 would redact as root@<IP>, by design)
      3L -> "x@12.34.56.78.example.com logged in from 10.0.0.7",
      4L -> "no pii here, id 123456789012 stays put",
      // separator-bearing serial: the \b before the area code stops a
      // mid-run "345-678-9012" match from eating the tail
      5L -> "serial 12345-678-9012 stays whole")
    val out = TextCleaning.piiStats(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out(0).getAs[String]("redacted") ==
      "mail <EMAIL> or call <PHONE> now")
    assert((out(0).getAs[Int]("n_emails"), out(0).getAs[Int]("n_ips"),
      out(0).getAs[Int]("n_phones")) == ((1, 0, 1)))
    assert(out(1).getAs[String]("redacted") ==
      "host <IP> and <PHONE> and <PHONE>")
    assert((out(1).getAs[Int]("n_ips"), out(1).getAs[Int]("n_phones")) == ((1, 2)))
    // email-before-IP ordering: root@192.168.10.20 is ONE email, not an IP
    assert(out(2).getAs[String]("redacted") == "<EMAIL> logged in from <IP>")
    assert((out(2).getAs[Int]("n_emails"), out(2).getAs[Int]("n_ips")) == ((1, 1)))
    // bare digit runs don't phone-match (separator after area code required)
    assert(out(3).getAs[String]("redacted") ==
      "no pii here, id 123456789012 stays put")
    assert(out(4).getAs[String]("redacted") ==
      "serial 12345-678-9012 stays whole")
  }

  test("redactPii is idempotent (placeholders can never re-match)") {
    import org.apache.spark.sql.functions.col
    val docs = docsOf(1L -> "a@b.com 10.1.2.3 555-123-4567")
    val once = docs.select(TextCleaning.redactPii(col("text")).as("t"))
    val twice = once.select(TextCleaning.redactPii(col("t")).as("t"))
    assert(once.head.getString(0) == "<EMAIL> <IP> <PHONE>")
    assert(twice.head.getString(0) == once.head.getString(0))
  }

  test("CorpusPipeline.clean: each stage gates what it should, in order") {
    import org.apache.spark.sql.functions._
    import graft.ops.CorpusPipeline
    val good = "This is a perfectly reasonable sentence about crawling.\n" +
      "Here is another fine sentence with plenty of words."
    val docs = docsOf(
      1L -> good,
      2L -> good,                                   // exact dup of 1 -> min id 1 survives
      3L -> "short\nno punct\ntiny",               // all lines die -> line-filter drop
      4L -> ("spam spam spam spam spam spam spam spam spam spam. " * 3 +
        "\nRepeat repeat repeat repeat repeat repeat again now."), // repetition gate
      5L -> ("Contact me at bob@example.com for all the details.\n" +
        "My address is 10.1.2.3 which is quite memorable."),       // PII redacted, kept
      6L -> ("Contact me at alice@example.com for all the details.\n" +
        "My address is 10.9.9.9 which is quite memorable."))       // dedups WITH 5 post-redaction
    val out = CorpusPipeline.clean(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.keySet == Set(1L, 5L), s"got ${out.keySet}")
    assert(out(5L).contains("<EMAIL>") && out(5L).contains("<IP>"))
    assert(!out(5L).contains("bob@example.com"))
    // span dedup stage: with spanK on, doc 1's text survives rebuilt
    val spanned = CorpusPipeline.clean(docs, "doc_id", "text", spanK = 5)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(spanned.keySet == Set(1L, 5L))
    assert(spanned(1L).nonEmpty)
  }

  test("CorpusPipeline.clean: fuzzy near-dup stage collapses one-word variants " +
      "that exact dedup cannot") {
    import graft.ops.CorpusPipeline
    // a long shared body (one-word variants share nearly all 3-gram
    // shingles, so some MinHash band collides) + an unrelated doc
    val body = "The crawler fetched every page politely and stored the " +
      "results in the frontier table for the next round of processing work."
    val docs = docsOf(
      1L -> s"$body This variant mentions apples near the end of it all.",
      3L -> s"$body This variant mentions oranges near the end of it all.",
      7L -> ("A completely different document about cooking pasta at home " +
        "with tomatoes, garlic, basil and a generous amount of olive oil."))
    // stage off (default): both variants survive exact dedup (texts differ)
    val off = CorpusPipeline.clean(docs, "doc_id", "text")
      .collect().map(_.getLong(0)).toSet
    assert(off == Set(1L, 3L, 7L), s"got $off")
    // stage on: the variant cluster keeps its min id; the unrelated doc is
    // untouched (its shingles share no LSH bucket with the variants)
    val on = CorpusPipeline.clean(docs, "doc_id", "text", nearDupBands = 3)
      .collect().map(_.getLong(0)).toSet
    assert(on == Set(1L, 7L), s"got $on")
  }

  test("CorpusPipeline.clean: classifier gate with a parquet-loaded model " +
      "(the real-model seam)") {
    import org.apache.spark.sql.functions._
    import graft.ops.{CorpusPipeline, Dedup, TextAnalysis}
    val spark2 = spark
    import spark2.implicits._
    val dim = 256
    // "train" a model offline: good-class words get positive weights, the
    // junk class negative — and persist it as the (bucket, weight) parquet
    // table a production run would load
    def bucketOf(w: String): Long = spark.range(1)
      .select(pmod(Dedup.hash40(lit(w)), lit(dim.toLong))).head.getLong(0)
    val goodWords = Seq("informative", "article", "research")
    val junkWords = Seq("casino", "viagra", "winner")
    val weightsPath = SparkTestBase.tmpDir("clf-weights")
    (goodWords.map(w => (bucketOf(w), 1.0)) ++
        junkWords.map(w => (bucketOf(w), -1.0)))
      .toDF("bucket", "weight")
      .write.mode("overwrite").parquet(weightsPath)
    val model = spark.read.parquet(weightsPath)
    val docs = docsOf(
      1L -> "An informative article about research topics appears here today.",
      2L -> "You are the casino winner, claim viagra now, lucky person.")
    val kept = CorpusPipeline.clean(docs, "doc_id", "text",
        weights = Some(model), classifierDim = dim)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L), s"got $kept")
    // the raw scores behave as the model says (positive vs negative mean)
    val scores = TextAnalysis.hashedBowScore(docs, "doc_id", "text", model, dim)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scores(1L) > 0 && scores(2L) < 0)
  }

  test("trainHashedBowPerceptron: separates a planted good/bad corpus and " +
      "the trained model gates the pipeline") {
    import org.apache.spark.sql.functions._
    import graft.ops.{CorpusPipeline, TextAnalysis}
    val spark2 = spark
    import spark2.implicits._
    val dim = 256
    // 40 docs, two planted classes with shared noise words; proper
    // sentences so the same docs survive the pipeline's earlier gates
    val docs = (0L until 40L).map { i =>
      val body =
        if (i % 2 == 0) s"Informative research evidence with insight number $i appears here."
        else s"Casino junk clickbait blather noise number $i appears here."
      (i, body)
    }.toDF("doc_id", "text")
    val labels = docs.select(col("doc_id"),
      when(col("doc_id") % 2 === 0, 1).otherwise(-1).as("label"))
    val w = TextAnalysis.trainHashedBowPerceptron(
      docs, "doc_id", "text", labels, dim, iters = 10)
    // perceptron converges on separable classes: 100% training accuracy,
    // read through the same hashedBowScore surface production scoring uses
    // (the mean weight has the integer score's sign)
    val scores = TextAnalysis.hashedBowScore(docs, "doc_id", "text", w, dim)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    (0L until 40L).foreach { i =>
      if (i % 2 == 0) assert(scores(i) > 0, s"good doc $i scored ${scores(i)}")
      else assert(scores(i) < 0, s"junk doc $i scored ${scores(i)}")
    }
    // the trained table IS a pipeline model: clean() keeps only the good class
    val kept = CorpusPipeline.clean(docs, "doc_id", "text",
        weights = Some(w), classifierDim = dim)
      .collect().map(_.getLong(0)).toSet
    assert(kept == (0L until 40L).filter(_ % 2 == 0).toSet, s"got $kept")
  }

  test("self-bootstrapped quality model: heuristic weak labels -> perceptron -> " +
      "generalizes to held-out docs") {
    import org.apache.spark.sql.functions._
    import graft.ops.TextAnalysis
    val spark2 = spark
    import spark2.implicits._
    // dim large enough that a held-out doc's fresh tokens rarely collide
    // into the few strongly-positive common-word buckets (at 256 the
    // collision rate measurably flips ~25% of held-out mash docs)
    val dim = 4096
    // 80 docs in two populations with DISJOINT vocab per doc (word suffix
    // varies by id), so generalization must come from the hashed feature
    // space, not from memorizing exact tokens
    val natural = (0L until 40L).map { i =>
      (i, s"the quick report number $i describes the finding and the " +
        s"method in plain words with the usual care topic$i detail$i")
    }
    val mash = (40L until 80L).map { i =>
      (i, s"zxqv$i bnmp$i qwrt$i kjhg$i vcxz$i plmn$i aswd$i erty$i " +
        s"uiop$i fghj$i zxcv$i qazw$i")
    }
    val docs = (natural ++ mash).toDF("doc_id", "text")
    // weak labels from the engine's OWN heuristic — no human labels: a
    // stopword-ratio threshold splits the populations
    val stopRatio = TextAnalysis.stopwordRatio(col("text"),
      Seq("the", "and", "in", "with", "a", "of"))
    val labels = docs.select(col("doc_id"),
      when(stopRatio > 0.15, 1).otherwise(-1).as("label"))
    // train on the EVEN ids only; the odd ids are held out entirely
    val trainIds = docs.where(col("doc_id") % 2 === 0)
    val w = TextAnalysis.trainHashedBowPerceptron(
      trainIds, "doc_id", "text",
      labels.join(trainIds.select("doc_id"), Seq("doc_id"), "left_semi"),
      dim, iters = 10)
    // held-out docs separate BY MARGIN: every natural doc scores above
    // every mash doc (threshold-free — the property a deployment picks its
    // gate threshold inside). A hard 0-threshold would be fragile here by
    // the op's real nature: a mash doc scores ~0 and ONE fresh token
    // hash-colliding into a hot positive bucket flips it (observed:
    // "fghj45" and "method" share bucket 2599 at dim 4096) — which is why
    // hashed linear scorers are thresholded on validation data, exactly
    // what CorpusPipeline.clean's minScore parameter is for.
    val heldOut = docs.where(col("doc_id") % 2 === 1)
    val scores = TextAnalysis.hashedBowScore(heldOut, "doc_id", "text", w, dim)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val naturalMin = scores.collect { case (id, s) if id < 40 => s }.min
    val mashMax = scores.collect { case (id, s) if id >= 40 => s }.max
    assert(naturalMin > mashMax,
      s"margin separation failed: natural min $naturalMin vs mash max $mashMax")
    // and the midpoint threshold classifies every held-out doc correctly
    val thr = (naturalMin + mashMax) / 2
    assert(scores.forall { case (id, s) => (id < 40) == (s > thr) })
    // keep the dedup import earning its keep: the weight table is pure
    // function of (train docs, labels) — retraining reproduces it exactly
    val w2 = TextAnalysis.trainHashedBowPerceptron(
      trainIds.repartition(7), "doc_id", "text",
      labels.join(trainIds.select("doc_id"), Seq("doc_id"), "left_semi"),
      dim, iters = 10)
    val m1 = w.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val m2 = w2.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(m1 == m2, "training must be bit-reproducible across partitionings")
  }

  test("CorpusPipeline.clean: language gate keeps only langKeep docs") {
    import graft.ops.{CorpusPipeline, TextAnalysis}
    val docs = docsOf(
      1L -> "The cat and the dog are friends, that is known to all of us.",
      2L -> "Der Hund und die Katze sind nicht ein Paar, das ist bekannt.",
      3L -> "Le chat et le chien sont dans la maison et la vie est une joie.",
      4L -> "The weather today is quite nice and the sun is out in force.")
    // gate off (default): language never filters
    val all = CorpusPipeline.clean(docs, "doc_id", "text")
      .collect().map(_.getLong(0)).toSet
    assert(all == Set(1L, 2L, 3L, 4L))
    // keep English only
    val en = CorpusPipeline.clean(docs, "doc_id", "text", langKeep = Seq("en"))
      .collect().map(_.getLong(0)).toSet
    assert(en == Set(1L, 4L))
    // keep German+French
    val defr = CorpusPipeline.clean(docs, "doc_id", "text",
        langKeep = Seq("de", "fr"))
      .collect().map(_.getLong(0)).toSet
    assert(defr == Set(2L, 3L))
    // minLangScore: an unclassifiable doc (no profile hits anywhere) never
    // passes the gate even though argmax falls back to the first profile
    val docs2 = docsOf(5L -> "Zzz qqq www rrr ttt yyy uuu vvv mmm nnn xxx.")
    val none = CorpusPipeline.clean(docs2, "doc_id", "text",
        langKeep = TextAnalysis.LangProfiles.map(_._1) :+ "zh")
      .collect().map(_.getLong(0)).toSet
    assert(none.isEmpty)
  }

  test("hashedBowScore: bucket hashing, broadcast weights, unweighted buckets count as 0") {
    import org.apache.spark.sql.functions._
    import graft.ops.{Dedup, TextAnalysis}
    val spark2 = spark
    import spark2.implicits._
    val dim = 64
    def bucketOf(w: String): Long = spark.range(1)
      .select(pmod(Dedup.hash40(lit(w)), lit(dim.toLong))).head.getLong(0)
    val (bGood, bBad) = (bucketOf("good"), bucketOf("bad"))
    assume(bGood != bBad) // distinct at dim=64 for these two words
    val weights = Seq((bGood, 0.6), (bBad, -0.3)).toDF("bucket", "weight")
    val docs = docsOf(
      1L -> "good good bad",   // (0.6 + 0.6 - 0.3)/3 = 0.3
      2L -> "bad unknownword", // (-0.3 + 0.0)/2 = -0.15 (missing weight -> 0)
      3L -> "   ")             // no tokens -> null score, callers decide
    val out = TextAnalysis.hashedBowScore(docs, "doc_id", "text", weights, dim)
      .collect()
      .map(r => r.getLong(0) ->
        ((if (r.isNullAt(1)) None else Some(r.getDouble(1)), r.getLong(2))))
      .toMap
    assert(out.keySet == Set(1L, 2L, 3L))
    assert(math.abs(out(1L)._1.get - 0.3) < 1e-12 && out(1L)._2 == 3L)
    assert(math.abs(out(2L)._1.get + 0.15) < 1e-12 && out(2L)._2 == 2L)
    assert(out(3L)._1.isEmpty && out(3L)._2 == 0L)
  }

  test("wordCounts: term and doc counts with minCount pruning") {
    import graft.ops.TextAnalysis
    val docs = docsOf(
      1L -> "the cat and the dog",
      2L -> "the dog runs",
      3L -> "a dog")
    val out = TextAnalysis.wordCounts(docs, "doc_id", "text")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out("the") == ((3L, 2L)))   // 3 occurrences across 2 docs
    assert(out("dog") == ((3L, 3L)))
    assert(out("cat") == ((1L, 1L)))
    val pruned = TextAnalysis.wordCounts(docs, "doc_id", "text", minCount = 3L)
      .collect().map(_.getString(0)).toSet
    assert(pruned == Set("the", "dog"))
  }
}

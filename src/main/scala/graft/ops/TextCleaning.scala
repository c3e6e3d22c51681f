package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-cleaning operators a large-scale training-data pipeline runs
  * between crawl and tokenization: repetition diagnostics (the Gopher
  * rules' repetition family), cross-corpus span-level exact dedup and
  * line-level filtering (the C4 cleaning steps), and PII redaction.
  * Everything is declarative Catalyst — explode /
  * partial-aggregatable groupBy / join — so plans stay in whole-stage
  * codegen and map-side combine applies to every shuffle.
  *
  * Scale notes (100 TB lens):
  *  - Both ops shuffle on short string keys (an n-gram / a k-word span,
  *    tens of bytes). Rows carry only (id, pos) beside the key — document
  *    text never rides a shuffle; the cleaned text is rebuilt by a final
  *    per-document aggregate over kept spans.
  *  - All aggregates are min/max/sum/count → map-side partial aggregation
  *    halves every exchange. No windows on the hot path: first-occurrence
  *    is arg-min via `min(struct(id, pos))`, not a per-key sort.
  */
object TextCleaning {

  /** Non-empty, lowercased, whitespace-split tokens (the corpus-wide
    * convention shared with [[TextAnalysis.tokens]] and the DuckDB
    * oracles: `list_filter(regexp_split_to_array(lower(t),'\s+'), w->w<>'')`). */
  def tokens(textCol: Column): Column =
    filter(split(lower(textCol), "\\s+"), w => w =!= "")

  /** Word n-grams of `ws` joined by single spaces: positions 1..len-n+1.
    * Guarded for len < n — Spark's `sequence(1, stop)` counts DOWN when
    * stop < 1, which would feed slice() an illegal start of 0. */
  private def grams(ws: Column, n: Int): Column =
    when(size(ws) >= n,
      transform(sequence(lit(1), size(ws) - (n - 1)),
        i => array_join(slice(ws, i, lit(n)), " ")))
      .otherwise(array().cast("array<string>"))

  /** Gopher-style repetition statistics, one row per document:
    *
    *  - `n_tokens`        token count
    *  - `distinct_frac`   distinct tokens / tokens (1.0 = no repetition)
    *  - `topNgram_frac`   chars covered by the most frequent word n-gram
    *                      (count x gram length / doc char length), for the
    *                      "fraction of characters in the most common
    *                      n-gram" Gopher rules (n small, 2-4)
    *  - `dupNgram_frac`   chars covered by all word n-grams occurring more
    *                      than once (occurrences x length / doc chars,
    *                      clipped at 1.0 — overlaps intentionally counted
    *                      per occurrence, documented contract), for the
    *                      "fraction of characters in duplicated n-grams"
    *                      rules (n large, 5-10)
    *
    * Char length is over the space-normalized token stream
    * (`array_join(ws, ' ')`), so raw-whitespace differences don't skew the
    * fractions. One explode per n-gram size, partial-aggregated counts,
    * then a per-doc max/sum — two narrow shuffles keyed by (doc, gram).
    */
  def repetitionStats(docs: DataFrame, idCol: String, textCol: String,
      topN: Int = 2, dupN: Int = 5): DataFrame = {
    val id = col(idCol)
    val base = docs.select(id, tokens(col(textCol)).as("ws"))
      .where(size(col("ws")) > 0)
      .withColumn("n_chars", length(array_join(col("ws"), " ")))
      .withColumn("n_tokens", size(col("ws")))
      .withColumn("n_distinct", size(array_distinct(col("ws"))))

    def gramFracs(n: Int, top: Boolean): DataFrame =
      base.select(id, col("n_chars"), explode(grams(col("ws"), n)).as("g"))
        .where(col("g") =!= "")
        .groupBy(id, col("n_chars"), col("g"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy(id)
        .agg((if (top)
          max(col("cnt") * length(col("g")))
        else
          sum(when(col("cnt") > 1, col("cnt") * length(col("g"))).otherwise(0L)))
          .cast("double").as("covered"),
          first(col("n_chars")).as("nc"))
        .select(id, least(lit(1.0), col("covered") / col("nc")).as("frac"))

    base.select(id, col("n_tokens"),
        (col("n_distinct").cast("double") / col("n_tokens")).as("distinct_frac"))
      .join(gramFracs(topN, top = true).withColumnRenamed("frac", "top_gram_frac"),
        Seq(idCol), "left_outer")
      .join(gramFracs(dupN, top = false).withColumnRenamed("frac", "dup_gram_frac"),
        Seq(idCol), "left_outer")
      .select(id, col("n_tokens"), col("distinct_frac"),
        coalesce(col("top_gram_frac"), lit(0.0)).as("top_gram_frac"),
        coalesce(col("dup_gram_frac"), lit(0.0)).as("dup_gram_frac"))
  }

  /** PII patterns shared by the redaction op and the DuckDB oracle — kept
    * inside the regex subset common to Java's engine and RE2 (no
    * lookaround, no backreferences) so the SAME pattern strings run in
    * both. The application ORDER is part of the contract: emails first
    * (their host part can contain IP-shaped digit runs), then IPv4, then
    * phone numbers (evaluated over already-redacted text, so an email's or
    * IP's digits can never phone-match). */
  val EmailPattern: String =
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Pattern: String =
    "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b"
  /** Phone shapes: optional +CC, then 555-123-4567 / (555) 123-4567 /
    * 555.123.4567 — a separator (or parens) after the area code is
    * REQUIRED, so bare digit runs (ids, timestamps) never match, and the
    * `\b` before the area code stops matches STARTING inside a longer
    * separator-bearing run (serial "12345-678-9012" must not lose its
    * tail to a mid-run "345-678-9012" match). */
  val PhonePattern: String =
    "(?:\\+[0-9]{1,2}[ .-]?)?(?:\\([0-9]{3}\\)[ .-]?|\\b[0-9]{3}[ .-])[0-9]{3}[ .-]?[0-9]{4}\\b"

  private val PiiChain = Seq(
    EmailPattern -> "<EMAIL>", Ipv4Pattern -> "<IP>", PhonePattern -> "<PHONE>")

  /** The text with emails, IPv4 addresses and phone numbers replaced by
    * typed placeholder tokens — the standard pre-training scrub. A pure
    * codegen'd regexp_replace chain; idempotent (placeholders contain no
    * digits or @, so a second pass matches nothing). */
  def redactPii(textCol: Column): Column =
    PiiChain.foldLeft(textCol) { case (t, (pat, rep)) =>
      regexp_replace(t, pat, rep) }

  /** Per-document PII hit counts plus the redacted text. Counts are taken
    * sequentially over the progressively redacted text — exactly what the
    * replace chain sees, so `n_*` are the true replacement counts, not
    * overlapping-pattern guesses. */
  def piiStats(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t0 = col(textCol)
    val t1 = regexp_replace(t0, EmailPattern, "<EMAIL>")
    val t2 = regexp_replace(t1, Ipv4Pattern, "<IP>")
    docs.select(col(idCol),
      size(regexp_extract_all(t0, lit(EmailPattern), lit(0))).as("n_emails"),
      size(regexp_extract_all(t1, lit(Ipv4Pattern), lit(0))).as("n_ips"),
      size(regexp_extract_all(t2, lit(PhonePattern), lit(0))).as("n_phones"),
      regexp_replace(t2, PhonePattern, "<PHONE>").as("redacted"))
  }

  /** C4-style line-level cleaning: drop lines that don't end in terminal
    * punctuation (. ! ? or a closing quote after one), have fewer than
    * `minWords` whitespace words, or contain a blocklisted phrase
    * (case-insensitive substring — C4 uses "javascript", cookie/policy
    * boilerplate). Documents whose surviving lines number fewer than
    * `minLines` are dropped entirely (the C4 three-sentence floor).
    *
    * Pure array-lambda expressions (split / filter / array_join) — stays
    * in whole-stage codegen, no explode, no shuffle at all: a 100 TB scan
    * shape. Returns (id, clean_text, lines_kept, lines_dropped).
    */
  def lineFilter(docs: DataFrame, idCol: String, textCol: String,
      minWords: Int = 3, minLines: Int = 1,
      blocklist: Seq[String] = Seq("javascript", "lorem ipsum", "cookie policy"))
      : DataFrame = {
    val id = col(idCol)
    // split on \r?\n: CRLF documents (ubiquitous in web text) must not
    // leave a stray \r on every line — trim() only strips spaces, and a
    // trailing \r flips the terminal-punctuation test differently under
    // Java regex ('$' matches before it) vs RE2 (it doesn't)
    val lines = filter(transform(split(col(textCol), "\\r?\\n"), l => trim(l)),
      l => l =!= "")
    def keepLine(l: Column): Column = {
      val terminal = l.rlike("[.!?][\"']?$")
      val words = size(filter(split(l, "\\s+"), w => w =!= ""))
      val blocked = blocklist.map(b => lower(l).contains(b))
        .foldLeft(lit(false))(_ || _)
      terminal && words >= minWords && !blocked
    }
    docs.select(id, lines.as("ls"))
      .select(id, filter(col("ls"), keepLine _).as("kept"), size(col("ls")).as("n"))
      .where(size(col("kept")) >= minLines)
      .select(id,
        array_join(col("kept"), "\n").as("clean_text"),
        size(col("kept")).as("lines_kept"),
        (col("n") - size(col("kept"))).as("lines_dropped"))
  }

  /** C4-style cross-corpus exact span dedup: split every document into
    * consecutive k-word spans (the trailing remainder is a span too), keep
    * each distinct span's FIRST occurrence corpus-wide (min (id, pos) —
    * C4 keeps one occurrence of every duplicated three-sentence span),
    * and rebuild each document from its surviving spans in order.
    *
    * Returns (id, clean_text, spans_kept, spans_dropped); documents with
    * no tokens come back with empty clean_text. First-occurrence is an
    * arg-min aggregate keyed by the span string — no window sort (a
    * hyper-common span would serialize one task; the agg combines
    * map-side), and the arg-min row IS the kept row (span + fid + fpos),
    * so there is no join back onto the exploded stream and the stream is
    * consumed exactly once — nothing to persist. Span totals are
    * ceil(len/k) straight off the token counts, no explode.
    */
  def dedupSpans(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 5): DataFrame = {
    require(k >= 1, s"span width must be positive: $k")
    val id = col(idCol)
    val toks = docs.select(id, tokens(col(textCol)).as("ws"))
      .where(size(col("ws")) > 0)
    // span j (0-based) covers tokens j*k+1 .. j*k+k; ceil(len/k) spans
    val spans = toks.select(id,
        posexplode(transform(
          sequence(lit(0), ceil(size(col("ws")) / lit(k.toDouble)).cast("int") - 1),
          j => array_join(slice(col("ws"), j * k + 1, lit(k)), " ")))
          .as(Seq("pos", "span")))
    val kept = spans.groupBy(col("span"))
      .agg(min(struct(id.as("fid"), col("pos").as("fpos"))).as("f"))
      .select(col("f.fid").as(idCol), col("f.fpos").as("pos"), col("span"))
    val rebuilt = kept.groupBy(id).agg(
      array_join(transform(array_sort(collect_list(struct(col("pos"), col("span")))),
        s => s("span")), " ").as("clean_text"),
      count(lit(1)).as("spans_kept"))
    val totals = toks.select(id,
      ceil(size(col("ws")) / lit(k.toDouble)).cast("long").as("spans_total"))
    val out = docs.select(id)
      .join(rebuilt, Seq(idCol), "left_outer")
      .join(totals, Seq(idCol), "left_outer")
      .select(id,
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        coalesce(col("spans_kept"), lit(0L)).as("spans_kept"),
        (coalesce(col("spans_total"), lit(0L)) -
          coalesce(col("spans_kept"), lit(0L))).as("spans_dropped"))
    out
  }
}

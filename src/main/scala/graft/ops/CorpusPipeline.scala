package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The canonical corpus-cleaning recipe, composed from the first-class ops:
  *
  *  1. line-level C4 filtering    (TextCleaning.lineFilter)
  *  2. language-ID gate           (TextAnalysis.detectLang, optional)
  *  3. Gopher repetition gates    (TextCleaning.repetitionStats)
  *  4. PII redaction              (TextCleaning.redactPii)
  *  5. exact dedup                (content-hash arg-min, keep min id)
  *  6. fuzzy near-dup             (MinHash+LSH -> clusters -> keep min id,
  *                                 optional — the C4/RefinedWeb/FineWeb
  *                                 stage every real pretraining run applies)
  *  7. quality-classifier gate    (TextAnalysis.hashedBowScore, optional)
  *  8. cross-corpus span dedup    (TextCleaning.dedupSpans, optional)
  *
  * Each stage is exactly the underlying op's plan — the composition adds
  * no shuffle of its own beyond the ops' documented ones, and document
  * text rides only the per-row projection stages (1, 2, 4) plus the
  * near-dup signature scan (a narrow shingle explode; the LSH join itself
  * carries ids and band signatures only) and the final span rebuild; the
  * gates (3, 5, 6, 7) shuffle ids and short keys only.
  * Stage order is deliberate: line noise is removed before repetition
  * statistics (boilerplate lines would dominate the n-gram counters), the
  * language gate runs right after line filtering — the pretraining-corpus
  * convention: every later stage (stopword-profile scoring included) is
  * language-dependent, so off-language docs leave the pipeline first and
  * never ride a shuffle — redaction runs before hashing so two documents
  * differing only in PII dedup together, exact dedup runs before the
  * near-dup stage so byte-identical clusters never inflate an LSH bucket
  * (the maxBucket cap exists for genuinely degenerate buckets, not for
  * work exact dedup does better), and span dedup runs last because it is
  * the only stage that rewrites text across documents.
  */
object CorpusPipeline {

  def clean(docs: DataFrame, idCol: String, textCol: String,
      minWords: Int = 3, minLines: Int = 1,
      blocklist: Seq[String] = Seq("javascript", "lorem ipsum", "cookie policy"),
      langKeep: Seq[String] = Seq.empty,
      langProfiles: Seq[(String, Seq[String])] = TextAnalysis.LangProfiles,
      langScriptLangs: Seq[(String, String)] = Seq.empty,
      langCjk: Option[String] = Some("zh"),
      minLangScore: Int = 1,
      minDistinctFrac: Double = 0.3,
      maxTopGramFrac: Double = 0.5, maxDupGramFrac: Double = 0.5,
      nearDupBands: Int = 0, nearDupRowsPerBand: Int = 2,
      nearDupShingle: Int = 3, nearDupMaxBucket: Long = 1000L,
      weights: Option[DataFrame] = None, classifierDim: Int = 1 << 16,
      minScore: Double = 0.0,
      spanK: Int = 0): DataFrame = {
    val id = col(idCol)

    // 1. line filtering (no shuffle)
    val lined = TextCleaning
      .lineFilter(docs, idCol, textCol, minWords, minLines, blocklist)
      .select(id, col("clean_text").as(textCol))

    // 2. optional language gate (no shuffle — a pure codegen'd projection
    // filter): keep docs whose argmax profile is in `langKeep` AND whose
    // winning score clears `minLangScore` (the low-evidence cutoff the
    // reference's identifier applies)
    val langGated =
      if (langKeep.isEmpty) lined
      else lined.where(
        TextAnalysis.detectLang(col(textCol), langProfiles, langCjk, langScriptLangs)
          .isin(langKeep: _*) &&
        TextAnalysis.detectLangScore(col(textCol), langProfiles, langScriptLangs,
          langCjk) >= minLangScore)

    // 3. repetition gates (ids + grams shuffle; text stays behind and is
    // joined back by id)
    val reps = TextCleaning.repetitionStats(langGated, idCol, textCol)
      .where(col("distinct_frac") >= minDistinctFrac &&
        col("top_gram_frac") <= maxTopGramFrac &&
        col("dup_gram_frac") <= maxDupGramFrac)
      .select(id)
    val gated = langGated.join(reps, Seq(idCol), "left_semi")

    // 4. PII redaction (no shuffle)
    val redacted = gated.select(id, TextCleaning.redactPii(col(textCol)).as(textCol))

    // 5. exact dedup: arg-min id per content hash — (hash, id) shuffle
    // only, winners joined back by id
    val winners = redacted
      .select(id, md5(col(textCol)).as("__h"))
      .groupBy(col("__h")).agg(min(id).as(idCol))
      .select(id)
    val deduped = redacted.join(winners, Seq(idCol), "left_semi")

    // 6. optional fuzzy near-dup: MinHash+LSH candidates -> connected
    // components -> keep each cluster's min id (the already-oracled
    // Dedup.minhashLshCandidates / dedupClusters / dropNearDuplicates
    // composition). All pair generation is bucket-bounded (never a
    // self-join) and only (id, band, sig) ride the exchanges; the cluster
    // loop is delta-sized (candidate-pair graph, not the corpus).
    val nearDeduped =
      if (nearDupBands <= 0) deduped
      else Dedup.dropNearDuplicates(
        deduped,
        Dedup.minhashLshCandidates(deduped, idCol, textCol,
          bands = nearDupBands, rowsPerBand = nearDupRowsPerBand,
          n = nearDupShingle, maxBucket = nearDupMaxBucket),
        idCol)

    // 7. optional classifier gate ((id, bucket) shuffle). Token-less docs
    // score null; null > minScore is not-true, so they drop here — the
    // deliberate choice for a cleaning recipe (a doc with no tokens after
    // line filtering carries no trainable text)
    val scored = weights match {
      case Some(w) =>
        val keep = TextAnalysis
          .hashedBowScore(nearDeduped, idCol, textCol, w, classifierDim)
          .where(col("score") > minScore).select(id)
        nearDeduped.join(keep, Seq(idCol), "left_semi")
      case None => nearDeduped
    }

    // 8. optional cross-corpus span dedup (rebuilds text)
    if (spanK > 0)
      TextCleaning.dedupSpans(scored, idCol, textCol, spanK)
        .where(col("spans_kept") > 0)
        .select(id, col("clean_text").as(textCol))
    else scored
  }
}

package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The canonical corpus-cleaning recipe, composed from the first-class ops:
  *
  *  1. line-level C4 filtering    (TextCleaning.lineFilter)
  *  2. Gopher repetition gates    (TextCleaning.repetitionStats)
  *  3. PII redaction              (TextCleaning.redactPii)
  *  4. exact dedup                (content-hash arg-min, keep min id)
  *  5. quality-classifier gate    (TextAnalysis.hashedBowScore, optional)
  *  6. cross-corpus span dedup    (TextCleaning.dedupSpans, optional)
  *
  * Each stage is exactly the underlying op's plan — the composition adds
  * no shuffle of its own beyond the ops' documented ones, and document
  * text rides only the per-row projection stages (1, 3) plus the final
  * span rebuild; the gates (2, 4, 5) shuffle ids and short keys only.
  * Stage order is deliberate: line noise is removed before repetition
  * statistics (boilerplate lines would dominate the n-gram counters),
  * redaction runs before hashing so two documents differing only in PII
  * dedup together, and span dedup runs last because it is the only stage
  * that rewrites text across documents.
  */
object CorpusPipeline {

  def clean(docs: DataFrame, idCol: String, textCol: String,
      minWords: Int = 3, minLines: Int = 1,
      blocklist: Seq[String] = Seq("javascript", "lorem ipsum", "cookie policy"),
      minDistinctFrac: Double = 0.3,
      maxTopGramFrac: Double = 0.5, maxDupGramFrac: Double = 0.5,
      weights: Option[DataFrame] = None, classifierDim: Int = 1 << 16,
      minScore: Double = 0.0,
      spanK: Int = 0): DataFrame = {
    val id = col(idCol)

    // 1. line filtering (no shuffle)
    val lined = TextCleaning
      .lineFilter(docs, idCol, textCol, minWords, minLines, blocklist)
      .select(id, col("clean_text").as(textCol))

    // 2. repetition gates (ids + grams shuffle; text stays behind and is
    // joined back by id)
    val reps = TextCleaning.repetitionStats(lined, idCol, textCol)
      .where(col("distinct_frac") >= minDistinctFrac &&
        col("top_gram_frac") <= maxTopGramFrac &&
        col("dup_gram_frac") <= maxDupGramFrac)
      .select(id)
    val gated = lined.join(reps, Seq(idCol), "left_semi")

    // 3. PII redaction (no shuffle)
    val redacted = gated.select(id, TextCleaning.redactPii(col(textCol)).as(textCol))

    // 4. exact dedup: arg-min id per content hash — (hash, id) shuffle
    // only, winners joined back by id
    val winners = redacted
      .select(id, md5(col(textCol)).as("__h"))
      .groupBy(col("__h")).agg(min(id).as(idCol))
      .select(id)
    val deduped = redacted.join(winners, Seq(idCol), "left_semi")

    // 5. optional classifier gate ((id, bucket) shuffle). Token-less docs
    // score null; null > minScore is not-true, so they drop here — the
    // deliberate choice for a cleaning recipe (a doc with no tokens after
    // line filtering carries no trainable text)
    val scored = weights match {
      case Some(w) =>
        val keep = TextAnalysis
          .hashedBowScore(deduped, idCol, textCol, w, classifierDim)
          .where(col("score") > minScore).select(id)
        deduped.join(keep, Seq(idCol), "left_semi")
      case None => deduped
    }

    // 6. optional cross-corpus span dedup (rebuilds text)
    if (spanK > 0)
      TextCleaning.dedupSpans(scored, idCol, textCol, spanK)
        .where(col("spans_kept") > 0)
        .select(id, col("clean_text").as(textCol))
    else scored
  }
}

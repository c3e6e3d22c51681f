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
}

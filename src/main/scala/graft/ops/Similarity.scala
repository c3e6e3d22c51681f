package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (Array[Float]/Array[Double]),
  * expressed in codegen-friendly higher-order functions (`zip_with` +
  * `aggregate`), no UDFs. Brute-force is the exactness baseline; the
  * LSH-bucketed variant is the scale path (probes scan one bucket, not the
  * corpus).
  */
object Similarity {

  /** Cosine similarity of two array columns, computed in double. */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)
    val na = aggregate(zip_with(a, a, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)
    val nb = aggregate(zip_with(b, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)
    dot / sqrt(na * nb)
  }

  /** Brute-force cosine top-k: probes cross-join the corpus. Exact; O(P*N).
    * Ranking quantizes similarity to `decimals` so order is stable across
    * engines/summation orders. */
  def cosineTopK(corpus: DataFrame, probes: DataFrame, idCol: String,
      embCol: String, k: Int, decimals: Int = 3): DataFrame = {
    val c = corpus.select(col(idCol), col(embCol).cast("array<double>").as("e"))
    val p = probes.select(col(idCol).as("qid"), col(embCol).cast("array<double>").as("qe"))
    val joined = p.crossJoin(c)
      .withColumn("sim", round(cosine(col("qe"), col("e")), decimals))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col(idCol))
    joined.withColumn("rn", row_number().over(w)).where(col("rn") <= k)
      .select(col("qid"), col(idCol).as("neighbor"), col("sim"), col("rn"))
      .orderBy(col("qid"), col("rn"))
  }

  /** Sign-bit LSH bucket of the first `nBits` dimensions. */
  def signBucket(embCol: Column, nBits: Int = 4): Column =
    (0 until nBits).map(i => when(element_at(embCol, i + 1) > 0, 1 << i).otherwise(0))
      .reduce(_ + _)

  /** LSH-bucketed approximate nearest neighbour: probes join only their own
    * sign bucket — corpus scanned once, shuffled by bucket, each probe
    * compares against ~N/2^nBits candidates. */
  def lshNearest(corpus: DataFrame, probes: DataFrame, idCol: String,
      embCol: String, nBits: Int = 4, k: Int = 1, decimals: Int = 3): DataFrame = {
    val c = corpus.select(col(idCol), col(embCol).cast("array<double>").as("e"))
      .withColumn("bucket", signBucket(col("e"), nBits))
    val p = probes.select(col(idCol).as("qid"), col(embCol).cast("array<double>").as("qe"))
      .withColumn("bucket", signBucket(col("qe"), nBits))
    val joined = p.join(c, Seq("bucket"))
      .withColumn("sim", round(cosine(col("qe"), col("e")), decimals))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col(idCol))
    joined.withColumn("rn", row_number().over(w)).where(col("rn") <= k)
      .select(col("qid"), col("bucket"), col(idCol).as("neighbor"), col("sim"), col("rn"))
      .orderBy(col("qid"), col("rn"))
  }
}

/** Text analysis for corpus quality pipelines: tokenization, stopword
  * ratios, quality stats, language grouping — plain declarative aggregates.
  */
object TextAnalysis {

  def tokens(textCol: Column): Column = split(lower(textCol), "\\s+")

  def tokenCount(textCol: Column): Column =
    size(filter(tokens(textCol), w => w =!= ""))

  def stopwordRatio(textCol: Column, stopwords: Seq[String]): Column = {
    val ws = tokens(textCol)
    val stops = size(filter(ws, w => stopwords.map(s => w === s).reduce(_ || _)))
    stops.cast("double") / size(ws)
  }

  /** Per-language quality aggregates (cnt, avg tokens/chars, stop ratio). */
  def qualityByLang(docs: DataFrame, textCol: String, langCol: String,
      charsCol: String, stopwords: Seq[String] = Seq("the", "a")): DataFrame =
    docs
      .withColumn("ws", tokens(col(textCol)))
      .withColumn("n_tokens", size(col("ws")))
      .withColumn("n_stop", size(filter(col("ws"),
        w => stopwords.map(s => w === s).reduce(_ || _))))
      .groupBy(col(langCol))
      .agg(count(lit(1)).as("cnt"),
        round(avg(col("n_tokens")), 4).as("avg_tokens"),
        round(avg(col(charsCol)), 2).as("avg_chars"),
        round(avg(col("n_stop").cast("double") / col("n_tokens")), 4).as("stop_ratio"))
      .orderBy(col(langCol))
}

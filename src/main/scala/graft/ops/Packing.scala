package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training-data prep: assign documents to
  * fixed-token-budget training sequences. The two industry shapes:
  *
  *  - `packConcat` — concat-and-chunk (GPT-style pretraining): the corpus
  *    is one token stream, sequences are consecutive `maxLen` windows, and
  *    a document may straddle a boundary. Pure window math over prefix
  *    sums: one shuffle, whole-stage codegen, no sequential state.
  *
  *  - `packGreedy` — no-split packing (T5/SFT-style): a document never
  *    crosses a sequence boundary; greedy first-fit in deterministic
  *    order. Inherently an order-dependent scan, so it runs per SHARD:
  *    the id hash splits the corpus into `nShards` independent streams
  *    packed in parallel — the same decompose-then-stream pattern as the
  *    politeness queues. One shuffle (repartition + sortWithinPartitions)
  *    feeding a streaming O(1)-state pass; no group ever materializes.
  *
  * At 100 TB both ops shuffle only (id, token-count, bucket) — text never
  * rides an exchange; choose nShards ≈ executor-core count × a small
  * factor so each stream is long enough to amortize tail waste.
  *
  * Determinism: order within a shard is (bucket, id) with
  * bucket = hash40(id) % 10^6 (md5-derived), so DuckDB oracles replay the
  * identical packing decisions; rerunning at any parallelism gives
  * byte-identical assignments for a fixed nShards.
  */
object Packing {

  private val Buckets = 1000000L

  private def withShard(df: DataFrame, idCol: String, tokensCol: String,
      nShards: Int): DataFrame =
    df.select(col(idCol), col(tokensCol).cast("long").as(tokensCol))
      .withColumn("bucket", Dedup.hash40(col(idCol).cast("string")) % Buckets)
      .withColumn("shard", (col("bucket") % nShards).cast("int"))

  /** Concat-and-chunk assignment: per shard, documents in (bucket, id)
    * order form a token stream cut into `maxLen`-token sequences. Returns
    * (idCol, shard, seq, off, spans): the sequence holding the document's
    * first token, the offset inside it, and how many consecutive
    * sequences the document touches (≥ 1; empty docs count the one they
    * sit in). Exclusive prefix sums stay well inside double precision for
    * any real shard (< 2^52 tokens). */
  def packConcat(df: DataFrame, idCol: String, tokensCol: String, maxLen: Long,
      nShards: Int): DataFrame = {
    val w = Window.partitionBy(col("shard")).orderBy(col("bucket"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    withShard(df, idCol, tokensCol, nShards)
      .withColumn("prefix", coalesce(sum(col(tokensCol)).over(w), lit(0L)))
      .select(col(idCol), col("shard"),
        floor(col("prefix") / maxLen).cast("long").as("seq"),
        (col("prefix") % maxLen).as("off"),
        (floor((col("prefix") + greatest(col(tokensCol), lit(1L)) - 1) / maxLen)
          - floor(col("prefix") / maxLen) + 1).cast("long").as("spans"))
  }

  /** Greedy no-split packing: per shard, documents in (bucket, id) order
    * are appended to the open sequence; when one would overflow `maxLen`
    * the sequence closes and a new one opens. A document longer than
    * `maxLen` occupies a sequence alone (callers truncate or split
    * upstream). Returns (idCol, shard, seq, off). */
  def packGreedy(df: DataFrame, idCol: String, tokensCol: String, maxLen: Long,
      nShards: Int): DataFrame = {
    import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}
    val base = withShard(df, idCol, tokensCol, nShards)
      .select(col(idCol), col(tokensCol).as("toks"), col("shard"), col("bucket"))
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("bucket"), col(idCol))
    // Row-based pass so the id keeps its original type (string keys sort
    // and emit unchanged — a long cast would null them silently)
    val outSchema = StructType(Seq(base.schema.head,
      StructField("shard", IntegerType, nullable = false),
      StructField("seq", LongType, nullable = false),
      StructField("off", LongType, nullable = false)))
    base.mapPartitions { it =>
      // a hash partition may hold several shards back to back; reset the
      // stream state at each shard boundary (rows arrive shard-sorted)
      var curShard = Int.MinValue
      var seq = 0L
      var fill = 0L
      it.map { r =>
        val shard = r.getInt(2)
        val toks = r.getLong(1)
        if (shard != curShard) { curShard = shard; seq = 0L; fill = 0L }
        if (fill > 0 && fill + toks > maxLen) { seq += 1; fill = 0L }
        val off = fill
        fill += toks
        org.apache.spark.sql.Row(r.get(0), shard, seq, off)
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }
}

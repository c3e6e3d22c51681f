package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ops.{Packing, Sampling}

/** Invariants for the sequence-packing and token-budget-mixture ops
  * (row-for-row parity vs DuckDB is pinned by q_pack_concat /
  * q_pack_greedy / q_token_budget_mix; these specs assert the contracts
  * those oracles replay).
  */
class PackingSpec extends AnyFunSuite {
  private implicit lazy val spark: org.apache.spark.sql.SparkSession = SparkTestBase.spark

  private val MaxLen = 128L
  private val Shards = 8

  private lazy val docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .withColumn("n_tokens", graft.ops.TextAnalysis.tokenCount(col("text")).cast("long"))
    .cache()

  private lazy val toksById: Map[Long, Long] = docs
    .select("doc_id", "n_tokens").collect()
    .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("packGreedy: no sequence exceeds maxLen unless it is a lone oversized doc") {
    val rows = Packing.packGreedy(docs, "doc_id", "n_tokens", MaxLen, Shards)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(rows.length == 500)
    rows.groupBy { case (_, shard, seq, _) => (shard, seq) }.foreach {
      case ((shard, seq), members) =>
        val total = members.map { case (id, _, _, _) => toksById(id) }.sum
        assert(total <= MaxLen || members.length == 1,
          s"shard $shard seq $seq holds $total tokens across ${members.length} docs")
    }
  }

  test("packGreedy: offsets are the running token sums of the open sequence") {
    val rows = Packing.packGreedy(docs, "doc_id", "n_tokens", MaxLen, Shards)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    rows.groupBy { case (_, shard, seq, _) => (shard, seq) }.foreach {
      case (_, members) =>
        // within a sequence, docs sorted by offset must tile [0, total)
        val sorted = members.sortBy { case (_, _, _, off) => off }
        var expect = 0L
        sorted.foreach { case (id, _, _, off) =>
          assert(off == expect, s"doc $id expected offset $expect, got $off")
          expect += toksById(id)
        }
    }
  }

  test("packConcat: offsets and spans follow the per-shard prefix sums") {
    val rows = Packing.packConcat(docs, "doc_id", "n_tokens", MaxLen, Shards)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.length == 500)
    // reconstruct each doc's global prefix and check the stream tiles:
    // per shard, ordered by (seq, off), prefixes advance by exactly toks
    rows.groupBy { case (_, shard, _, _, _) => shard }.foreach { case (shard, members) =>
      val ordered = members.sortBy { case (_, _, seq, off, _) => (seq, off) }
      var prefix = 0L
      ordered.foreach { case (id, _, seq, off, spans) =>
        assert(seq == prefix / MaxLen && off == prefix % MaxLen,
          s"doc $id in shard $shard: prefix $prefix vs (seq $seq, off $off)")
        val toks = toksById(id)
        val lastSeq = (prefix + math.max(toks, 1L) - 1) / MaxLen
        assert(spans == lastSeq - seq + 1, s"doc $id spans")
        prefix += toks
      }
    }
  }

  test("packGreedy: string-keyed corpora keep their ids (no silent long cast)") {
    import spark.implicits._
    val strDocs = docs.select(concat(lit("doc-"), col("doc_id")).as("key"),
      col("n_tokens"))
    val rows = Packing.packGreedy(strDocs, "key", "n_tokens", MaxLen, Shards)
      .collect()
    assert(rows.length == 500)
    assert(rows.forall(r => r.getString(0) != null && r.getString(0).startsWith("doc-")))
  }

  test("packing is deterministic across runs and repartitions") {
    val a = Packing.packGreedy(docs, "doc_id", "n_tokens", MaxLen, Shards).collect().toSet
    val b = Packing.packGreedy(docs.repartition(13), "doc_id", "n_tokens", MaxLen, Shards)
      .collect().toSet
    assert(a == b)
  }

  test("packGreedy consumes real BPE counts (train -> encode -> pack end-to-end)") {
    import spark.implicits._
    val trainText = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
    val merges = graft.ops.TextAnalysis.bpeTrain(
      Seq((1L, trainText)).toDF("doc_id", "text"), "doc_id", "text", nMerges = 8)
    val encoded = graft.ops.TextAnalysis.bpeEncode(
      docs.select("doc_id", "text"), "doc_id", "text", merges).cache()
    val bpeById = encoded.select("doc_id", "n_bpe_tokens").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // real text encodes to nonzero counts that differ from whitespace counts
    assert(bpeById.values.sum > 0)
    assert(bpeById.exists { case (id, n) => n != toksById(id) })
    val rows = Packing.packGreedy(encoded, "doc_id", "n_bpe_tokens", MaxLen, Shards)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(rows.length == 500)
    rows.groupBy { case (_, shard, seq, _) => (shard, seq) }.foreach {
      case ((shard, seq), members) =>
        val total = members.map { case (id, _, _, _) => bpeById(id) }.sum
        assert(total <= MaxLen || members.length == 1,
          s"shard $shard seq $seq holds $total BPE tokens across ${members.length} docs")
    }
    encoded.unpersist()
  }

  test("tokenBudgetSample: budgets are respected and spent maximally in hash order") {
    val budgets = Map("src0" -> 800L, "src7" -> 150L)
    val kept = Sampling.tokenBudgetSample(docs, "doc_id", "source", "n_tokens",
        budgets, defaultBudget = 400L, nShards = Shards)
      .select("doc_id", "source", "cum_tokens").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    def budgetOf(src: String): Long = budgets.getOrElse(src, 400L)
    // (a) never over budget
    kept.groupBy(_._2).foreach { case (src, members) =>
      assert(members.map(_._3).max <= budgetOf(src))
    }
    // (b) maximal: the next doc in hash order would blow the budget.
    // Recompute the full hash-ordered stream per stratum driver-side.
    val all = docs.select(col("doc_id"), col("source"), col("n_tokens"),
        graft.ops.Dedup.hash40(col("doc_id").cast("string")).%(1000000L).as("bucket"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val keptIds = kept.map(_._1).toSet
    all.groupBy(_._2).foreach { case (src, members) =>
      var cum = 0L
      members.sortBy { case (id, _, _, bucket) => (bucket, id) }.foreach {
        case (id, _, toks, _) =>
          cum += toks
          assert(keptIds.contains(id) == (cum <= budgetOf(src)),
            s"doc $id of $src at cum $cum: kept=${keptIds.contains(id)}")
      }
    }
  }

  test("tokenBudgetSample: kept set is invariant to nShards (two-phase proof)") {
    def run(n: Int): Set[Long] =
      Sampling.tokenBudgetSample(docs, "doc_id", "source", "n_tokens",
        Map("src3" -> 900L), defaultBudget = 350L, nShards = n)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    val a = run(1)
    val b = run(7)
    val c = run(64)
    assert(a == b && b == c)
  }
}

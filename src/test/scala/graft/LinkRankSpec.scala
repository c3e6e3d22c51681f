package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.crawl.CrawlConfig
import graft.jobs.LinkDb
import graft.model.WebPage
import graft.score.ScoringFilter

/** LinkDb.linkRank — the offline link-analysis job whose scores
  * `LinkAnalysisScoring` consumes (reference scoring-link plugin reads a
  * rank no Nutch 2.2 job produces). Verified against an independent
  * single-threaded reference PageRank on hand graphs and a seeded random
  * graph, plus the Σrank=1 mass invariant and the applyRanks→generate-
  * priority integration.
  */
class LinkRankSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  /** Independent reference: damped PageRank with dangling-mass
    * redistribution over an in-memory adjacency map. */
  private def refRank(edges: Seq[(String, String)], iters: Int,
      d: Double = 0.85): Map[String, Double] = {
    val e = edges.distinct
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct
    val n = nodes.size
    val out = e.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    var r = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to iters) {
      val dm = nodes.filterNot(out.contains).map(r).sum
      val contrib = scala.collection.mutable.Map[String, Double]().withDefaultValue(0.0)
      for ((s, ds) <- out; t <- ds) contrib(t) += r(s) / ds.size
      r = nodes.map(u => u -> ((1.0 - d) / n + d * (contrib(u) + dm / n))).toMap
    }
    r
  }

  private def runBoth(edges: Seq[(String, String)], iters: Int): Unit = {
    val got = LinkDb.linkRank(spark, edges.toDF("in", "out"), iterations = iters)
      .collect().map(row => row.getString(0) -> row.getDouble(1)).toMap
    val want = refRank(edges, iters)
    assert(got.keySet == want.keySet,
      s"node sets differ: ${got.keySet.diff(want.keySet)} / ${want.keySet.diff(got.keySet)}")
    for ((u, w) <- want)
      assert(math.abs(got(u) - w) < 1e-9, s"rank($u): got ${got(u)}, want $w")
    val mass = got.values.sum
    assert(math.abs(mass - 1.0) < 1e-9, s"rank mass must stay 1.0, got $mass")
  }

  test("matches reference on a cyclic graph with no dangling nodes") {
    runBoth(Seq("A" -> "B", "A" -> "C", "B" -> "C", "C" -> "A"), iters = 5)
  }

  test("dangling mass is redistributed (single edge, sink node)") {
    runBoth(Seq("A" -> "B"), iters = 4)
    // closed form for iteration 1: dm = rB = 1/2;
    // rA = 0.075 + 0.85*(0 + 0.25) = 0.2875, rB = 0.075 + 0.85*0.75 = 0.7125
    val r1 = LinkDb.linkRank(spark, Seq("A" -> "B").toDF("in", "out"), iterations = 1)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(r1("A") - 0.2875) < 1e-12 && math.abs(r1("B") - 0.7125) < 1e-12)
  }

  test("matches reference on a seeded random graph with multi-edges and danglings") {
    val rnd = new scala.util.Random(42)
    val nodes = (0 until 30).map(i => s"n$i")
    // ~3 out-edges per non-dangling node; nodes 25-29 emit nothing (dangling
    // unless linked); duplicate edges included to pin the distinct semantics
    val edges = for {
      i <- 0 until 25
      _ <- 0 until 3
    } yield nodes(i) -> nodes(rnd.nextInt(30))
    val withDups = edges ++ edges.take(10)
    runBoth(withDups.filter { case (a, b) => a != b }, iters = 6)
  }

  test("applyRanks writes scores back; link scoring generates by them") {
    val pages = Seq(
      WebPage(url = "http://r.test/a", score = 0.1f),
      WebPage(url = "http://r.test/b", score = 0.2f),
      WebPage(url = "http://r.test/unranked", score = 0.3f)).toDS()
    val ranks = Seq(("http://r.test/a", 0.7), ("http://r.test/b", 0.25))
      .toDF("url", "rank")
    val scored = LinkDb.applyRanks(spark, pages, ranks)
      .collect().map(p => p.url -> p.score).toMap
    assert(scored("http://r.test/a") == 0.7f)
    assert(scored("http://r.test/b") == 0.25f)
    assert(scored("http://r.test/unranked") == 0.3f, "pages the analysis never saw keep their score")

    // the link policy turns those stored scores into generate priority
    val link = ScoringFilter(CrawlConfig(scoringFilterClass = "link"))
    val prio = scored.map { case (u, s) =>
      u -> link.generatorSortValue(WebPage(url = u, score = s), 1.0f)
    }
    assert(prio.toSeq.sortBy(-_._2).map(_._1) ==
      Seq("http://r.test/a", "http://r.test/unranked", "http://r.test/b"))
  }

  test("ranks order by link popularity (hub graph)") {
    // star: every spoke points at the hub; hub points at one spoke. The
    // hub<->s1 2-cycle oscillates (damped by 0.7225 per period), so run
    // past the transient: at 25 iterations hub leads s1 by ~0.07 (also a
    // regression guard for the per-iteration lineage cut — 25 iterations
    // without it would take 2^25 analyzer work).
    val edges = (1 to 8).map(i => s"s$i" -> "hub") :+ ("hub" -> "s1")
    val got = LinkDb.linkRank(spark, edges.toDF("in", "out"), iterations = 25)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got("hub") > got("s1") && got("s1") > got("s2"),
      s"hub must dominate, favored spoke second: $got")
  }
}

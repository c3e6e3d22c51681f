package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.GraftFunctions
import graft.url.UrlUtil

/** Native Catalyst expression registration + codegen paths. */
class FunctionsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("graft_* SQL functions evaluate through codegen and match the Scala core") {
    GraftFunctions.register(spark)
    val urls = Seq(
      "HTTP://Foo.Com:80//a/./b/../c.html#frag",
      "http://bar.baz.com:8983/to/index.html?a=b",
      "not a url")
    urls.toDF("url").createOrReplaceTempView("urls_v")
    val rows = spark.sql(
      """SELECT url, graft_uuid3(url) AS k, graft_normalize_url(url) AS n,
                graft_reverse_url(url) AS r
         FROM urls_v""").collect()
    val byUrl = rows.map(r => r.getString(0) -> (r.getString(1), r.getString(2), r.getString(3))).toMap

    val u1 = urls(0)
    assert(byUrl(u1)._1 == UrlUtil.uuid3(u1))
    assert(byUrl(u1)._2 == "http://foo.com/a/c.html")
    val u2 = urls(1)
    assert(byUrl(u2)._3 == "com.baz.bar:http:8983/to/index.html?a=b")
    // malformed url -> null normalize/reverse, but uuid3 still defined
    assert(byUrl("not a url")._2 == null && byUrl("not a url")._3 == null)
    assert(byUrl("not a url")._1 == UrlUtil.uuid3("not a url"))
  }

  test("GraftExtensions wires the SQL surface at session build (spark.sql.extensions path)") {
    import org.apache.spark.sql.SparkSession
    val old = spark // keep the shared session to restore
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // same SparkContext, fresh session state built WITH the extension —
      // no register() call anywhere
      val s2 = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new graft.functions.GraftExtensions)
        .getOrCreate()
      assert(s2 ne old, "builder must create a fresh session after clear")
      val got = s2.sql(
        "SELECT graft_uuid3('http://a.com/x') AS k, graft_reverse_url('http://a.com/x') AS r"
      ).head()
      assert(got.getString(0) == UrlUtil.uuid3("http://a.com/x"))
      assert(got.getString(1) == "com.a:http/x")
      // derived sessions inherit the extension-injected functions
      assert(s2.newSession().sql("SELECT graft_uuid3('y')").head().getString(0)
        == UrlUtil.uuid3("y"))
    } finally {
      SparkSession.setDefaultSession(old)
      SparkSession.setActiveSession(old)
    }
  }

  test("graft_bloom: Catalyst TypedImperativeAggregate builds a mergeable filter") {
    import spark.implicits._
    val keys = (0 until 5000).map(i => s"key-$i")
    val df = keys.toDF("k").repartition(8)
    val bf = graft.functions.BloomAgg.buildFilter(df, "k", expectedItems = 5000)
    assert(keys.forall(bf.mightContain), "no false negatives across partial-merge boundaries")
    val fps = (5000 until 10000).count(i => bf.mightContain(s"key-$i"))
    assert(fps < 250, s"fpp too high: $fps/5000")
    // grouped build: one filter per bucket via a plain groupBy
    graft.functions.BloomAgg.register(spark)
    val grouped = df.selectExpr("k", "length(k) % 3 AS b")
      .groupBy("b").agg(org.apache.spark.sql.functions.expr("graft_bloom(k, 2000, 0.01)").as("bloom"))
      .collect()
    assert(grouped.length == 3)
    grouped.foreach { r =>
      assert(graft.seen.BloomFilter.fromBytes(r.getAs[Array[Byte]]("bloom")).approxBitsSet > 0)
    }
  }
}

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
}

package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.net.http.HttpRequest.BodyPublishers
import java.net.http.HttpResponse.BodyHandlers

import org.json4s._
import org.json4s.jackson.JsonMethods
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.api.{ConfManager, GraftServer}

/** E2E over real HTTP: the REST surface mirrors the reference's NutchServer
  * resources (api/resources/JobResource.java, ConfigResource.java,
  * DbResource.java, AdminResource.java; endpoint shapes asserted by the
  * reference's own TestAPI.java). */
class ApiSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkTestBase.spark
  private var server: GraftServer = _
  private val client = HttpClient.newHttpClient()

  override def beforeAll(): Unit = server = new GraftServer(spark, 0).start()
  override def afterAll(): Unit = if (server != null) server.stop()

  private def base = s"http://127.0.0.1:${server.boundPort}"

  private def get(path: String): (Int, JValue) = {
    val r = client.send(HttpRequest.newBuilder(URI.create(s"$base$path")).GET().build(),
      BodyHandlers.ofString())
    (r.statusCode(), JsonMethods.parse(r.body()))
  }

  private def send(method: String, path: String, body: String): (Int, JValue) = {
    val r = client.send(HttpRequest.newBuilder(URI.create(s"$base$path"))
      .method(method, BodyPublishers.ofString(body))
      .header("Content-Type", "application/json").build(), BodyHandlers.ofString())
    (r.statusCode(), JsonMethods.parse(r.body()))
  }

  private def jstr(v: JValue): String = v.asInstanceOf[JString].s

  test("admin status reports configuration set and job counts") {
    val (code, body) = get("/admin")
    assert(code == 200)
    val m = body.values.asInstanceOf[Map[String, Any]]
    assert(m("configuration").asInstanceOf[Seq[_]].contains(ConfManager.Default))
    assert(m.contains("runningJobs"))
  }

  test("config CRUD: create, read, property get/set, delete; default undeletable") {
    val (c1, id) = send("POST", "/config/apitest",
      """{"generate.topn":"7","fetcher.server.delay":"0.0"}""")
    assert(c1 == 200 && jstr(id) == "apitest")
    assert(get("/config")._2.values.asInstanceOf[Seq[_]].contains("apitest"))
    assert(jstr(get("/config/apitest/generate.topn")._2) == "7")
    assert(send("PUT", "/config/apitest/db.fetch.retry.max", "5")._1 == 200)
    assert(jstr(get("/config/apitest/db.fetch.retry.max")._2) == "5")
    val cfgMap = get("/config/apitest")._2.values.asInstanceOf[Map[String, Any]]
    assert(cfgMap("generate.topn") == "7")
    // the typed view picks the properties up
    assert(server.confs.crawlConfig("apitest").get.topN == 7L)
    assert(server.confs.crawlConfig("apitest").get.retryMax == 5)
    assert(get("/config/apitest/no.such.prop")._1 == 404)
    assert(send("DELETE", "/config/apitest", "")._2 == JBool(true))
    assert(send("DELETE", s"/config/${ConfManager.Default}", "")._2 == JBool(false))
  }

  test("job create runs a crawl to FINISHED; db query reads the result table") {
    val table = SparkTestBase.tmpDir("api-crawl") + "/frontier"
    send("POST", "/config/fastcrawl",
      """{"fetcher.server.delay":"0.0","db.fetch.interval.default":"0"}""")
    val (code, idJ) = send("POST", "/job/create",
      s"""{"crawlId":"c1","type":"CRAWL","confId":"fastcrawl",
          "args":{"table":"$table","pages":150,"hosts":6,"depth":1,"numSeeds":4}}""")
    assert(code == 200)
    val id = jstr(idJ)
    assert(id.startsWith("c1-CRAWL-"))

    var state = "IDLE"
    val deadline = System.nanoTime() + 120L * 1000000000L
    while (state != "FINISHED" && state != "FAILED" && System.nanoTime() < deadline) {
      Thread.sleep(200)
      state = get(s"/job/$id")._2.values.asInstanceOf[Map[String, Any]]("state").toString
    }
    val info = get(s"/job/$id")._2.values.asInstanceOf[Map[String, Any]]
    assert(state == "FINISHED", s"job info: $info")
    val result = info("result").asInstanceOf[Map[String, Any]]
    assert(result("roundsCompleted").toString.toInt == 1)

    // job listing includes it, filtered by crawlId
    val listed = get("/job?crawlId=c1")._2.values.asInstanceOf[Seq[Map[String, Any]]]
    assert(listed.exists(_("id") == id))
    assert(get("/job?crawlId=nope")._2.values.asInstanceOf[Seq[_]].isEmpty)

    // /db: projection + key-range (reversed-url order) + limit
    val (dbCode, dbBody) = send("POST", "/db",
      s"""{"table":"$table","fields":["status","score"],"limit":5}""")
    assert(dbCode == 200)
    val rows = dbBody.values.asInstanceOf[Map[String, Any]]("values")
      .asInstanceOf[Seq[Map[String, Any]]]
    assert(rows.nonEmpty && rows.size <= 5)
    assert(rows.head.keySet == Set("url", "status", "score"))
    // range-restricted query returns a subset
    val host0 = rows.head("url").toString
    val rev = graft.url.UrlUtil.reverseUrl(host0)
    val sub = send("POST", "/db",
      s"""{"table":"$table","startKey":"$rev","endKey":"$rev","fields":["status"]}""")
      ._2.values.asInstanceOf[Map[String, Any]]("values").asInstanceOf[Seq[Map[String, Any]]]
    assert(sub.map(_("url")) == Seq(host0))

    // unknown job id and bad requests surface as HTTP errors, not 500s
    assert(get("/job/nope-1")._1 == 404)
    // malformed bodies are client errors, not 500s: unparsable JSON and a
    // JSON array where an object is required
    assert(send("POST", "/job/create", """{not json""")._1 == 400)
    assert(send("POST", "/job/create", """[1,2,3]""")._1 == 400)
    assert(send("POST", "/job/create", """{"crawlId":"x"}""")._1 == 400)
    assert(send("POST", "/job/create",
      """{"crawlId":"x","type":"NOPE"}""")._1 == 400)
    assert(send("POST", "/job/create",
      """{"crawlId":"x","type":"CRAWL","confId":"nope"}""")._1 == 400)
  }

  test("graceful stop halts a multi-round crawl at a round boundary") {
    val table = SparkTestBase.tmpDir("api-stop") + "/frontier"
    val (_, idJ) = send("POST", "/job/create",
      s"""{"crawlId":"c2","type":"CRAWL","confId":"default",
          "args":{"table":"$table","pages":120,"hosts":6,"depth":40,"numSeeds":3}}""")
    val id = jstr(idJ)
    // let it enter the round loop, then ask for a graceful stop
    Thread.sleep(500)
    assert(get(s"/job/$id/stop")._2 == JBool(true))
    val deadline = System.nanoTime() + 180L * 1000000000L
    var info: Map[String, Any] = null
    var state = ""
    while (state != "FINISHED" && state != "FAILED" && state != "KILLED" &&
        System.nanoTime() < deadline) {
      Thread.sleep(200)
      info = get(s"/job/$id")._2.values.asInstanceOf[Map[String, Any]]
      state = info("state").toString
    }
    assert(state == "FINISHED", s"job info: $info")
    val rounds = info("result").asInstanceOf[Map[String, Any]]("roundsCompleted")
      .toString.toInt
    assert(rounds < 40, s"stop flag ignored: completed all $rounds rounds")

    // resubmitting the SAME table resumes from the stop point: the crawl's
    // snapshot-based checkpoint makes the new job run only the missing
    // rounds up to its depth
    val target = rounds + 2
    val (_, id2J) = send("POST", "/job/create",
      s"""{"crawlId":"c2","type":"CRAWL","confId":"default",
          "args":{"table":"$table","pages":120,"hosts":6,"depth":$target,"numSeeds":3}}""")
    val id2 = jstr(id2J)
    var st2 = ""
    val dl2 = System.nanoTime() + 180L * 1000000000L
    while (st2 != "FINISHED" && st2 != "FAILED" && System.nanoTime() < dl2) {
      Thread.sleep(200)
      st2 = get(s"/job/$id2")._2.values.asInstanceOf[Map[String, Any]]("state").toString
    }
    assert(st2 == "FINISHED")
    // HEAD stage is "update" normally, "compact" if target hit the
    // every-8-rounds default compaction boundary
    val head = new graft.table.SnapshotTable(table).lastCompleted
    assert(head.exists(_._1 == target),
      s"resume must complete exactly through round $target, head=$head")
  }

  test("abort on an unknown id is false; stop on finished job is safe") {
    assert(get("/job/zzz/abort")._2 == JBool(false))
  }
}

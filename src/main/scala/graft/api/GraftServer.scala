package graft.api

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.Executors

import scala.util.control.NonFatal

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.SparkSession
import org.json4s._
import org.json4s.jackson.JsonMethods

/** REST job-management server — the reference's NutchServer
  * (api/NutchServer.java:57-120; resources/JobResource.java,
  * ConfigResource.java, DbResource.java, AdminResource.java) rebuilt on the
  * JDK's built-in HTTP server (zero extra dependencies; json4s ships with
  * Spark). Binds localhost only, same as the reference default.
  *
  * Endpoints (1:1 with the reference resource methods):
  * {{{
  *   GET    /admin                    server status (uptime, confs, running jobs)
  *   GET    /admin/stop               shut the server down
  *   GET    /job[?crawlId=]           list jobs
  *   POST   /job/create               {crawlId, type, confId?, args?} -> job id
  *   GET    /job/{id}                 job info (state, msg, result)
  *   GET    /job/{id}/stop            graceful stop at next stage boundary
  *   GET    /job/{id}/abort           hard kill (cancels the Spark job group)
  *   GET    /config                   list config ids
  *   POST   /config/{id}              create/replace config from a JSON map
  *   GET    /config/{id}              the config map
  *   GET    /config/{id}/{prop}       one property
  *   PUT    /config/{id}/{prop}       set one property (body = raw value)
  *   DELETE /config/{id}              delete config
  *   POST   /db                       {table, batchId?, startKey?, endKey?,
  *                                     fields?, limit?} -> rows
  * }}}
  */
final class GraftServer(spark: SparkSession, port: Int = 0) {

  val confs = new ConfManager
  val jobs = new JobManager(spark, confs, new JobFactory(spark))
  private val started = System.currentTimeMillis()
  @volatile private var stopping = false

  private val pool = Executors.newFixedThreadPool(4)
  private val server: HttpServer = {
    val s = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
    s.setExecutor(pool)
    s.createContext("/", handle _)
    s
  }

  def start(): GraftServer = { server.start(); this }
  def boundPort: Int = server.getAddress.getPort
  def stop(): Unit = { jobs.shutdown(); server.stop(0); pool.shutdownNow() }

  // ---- routing ------------------------------------------------------------

  private def handle(ex: HttpExchange): Unit = {
    val path = ex.getRequestURI.getPath.stripSuffix("/")
    val parts = path.split("/").filter(_.nonEmpty).toList
    val method = ex.getRequestMethod
    try {
      (method, parts) match {
        case ("GET", "admin" :: Nil) => json(ex, 200, adminStatus)
        case ("GET", "admin" :: "stop" :: Nil) =>
          json(ex, 200, JString("stopping")); stopping = true
          new Thread(() => { Thread.sleep(100); stop() }).start()
        case ("GET", "job" :: Nil) =>
          val crawlId = Option(ex.getRequestURI.getQuery)
            .flatMap(_.split("&").collectFirst {
              case kv if kv.startsWith("crawlId=") => kv.drop("crawlId=".length)
            })
          json(ex, 200, toJson(jobs.list(crawlId, JobState.ANY).map(_.toMap)))
        case ("POST", "job" :: "create" :: Nil) =>
          val body = JsonMethods.parse(readBody(ex)).values.asInstanceOf[Map[String, Any]]
          val cfg = JobConfig(
            crawlId = body.getOrElse("crawlId", "default").toString,
            jobType = body.getOrElse("type",
              throw new IllegalArgumentException("type required")).toString,
            confId = body.getOrElse("confId", ConfManager.Default).toString,
            args = body.get("args").collect { case m: Map[_, _] =>
              m.map { case (k, v) => k.toString -> v } }.getOrElse(Map.empty))
          json(ex, 200, JString(jobs.create(cfg)))
        case ("GET", "job" :: id :: Nil) =>
          jobs.get(id) match {
            case Some(info) => json(ex, 200, toJson(info.toMap))
            case None => json(ex, 404, err(s"unknown job $id"))
          }
        case ("GET", "job" :: id :: "stop" :: Nil) => json(ex, 200, JBool(jobs.stop(id)))
        case ("GET", "job" :: id :: "abort" :: Nil) => json(ex, 200, JBool(jobs.abort(id)))
        case ("GET", "config" :: Nil) => json(ex, 200, toJson(confs.list))
        case ("GET", "config" :: id :: Nil) =>
          confs.get(id) match {
            case Some(m) => json(ex, 200, toJson(m))
            case None => json(ex, 404, err(s"unknown config $id"))
          }
        case ("GET", "config" :: id :: prop :: Nil) =>
          confs.getProperty(id, prop) match {
            case Some(v) => json(ex, 200, JString(v))
            case None => json(ex, 404, err(s"unknown property $prop"))
          }
        case ("POST", "config" :: id :: Nil) =>
          val props = JsonMethods.parse(readBody(ex)).values.asInstanceOf[Map[String, Any]]
            .map { case (k, v) => k -> String.valueOf(v) }
          json(ex, 200, JString(confs.create(id, props)))
        case ("PUT", "config" :: id :: prop :: Nil) =>
          confs.setProperty(id, prop, readBody(ex).trim.stripPrefix("\"").stripSuffix("\""))
          json(ex, 200, JBool(true))
        case ("DELETE", "config" :: id :: Nil) => json(ex, 200, JBool(confs.delete(id)))
        case ("POST", "db" :: Nil) =>
          val f = JsonMethods.parse(readBody(ex)).values.asInstanceOf[Map[String, Any]]
          val reader = new DbReader(spark,
            JobFactory.str(f, "table").getOrElse("/tmp/graft-frontier"))
          val rows = reader.runQuery(
            batchId = JobFactory.str(f, "batchId"),
            startKey = JobFactory.str(f, "startKey"),
            endKey = JobFactory.str(f, "endKey"),
            fields = f.get("fields").collect { case xs: Seq[_] => xs.map(_.toString) }
              .getOrElse(Seq.empty),
            limit = JobFactory.int(f, "limit").getOrElse(100))
          json(ex, 200, toJson(Map("values" -> rows)))
        case _ => json(ex, 404, err(s"no route: $method $path"))
      }
    } catch {
      case e: IllegalArgumentException => json(ex, 400, err(e.getMessage))
      // malformed request bodies (unparsable JSON, or a JSON array where an
      // object is required) are client errors, not server faults — the
      // reference's BadRequest mapping
      case e: com.fasterxml.jackson.core.JsonProcessingException =>
        json(ex, 400, err(s"malformed JSON body: ${e.getOriginalMessage}"))
      case e: ClassCastException =>
        json(ex, 400, err("request body must be a JSON object"))
      case NonFatal(e) =>
        json(ex, 500, err(s"${e.getClass.getSimpleName}: ${e.getMessage}"))
    } finally ex.close()
  }

  /** Reference NutchStatus (api/model/response/NutchStatus.java). */
  private def adminStatus: JValue = toJson(Map(
    "startDate" -> started,
    "configuration" -> confs.list,
    "jobs" -> jobs.list(None, JobState.ANY).size,
    "runningJobs" -> jobs.runningCount,
    "stopping" -> stopping))

  // ---- plumbing -----------------------------------------------------------

  private def readBody(ex: HttpExchange): String =
    new String(ex.getRequestBody.readAllBytes(), UTF_8)

  private def err(msg: String): JValue = JObject("error" -> JString(msg))

  private def toJson(v: Any): JValue = v match {
    case null => JNull
    case j: JValue => j
    case s: String => JString(s)
    case b: Boolean => JBool(b)
    case i: Int => JInt(i)
    case l: Long => JInt(l)
    case bi: BigInt => JInt(bi)
    case d: Double => JDouble(d)
    case f: Float => JDouble(f.toDouble)
    case n: Number => JDouble(n.doubleValue)
    case m: Map[_, _] => JObject(m.map { case (k, x) => k.toString -> toJson(x) }.toList)
    case xs: Iterable[_] => JArray(xs.map(toJson).toList)
    case xs: Array[_] => JArray(xs.map(toJson).toList)
    case other => JString(other.toString)
  }

  private def json(ex: HttpExchange, code: Int, body: JValue): Unit = {
    val bytes = JsonMethods.compact(JsonMethods.render(body)).getBytes(UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length)
    ex.getResponseBody.write(bytes)
  }
}

/** `spark-submit --class graft.api.GraftServerMain <jar> [port]` — the
  * reference's `bin/nutch nutchserver` entry (NutchServer.java:160-200). */
object GraftServerMain {
  def main(args: Array[String]): Unit = {
    val port = args.headOption.map(_.toInt).getOrElse(8081) // NutchServer DEFAULT_PORT
    val spark = SparkSession.builder()
      .appName("graft-server")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val server = new GraftServer(spark, port).start()
    println(s"GraftServer listening on 127.0.0.1:${server.boundPort}")
    Thread.currentThread().join()
  }
}

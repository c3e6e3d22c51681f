package graft.api

import java.util.concurrent.{ArrayBlockingQueue, ConcurrentHashMap, ThreadPoolExecutor, TimeUnit}
import java.util.concurrent.atomic.{AtomicBoolean, AtomicLong}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession

/** Job-management surface mirroring the reference's REST job model
  * (reference: api/JobManager.java:26-41, api/impl/RAMJobManager.java:30-99,
  * api/impl/JobWorker.java:44-92) re-expressed for Spark's execution model:
  * a submitted job runs on a pool thread inside its own Spark job group, so
  * `abort` is `SparkContext.cancelJobGroup` (every running distributed stage
  * of that job is cancelled cluster-wide) and `stop` raises a cooperative
  * flag the multi-round tools check at their next stage boundary — the same
  * "stop at next checkpoint" contract as the reference's NutchTool.
  */
object JobState extends Enumeration {
  val IDLE, RUNNING, FINISHED, FAILED, KILLING, KILLED, STOPPING, ANY = Value
}

/** Reference: api/model/request/JobConfig.java:23-28. */
final case class JobConfig(
    crawlId: String,
    jobType: String,
    confId: String = ConfManager.Default,
    args: Map[String, Any] = Map.empty)

/** Reference: api/model/response/JobInfo.java:24-46. */
final class JobInfo(
    val id: String,
    val config: JobConfig,
    @volatile var state: JobState.Value,
    @volatile var msg: String,
    @volatile var result: Map[String, Any] = null) {

  def toMap: Map[String, Any] = Map(
    "id" -> id,
    "crawlId" -> config.crawlId,
    "type" -> config.jobType,
    "confId" -> config.confId,
    "args" -> config.args,
    "state" -> state.toString,
    "msg" -> msg,
    "result" -> result)
}

/** One queued/running job: the reference's JobWorker (api/impl/JobWorker.java)
  * with the Hadoop job handle replaced by a Spark job group.
  */
private[api] final class JobWorker(
    val info: JobInfo,
    spark: SparkSession,
    tool: GraftTool) extends Runnable {

  val stopRequested = new AtomicBoolean(false)

  override def run(): Unit = {
    if (info.state == JobState.KILLED) return
    info.state = JobState.RUNNING
    info.msg = "running"
    // Thread-local: every Spark stage this tool launches belongs to the
    // job-group `info.id`; abort cancels the whole group mid-shuffle.
    spark.sparkContext.setJobGroup(info.id, s"graft ${info.config.jobType}", true)
    try {
      info.result = tool.run(info.config.args, () => stopRequested.get)
      info.state = JobState.FINISHED
      info.msg = "finished"
    } catch {
      case e: Throwable =>
        if (info.state == JobState.KILLING || stopRequested.get) {
          info.state = JobState.KILLED
          info.msg = "killed"
        } else {
          info.state = JobState.FAILED
          info.msg = s"failed: ${e.getClass.getSimpleName}: ${e.getMessage}"
        }
    } finally spark.sparkContext.clearJobGroup()
  }

  /** Graceful: finish the current stage, skip the rest (JobWorker.java:72-80). */
  def stopJob(): Boolean = {
    if (info.state == JobState.RUNNING) info.state = JobState.STOPPING
    stopRequested.set(true)
    true
  }

  /** Hard kill: cancel the Spark job group (JobWorker.java:82-92). */
  def killJob(): Boolean = {
    stopRequested.set(true)
    info.state match {
      case JobState.RUNNING | JobState.STOPPING =>
        info.state = JobState.KILLING
        spark.sparkContext.cancelJobGroup(info.id)
        true
      case JobState.IDLE =>
        info.state = JobState.KILLED; true
      case _ => false
    }
  }
}

/** Reference: api/impl/RAMJobManager.java + NutchServerPoolExecutor
  * (NutchServer.java:95-99: pool of 10, capacity 100).
  */
final class JobManager(
    spark: SparkSession,
    confs: ConfManager,
    factory: JobFactory,
    poolSize: Int = 10,
    capacity: Int = 100) {

  private val seq = new AtomicLong(0)
  private val workers = new ConcurrentHashMap[String, JobWorker]()
  private val executor = new ThreadPoolExecutor(
    poolSize, poolSize, 1, TimeUnit.HOURS, new ArrayBlockingQueue[Runnable](capacity))

  def create(config: JobConfig): String = {
    require(config.args != null, "Arguments cannot be null!")
    val conf = confs.crawlConfig(config.confId)
      .getOrElse(throw new IllegalArgumentException(s"Unknown confId ${config.confId}"))
    val tool = factory.createToolByType(config.jobType, conf)
      .getOrElse(throw new IllegalArgumentException(s"Unknown job type ${config.jobType}"))
    val id = s"${config.crawlId}-${config.jobType}-${seq.incrementAndGet()}"
    val worker = new JobWorker(new JobInfo(id, config, JobState.IDLE, "idle"), spark, tool)
    workers.put(id, worker)
    executor.execute(worker)
    id
  }

  def list(crawlId: Option[String], state: JobState.Value): Seq[JobInfo] =
    workers.values.asScala.toSeq
      .filter(w => crawlId.forall(_ == w.info.config.crawlId))
      .filter(w => state == JobState.ANY ||
        (state == JobState.RUNNING && w.info.state == JobState.RUNNING) ||
        (state != JobState.RUNNING && w.info.state != JobState.RUNNING))
      .map(_.info)
      .sortBy(_.id)

  def get(id: String): Option[JobInfo] = Option(workers.get(id)).map(_.info)
  def stop(id: String): Boolean = Option(workers.get(id)).exists(_.stopJob())
  def abort(id: String): Boolean = Option(workers.get(id)).exists(_.killJob())
  def runningCount: Int = workers.values.asScala.count(_.info.state == JobState.RUNNING)

  def shutdown(): Unit = {
    workers.values.asScala.foreach(_.stopJob())
    executor.shutdownNow()
  }
}

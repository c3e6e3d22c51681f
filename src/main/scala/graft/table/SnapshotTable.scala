package graft.table

import java.nio.charset.StandardCharsets

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Iceberg-style snapshot table over plain Parquet.
  *
  * No Iceberg jar ships in /opt/spark/jars (offline build), so this thin
  * layer supplies the pieces the engine needs from it: append-only
  * snapshots with manifests, snapshot-isolation reads, latest-key-wins
  * upsert-on-read, compaction, and snapshot-based checkpoint resume
  * (north_rule: "append results ... to Iceberg with per-partition lineage
  * columns and snapshot-based checkpoint resume"). It replaces the
  * reference's mutable Gora/HBase webpage store (upsert A5 of SURVEY.md §2).
  * All metadata IO goes through the Hadoop FileSystem API, so the layout
  * works identically on file://, hdfs:// or s3a:// paths.
  *
  * Layout:
  * {{{
  *   <path>/data/sid=<id>/part-*.parquet   one directory per snapshot
  *   <path>/snapshots/<id>.json            manifest: id, parent, round, stage, base
  *   <path>/HEAD                           current snapshot id (atomic rename)
  * }}}
  *
  * A "base" snapshot is a compaction result: reads only consider snapshots
  * from the newest base at-or-before the read snapshot onward. Rows carry
  * `snapshot_id`; the current view resolves duplicate keys by latest
  * snapshot_id — exactly the put-wins semantics of the reference store.
  */
final class SnapshotTable(val path: String, val keyCol: String = "key",
    hadoopConf: Configuration = new Configuration()) {

  case class Snapshot(id: Long, parent: Long, round: Int, stage: String, base: Boolean)

  private val root = new Path(path)
  private def fs: FileSystem = root.getFileSystem(hadoopConf)
  private def snapshotsDir = new Path(root, "snapshots")
  private def dataDir(id: Long) = new Path(root, s"data/sid=$id")
  private def headFile = new Path(root, "HEAD")

  private def readString(p: Path): String = {
    val in = fs.open(p)
    try {
      val bos = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { bos.write(buf, 0, n); n = in.read(buf) }
      new String(bos.toByteArray, StandardCharsets.UTF_8)
    } finally in.close()
  }

  private def writeString(p: Path, s: String): Unit = {
    val out = fs.create(p, true)
    try out.write(s.getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  def exists: Boolean = fs.exists(snapshotsDir)

  def snapshots: Seq[Snapshot] =
    if (!fs.exists(snapshotsDir)) Seq.empty
    else fs.listStatus(snapshotsDir).toSeq
      .filter(_.getPath.getName.endsWith(".json"))
      .map(st => parseManifest(readString(st.getPath)))
      .sortBy(_.id)

  def head: Option[Long] =
    if (fs.exists(headFile)) Some(readString(headFile).trim.toLong) else None

  def headSnapshot: Option[Snapshot] = head.flatMap(id => snapshots.find(_.id == id))

  /** Append a snapshot; returns its id. The df gains a `snapshot_id` lineage
    * column. Manifest write + HEAD rename make the commit atomic-enough for
    * single-writer crawl rounds (a crash before the HEAD move leaves an
    * orphan data dir that is never referenced).
    */
  def append(df: DataFrame, round: Int, stage: String, base: Boolean = false): Long = {
    val id = head.getOrElse(0L) + 1
    val parent = head.getOrElse(0L)
    df.withColumn("snapshot_id", lit(id))
      .write.mode("overwrite").parquet(dataDir(id).toString)
    fs.mkdirs(snapshotsDir)
    writeString(new Path(snapshotsDir, s"$id.json"),
      s"""{"id":$id,"parent":$parent,"round":$round,"stage":"$stage","base":$base}""")
    val tmp = new Path(root, ".HEAD.tmp")
    writeString(tmp, id.toString)
    fs.delete(headFile, false)
    fs.rename(tmp, headFile)
    id
  }

  private def parseManifest(s: String): Snapshot = {
    def field(name: String): String = {
      val re = ("\"" + name + "\":\\s*(\"[^\"]*\"|[^,}]*)").r
      re.findFirstMatchIn(s).map(_.group(1).stripPrefix("\"").stripSuffix("\"")).getOrElse("")
    }
    Snapshot(field("id").toLong, field("parent").toLong, field("round").toInt,
      field("stage"), field("base").toBoolean)
  }

  /** Snapshot ids contributing to a read at `atId`: newest base <= atId,
    * then every snapshot after it up to atId. */
  private def chainFor(atId: Long): Seq[Long] = {
    val all = snapshots.filter(_.id <= atId)
    val lastBase = all.filter(_.base).map(_.id).maxOption.getOrElse(0L)
    all.map(_.id).filter(_ >= lastBase)
  }

  /** All row versions visible at a snapshot (multi-version scan — the shape
    * generate/stats read, SURVEY.md §1.4). */
  def readAt(spark: SparkSession, atId: Long): DataFrame = {
    val dirs = chainFor(atId).map(dataDir(_).toString)
    if (dirs.isEmpty) throw new IllegalStateException(s"empty table at $path")
    spark.read.parquet(dirs: _*)
  }

  /** Just the rows written by one snapshot (a stage's delta). */
  def readSnapshot(spark: SparkSession, id: Long): DataFrame =
    spark.read.parquet(dataDir(id).toString)

  /** The snapshot id of a given (round, stage) commit, if present. */
  def snapshotFor(round: Int, stage: String): Option[Long] =
    snapshots.find(s => s.round == round && s.stage == stage).map(_.id)

  def readAll(spark: SparkSession): DataFrame =
    readAt(spark, head.getOrElse(throw new IllegalStateException(s"no HEAD at $path")))

  /** Latest-key-wins resolution = the reference store's put/upsert
    * semantics: for each key only the most recent write survives. */
  def currentView(spark: SparkSession): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col("snapshot_id").desc)
    readAll(spark)
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__rn")
  }

  /** Rewrite the resolved view as a single base snapshot, bounding the
    * number of deltas a read must merge — the Iceberg rewrite/compact
    * analogue; run every k rounds at scale. */
  def compact(spark: SparkSession, round: Int): Long = {
    val resolved = currentView(spark).drop("snapshot_id").cache()
    resolved.count() // materialize before the new snapshot dir is written
    val id = append(resolved, round, "compact", base = true)
    resolved.unpersist()
    id
  }

  /** Highest completed round+stage, for checkpoint resume. */
  def lastCompleted: Option[(Int, String)] = headSnapshot.map(s => (s.round, s.stage))

  /** Like [[lastCompleted]], but restricted to the stages the caller's
    * resume logic understands: walks the parent chain from HEAD past any
    * foreign snapshot (e.g. an offline "linkrank" rescore appended between
    * crawl rounds). Treating a foreign head as "round done" would silently
    * skip the round's remaining crawl stages on resume. */
  def lastCompletedOf(known: Set[String]): Option[(Int, String)] = {
    val byId = snapshots.map(s => s.id -> s).toMap
    Iterator.iterate(headSnapshot)(_.flatMap(s => byId.get(s.parent)))
      .takeWhile(_.isDefined).flatten
      .find(s => known.contains(s.stage))
      .map(s => (s.round, s.stage))
  }

  /** Drop the whole table (reference: DbCleanerJob store.deleteSchema, A10). */
  def drop(): Unit = fs.delete(root, true)
}

package graft.warc

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** A decoded WARC record as a flat row (the read-side schema). */
final case class WarcRow(
    url: String,
    warc_type: String,
    warc_date: String,
    record_id: String,
    content_type: String,
    payload: Array[Byte])

/** WARC export/ingest over Spark.
  *
  * Write side: one `part-NNNNN.warc` file per partition, produced inside
  * `mapPartitions` — the standard shape for a custom archive sink. File
  * names and contents are fully deterministic (partition id names the
  * file; record ids derive from the url via uuid3; dates from fetchTime),
  * so a task retry rewrites the identical bytes — idempotent by
  * construction, no commit protocol needed.
  *
  * Read side: the built-in `binaryFile` source loads whole files (WARC is
  * delimiter-free and therefore not arbitrarily splittable — the
  * large-scale convention is many medium files, e.g. ~1 GB, which is
  * exactly what one-file-per-partition produces; parallelism = file
  * count), then the codec explodes each file into records. Projection
  * after read prunes columns, and binaryFile pushes down path filters.
  */
object WarcIO {

  /** Epoch ms -> `YYYY-MM-DDThh:mm:ssZ` (second precision, per spec). */
  def warcDate(epochMs: Long): String =
    java.time.Instant.ofEpochSecond(Math.floorDiv(epochMs, 1000L)).toString

  /** Pages (url, content, contentType, fetchTime) -> WARC response
    * records. Null payloads (unfetched rows) are skipped, matching what a
    * crawler archives. The record id derives from (url, fetchTime-in-ms),
    * not the url alone: an export carries one record per FETCHED version
    * ROW (several captures of one url across rounds), and WARC 1.0
    * requires globally unique ids — the millisecond time disambiguates
    * two captures landing inside the same second, which the
    * second-truncated WARC-Date header cannot. contentType flows from
    * crawled-server data, so CR/LF are stripped before it becomes a
    * header line (the codec rejects them). */
  def toRecords(rows: Iterator[(String, Array[Byte], String, Long)]): Iterator[WarcRecord] =
    rows.collect { case (url, content, contentType, fetchTime) if content != null =>
      val date = warcDate(fetchTime)
      WarcRecord(
        warcType = "response",
        targetUri = url,
        date = date,
        recordId = "urn:uuid:" + graft.url.UrlUtil.uuid3(url + "\n" + fetchTime),
        contentType = if (contentType == null || contentType.isEmpty)
          "application/octet-stream"
        else contentType.map(c => if (c == '\r' || c == '\n') ' ' else c),
        payload = content)
    }

  /** Export pages to `dir` as WARC, one file per partition; returns the
    * number of records written. Records stream to the file one at a time —
    * task memory is O(largest record), not O(archive), so the ~1 GB-file
    * convention never hits the JVM array ceiling. All I/O goes through the
    * Hadoop FileSystem API resolved from the path, so `dir` may live on
    * HDFS/S3 in cluster mode — executor-local java.nio paths would scatter
    * the export across worker disks. With `gzip = true` the files are
    * `.warc.gz` with one gzip member per record (the Common-Crawl-style
    * interchange convention — see WarcCodec.recordBytesGz). */
  def write(pages: DataFrame, dir: String, gzip: Boolean = false): Long = {
    import pages.sparkSession.implicits._
    val hconf = new org.apache.spark.util.SerializableConfiguration(
      pages.sparkSession.sparkContext.hadoopConfiguration)
    val dirPath = new org.apache.hadoop.fs.Path(dir)
    val dfs = dirPath.getFileSystem(hconf.value)
    dfs.mkdirs(dirPath)
    // Overwrite semantics, established ONCE in the driver before any task
    // starts: the per-task commit below treats an existing destination as
    // written by a twin of the same job — an assumption that only holds
    // WITHIN one job. Re-running an export into a non-empty dir would
    // otherwise silently keep stale part files (including higher part
    // numbers from a previous larger export) while reporting the new
    // count. Deleting stale parts (and crashed-attempt tmps) here keeps
    // the task-level twin protocol race-free and the directory's contents
    // exactly this job's output.
    val stale = dfs.globStatus(new org.apache.hadoop.fs.Path(dirPath,
      "{part-*.warc,part-*.warc.gz,.part-*.tmp}"))
    if (stale != null) stale.foreach(s => dfs.delete(s.getPath, false))
    pages
      .select(col("url"), col("content"), col("contentType"), col("fetchTime"))
      .as[(String, Array[Byte], String, Long)]
      .mapPartitions { rows =>
        val part = TaskContext.getPartitionId()
        val recs = toRecords(rows)
        if (!recs.hasNext) Iterator.empty
        else {
          // write-then-rename: a speculative twin or retried attempt either
          // sees the finished file or replaces it with identical bytes
          // (file contents are deterministic) — never a half-truncated
          // interleaving. HDFS rename is atomic; object stores degrade to
          // copy but still never expose the tmp name as the final file.
          val base = new org.apache.hadoop.fs.Path(dir)
          // a PRIVATE FileSystem instance: setWriteChecksum on the shared
          // FileSystem.CACHE instance would silently disable .crc sidecars
          // for every later writer in this JVM (seen-bank checkpoints etc.)
          val fs = org.apache.hadoop.fs.FileSystem.newInstance(
            base.getFileSystem(hconf.value).getUri, hconf.value)
          try {
            // no .crc sidecars in the archive dir (local FS is checksummed
            // by default); WARC is length-framed and the decode is strict
            fs.setWriteChecksum(false)
            val ext = if (gzip) "warc.gz" else "warc"
            val f = new org.apache.hadoop.fs.Path(base, f"part-$part%05d.$ext%s")
            val tmp = new org.apache.hadoop.fs.Path(base,
              f".part-$part%05d.${TaskContext.get().taskAttemptId()}%d.tmp")
            val out = fs.create(tmp, true)
            var n = 0L
            try recs.foreach { r =>
              out.write(if (gzip) WarcCodec.recordBytesGz(r)
                else WarcCodec.recordBytes(r))
              n += 1
            }
            finally out.close()
            // Commit: file contents are a pure function of the partition's
            // rows, so an existing destination was written by a twin of
            // this very task and is already correct — NEVER delete it
            // first (delete-then-rename leaves a window where a killed
            // retry has destroyed the committed file and renamed nothing).
            // Existing file => drop our tmp and succeed; otherwise rename,
            // and losing the rename race to a twin is equally fine.
            if (fs.exists(f)) fs.delete(tmp, false)
            else if (!fs.rename(tmp, f)) {
              // a twin may have won between the exists probe and the
              // rename; only a failed rename with NO file at the
              // destination is real data loss
              if (!fs.exists(f))
                throw new java.io.IOException(s"warcexport: rename $tmp -> $f failed")
              fs.delete(tmp, false)
            }
            Iterator.single(n)
          } finally fs.close()
        }
      }
      .collect().sum // ≤ one row per partition
  }

  /** WARC response records -> frontier page rows (the "switch engines"
    * ingest path: a third-party WARC dump becomes fetched pages a graft
    * crawl can parse / index / update from). Keys derive from the url
    * (uuid3); the record date becomes fetchTime; a FETCH marker stamps the
    * given batch so the parse stage's mark filter picks the rows up.
    *
    * An archive may carry several captures of one url (one record per
    * fetched version row on export); all import rows of one batch share a
    * snapshot, where duplicate keys would resolve nondeterministically —
    * so the import keeps exactly the latest capture per url (max
    * (warc_date, record_id); ISO-8601 dates compare chronologically as
    * strings). The reduce partial-aggregates map-side, so one shuffle
    * moves at most one payload per url per map partition. Batch only —
    * streaming ingest composes its own maps with StreamingDedup. */
  def toPages(records: Dataset[WarcRow],
      batchId: String = "warc-import", round: Int = 1): Dataset[graft.model.WebPage] = {
    import records.sparkSession.implicits._
    records.filter(_.warc_type == "response")
      .groupByKey(_.url)
      .reduceGroups { (a: WarcRow, b: WarcRow) =>
        if (Ordering[(String, String)].gteq((a.warc_date, a.record_id),
          (b.warc_date, b.record_id))) a else b
      }
      .map(_._2)
      .map { r =>
      graft.model.WebPage(
        key = graft.url.UrlUtil.uuid3(r.url),
        url = r.url,
        status = graft.model.CrawlStatus.FETCHED,
        fetchTime =
          try java.time.Instant.parse(r.warc_date).toEpochMilli
          catch { case _: java.time.format.DateTimeParseException => 0L },
        content = r.payload,
        contentType = r.content_type,
        markers = Map(graft.model.Marks.FETCH -> batchId),
        batchId = batchId,
        round = round)
    }
  }

  /** Ingest a directory of `.warc` / `.warc.gz` files as a Dataset of
    * records (gz archives inflate member-wise with the strict bounded
    * decoder — see WarcCodec.gunzipStrict; raise `maxInflated` for
    * legitimate archives above the 1 GiB default ceiling). */
  def read(spark: SparkSession, dir: String,
      maxInflated: Long = WarcCodec.DefaultMaxInflated): Dataset[WarcRow] = {
    import spark.implicits._
    toRows(spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.{warc,warc.gz}")
      .load(dir)
      .select(col("content")).as[Array[Byte]], maxInflated)
  }

  /** Ingest a directory of legacy `.arc` / `.arc.gz` files (the pre-WARC
    * Internet-Archive container — see [[ArcCodec]]) as the same WarcRow
    * stream [[read]] produces, so `toPages` and everything downstream
    * consume old ARC corpora unchanged. */
  def readArc(spark: SparkSession, dir: String,
      maxInflated: Long = WarcCodec.DefaultMaxInflated): Dataset[WarcRow] = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.{arc,arc.gz}")
      .load(dir)
      .select(col("content")).as[Array[Byte]]
      .flatMap(bytes => ArcCodec.decodeAuto(bytes, maxInflated).map(r =>
        WarcRow(r.targetUri, r.warcType, r.date, r.recordId, r.contentType,
          r.payload)))
  }

  /** Continuous ARC ingest — the streaming counterpart of [[readArc]],
    * same file-stream exactly-once contract as [[readStream]]. */
  def readArcStream(spark: SparkSession, dir: String,
      maxInflated: Long = WarcCodec.DefaultMaxInflated): Dataset[WarcRow] = {
    import spark.implicits._
    spark.readStream.format("binaryFile")
      .schema(BinaryFileSchema)
      .option("pathGlobFilter", "*.{arc,arc.gz}")
      .load(dir)
      .select(col("content")).as[Array[Byte]]
      .flatMap(bytes => ArcCodec.decodeAuto(bytes, maxInflated).map(r =>
        WarcRow(r.targetUri, r.warcType, r.date, r.recordId, r.contentType,
          r.payload)))
  }

  /** The binaryFile source's fixed schema (a streaming read must declare
    * it — file streams don't infer). */
  private val BinaryFileSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("path",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("modificationTime",
      org.apache.spark.sql.types.TimestampType),
    org.apache.spark.sql.types.StructField("length",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("content",
      org.apache.spark.sql.types.BinaryType)))

  /** Continuous WARC ingest: watch `dir` as a Structured Streaming file
    * source — every `.warc` file dropped in becomes one input row whose
    * records explode downstream (binaryFile is a standard FileFormat, so
    * the file stream tracks processed files in its checkpoint; an archive
    * is ingested exactly once per query). Compose with
    * [[toPages]]-shaped maps and `StreamingDedup.dropSeen` keyed by the
    * page key for exactly-once pages across re-delivered archives. */
  def readStream(spark: SparkSession, dir: String,
      maxInflated: Long = WarcCodec.DefaultMaxInflated): Dataset[WarcRow] = {
    import spark.implicits._
    toRows(spark.readStream.format("binaryFile")
      .schema(BinaryFileSchema)
      .option("pathGlobFilter", "*.{warc,warc.gz}")
      .load(dir)
      .select(col("content")).as[Array[Byte]], maxInflated)
  }

  private def toRows(files: Dataset[Array[Byte]],
      maxInflated: Long): Dataset[WarcRow] = {
    import files.sparkSession.implicits._
    files.flatMap(bytes => WarcCodec.decodeAuto(bytes, maxInflated).map(r =>
      WarcRow(r.targetUri, r.warcType, r.date, r.recordId, r.contentType,
        r.payload)))
  }
}

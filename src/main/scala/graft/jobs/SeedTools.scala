package graft.jobs

import org.apache.spark.sql.{Dataset, SparkSession}

/** One directory-dump entry: the seed url plus the topic path and the
  * optional title/description snippet the reference lifts into metadata
  * (DmozParser snippet mode stores `_dmoz_title_`/`_dmoz_desc_`). */
final case class DmozSeed(url: String, topic: String, title: String,
    description: String)

/** Bulk-seed tooling (reference tools/DmozParser.java): convert an
  * open-directory RDF dump (`<Topic r:id=...>` sections containing
  * `<ExternalPage about=url>` entries with `<d:Title>`/`<d:Description>`
  * children) into seed urls, with the reference's three admission rules —
  * the Top/Adult section filter, an optional topic regex, and the
  * md5-subset sampler (`abs(hash ^ skew) % subsetDenom == 0`, the
  * deterministic "take 1/N of the directory" switch for bootstrap crawls).
  *
  * Spark shape: RDF is not line-splittable (topic state spans lines), so
  * each dump FILE parses whole inside one task via the binaryFile source —
  * parallelism = file count, the same contract as WARC ingest; a dump too
  * big for one task splits into several files at Topic boundaries. The
  * per-file parse is a single sequential regex scan, not a DOM load, so
  * task memory is O(file), never O(tree).
  */
object SeedTools {

  /** Topic sections + page entries in document order; one regex pass. */
  private val EventRe =
    ("""(?s)<Topic\s+r:id="([^"]*)"|""" +
      """<ExternalPage\s+about="([^"]*)"[^>]*>(.*?)</ExternalPage>""").r
  private val TitleRe = """(?s)<d:Title>(.*?)</d:Title>""".r
  private val DescRe = """(?s)<d:Description>(.*?)</d:Description>""".r

  /** The five predefined XML entities (directory dumps use no others). */
  private def unescape(s: String): String = s
    .replace("&lt;", "<").replace("&gt;", ">")
    .replace("&quot;", "\"").replace("&apos;", "'")
    .replace("&amp;", "&") // last, so &amp;lt; decodes to &lt; not <

  /** Reference subset sampler shape (DmozParser.java:152-157): an
    * md5-derived int hash of the url, xor'd with a caller skew, |.| mod
    * the denominator — deterministic, uniform, engine-independent. */
  def subsetHash(url: String, skew: Int): Int = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(url.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val h = ((d(0) & 0xff) << 24) | ((d(1) & 0xff) << 16) |
      ((d(2) & 0xff) << 8) | (d(3) & 0xff)
    math.abs(h ^ skew)
  }

  /** Pure per-file parse — also the test surface. */
  def parseContent(xml: String, subsetDenom: Int = 1,
      includeAdult: Boolean = false, skew: Int = 0,
      topicPattern: Option[String] = None): Iterator[DmozSeed] = {
    require(subsetDenom >= 1, s"subsetDenom must be positive: $subsetDenom")
    val topicRe = topicPattern.map(_.r)
    var topic = ""
    EventRe.findAllMatchIn(xml).flatMap { m =>
      if (m.group(1) != null) {
        topic = unescape(m.group(1))
        None
      } else {
        val url = unescape(m.group(2))
        val keep =
          (includeAdult || !topic.startsWith("Top/Adult")) &&
            topicRe.forall(_.matches(topic)) &&
            subsetHash(url, skew) % subsetDenom == 0
        if (!keep) None
        else {
          val body = m.group(3)
          Some(DmozSeed(url, topic,
            TitleRe.findFirstMatchIn(body).map(t => unescape(t.group(1)).trim)
              .getOrElse(""),
            DescRe.findFirstMatchIn(body).map(d => unescape(d.group(1)).trim)
              .getOrElse("")))
        }
      }
    }
  }

  /** Distributed parse of a dump file / directory of dump files. */
  def parseDmozRdf(spark: SparkSession, path: String, subsetDenom: Int = 1,
      includeAdult: Boolean = false, skew: Int = 0,
      topicPattern: Option[String] = None): Dataset[DmozSeed] = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .select("content").as[Array[Byte]]
      .flatMap(bytes => parseContent(
        new String(bytes, java.nio.charset.StandardCharsets.UTF_8),
        subsetDenom, includeAdult, skew, topicPattern))
  }
}

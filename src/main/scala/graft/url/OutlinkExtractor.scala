package graft.url

import java.util.regex.Pattern

/** Regex outlink extraction from plain text (SURVEY.md B18).
  *
  * Re-expression of the reference's plain-text URL extractor
  * (reference: src/main/java/org/apache/nutch/parse/OutlinkExtractor.java:50-120):
  * same URL pattern (scheme required — bare "www.x.com" does NOT match,
  * per reference TestOutlinkExtractor), case-insensitive multiline matching,
  * and the 60 s per-document bail-out that guards against parasitic
  * backtracking inputs (postscript is the reference's known example).
  *
  * The pattern is also exposed for the declarative/columnar path
  * (`extractAll`), where Spark's codegen'd `regexp_extract_all` does the
  * same work without leaving Tungsten.
  */
object OutlinkExtractor {

  /** URL regex (reference OutlinkExtractor.java:58-60). */
  val UrlPattern: String =
    "([A-Za-z][A-Za-z0-9+.-]{1,120}:[A-Za-z0-9/](([A-Za-z0-9$_.+!*,;/?:@&~=-])|%[A-Fa-f0-9]{2}){1,333}" +
      "(#([a-zA-Z0-9][a-zA-Z0-9$_.+!*,;/?:@&~=%-]{0,1000}))?)"

  private val compiled: Pattern =
    Pattern.compile(UrlPattern, Pattern.CASE_INSENSITIVE | Pattern.MULTILINE)

  /** All (url, anchor) matches in `plainText`, in text order, bailing out
    * after `timeLimitMs` (reference OutlinkExtractor.java:101-110). */
  def getOutlinks(plainText: String, anchor: String = "",
      timeLimitMs: Long = 60000L): Seq[(String, String)] = {
    if (plainText == null || plainText.isEmpty) return Seq.empty
    val start = System.currentTimeMillis()
    val m = compiled.matcher(plainText)
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var bail = false
    while (!bail && m.find()) {
      out += (m.group(0) -> anchor)
      if (System.currentTimeMillis() - start >= timeLimitMs) bail = true
    }
    out.toSeq
  }

  /** Columnar form: array of all URL matches in a text column — stays in
    * whole-stage codegen (no UDF). */
  def extractAll(textCol: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.regexp_extract_all(textCol,
      org.apache.spark.sql.functions.lit(UrlPattern), org.apache.spark.sql.functions.lit(0))
}

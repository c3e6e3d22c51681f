package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.lang.{LangCodes, PageLanguage}
import graft.ops.TextAnalysis
import graft.jobs.{IndexerJob, LanguageIndexingFilter}
import graft.model.{CrawlStatus, Marks, WebPage}

/** ISO-639 normalization + page language resolution. The 44 golden cases
  * reproduce the reference's TestHTMLLanguageParser.testParseLanguage
  * (plugin/language-identifier/.../TestHTMLLanguageParser.java:76-104). */
class LangSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val Golden: Seq[(String, Option[String])] = Seq(
    "(SCHEME=ISO.639-1) sv" -> Some("sv"),
    "(SCHEME=RFC1766) sv-FI" -> Some("sv"),
    "(SCHEME=Z39.53) SWE" -> Some("sv"),
    "EN_US, SV, EN, EN_UK" -> Some("en"),
    "English Swedish" -> Some("en"),
    "English, swedish" -> Some("en"),
    "English,Swedish" -> Some("en"),
    "Other (Svenska)" -> Some("sv"),
    "SE" -> Some("se"),
    "SV" -> Some("sv"),
    "SV charset=iso-8859-1" -> Some("sv"),
    "SV-FI" -> Some("sv"),
    "SV; charset=iso-8859-1" -> Some("sv"),
    "SVE" -> Some("sv"),
    "SW" -> Some("sw"),
    "SWE" -> Some("sv"),
    "SWEDISH" -> Some("sv"),
    "Sv" -> Some("sv"),
    "Sve" -> Some("sv"),
    "Svenska" -> Some("sv"),
    "Swedish" -> Some("sv"),
    "Swedish, svenska" -> Some("sv"),
    "en, sv" -> Some("en"),
    "sv" -> Some("sv"),
    "sv, be, dk, de, fr, no, pt, ch, fi, en" -> Some("sv"),
    "sv,en" -> Some("sv"),
    "sv-FI" -> Some("sv"),
    "sv-SE" -> Some("sv"),
    "sv-en" -> Some("sv"),
    "sv-fi" -> Some("sv"),
    "sv-se" -> Some("sv"),
    "sv; Content-Language: sv" -> Some("sv"),
    "sv_SE" -> Some("sv"),
    "sve" -> Some("sv"),
    "svenska, swedish, engelska, english" -> Some("sv"),
    "sw" -> Some("sw"),
    "swe" -> Some("sv"),
    "swe.SPR." -> Some("sv"),
    "sweden" -> Some("sv"),
    "swedish" -> Some("sv"),
    "swedish," -> Some("sv"),
    "text/html; charset=sv-SE" -> Some("sv"),
    "text/html; sv" -> Some("sv"),
    "torp, stuga, uthyres, bed & breakfast" -> None)

  test("parseLanguage matches the reference's 44 golden cases") {
    Golden.foreach { case (in, want) =>
      assert(LangCodes.parseLanguage(in) == want, s"input: '$in'")
    }
    assert(LangCodes.parseLanguage(null).isEmpty)
    assert(LangCodes.parseLanguage("").isEmpty)
  }

  test("parseLanguageCol mirrors the scalar over the goldens (codegen path)") {
    val df = Golden.map(_._1).toDF("raw")
      .withColumn("norm", LangCodes.parseLanguageCol(col("raw")))
    val got = df.collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap
    Golden.foreach { case (in, want) =>
      assert(got(in) == want, s"columnar input: '$in'")
    }
  }

  test("parseLanguage resolves 639-2 B/T codes and English names across the registry") {
    assert(LangCodes.parseLanguage("deu").contains("de"))
    assert(LangCodes.parseLanguage("ger").contains("de"))
    assert(LangCodes.parseLanguage("French").contains("fr"))
    assert(LangCodes.parseLanguage("zho").contains("zh"))
    assert(LangCodes.parseLanguage("Portuguese").contains("pt"))
    assert(LangCodes.parseLanguage("jpn").contains("ja"))
  }

  test("wide detectLang self-detects every profile and script language") {
    val samples: Seq[(String, String)] =
      TextAnalysis.WideLangProfiles.map { case (l, ws) =>
        l -> (ws.mkString(" ") + " " + ws.mkString(" "))
      } ++ Seq(
        "ru" -> "и в не на он что как это",
        "el" -> "και το να δεν είναι με του",
        "ar" -> "في من على أن إلى عن هذا",
        "he" -> "של את על לא זה עם הוא",
        "hi" -> "के है में की का से नहीं",
        "th" -> "ที่ และ การ ใน เป็น ของ ได้",
        "ko" -> "이 그 있다 하는 것 수 들",
        "ja" -> "の に は を た が で",
        "zh" -> "的 是 了 在 不 有 这")
    val df = samples.toDF("lang", "sample")
      .withColumn("pred", TextAnalysis.detectLang(col("sample"),
        TextAnalysis.WideLangProfiles, cjkLang = None,
        scriptLangs = TextAnalysis.ScriptLangs))
    val miss = df.where(col("pred") =!= col("lang")).collect()
    assert(miss.isEmpty, miss.map(r => s"${r.getString(0)}->${r.getString(2)}").mkString(", "))
  }

  test("kana-bearing Japanese resolves ja over zh; pure-kanji resolves zh") {
    val df = Seq(
      ("ja", "これは日本語のテストです"),
      ("zh", "这是中文测试文本内容")).toDF("lang", "sample")
      .withColumn("pred", TextAnalysis.detectLang(col("sample"),
        TextAnalysis.WideLangProfiles, cjkLang = None,
        scriptLangs = TextAnalysis.ScriptLangs))
    df.collect().foreach(r => assert(r.getString(2) == r.getString(0), r.getString(1)))
  }

  test("PageLanguage.resolve honors detect-before-identify policy and metadata priority") {
    val pages = Seq(
      // dc.language beats everything, normalized from a 639-2 code
      (Map("dc.language" -> "SWE", "lang" -> "en"), Map.empty[String, String],
        "t", "the and of to is in that", "sv"),
      // meta content-language next
      (Map("content-language" -> "sv-FI"), Map.empty[String, String],
        "t", "the and of to is in that", "sv"),
      // html lang attribute next
      (Map("lang" -> "fi"), Map.empty[String, String], "t", "x", "fi"),
      // protocol header when no metadata
      (Map.empty[String, String], Map("Content-Language" -> "Swedish"),
        "t", "x", "sv"),
      // nothing declared -> statistical identification over title+text
      (Map.empty[String, String], Map.empty[String, String],
        "title", "der und die das ist nicht ein der und die", "de"))
      .toDF("metadata", "headers", "title", "text", "want")
    val got = pages.withColumn("lang",
      PageLanguage.resolve(col("metadata"), col("headers"), col("title"), col("text")))
    got.collect().foreach(r =>
      assert(r.getAs[String]("lang") == r.getAs[String]("want"),
        r.getAs[Map[String, String]]("metadata").toString))
  }

  test("identify-only policy with minScore gates low-evidence text to null") {
    val df = Seq("the and of to is in that the and", "zzz qqq").toDF("text")
      .withColumn("lang", PageLanguage.resolve(
        map(), map(), lit(""), col("text"),
        policy = Seq("identify"), minScore = 3))
    val rows = df.collect()
    assert(rows(0).getString(1) == "en")
    assert(rows(1).getString(1) == null)
  }

  test("LanguageIndexingFilter indexes the resolved lang, 'unknown' when unresolvable") {
    val pages = Seq(
      WebPage(key = "k1", url = "http://a/1", status = CrawlStatus.FETCHED,
        title = "t", text = "el los las es una y que el los",
        markers = Map(Marks.PARSE -> "b1"), batchId = "b1"),
      WebPage(key = "k2", url = "http://a/2", status = CrawlStatus.FETCHED,
        title = "t", text = "zzz", metadata = Map("dc.language" -> "por"),
        markers = Map(Marks.PARSE -> "b1"), batchId = "b1"),
      WebPage(key = "k3", url = "http://a/3", status = CrawlStatus.FETCHED,
        title = "", text = "", markers = Map(Marks.PARSE -> "b1"), batchId = "b1"))
      .toDF()
    val docs = IndexerJob.buildDocs(pages,
        extraFilters = Seq(LanguageIndexingFilter(minScore = 2)))
      .select("doc_key", "lang").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(docs("k1") == "es")
    assert(docs("k2") == "pt")
    assert(docs("k3") == "unknown")
  }
}

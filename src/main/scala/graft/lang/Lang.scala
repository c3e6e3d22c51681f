package graft.lang

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** ISO-639 language-code normalization (reference: plugin/language-identifier
  * HTMLLanguageParser.java:279-301 `LanguageParser.parseLanguage` +
  * langmappings.properties). Maps messy language declarations — RFC 1766
  * tags, ISO 639-2/B and 639-2/T three-letter codes, English language names,
  * charset-polluted header values, multi-valued lists — to the primary
  * two-letter ISO 639-1 code.
  *
  * Semantics (kept bit-compatible with the reference's 44 golden cases):
  *  1. split the raw string on any of `, ; . ( ) =` or space (keeping
  *     empty tokens, as the reference's split(..., -1) does);
  *  2. for each token in order, take the primary subtag (the part before
  *     the first `-`, then before the first `_`), lowercased;
  *  3. the first token whose primary subtag is a known alias wins; a
  *     string with no known alias normalizes to None.
  */
object LangCodes {

  /** The ISO-639 registry the reference embeds (langmappings.properties):
    * one entry per two-letter code with its 639-2 aliases and English name.
    * Registry order matters only for duplicate aliases (`scr`, `mlt`):
    * later entries win, which is deterministic here (the reference loads
    * into a hash table, so its duplicate-alias winner is unspecified —
    * neither side's golden tests depend on those two aliases).
    * Quirks kept for fidelity: `sv` lists "Sweden" (so "sweden" → sv) and
    * `yi` has the registry's fused "yidYiddish" alias. */
  private val Registry: Seq[(String, String)] = Seq(
    "aa" -> "aar Afar", "ab" -> "abk Abkhazian", "ae" -> "ave",
    "af" -> "afr Afrikaans", "ak" -> "aka", "am" -> "amh Amharic",
    "an" -> "arg", "ar" -> "ara Arabic", "as" -> "asm Assamese",
    "av" -> "ava", "ay" -> "aym Aymara", "az" -> "aze Azerbaijani",
    "ba" -> "bak Bashkir", "be" -> "bel Byelorussian", "bg" -> "bul Bulgarian",
    "bh" -> "bih Bihari", "bi" -> "bis Bislama", "bm" -> "bam",
    "bn" -> "ben Bengali", "bo" -> "bod tib Tibetan", "br" -> "bre Breton",
    "bs" -> "bos", "ca" -> "cat Catalan", "ce" -> "che", "ch" -> "cha",
    "co" -> "cos Corsican", "cr" -> "cre", "cs" -> "ces cze Czech",
    "cu" -> "chu", "cv" -> "chv", "cy" -> "cym wel Welsh",
    "da" -> "dan Danish", "de" -> "deu ger German", "dv" -> "div",
    "dz" -> "dzo Dzongkha", "ee" -> "ewe", "el" -> "ell gre Greek",
    "en" -> "eng English", "eo" -> "epo Esperanto", "es" -> "esl spa Spanish",
    "et" -> "est Estonian", "eu" -> "baq eus Basque", "fa" -> "fas per Persian",
    "ff" -> "ful", "fi" -> "fin Finnish", "fj" -> "fij Fijian",
    "fo" -> "fao Faroese", "fr" -> "fra fre French", "fy" -> "fry Frisian",
    "ga" -> "gai iri Irish", "gd" -> "gla", "gl" -> "glg Gallegan",
    "gn" -> "grn Guarani", "gu" -> "guj Gujarati", "gv" -> "glv",
    "ha" -> "hau Hausa", "he" -> "heb Hebrew", "hi" -> "hin Hindi",
    "ho" -> "hmo", "hr" -> "scr hrv Croatian", "ht" -> "hat",
    "hu" -> "hun Hungarian", "hy" -> "arm hye Armenian", "hz" -> "her",
    "ia" -> "ina Interlingua", "id" -> "ind Indonesian", "ie" -> "ile",
    "ig" -> "ibo", "ii" -> "iii", "ik" -> "ipk Inupiak", "io" -> "ido",
    "is" -> "ice isl Icelandic", "it" -> "ita Italian", "iu" -> "iku Inuktitut",
    "ja" -> "jpn Japanese", "jv" -> "jw jav jaw Javanese",
    "ka" -> "geo kat Georgian", "kg" -> "kon", "ki" -> "kik", "kj" -> "kua",
    "kk" -> "kaz Kazakh", "kl" -> "kal Greenlandic", "km" -> "khm Khmer",
    "kn" -> "kan Kannada", "ko" -> "kor Korean", "kr" -> "kau",
    "ks" -> "kas Kashmiri", "ku" -> "kur Kurdish", "kv" -> "kom",
    "kw" -> "cor", "ky" -> "kir Kirghiz", "la" -> "lat Latin",
    "lb" -> "ltz", "lg" -> "lug", "li" -> "lim", "ln" -> "lin Lingala",
    "lo" -> "lao Lao", "lt" -> "lit Lithuanian", "lu" -> "lub",
    "lv" -> "lav Latvian", "mg" -> "mlg Malagasy", "mh" -> "mah",
    "mi" -> "mao mri Maori", "mk" -> "mac mak Macedonian",
    "ml" -> "mal mlt Maltese", "mn" -> "mon Mongolian", "mo" -> "mol Moldavian",
    "mr" -> "mar Marathi", "ms" -> "may msa Malay", "mt" -> "mlt",
    "my" -> "bur mya Burmese", "na" -> "nau Nauru", "nb" -> "nob",
    "nd" -> "nde", "ne" -> "nep Nepali", "ng" -> "ndo",
    "nl" -> "dut nla Dutch", "nn" -> "nno", "no" -> "nor Norwegian",
    "nr" -> "nbl", "nv" -> "nav", "ny" -> "nya", "oc" -> "oci",
    "oj" -> "oji", "om" -> "orm Oromo", "or" -> "ori Oriya", "os" -> "oss",
    "pa" -> "pan Panjabi", "pi" -> "pli", "pl" -> "pol Polish",
    "ps" -> "pus Pushto", "pt" -> "por Portuguese", "qu" -> "que Quechua",
    "rm" -> "roh Rhaeto-Romance", "rn" -> "run Rundi",
    "ro" -> "ron rum Romanian", "ru" -> "rus Russian", "rw" -> "kin Kinyarwanda",
    "sa" -> "san Sanskrit", "sc" -> "srd", "sd" -> "snd Sindhi",
    "se" -> "sme", "sg" -> "sag Sango", "sh" -> "scr Serbo-Croatian",
    "si" -> "sin Singhalese", "sk" -> "slk slo Slovak", "sl" -> "slv Slovenian",
    "sm" -> "smo Samoan", "sn" -> "sna Shona", "so" -> "som Somali",
    "sq" -> "alb sqi Albanian", "sr" -> "scc srp Serbian", "ss" -> "ssw Siswant",
    "st" -> "sot Sotho", "su" -> "sun Sudanese",
    "sv" -> "sve swe Swedish Svenska Sweden", "sw" -> "swa Swahili",
    "ta" -> "tam Tamil", "te" -> "tel Telugu", "tg" -> "tgk Tajik",
    "th" -> "tha Thai", "ti" -> "tir Tigrinya", "tk" -> "tuk Turkmen",
    "tl" -> "tgl Tagalog", "tn" -> "tsn Tswana", "to" -> "tog Tonga",
    "tr" -> "tur Turkish", "ts" -> "tso Tsonga", "tt" -> "tat Tatar",
    "tw" -> "twi Twi", "ty" -> "tah", "ug" -> "uig Uighur",
    "uk" -> "ukr Ukrainian", "ur" -> "urd Urdu", "uz" -> "uzb Uzbek",
    "ve" -> "ven", "vi" -> "vie Vietnamese", "vo" -> "vol Volapk",
    "wa" -> "wln", "wo" -> "wol Wolof", "xh" -> "xho Xhosa",
    "yi" -> "yidYiddish", "yo" -> "yor Yoruba", "za" -> "zha Zhuang",
    "zh" -> "chi zho Chinese", "zu" -> "zul Zulu")

  /** alias (lowercased) -> primary two-letter code; every code also maps
    * to itself. Later registry entries win duplicate aliases. */
  val Primary: Map[String, String] = {
    val b = scala.collection.mutable.LinkedHashMap.empty[String, String]
    Registry.foreach { case (code, aliases) =>
      b.put(code, code)
      aliases.split(' ').filter(_.nonEmpty)
        .foreach(a => b.put(a.toLowerCase, code))
    }
    b.toMap
  }

  /** The token-separator class of the reference's split
    * (`,| |;|\.|\(|\)|=` expressed as one character class). */
  val SeparatorClass: String = "[, ;.()=]"

  /** Scalar normalizer — reference HTMLLanguageParser.parseLanguage. */
  def parseLanguage(lang: String): Option[String] =
    if (lang == null) None
    else lang.split(SeparatorClass, -1).iterator
      .map(t => primarySubtag(t))
      .flatMap(Primary.get)
      .nextOption()

  private def primarySubtag(token: String): String = {
    val dash = token.split("-", -1)
    val und = dash(0).split("_", -1)
    und(0).toLowerCase
  }

  /** Columnar mirror of [[parseLanguage]]: the registry ships as a
    * plan-time map literal, the scan stays in whole-stage codegen — no
    * UDF, no dictionary broadcast. null in → null out; no alias hit →
    * null out. */
  def parseLanguageCol(c: Column): Column = {
    val registry = typedLit(Primary)
    // try_element_at: ANSI-safe — unknown alias and no-hit both yield null
    val prims = transform(split(c, SeparatorClass, -1), t =>
      try_element_at(registry,
        lower(element_at(split(element_at(split(t, "-", -1), 1), "_", -1), 1))))
    try_element_at(filter(prims, x => x.isNotNull), lit(1))
  }
}

/** Page-level language resolution (reference HTMLLanguageParser.filter:
  * the `lang.extraction.policy` ordering of metadata *detection* vs
  * statistical *identification*). The Spark mapping works over the page
  * columns instead of a DOM walk: parse-stage meta declarations live in
  * the page `metadata` map, protocol headers in `headers`. */
object PageLanguage {

  /** Metadata keys consulted by detection, in reference priority order
    * (HTMLLanguageParser.getLanguageFromMetadata:178-191 — dublin core
    * first, then meta content-language, then the html lang attribute),
    * followed by the protocol Content-Language header
    * (detectLanguage:140-143). */
  val DetectKeys: Seq[String] = Seq("dc.language", "content-language", "lang")
  val HeaderKey: String = "Content-Language"

  /** Detection half: first declared value wins, normalized through the
    * ISO-639 registry (the reference normalizes DOM-parsed declarations via
    * parseLanguage; we normalize the header path too so downstream always
    * sees a primary code). */
  def detect(metadataCol: Column, headersCol: Column): Column =
    coalesce(
      (DetectKeys.map(k => LangCodes.parseLanguageCol(element_at(metadataCol, k))) :+
        LangCodes.parseLanguageCol(element_at(headersCol, HeaderKey))): _*)

  /** Identification half: statistical n-gram scoring over title+text
    * (reference identifyLanguage:146-170 builds title+" "+content and runs
    * the Tika identifier; `minScore` is the `only.certain` analogue — the
    * winning profile must clear it or the result is null). */
  def identify(titleCol: Column, textCol: Column, minScore: Int = 0): Column = {
    val text = concat_ws(" ", titleCol, textCol)
    val lang = graft.ops.TextAnalysis.detectLang(
      text, graft.ops.TextAnalysis.WideLangProfiles, cjkLang = None,
      scriptLangs = graft.ops.TextAnalysis.ScriptLangs)
    if (minScore <= 0) lang
    else when(graft.ops.TextAnalysis.detectLangScore(
      text, graft.ops.TextAnalysis.WideLangProfiles,
      graft.ops.TextAnalysis.ScriptLangs) >= minScore, lang)
  }

  /** The policy fold: `Seq("detect", "identify")` mirrors the reference
    * default `lang.extraction.policy=detect,identify` (first non-null
    * stage wins). */
  def resolve(metadataCol: Column, headersCol: Column, titleCol: Column,
      textCol: Column, policy: Seq[String] = Seq("detect", "identify"),
      minScore: Int = 0): Column =
    coalesce(policy.map {
      case "detect"   => detect(metadataCol, headersCol)
      case "identify" => identify(titleCol, textCol, minScore)
      case other => throw new IllegalArgumentException(
        s"unknown lang.extraction.policy stage: $other")
    }: _*)
}

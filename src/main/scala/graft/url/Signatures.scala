package graft.url

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import graft.model.WebPage

/** Content signatures for change detection
  * (reference: crawl/MD5Signature.java:42-67, crawl/TextProfileSignature.java:66-136,
  * crawl/SignatureComparator.java).
  */
object Signatures {

  def md5(bytes: Array[Byte]): Array[Byte] =
    MessageDigest.getInstance("MD5").digest(bytes)

  /** MD5 of content, else MD5 of baseUrl (else url) — reference
    * MD5Signature.calculate. */
  def md5Signature(page: WebPage): Array[Byte] = {
    val data =
      if (page.content != null && page.content.nonEmpty) page.content
      else {
        val s = if (page.baseUrl != null) page.baseUrl else if (page.url != null) page.url else ""
        s.getBytes(StandardCharsets.UTF_8)
      }
    md5(data)
  }

  /** Tokenize text, quantize term frequencies, MD5 the profile — reference
    * TextProfileSignature.calculate (min token len 2, quant rate 0.01).
    * Falls back to md5Signature when there is no text.
    */
  def textProfileSignature(page: WebPage, minTokenLen: Int = 2,
      quantRate: Float = 0.01f): Array[Byte] = {
    val text = page.text
    if (text == null || text.isEmpty) return md5Signature(page)

    val tokens = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    var maxFreq = 0
    val cur = new StringBuilder
    def flush(): Unit = {
      // NOTE: the reference keeps tokens with length > MIN_TOKEN_LEN (strictly)
      if (cur.length > minTokenLen) {
        val s = cur.toString
        val c = tokens.getOrElse(s, 0) + 1
        tokens.update(s, c)
        if (c > maxFreq) maxFreq = c
      }
      cur.setLength(0)
    }
    text.foreach { c =>
      if (Character.isLetterOrDigit(c)) cur.append(Character.toLowerCase(c))
      else if (cur.nonEmpty) flush()
    }
    flush()

    var quant = math.round(maxFreq * quantRate)
    if (quant < 2) quant = if (maxFreq > 1) 2 else 1
    val profile = tokens.toSeq
      .map { case (t, c) => (t, (c / quant) * quant) }
      .filter(_._2 >= quant)
      // decreasing frequency, stable on token for determinism
      .sortBy { case (t, c) => (-c, t) }
    val profileText = profile.map { case (t, c) => s"$t $c" }.mkString("\n")
    md5(profileText.getBytes(StandardCharsets.UTF_8))
  }

  /** Lexicographic unsigned byte compare (reference: SignatureComparator). */
  def compare(a: Array[Byte], b: Array[Byte]): Int = {
    if (a == null && b == null) return 0
    if (a == null) return -1
    if (b == null) return 1
    val len = math.min(a.length, b.length)
    var i = 0
    while (i < len) {
      val cmp = (a(i) & 0xff) - (b(i) & 0xff)
      if (cmp != 0) return cmp
      i += 1
    }
    a.length - b.length
  }
}

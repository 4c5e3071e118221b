package graft.functions

import java.text.Normalizer
import java.util.regex.{Matcher, Pattern}

/** Vietnamese text-normalization kernels (reference F3–F7 and F11):
  * the `TextNormalizer` chain of `pre_processing/process_all.py:145-255`
  * and the `process_text` cleaner of `alignment/post_process.py:100-122`.
  *
  * The reference's `underthesea.text_normalize` step is an external
  * library call; here it is an identity hook (documented stand-in —
  * no parity claim), exactly as SURVEY §7 prescribes for
  * external-tool stages. Likewise `num2words(lang="vi")` is re-
  * implemented with the standard mốt/lăm/tư/lẻ reading rules; the
  * golden pins in VietnameseTextSpec define this implementation's
  * semantics rather than claiming bit-parity with num2words.
  */
object VietnameseText {

  private val digitWords = Array(
    "không", "một", "hai", "ba", "bốn", "năm", "sáu", "bảy", "tám", "chín")

  // Patterns ported 1:1 from process_all.py:149-160.
  private val numberPat = Pattern.compile("\\b\\d{1,3}(?:[.,]\\d{3})*(?:[.,]\\d+)?\\b")
  private val currencyPat = Pattern.compile(
    "\\b\\d+(?:[.,]\\d+)?\\s*(?:VND|vnđ|đ|USD|\\$|€|¥|₫)\\b", Pattern.CASE_INSENSITIVE)
  private val datePat = Pattern.compile("\\b(\\d{1,2})[/-](\\d{1,2})[/-](\\d{2,4})\\b")
  private val urlPat = Pattern.compile("https?://[^\\s]+")
  private val wsPat = Pattern.compile("\\s+")
  private val intPat = Pattern.compile("\\b\\d+\\b")

  private def replaceAll(p: Pattern, s: String)(f: Matcher => String): String = {
    val m = p.matcher(s)
    val sb = new java.lang.StringBuilder
    while (m.find()) m.appendReplacement(sb, Matcher.quoteReplacement(f(m)))
    m.appendTail(sb)
    sb.toString
  }

  /** F4 (`process_all.py:228-233`): digit-by-digit reading; numbers
    * below ten read as a single word. */
  def digitByDigit(num: Long): String =
    if (num < 10) digitWords(num.toInt)
    else num.toString.map(d => digitWords(d - '0')).mkString(" ")

  /** F3 (`process_all.py:197-209`): canonicalize 1.234,56 / 1,234.56
    * thousand-decimal forms — only when BOTH separators appear. */
  def normalizeNumberFormats(text: String): String =
    replaceAll(numberPat, text) { m =>
      val s = m.group()
      if (s.contains(",") && s.contains(".")) {
        if (s.indexOf(',') < s.indexOf('.')) s.replace(",", "")
        else s.replace(".", "").replace(",", ".")
      } else s
    }

  /** F5 (`process_all.py:230-241`): đ/vnđ/₫ → VND, $ → USD, uppercase
    * the matched span. */
  def normalizeCurrency(text: String): String =
    replaceAll(currencyPat, text) { m =>
      m.group()
        .replace("đ", "VND").replace("vnđ", "VND")
        .replace("$", "USD").replace("₫", "VND")
        .toUpperCase
    }

  /** F6 (`process_all.py:243-255`): d/m/yy(yy) → spoken Vietnamese;
    * two-digit years pivot at 30 (≤30 → 20xx else 19xx). */
  def normalizeDates(text: String): String =
    replaceAll(datePat, text) { m =>
      val day = m.group(1)
      val month = m.group(2)
      var year = m.group(3)
      if (year.length == 2)
        year = (if (year.toInt <= 30) "20" else "19") + year
      val yearWords = year.map(d => digitWords(d - '0')).mkString(" ")
      s"ngày ${digitByDigit(day.toLong)} tháng ${digitByDigit(month.toLong)} năm $yearWords"
    }

  /** Tail of F7: every remaining number-pattern match read digit by
    * digit (`process_all.py:211-226` — separators stripped first). */
  def numbersToWords(text: String): String =
    replaceAll(numberPat, text) { m =>
      val raw = m.group().replace(",", "").replace(".", "")
      try digitByDigit(raw.toLong)
      catch { case _: NumberFormatException => m.group() }
    }

  /** F7 (`process_all.py:165-193`): the full chain — URL strip → NFC
    * → (underthesea hook: identity) → F3 → F5 → F6 → numbers-to-words
    * → trim, whitespace squeeze, lowercase. */
  def normalizeText(text: String): String = {
    if (text == null || text.isEmpty) return ""
    var t = urlPat.matcher(text).replaceAll("")
    t = Normalizer.normalize(t, Normalizer.Form.NFC)
    // underthesea.text_normalize hook — identity stand-in.
    t = normalizeNumberFormats(t)
    t = normalizeCurrency(t)
    t = normalizeDates(t)
    t = numbersToWords(t)
    t = wsPat.matcher(t.trim).replaceAll(" ")
    t.toLowerCase
  }

  /** Full Vietnamese number naming (reference F11 uses
    * `num2words(lang="vi")`): standard mười/mươi/mốt/tư/lăm/lẻ/trăm/
    * nghìn/triệu/tỷ reading. Stand-in — semantics pinned in
    * VietnameseTextSpec, no num2words parity claim. */
  def numberName(n: Long): String = {
    if (n < 0) return "âm " + numberName(-n)
    if (n == 0) return digitWords(0)
    val scales = Array("", " nghìn", " triệu", " tỷ", " nghìn tỷ", " triệu tỷ")
    // split into 3-digit groups, most significant first
    val groups = scala.collection.mutable.ArrayBuffer.empty[Int]
    var rest = n
    while (rest > 0) { groups.prepend((rest % 1000).toInt); rest /= 1000 }
    val parts = groups.zipWithIndex.flatMap { case (g, i) =>
      val scaleIdx = groups.length - 1 - i
      if (g == 0) None
      else {
        val leading = i == 0
        Some(groupName(g, leading) + scales(scaleIdx))
      }
    }
    parts.mkString(" ")
  }

  /** 1..999 reading; `leading` marks the most significant group
    * (which omits a zero-hundreds prefix). */
  private def groupName(g: Int, leading: Boolean): String = {
    val h = g / 100
    val t = (g % 100) / 10
    val u = g % 10
    val sb = new StringBuilder
    if (h > 0 || !leading) { sb.append(digitWords(h)).append(" trăm") }
    if (t == 0) {
      if (u > 0) {
        if (sb.nonEmpty) sb.append(" lẻ")
        if (sb.nonEmpty) sb.append(' ')
        sb.append(digitWords(u))
      }
    } else if (t == 1) {
      if (sb.nonEmpty) sb.append(' ')
      sb.append("mười")
      if (u > 0) sb.append(' ').append(if (u == 5) "lăm" else digitWords(u))
    } else {
      if (sb.nonEmpty) sb.append(' ')
      sb.append(digitWords(t)).append(" mươi")
      if (u > 0) sb.append(' ').append(u match {
        case 1 => "mốt"
        case 4 => "tư"
        case 5 => "lăm"
        case _ => digitWords(u)
      })
    }
    sb.toString
  }

  /** F11 (`alignment/post_process.py:100-122`): strip typographic
    * quotes/dashes/bullets/ellipses, squeeze whitespace, then read
    * every bare integer with the full number naming. */
  def processText(text: String): String = {
    if (text == null) return null
    var t = text
      .replace("“", "").replace("”", "")
      .replace("‘", "").replace("’", "")
      .replace("–", "").replace("•", "").replace("…", "")
    t = wsPat.matcher(t).replaceAll(" ").trim
    replaceAll(intPat, t) { m =>
      try numberName(m.group().toLong)
      catch { case _: NumberFormatException => m.group() }
    }
  }
}

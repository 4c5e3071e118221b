package graft.functions

import java.text.Normalizer
import java.util.regex.{Matcher, Pattern}

/** Vietnamese text-normalization kernels (reference F3–F7 and F11):
  * the `TextNormalizer` chain of `pre_processing/process_all.py:145-255`
  * and the `process_text` cleaner of `alignment/post_process.py:100-122`.
  *
  * The reference's `underthesea.text_normalize` step is an external
  * library call; here the hook is a deterministic tone-mark
  * normalizer implementing the public orthography rules
  * ([[toneNormalize]] — reproduces underthesea's documented example
  * exactly; still a declared stand-in, no full-library parity
  * claim), per SURVEY §7's prescription for external-tool stages.
  * Likewise `num2words(lang="vi")` is re-implemented with the
  * standard mốt/lăm/tư/lẻ reading rules; the golden pins in
  * VietnameseTextSpec define this implementation's semantics rather
  * than claiming bit-parity with num2words.
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

  // ---- Tone-mark normalization (the underthesea.text_normalize
  // stand-in, r9: was identity). underthesea's documented behavior on
  // "Ðảm baỏ chất lựơng phòng thí nghịêm hoá học" is lookalike repair
  // (latin eth Ð → Đ) plus re-placing each syllable's tone mark on
  // its orthographically correct vowel ("baỏ" → "bảo", "lựơng" →
  // "lượng", "hoá" → "hóa"). That rule set is public orthography, so
  // it is implementable deterministically:
  //   1. carrier priority: the LAST diacritic-modified vowel
  //      (ă â ê ô ơ ư) if any;
  //   2. else closed syllable (consonant after the vowel cluster):
  //      the last vowel;
  //   3. else open cluster of ≥2 vowels: the second-to-last vowel
  //      (classic style: hòa, not hoà — matches underthesea);
  //   4. single vowel: itself.
  // `u` after `q` and `i` after `g` (with vowels following) are
  // glide letters, never carriers (quý, già). Tokens with zero or
  // multiple tone marks, non-contiguous vowel runs (foreign words),
  // or no vowels pass through unchanged — correctness on
  // already-standard text (the no-op invariant q36 gates on) matters
  // more than coverage of typos the corpus does not contain.
  private val ToneMarkChars = "\u0301\u0300\u0309\u0303\u0323" // sắc huyền hỏi ngã nặng
  private val BaseVowels = "aăâeêioôơuưy"
  private val ModifiedVowels = "ăâêôơư"
  private val tokenPat = Pattern.compile("\\S+")

  /** One token: strip the tone mark, find the correct carrier,
    * recompose. Returns the input (with only lookalike repair) when
    * the token is not a well-formed single-tone Vietnamese syllable. */
  def toneNormalizeToken(tok0: String): String = {
    val tok = tok0.replace('Ð', 'Đ').replace('ð', 'đ')
    // Fast path: pure-ASCII tokens carry no tone marks.
    var ascii = true
    var k = 0
    while (ascii && k < tok.length) { if (tok.charAt(k) >= 0x80) ascii = false; k += 1 }
    if (ascii) return tok
    val nfd = Normalizer.normalize(tok, Normalizer.Form.NFD)
    val kept = new java.lang.StringBuilder
    var tone: Char = 0
    var nTones = 0
    var i = 0
    while (i < nfd.length) {
      val c = nfd.charAt(i)
      if (ToneMarkChars.indexOf(c) >= 0) { nTones += 1; tone = c }
      else kept.append(c)
      i += 1
    }
    if (nTones != 1) return tok
    val base = Normalizer.normalize(kept.toString, Normalizer.Form.NFC)
    val lower = base.toLowerCase(java.util.Locale.ROOT)
    val vowelIdx = (0 until base.length).filter(j => BaseVowels.indexOf(lower.charAt(j)) >= 0)
    if (vowelIdx.isEmpty) return tok
    // one contiguous vowel run only (a Vietnamese syllable's shape)
    if (vowelIdx.last - vowelIdx.head + 1 != vowelIdx.length) return tok
    var run = vowelIdx
    if (run.length > 1) {
      val h = run.head
      val prev = if (h > 0) lower.charAt(h - 1) else ' '
      if ((lower.charAt(h) == 'u' && prev == 'q') ||
          (lower.charAt(h) == 'i' && prev == 'g')) run = run.tail
    }
    val modIdx = run.filter(j => ModifiedVowels.indexOf(lower.charAt(j)) >= 0)
    val carrier =
      if (modIdx.nonEmpty) modIdx.last
      else if (vowelIdx.last < base.length - 1) run.last // closed syllable
      else if (run.length >= 2) run(run.length - 2)
      else run.last
    val composed = Normalizer.normalize(base.charAt(carrier).toString + tone, Normalizer.Form.NFC)
    base.substring(0, carrier) + composed + base.substring(carrier + 1)
  }

  /** Token-wise [[toneNormalizeToken]] over running text. */
  def toneNormalize(text: String): String =
    replaceAll(tokenPat, text)(m => toneNormalizeToken(m.group()))

  /** F7 (`process_all.py:165-193`): the full chain — URL strip → NFC
    * → tone-mark normalize (the underthesea stand-in) → F3 → F5 → F6
    * → numbers-to-words → trim, whitespace squeeze, lowercase. */
  def normalizeText(text: String): String = {
    if (text == null || text.isEmpty) return ""
    var t = urlPat.matcher(text).replaceAll("")
    t = Normalizer.normalize(t, Normalizer.Form.NFC)
    t = toneNormalize(t)
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
    // Covers the full Long range: 7 groups (10^18) reads "tỷ tỷ" —
    // the r8 table stopped at "triệu tỷ" and numberName(>=10^18)
    // threw ArrayIndexOutOfBounds.
    val scales = Array("", " nghìn", " triệu", " tỷ", " nghìn tỷ", " triệu tỷ", " tỷ tỷ")
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

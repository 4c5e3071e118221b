package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Golden pins for the Vietnamese normalization family (F3–F7, F11).
  * Reference semantics: `pre_processing/process_all.py:145-255`,
  * `alignment/post_process.py:100-122`. The full number naming is a
  * documented stand-in for num2words(lang="vi") — these pins define
  * its semantics. */
class VietnameseTextSpec extends AnyFunSuite {
  import VietnameseText._

  test("F3 number-format canonicalize: only both-separator forms change") {
    assert(normalizeNumberFormats("1.234,56") == "1234.56")
    assert(normalizeNumberFormats("1,234.56") == "1234.56")
    assert(normalizeNumberFormats("234,56") == "234,56")   // single separator untouched
    assert(normalizeNumberFormats("1.234") == "1.234")
    assert(normalizeNumberFormats("x 12 y") == "x 12 y")
  }

  test("F4 digit-by-digit reading") {
    assert(digitByDigit(7) == "bảy")
    assert(digitByDigit(123) == "một hai ba")
    assert(digitByDigit(105) == "một không năm")
  }

  test("F5 currency mapping uppercases the matched span") {
    assert(normalizeCurrency("5 đ") == "5 VND")
    // Reference quirk preserved: its replacement dict applies "đ"
    // BEFORE "vnđ" (process_all.py:235-238), so vnđ becomes vnVND →
    // upper VNVND — we copy, not fix.
    assert(normalizeCurrency("12,5 vnđ") == "12,5 VNVND")
    assert(normalizeCurrency("3 $") == "3 $")             // $ needs \b after: '3 $' has none
    assert(normalizeCurrency("gia 10 USD roi") == "gia 10 USD roi")
  }

  test("F6 date reading with 2-digit year pivot at 30") {
    assert(normalizeDates("12/3/2024") == "ngày một hai tháng ba năm hai không hai bốn")
    assert(normalizeDates("5-1-99") == "ngày năm tháng một năm một chín chín chín")
    assert(normalizeDates("5-1-05") == "ngày năm tháng một năm hai không không năm")
    assert(normalizeDates("no date here") == "no date here")
  }

  test("F7 full chain") {
    assert(normalizeText("12/3/2024 giá 234,56 đ xem https://x.vn/a") ==
      "ngày một hai tháng ba năm hai không hai bốn giá hai ba bốn năm sáu vnd xem")
    assert(normalizeText("") == "")
    assert(normalizeText("  Nhiều   khoảng   trắng  ") == "nhiều khoảng trắng")
  }

  test("F11 full number naming") {
    val pins = Seq(
      0L -> "không", 5L -> "năm", 10L -> "mười", 15L -> "mười lăm",
      21L -> "hai mươi mốt", 24L -> "hai mươi tư", 25L -> "hai mươi lăm",
      99L -> "chín mươi chín",
      100L -> "một trăm", 101L -> "một trăm lẻ một", 110L -> "một trăm mười",
      234L -> "hai trăm ba mươi tư",
      1000L -> "một nghìn",
      1005L -> "một nghìn không trăm lẻ năm",
      1234L -> "một nghìn hai trăm ba mươi tư",
      2024L -> "hai nghìn không trăm hai mươi tư",
      1000000L -> "một triệu",
      1234567L -> "một triệu hai trăm ba mươi tư nghìn năm trăm sáu mươi bảy")
    for ((n, want) <- pins)
      assert(numberName(n) == want, s"numberName($n)")
  }

  test("F11 cleaner strips typographic marks and squeezes") {
    assert(processText("“Giá” • 21 đồng") == "Giá hai mươi mốt đồng")
    assert(processText("a…–b") == "ab")
    assert(processText("  x   y  ") == "x y")
  }

  test("F11 number naming covers the full Long range (tỷ tỷ scale)") {
    assert(numberName(1000000000L) == "một tỷ")
    assert(numberName(1000000000000L) == "một nghìn tỷ")
    assert(numberName(1000000000000000000L) == "một tỷ tỷ")
    // r8 threw ArrayIndexOutOfBounds here; now every Long names.
    assert(numberName(Long.MaxValue).startsWith("chín tỷ tỷ"))
    assert(numberName(-21L) == "âm hai mươi mốt")
  }

  test("tone normalization reproduces underthesea's documented example") {
    // underthesea.text_normalize("Ðảm baỏ chất lựơng phòng thí nghịêm
    // hoá học") == "Đảm bảo chất lượng phòng thí nghiệm hóa học"
    assert(toneNormalize("Ðảm baỏ chất lựơng phòng thí nghịêm hoá học") ==
      "Đảm bảo chất lượng phòng thí nghiệm hóa học")
  }

  test("tone normalization: carrier rules per shape") {
    // modified vowel wins, last of them (ươ)
    assert(toneNormalizeToken("lựơng") == "lượng")
    // closed syllable: last vowel
    assert(toneNormalizeToken("hòang") == "hoàng")
    // open cluster: second-to-last (classic style)
    assert(toneNormalizeToken("hoà") == "hòa")
    assert(toneNormalizeToken("baỏ") == "bảo")
    // qu- and gi- glides never carry
    assert(toneNormalizeToken("qúy") == "quý")
    assert(toneNormalizeToken("gìa") == "già")
    // single-vowel gi (no following vowel): i carries
    assert(toneNormalizeToken("gì") == "gì")
  }

  test("tone normalization is a NO-OP on already-standard text (the q36 invariant)") {
    val std = Seq("Đảm", "bảo", "chất", "lượng", "phòng", "thí", "nghiệm",
      "hóa", "học", "già", "quý", "được", "người", "hoàng", "giá", "vnđ",
      "spark", "window", "3,14", "the", "đồng")
    for (w <- std) assert(toneNormalizeToken(w) == w, s"changed: $w")
    // multi-tone / no-vowel / foreign tokens pass through
    assert(toneNormalizeToken("piano") == "piano")
    assert(toneNormalizeToken("xyz") == "xyz")
  }
}

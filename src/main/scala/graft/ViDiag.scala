package graft

import graft.functions.VietnameseText
import java.text.Normalizer
import java.util.regex.Pattern

/** Dev tool: micro-times each pass of the q36 normalization chain. */
object ViDiag {
  def main(args: Array[String]): Unit = {
    val sample = "26/3/1996 giá 234,56 đ xem https://example.com/x"
    val n = 150000
    def time(name: String)(f: => Unit): Unit = {
      var i = 0; while (i < n / 2) { f; i += 1 }
      val t0 = System.nanoTime()
      i = 0; while (i < n) { f; i += 1 }
      println(f"VIDIAG $name%-22s ${(System.nanoTime() - t0) / 1e6}%8.1f ms / $n calls")
    }
    val urlPat = Pattern.compile("https?://[^\\s]+")
    val wsPat = Pattern.compile("\\s+")
    time("full")(VietnameseText.normalizeText(sample))
    time("urlStrip")(urlPat.matcher(sample).replaceAll(""))
    time("nfc")(Normalizer.normalize(sample, Normalizer.Form.NFC))
    time("nfcCheck")(Normalizer.isNormalized(sample, Normalizer.Form.NFC))
    time("numFormats")(VietnameseText.normalizeNumberFormats(sample))
    time("currency")(VietnameseText.normalizeCurrency(sample))
    time("dates")(VietnameseText.normalizeDates(sample))
    time("numWords")(VietnameseText.numbersToWords(sample))
    time("wsLower")(wsPat.matcher(sample.trim).replaceAll(" ").toLowerCase)
  }
}

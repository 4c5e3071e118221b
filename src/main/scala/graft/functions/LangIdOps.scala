package graft.functions

import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String

/** JVM kernel behind [[graft.operators.LangId]]: stopword-profile
  * language identification in ONE pass over the raw token array.
  *
  * Semantics are identical to the column form
  * `argmax_lang(size(array_intersect(array_distinct(tokens), profile)))`
  * with ties broken by profile order, "und" when nothing hits — but
  * the column form builds a `when`-reduce of structs whose every
  * comparison level re-evaluates both operands' intersect subtrees
  * (no CSE for higher-order functions), i.e. O(langs²) evaluations of
  * `array_distinct(split(text))` per row. Here: per-token hash lookup
  * into the 50-word profile map, a seen-bitmask per language (so
  * duplicate tokens can't double count — distinct-set semantics
  * without materializing the distinct array), then a popcount argmax.
  */
object LangIdOps {

  /** Small public stopword profiles (top function words per language). */
  val Profiles: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "und", "den", "von", "zu", "das", "mit", "sich", "nicht"),
    "en" -> Seq("the", "and", "of", "to", "in", "is", "you", "that", "it", "he"),
    "es" -> Seq("de", "la", "que", "el", "en", "y", "los", "se", "del", "las"),
    "fr" -> Seq("le", "de", "et", "la", "les", "des", "en", "un", "du", "une"),
    "vi" -> Seq("và", "của", "là", "có", "không", "được", "trong", "cho", "người", "những"))

  // The seen-bitmask per language is an Int: a profile grown past 32
  // words would silently wrap `1 << wordIdx` and corrupt hit counts.
  require(Profiles.forall(_._2.length <= 32),
    "LangIdOps: profiles are limited to 32 words (Int seen-bitmask); " +
      "widen masks to Long before growing a profile")

  private val langCodes: Array[UTF8String] =
    Profiles.map(p => UTF8String.fromString(p._1)).toArray
  private val Und = UTF8String.fromString("und")
  private val nLangs = Profiles.length

  /** word -> packed (langIdx << 8 | wordIdx) entries; a word may sit
    * in several profiles ("de", "la", "en" are in both es and fr). */
  private val wordHits: java.util.HashMap[UTF8String, Array[Int]] = {
    val m = new java.util.HashMap[UTF8String, Array[Int]]()
    for (((_, words), li) <- Profiles.zipWithIndex; (w, wi) <- words.zipWithIndex) {
      val k = UTF8String.fromString(w)
      val prev = m.get(k)
      val entry = (li << 8) | wi
      m.put(k, if (prev == null) Array(entry) else prev :+ entry)
    }
    m
  }

  /** Predicted language code for a (possibly duplicate-bearing) token
    * array. Ties: earliest profile wins; zero hits everywhere: "und". */
  def predict(tokens: ArrayData): UTF8String = {
    val masks = new Array[Int](nLangs)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      val entries = wordHits.get(tokens.getUTF8String(i))
      if (entries != null) {
        var j = 0
        while (j < entries.length) {
          val e = entries(j)
          masks(e >> 8) |= 1 << (e & 0xff)
          j += 1
        }
      }
      i += 1
    }
    var best = -1
    var bestHits = 0
    var l = 0
    while (l < nLangs) {
      val h = Integer.bitCount(masks(l))
      if (h > bestHits) { bestHits = h; best = l }
      l += 1
    }
    if (bestHits == 0) Und else langCodes(best)
  }
}

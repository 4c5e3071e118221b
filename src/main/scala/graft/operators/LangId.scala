package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.functions.{GraftFunctions, LangIdOps, TextFunctions}

/** Stopword-profile language identification: score each language by
  * the number of distinct document tokens hitting its (public,
  * frequency-list-derived) stopword profile; predict the argmax,
  * "und" (undetermined) when nothing hits. Deterministic tie-break:
  * higher hits, then earliest profile (= lexicographically smaller
  * language code — profiles are alphabetical).
  *
  * [[predict]] is one codegen'd kernel pass per row
  * ([[graft.functions.LangIdPredict]]); [[predictColumnForm]] keeps
  * the pure-`functions` formulation, which is semantically identical
  * but re-evaluates the intersect subtrees O(langs²) times per row
  * (higher-order functions get no CSE) — LangIdSpec pins the two
  * against each other, and the DuckDB oracle replicates the same
  * argmax independently.
  */
object LangId {

  /** Small public stopword profiles (top function words per language). */
  val Profiles: Seq[(String, Seq[String])] = LangIdOps.Profiles

  /** Hit count for one language profile over the distinct token set. */
  def hits(textCol: Column, profile: Seq[String]): Column =
    size(array_intersect(
      array_distinct(TextFunctions.tokens(textCol)),
      array(profile.map(lit): _*)))

  /** Predicted language code for a text column (kernel form). */
  def predict(textCol: Column): Column =
    GraftFunctions.lang_id(TextFunctions.tokens(textCol))

  /** Reference column-expression form of [[predict]] — the spec's
    * semantic pin, not the hot path. */
  def predictColumnForm(textCol: Column): Column = {
    val scored = Profiles.map { case (lang, words) => (lang, hits(textCol, words)) }
    // Encode (hits, prio, lang) so the reduce picks max hits with the
    // earliest-profile tie-break baked in.
    val best = scored.map { case (lang, h) =>
      struct(h.as("h"), lit(Profiles.length - Profiles.indexWhere(_._1 == lang)).as("prio"), lit(lang).as("lang"))
    }.reduce((a, b) => when(a("h") > b("h") || (a("h") === b("h") && a("prio") > b("prio")), a).otherwise(b))
    when(best("h") === 0, lit("und")).otherwise(best("lang"))
  }

  /** DuckDB oracle replicating [[predict]] exactly: per-language hit
    * counts via list_intersect, argmax with first-profile tie-break
    * as an ordered CASE with full comparisons. */
  def oracleSql: String = {
    val langs = Profiles.map(_._1)
    val hitDefs = Profiles.map { case (lang, ws) =>
      s"len(list_intersect(toks, ${ws.map(w => s"'$w'").mkString("[", ", ", "]")})) AS h_$lang"
    }.mkString(",\n           ")
    val zeroCond = langs.map(l => s"h_$l = 0").mkString(" AND ")
    val branches = langs.init.map { l =>
      val conds = langs.filterNot(_ == l).map(r => s"h_$l >= h_$r").mkString(" AND ")
      s"WHEN $conds THEN '$l'"
    }.mkString("\n                  ")
    s"""
    WITH d AS (SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks FROM documents),
    s AS (SELECT doc_id,
           $hitDefs
          FROM d)
    SELECT doc_id,
           CASE WHEN $zeroCond THEN 'und'
                  $branches
                  ELSE '${langs.last}' END AS pred_lang
    FROM s
    ORDER BY doc_id"""
  }
}

package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Pins the BPE kernel's semantic contract:
  * - the census counts overlapping adjacent POSITIONS;
  * - application is greedy left-to-right non-overlapping over WHOLE
  *   tokens, so "aaa" under merge (a,a) → [aa, a] and a run of six
  *   identical tokens merges into three (exact Sennrich greedy);
  * - a merge NEVER fires across a token boundary: merge (e,s) must
  *   not rewrite [th, e, se] (the token e merely precedes a token
  *   STARTING with s) — the wrapped doubled-separator representation
  *   guarantees this (see [[Bpe]]'s representation note);
  * - tiebreak is (count DESC, lhs ASC, rhs ASC);
  * - training stops early when no adjacent pairs remain;
  * - segmentation falls back to character count for unseen words.
  */
class BpeSpec extends SparkSuite {
  import spark.implicits._

  private val S = Bpe.Sep
  private val B = Bpe.Bnd

  /** Wrapped doubled-separator flat form of a token sequence. */
  private def seqOf(toks: String*): String = S + toks.mkString(B) + S

  private def dictOf(rows: (String, Long)*) =
    rows.toSeq.toDF("word", "freq")

  test("census counts overlapping positions; apply is greedy left-to-right") {
    // "aaa" ×5: census sees (a,a) at two positions → count 10.
    val (merges, dict) = Bpe.learnMerges(dictOf("aaa" -> 5L), "word", "freq", 1)
    assert(merges.collect().toSeq === Seq(Row(1L, "a", "a", "aa", 10L)))
    // Greedy application leaves [aa, a], never [a, aa] or [aaa].
    val seqs = dict.select("seq").as[String].collect()
    assert(seqs.toSeq === Seq(seqOf("aa", "a")))
  }

  test("argmax tiebreak is (count DESC, lhs ASC, rhs ASC)") {
    // "ba" and "ab" both have count 3 — (a,b) wins on lhs order.
    val (merges, _) = Bpe.learnMerges(
      dictOf("ba" -> 3L, "ab" -> 3L), "word", "freq", 1)
    assert(merges.collect().toSeq === Seq(Row(1L, "a", "b", "ab", 3L)))
  }

  test("frequency weighting drives the argmax, not word count") {
    // One word of freq 10 beats three words of freq 1 each.
    val (merges, _) = Bpe.learnMerges(
      dictOf("xy" -> 10L, "pq" -> 1L, "pr" -> 1L, "ps" -> 1L),
      "word", "freq", 1)
    assert(merges.collect().toSeq === Seq(Row(1L, "x", "y", "xy", 10L)))
  }

  test("training stops when the dictionary runs out of pairs") {
    // "ab" collapses after one merge; round 2 finds no pairs.
    val (merges, dict) = Bpe.learnMerges(dictOf("ab" -> 2L), "word", "freq", 5)
    assert(merges.collect().toSeq === Seq(Row(1L, "a", "b", "ab", 2L)))
    assert(dict.select("seq").as[String].collect().toSeq === Seq(seqOf("ab")))
  }

  test("merge chain: learned subword reused as lhs/rhs of later merges") {
    // "abab" ×4: round 1 merges (a,b) → [ab, ab]; round 2 (ab, ab).
    val (merges, dict) = Bpe.learnMerges(dictOf("abab" -> 4L), "word", "freq", 3)
    assert(merges.collect().toSeq === Seq(
      Row(1L, "a", "b", "ab", 8L),
      Row(2L, "ab", "ab", "abab", 4L)))
    assert(dict.select("seq").as[String].collect().toSeq === Seq(seqOf("abab")))
  }

  test("a merge never fires across a token boundary (token alignment)") {
    // "esese": round 1 merges (e,s) (tiebreak over (s,e)) → [es,es,e].
    // Round 2 census over WHOLE tokens is {(es,es):1, (es,e):1} —
    // (es,e) wins on rhs ASC and must rewrite ONLY the (es,e) pair:
    // [es, ese]. A character-boundary replace would instead corrupt
    // the seq to [eses, e] by matching "es␟e" inside "es␟es".
    val (merges, dict) = Bpe.learnMerges(dictOf("esese" -> 1L), "word", "freq", 2)
    assert(merges.collect().toSeq === Seq(
      Row(1L, "e", "s", "es", 2L),
      Row(2L, "es", "e", "ese", 1L)))
    assert(dict.select("seq").as[String].collect().toSeq === Seq(seqOf("es", "ese")))
  }

  test("segmentStatsWithMerges is token-aligned and exactly greedy") {
    val docs = Seq(
      (1L, "these"),    // (t,h) → [th,e,s,e]; (s,e) → [th,e,se]; (e,s) must NOT fire → 3 toks
      (2L, "abab"),     // back-to-back (a,b) pairs share a boundary → both merge → 2 toks
      (3L, "aaaaaa"),   // run of six: exact greedy (a,a) → [aa,aa,aa] → 3 toks
      (4L, "aaaaa")     // run of five → [aa,aa,a] → 3 toks
    ).toDF("doc_id", "text")
    val merges = Seq(("t", "h"), ("s", "e"), ("e", "s"), ("a", "b"), ("a", "a"))
    val out = Bpe.segmentStatsWithMerges(docs, merges)
      .orderBy("doc_id").select("doc_id", "n_tokens").as[(Long, Long)].collect()
    assert(out.toSeq === Seq((1L, 3L), (2L, 2L), (3L, 3L), (4L, 3L)))
  }

  test("segmentStats: dictionary lookup + unseen-word char fallback") {
    val (_, dict) = Bpe.learnMerges(dictOf("abab" -> 4L), "word", "freq", 2)
    val docs = Seq((1L, "abab abab zzz"), (2L, "abab")).toDF("doc_id", "text")
    val out = Bpe.segmentStats(docs, "doc_id", "text", dict)
      .orderBy("doc_id").collect().toSeq
    // doc 1: abab→1 tok ×2, zzz unseen → 3 toks; 11 chars; 5 tokens.
    assert(out === Seq(
      Row(1L, 3L, 5L, 11L, 22000L),
      Row(2L, 1L, 1L, 4L, 40000L)))
  }

  test("learnMergesLocal ≡ learnMerges: merge table and segmented dict row-for-row") {
    // Exercises every edge the distributed trainer pins: overlap runs,
    // exact tie-breaks, chained merges, multi-word frequency
    // weighting, early exhaustion, and unicode (code-point tokens).
    val corpora = Seq(
      dictOf("aaa" -> 5L),
      dictOf("ba" -> 3L, "ab" -> 3L),
      dictOf("abab" -> 4L, "these" -> 2L, "aaaaa" -> 1L),
      dictOf("xy" -> 1L),
      dictOf("độộ" -> 7L, "ộb" -> 7L, "ab" -> 2L))
    for (corpus <- corpora; k <- Seq(1, 3, 8)) {
      val (dm, dd) = Bpe.learnMerges(corpus, "word", "freq", k)
      val (lm, ld) = Bpe.learnMergesLocal(corpus, "word", "freq", k)
      assert(lm.collect().toSeq === dm.collect().toSeq,
        s"merge tables diverged (k=$k)")
      assert(ld.orderBy("word").collect().toSeq === dd.orderBy("word").collect().toSeq,
        s"segmented dictionaries diverged (k=$k)")
    }
    // the router takes the local branch under the bound and the
    // distributed one above it, with identical results either way
    val c = dictOf("abab" -> 4L, "cd" -> 9L)
    val (am, ad) = Bpe.learnMergesAuto(c, "word", "freq", 2, maxLocalDict = 1)
    val (bm, bd) = Bpe.learnMergesAuto(c, "word", "freq", 2)
    assert(am.collect().toSeq === bm.collect().toSeq)
    assert(ad.orderBy("word").collect().toSeq === bd.orderBy("word").collect().toSeq)
  }

  test("learnMergesLocal fails fast past the dictionary bound") {
    intercept[IllegalArgumentException] {
      Bpe.learnMergesLocal(dictOf("ab" -> 1L, "cd" -> 1L, "ef" -> 1L),
        "word", "freq", 1, maxDictRows = 2)
    }
  }
}

package graft.operators

import graft.SparkSuite

/** Exact-semantics pin for the stateful sentence grouping (reference
  * F10, `pre_processing/process_all.py:305-335`): accumulate until
  * the running word count reaches minWords — a sentence that crosses
  * the threshold is INCLUDED in the closing group — and the final
  * partial group survives only if it holds at least minWords/2
  * words. Hand-computed expectations, not an oracle. */
class SentenceGroupingSpec extends SparkSuite {
  import spark.implicits._

  private def run(sents: Seq[(String, Int, String)], minWords: Int) =
    SentenceGrouping(sents.toDF("book", "seq", "sentence"), "book", "seq", "sentence", minWords)
      .select("key", "group_idx", "text", "word_count")
      .as[(String, Int, String, Int)]
      .collect()
      .sortBy(r => (r._1, r._2))
      .toSeq

  test("greedy boundary includes the crossing sentence") {
    // minWords=5: "one two" (2) + "three four five six" (4) = 6 >= 5
    // -> group closes INCLUDING the crossing sentence.
    val got = run(Seq(("b", 1, "one two"), ("b", 2, "three four five six"), ("b", 3, "seven eight nine")), 5)
    assert(got == Seq(
      ("b", 0, "one two three four five six", 6),
      ("b", 1, "seven eight nine", 3))) // tail: 3 >= 5/2=2 -> kept
  }

  test("short tail below minWords/2 is dropped") {
    // minWords=6 -> tail threshold 3; trailing "x y" (2 words) dropped.
    val got = run(Seq(("b", 1, "a b c d e f"), ("b", 2, "x y")), 6)
    assert(got == Seq(("b", 0, "a b c d e f", 6)))
  }

  test("exact-threshold group closes without borrowing") {
    val got = run(Seq(("b", 1, "a b c"), ("b", 2, "d e"), ("b", 3, "f g h i j")), 5)
    assert(got == Seq(
      ("b", 0, "a b c d e", 5),
      ("b", 1, "f g h i j", 5)))
  }

  test("empty sentences are skipped; multiple keys are independent") {
    val got = run(Seq(
      ("a", 1, "w1 w2 w3"), ("a", 2, ""), ("a", 3, "w4 w5"),
      ("b", 1, "v1 v2 v3 v4 v5 v6")), 5)
    assert(got == Seq(
      ("a", 0, "w1 w2 w3 w4 w5", 5),
      ("b", 0, "v1 v2 v3 v4 v5 v6", 6)))
  }

  test("order is by seq, not input order") {
    val got = run(Seq(("b", 2, "c d"), ("b", 1, "a b"), ("b", 3, "e f")), 4)
    assert(got == Seq(
      ("b", 0, "a b c d", 4),
      ("b", 1, "e f", 2))) // 2 >= 4/2 -> kept
  }
}

package graft.operators

import graft.SparkSuite

/** Corpus-WER aggregator (reference A8,
  * `alignment/post_process.py:322-329`): jiwer-style WEIGHTED corpus
  * WER — sum of edit distances over sum of reference words, NOT the
  * mean of per-utterance rates. Exact value pins. */
class WerSpec extends SparkSuite {
  import spark.implicits._

  test("weighted corpus WER, not mean-of-rates") {
    // utt1: ref 4 words, 0 errors (WER 0%)
    // utt2: ref 1 word, 1 error  (WER 100%)
    // mean-of-rates would be 50%; weighted corpus WER = 1/5 = 20%.
    val df = Seq(
      ("w1 w2 w3 w4", "w1 w2 w3 w4"),
      ("x", "y")).toDF("ref", "hyp")
    val wer = df.agg(Wer.corpusWer($"ref", $"hyp").as("wer")).as[Double].head()
    assert(wer == 20.0)
  }

  test("substitutions, deletions, insertions all count") {
    val df = Seq(
      ("a b c", "a x c"),   // 1 substitution
      ("d e f", "d f"),     // 1 deletion
      ("g h", "g h i")      // 1 insertion
    ).toDF("ref", "hyp")
    // errors=3, refWords=8 -> 37.5%
    val wer = df.agg(Wer.corpusWer($"ref", $"hyp").as("wer")).as[Double].head()
    assert(wer == 37.5)
  }

  test("empty corpus yields 0") {
    val df = Seq.empty[(String, String)].toDF("ref", "hyp")
    val wer = df.agg(Wer.corpusWer($"ref", $"hyp").as("wer")).as[Double].head()
    assert(wer == 0.0)
  }

  test("per-group aggregation composes") {
    val df = Seq(
      ("g1", "a b", "a b"),
      ("g1", "c d", "c x"),
      ("g2", "e", "f")).toDF("g", "ref", "hyp")
    val got = df.groupBy("g").agg(Wer.corpusWer($"ref", $"hyp").as("wer"))
      .as[(String, Double)].collect().toMap
    assert(got == Map("g1" -> 25.0, "g2" -> 100.0))
  }
}

package graft.functions

import org.scalacheck.Gen

import graft.{PropSampling, SparkSuite}

class BpeSpec extends SparkSuite {
  import spark.implicits._

  test("classic fixture: merge order, segmentation, early stop") {
    // The Sennrich et al. example: {"low":5, "lower":2, "newest":6,
    // "widest":3}. Pair counts put (e,s)=(s,t)=9 first — the
    // (count desc, left asc) rule picks (e,s); then (es,t)=9; then
    // the 7-count tie (l,o) < (o,w); then (lo,w)=7.
    val counts = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
    val model = Bpe.trainDriverSide(counts, nMerges = 4)
    assert(model.merges === Seq(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")))
    assert(model.encodeWord("lowest").toSeq === Seq("low", "est"))
    assert(model.encodeWord("newest").toSeq === Seq("n", "e", "w", "est"))
    assert(model.encodeWord("low").toSeq === Seq("low"))
    assert(model.encodeWord("unseen").toSeq === Seq("u", "n", "s", "e", "e", "n"))
    assert(model.encodeWord("").isEmpty)
    // Early stop: no adjacent pair reaches count 2 in a one-word
    // vocabulary of distinct symbols.
    assert(Bpe.trainDriverSide(Seq(("abc", 1L)), nMerges = 10).merges.isEmpty)
  }

  test("distributed fit ≡ driver-side training on the same word counts") {
    // The corpus spells out the fixture's word frequencies; the
    // distributed word-count + top-k path must land on the identical
    // merge table.
    val docs = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest"))
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }
    val fitted = Bpe.fit(docs.toDF("doc_id", "text"), nMerges = 4)
    assert(fitted.merges === Seq(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")))
    // Multi-word docs split on whitespace before counting.
    val joined = Bpe.fit(Seq((1L, "low low low low low lower lower"),
      (2L, "newest newest newest newest newest newest"),
      (3L, "widest widest widest")).toDF("doc_id", "text"), nMerges = 4)
    assert(joined.merges === fitted.merges)
  }

  test("reconstruction + determinism on random corpora; column path ≡ model path") {
    val wordGen = Gen.chooseNum(1, 8).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("aàbđcệ".toSeq)).map(_.mkString))
    val corpusGen = Gen.chooseNum(3, 25).flatMap(n => Gen.listOfN(n, wordGen))
    for (words <- PropSampling.sample(corpusGen, n = 4)) {
      val docs = words.zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
      val model = Bpe.fit(docs, nMerges = 12, maxVocab = 100)
      assert(Bpe.fit(docs, nMerges = 12, maxVocab = 100) === model, "fit must be deterministic")
      for (w <- words) {
        val toks = model.encodeWord(w)
        assert(toks.mkString === w, s"tokens must reconstruct '$w', got ${toks.toSeq}")
      }
      // The codegen'd column expression agrees with the driver-side
      // model on every document (multi-word text included).
      val got = docs.select($"doc_id", Bpe.encodeTokens($"text", model).as("toks"))
        .as[(Long, Seq[String])].collect().toMap
      for ((w, i) <- words.zipWithIndex)
        assert(got(i.toLong) === model.encode(w).toSeq)
    }
  }

  test("fitted token count is a column usable in aggregations") {
    val docs = Seq((1L, "low lower"), (2L, "newest widest newest")).toDF("doc_id", "text")
    val model = Bpe.fit(docs, nMerges = 4)
    val counts = docs.select($"doc_id", Bpe.tokenCount($"text", model).as("n"))
      .as[(Long, Int)].collect().toMap
    assert(counts(1L) === model.encode("low lower").length)
    assert(counts(2L) === model.encode("newest widest newest").length)
  }
}
